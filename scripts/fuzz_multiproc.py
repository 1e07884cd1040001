"""Randomized REAL multi-process fuzz: random flag/dataset configs run
through actual ``jax.distributed`` CLI processes (--coordinator) and
byte-compared against the single-host run.

Complements scripts/fuzz_oracle.py (single-host vs the string oracle)
with the multi-host surface: host record ranges, gz range spill, DCN
table/edge merges, engine broadcast, uniform join-cap agreement, part-
file concatenation.  Each config costs ~15-30 s (process + coordination
startup), so waves are small.

Usage: python scripts/fuzz_multiproc.py [n_configs] [start_seed]
"""

from __future__ import annotations

import gzip
import os
import socket
import subprocess
import sys
import tempfile
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _read(path: str) -> bytes:
    if path.endswith(".gz"):
        with gzip.open(path, "rb") as f:
            return f.read()
    with open(path, "rb") as f:
        return f.read()


def run_one(seed: int) -> dict:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from genfastq import gen_dataset
    from humid_tpu.pipeline import run

    rng = np.random.default_rng(seed)
    n_files = int(rng.integers(1, 4))
    n_proc = int(rng.integers(2, 4))
    edit = bool(rng.integers(0, 5) == 0)
    cfg = dict(
        n_reads=int(rng.integers(60, 400)),
        n_files=n_files,
        umi_style=["none", "underscore", "colon"][int(rng.integers(0, 3))],
        gz=bool(rng.integers(0, 2)),
        ragged=bool(rng.integers(0, 2)),
        unequal_lengths=bool(rng.integers(0, 2)) and n_files > 1,
    )
    flags = ["-m", str(int(rng.integers(0, 3))),
             "-n", str(int(rng.integers(8, 33)))]
    if edit:
        flags.append("-e")
    if rng.integers(0, 2):
        flags.append("-x")
    with tempfile.TemporaryDirectory() as d:
        gen_dataset(rng, d, **cfg)
        ext = "fastq.gz" if cfg["gz"] else "fastq"
        files = [os.path.join(d, f"file{i}.{ext}") for i in range(n_files)]
        ref_dir = os.path.join(d, "ref")
        kw = dict(zip(("distance", "word_length"),
                      (int(flags[1]), int(flags[3]))))
        run(files, dir_name=ref_dir, log_name=os.devnull,
            write_dedup=True, write_annotated=True, run_stats=True,
            edit=edit, maximum="-x" in flags, **kw)

        port = _free_port()
        out_dir = os.path.join(d, "dist")
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        env.pop("XLA_FLAGS", None)
        # Randomize the distributed-cluster route: forced sharded
        # (owned-component walks + DCN merge) vs forced replicated —
        # both must byte-match the single-host run.
        cfg["cluster_sharded"] = bool(rng.integers(0, 2))
        env["HUMID_TPU_CLUSTER_SHARDED"] = (
            "1" if cfg["cluster_sharded"] else "0")
        procs = [subprocess.Popen(
            [sys.executable, "-m", "humid_tpu",
             "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", str(n_proc), "--process-id", str(pid),
             "-d", out_dir, "-s", "-a", "-l", os.devnull,
             *flags, *files],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
            for pid in range(n_proc)]
        for p in procs:
            try:
                _, err = p.communicate(timeout=300)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise RuntimeError("distributed run timed out")
            if p.returncode != 0:
                raise RuntimeError(
                    f"process failed: {err.decode()[-1500:]}")
        for f in sorted(os.listdir(ref_dir)):
            a = _read(os.path.join(ref_dir, f))
            b = _read(os.path.join(out_dir, f))
            if a != b:
                raise AssertionError(f"{f} differs (n_proc={n_proc})")
    return dict(cfg, flags=flags, n_proc=n_proc)


def main() -> int:
    n_cfg = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    seed0 = int(sys.argv[2]) if len(sys.argv) > 2 else 42_000
    failures = []
    for i in range(n_cfg):
        seed = seed0 + i
        try:
            cfg = run_one(seed)
            status = "ok"
        except Exception:
            failures.append((seed, traceback.format_exc()))
            status = "FAIL"
            cfg = {}
        print(f"[{i + 1}/{n_cfg}] seed={seed} {status} {cfg}", flush=True)
    if failures:
        print(f"\n{len(failures)} FAILURES:")
        for seed, tb in failures:
            print(f"--- seed={seed}\n{tb}")
        return 1
    print(f"all {n_cfg} multi-process configs byte-match single-host")
    return 0


if __name__ == "__main__":
    sys.exit(main())

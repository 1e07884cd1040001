"""End-to-end dedup throughput benchmark.

Measures reads/sec of the full pipeline (FastQ bytes -> packed words ->
unique counting -> device neighbour search -> clustering -> dedup FastQ
output) on a synthetic dataset sized like the reference's own workloads,
and prints ONE JSON line:

  {"metric": "reads_per_sec", "value": N, "unit": "reads/s",
   "vs_baseline": R}

Baseline: the reference publishes no numbers (BASELINE.md).  The only
in-repo evidence is the troubleshooting log of a WGS-scale run
(/root/reference/docs/troubleshooting.rst:13-15): 22m42s trie build +
17m10s neighbour search for >=100M reads implies ~40k reads/s on a single
core, ignoring its output pass.  Until a measured single-core baseline
binary lands, vs_baseline is computed against BASELINE_READS_PER_SEC=40000.

Runs on whatever jax backend is default (the real TPU chip under the
driver); first invocation pays one jit compile per block shape, so the
timed run is preceded by an untimed warmup over the same shapes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

BASELINE_READS_PER_SEC = 40_000.0
BENCH_DIR = "/tmp/humid_tpu_bench"


def gen_dataset(path: str, n_reads: int, read_len: int = 100,
                dup_factor: int = 8, seed: int = 0) -> None:
    """Synthetic single-end FastQ: ``n_reads`` reads drawn from a pool of
    n_reads/dup_factor distinct sequences, each with a 30% chance of one
    random substitution (near-duplicates for the distance-1 search)."""
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    pool = bases[rng.integers(0, 4, size=(n_reads // dup_factor, read_len))]
    idx = rng.integers(0, len(pool), n_reads)
    seqs = pool[idx].copy()
    mut = rng.random(n_reads) < 0.3
    pos = rng.integers(0, read_len, n_reads)
    seqs[np.flatnonzero(mut), pos[mut]] = bases[
        rng.integers(0, 4, int(mut.sum()))
    ]
    qual = np.full((n_reads, read_len), ord("I"), np.uint8)
    with open(path, "wb") as f:
        chunk = 1 << 16
        for lo in range(0, n_reads, chunk):
            hi = min(lo + chunk, n_reads)
            parts = []
            for i in range(lo, hi):
                parts.append(b"@read%d\n" % i)
                parts.append(seqs[i].tobytes())
                parts.append(b"\n+\n")
                parts.append(qual[i].tobytes())
                parts.append(b"\n")
            f.write(b"".join(parts))


def run_once(files, out_dir, **kw):
    from humid_tpu.pipeline import run

    t0 = time.perf_counter()
    res = run(files, dir_name=out_dir, log_name=os.devnull, **kw)
    return time.perf_counter() - t0, res


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--reads", type=int, default=1_000_000)
    p.add_argument("--distance", type=int, default=1)
    p.add_argument("--no-warmup", action="store_true")
    args = p.parse_args()

    os.makedirs(BENCH_DIR, exist_ok=True)
    fq = os.path.join(BENCH_DIR, f"bench_{args.reads}.fastq")
    if not os.path.exists(fq):
        gen_dataset(fq, args.reads)

    out_dir = os.path.join(BENCH_DIR, "out")
    kw = dict(distance=args.distance, write_dedup=True)

    if not args.no_warmup:
        # Untimed warmup: same block shapes -> jit cache is hot.
        run_once([fq], out_dir, **kw)
    dt, res = run_once([fq], out_dir, **kw)

    rps = args.reads / dt
    print(json.dumps({
        "metric": "reads_per_sec",
        "value": round(rps, 1),
        "unit": "reads/s",
        "vs_baseline": round(rps / BASELINE_READS_PER_SEC, 2),
    }))
    print(
        f"# {args.reads} reads in {dt:.2f}s; unique={res.unique} "
        f"clusters={res.clusters} total={res.total}",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

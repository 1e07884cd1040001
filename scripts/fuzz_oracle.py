"""Wide randomized end-to-end fuzz vs the string oracle.

Runs the same config fuzz as tests/test_pipeline.py::
test_fuzz_random_config_matches_oracle over MANY more seeds — a hunt
campaign, not a CI gate (the in-tree test keeps 20 fixed seeds).  Any
divergence from the oracle's byte-level outputs or stats is a
correctness bug in the pipeline (or, historically, in the oracle —
either way worth finding before a user does).

Usage: python scripts/fuzz_oracle.py [n_configs] [start_seed]
"""

from __future__ import annotations

import os
import sys
import tempfile
import traceback
from pathlib import Path

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Virtual 8-device mesh so the randomized sharded* strategies exercise
# real multi-shard paths (same setup as tests/conftest.py).
_flags = " ".join(f for f in os.environ.get("XLA_FLAGS", "").split()
                  if "xla_force_host_platform_device_count" not in f)
os.environ["XLA_FLAGS"] = (
    _flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402


def main() -> int:
    n_cfg = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    seed0 = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000

    import jax

    jax.config.update("jax_platforms", "cpu")
    from test_pipeline import _check_case

    failures = []
    for i in range(n_cfg):
        seed = seed0 + i
        rng = np.random.default_rng(seed)
        n_files = int(rng.integers(1, 4))
        edit = bool(rng.integers(0, 4) == 0)
        cfg = dict(
            n_files=n_files,
            umi_style=["none", "underscore", "colon"][
                int(rng.integers(0, 3))],
            gz=bool(rng.integers(0, 2)),
            distance=int(rng.integers(0, 4)),
            word_length=int(rng.integers(0, 40)),
            edit=edit,
            maximum=bool(rng.integers(0, 2)),
            ragged=bool(rng.integers(0, 2)),
            unequal=bool(rng.integers(0, 2)) and n_files > 1,
            n_reads=int(rng.integers(50, 500)),
            batch_records=int(rng.choice([64, 1 << 10, 1 << 19])),
        )
        span = bool(rng.integers(0, 2))
        # Engine-equivalence dimension: force a random strategy; every
        # engine must reproduce the oracle byte-for-byte.  (The
        # pigeonhole mesh search is Hamming-only.)
        strategies = ([None, "runs", "dense", "bucketed", "runs_device",
                       "sharded", "sharded_bucketed"]
                      if not edit else [None, "dense", "sharded"])
        strategy = strategies[int(rng.integers(0, len(strategies)))]
        # Degenerate-data dimension: tiny pools make giant equal-key
        # runs, driving the big-run / dense / join-cap fallback ladders.
        if rng.integers(0, 4) == 0:
            cfg["pool_size"] = int(rng.choice([1, 2, 4]))
        # The overlapped pass-1 (sorted key runs on the packing pool +
        # fused k-way merge) is the recommended many-core production
        # setting and a complete alternate unique-counting
        # implementation — fuzz it too.
        overlap = bool(rng.integers(0, 3) == 0)
        # Fused device-resident pipeline dimension (round 5): the whole
        # unique->neighbours(->labels) stretch through ops/fused.py.
        # Excluded by the same phase-override rules as production
        # routing (strategy / overlap opt-ins win), and -e runs ignore
        # it by construction.
        fused = (bool(rng.integers(0, 3) == 0) and strategy is None
                 and not overlap)
        # Cluster-route dimension: sequential native walk (default) /
        # component-parallel OpenMP / the round-5 device formulation of
        # directional clustering — all bit-exact by contract.
        cluster_route = [None, "parallel", "device"][
            int(rng.integers(0, 3)) if rng.integers(0, 2) else 0]
        # -e verifier dimension: native banded DP vs the device
        # pairwise banded-Levenshtein kernel.
        edit_verify = (["host", "device"][int(rng.integers(0, 2))]
                       if edit and rng.integers(0, 2) else None)
        env_backup = {k: os.environ.get(k)
                      for k in ("HUMID_TPU_SPAN_CACHE",
                                "HUMID_TPU_STRATEGY",
                                "HUMID_TPU_OVERLAP_UNIQUE",
                                "HUMID_TPU_FUSED",
                                "HUMID_TPU_CLUSTER",
                                "HUMID_TPU_EDIT_VERIFY")}
        if edit_verify is not None:
            os.environ["HUMID_TPU_EDIT_VERIFY"] = edit_verify
        else:
            os.environ.pop("HUMID_TPU_EDIT_VERIFY", None)
        if fused:
            os.environ["HUMID_TPU_FUSED"] = "1"
        else:
            os.environ.pop("HUMID_TPU_FUSED", None)
        if cluster_route is not None:
            os.environ["HUMID_TPU_CLUSTER"] = cluster_route
        else:
            os.environ.pop("HUMID_TPU_CLUSTER", None)
        if span:
            os.environ["HUMID_TPU_SPAN_CACHE"] = "1"
        else:
            os.environ.pop("HUMID_TPU_SPAN_CACHE", None)
        if strategy is not None:
            os.environ["HUMID_TPU_STRATEGY"] = strategy
        else:
            os.environ.pop("HUMID_TPU_STRATEGY", None)
        if overlap:
            os.environ["HUMID_TPU_OVERLAP_UNIQUE"] = "1"
        else:
            os.environ.pop("HUMID_TPU_OVERLAP_UNIQUE", None)
        try:
            with tempfile.TemporaryDirectory() as d:
                _check_case(Path(d), rng, **cfg)
            status = "ok"
        except Exception:
            failures.append((seed, dict(cfg, strategy=strategy,
                                        overlap=overlap, fused=fused,
                                        cluster=cluster_route),
                             span, traceback.format_exc()))
            status = "FAIL"
        finally:
            for k, v in env_backup.items():
                if v is not None:
                    os.environ[k] = v
                else:
                    os.environ.pop(k, None)
        if status == "FAIL" or (i + 1) % 25 == 0:
            print(f"[{i + 1}/{n_cfg}] seed={seed} {status}", flush=True)

    if failures:
        print(f"\n{len(failures)} FAILURES:")
        for seed, cfg, span, tb in failures:
            print(f"--- seed={seed} span={span} cfg={cfg}\n{tb}")
        return 1
    print(f"all {n_cfg} configs match the oracle")
    return 0


if __name__ == "__main__":
    sys.exit(main())

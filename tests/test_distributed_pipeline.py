"""Host-sharded pipeline == single-host pipeline, simulated in-process."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from genfastq import gen_dataset  # noqa: E402

from humid_tpu.pipeline import run
from humid_tpu.parallel.pipeline import (
    count_records,
    pack_host_range,
    run_sharded,
)


def _simulated_hosts(files, n_hosts, **kw):
    """Run run_sharded once per 'host', exchanging tables via a list."""
    total = count_records(files[0])
    per_host = []
    for h in range(n_hosts):
        # Gather step: collect every host's local table.
        def all_gather(arrs, h=h):
            gathered = [[] for _ in arrs]
            for p in range(n_hosts):
                from humid_tpu.parallel.multihost import host_record_range
                from humid_tpu.ops.unique import unique_words

                lo, hi = host_record_range(total, p, n_hosts)
                packed, filtered = pack_host_range(files, lo, hi)
                u, c, f, _ = unique_words(packed[~filtered])
                fg = (np.flatnonzero(~filtered) + lo)[f] if len(f) else f
                for slot, val in enumerate((u, c, fg)):
                    gathered[slot].append(val)
            return gathered

        cl, counts, first_occ, uniq = run_sharded(
            files, total_records=total, process_id=h,
            num_processes=n_hosts, all_gather=all_gather, **kw,
        )
        per_host.append((cl, counts, first_occ, uniq))
    return per_host


def test_sharded_matches_single_host(tmp_path):
    gen_dataset(np.random.default_rng(3), str(tmp_path), n_reads=700,
                n_files=2, umi_style="underscore")
    files = [str(tmp_path / f"file{i}.fastq") for i in range(2)]

    ref = run(files, dir_name=str(tmp_path / "out"),
              log_name=os.devnull, write_dedup=False)

    results = _simulated_hosts(files, 3)
    for cl, counts, first_occ, uniq in results:
        np.testing.assert_array_equal(cl.labels, ref.labels)
        np.testing.assert_array_equal(counts, ref.counts)
        assert cl.num_clusters == ref.clusters
        # Representative reads derive from (first_occ, max_leaf) exactly
        # as in the single-host pipeline.
        reps = np.sort(first_occ[cl.max_leaf])
        np.testing.assert_array_equal(reps, ref.rep_reads)


def test_sharded_single_process_path(tmp_path):
    gen_dataset(np.random.default_rng(5), str(tmp_path), n_reads=300)
    files = [str(tmp_path / "file0.fastq")]
    ref = run(files, dir_name=str(tmp_path / "out"),
              log_name=os.devnull, write_dedup=False)
    cl, counts, first_occ, uniq = run_sharded(
        files, process_id=0, num_processes=1)
    np.testing.assert_array_equal(cl.labels, ref.labels)
    assert cl.num_clusters == ref.clusters

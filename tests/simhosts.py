"""In-process multi-host simulation gather for the sharded pipeline.

``make_sim_gather`` returns an ``all_gather`` fake that recomputes every
simulated host's contribution on demand (hosts run sequentially in one
process, so the fake cannot capture live peers).  It serves BOTH gather
shapes the pipeline issues:

  3 arrays  -> per-host unique tables (uniq, counts, first_occ)
  2 arrays  -> per-host partial neighbour-pair lists, recomputed with
               find_neighbor_pairs(shard=(p, n_hosts)) over the merged
               global unique table — exactly what each real host would
               contribute (humid_tpu/parallel/pipeline.py).
"""

import os

import numpy as np


def make_sim_gather(files, total, n_hosts, *, word_length=24, distance=1,
                    edit=False, maximum=False, neighbor_opts=None):
    from humid_tpu.ops import find_neighbor_pairs
    from humid_tpu.ops.unique import unique_words
    from humid_tpu.parallel.multihost import (
        combine_unique_tables,
        host_record_range,
    )
    from humid_tpu.parallel.pipeline import pack_host_range

    def host_tables():
        per = []
        for p in range(n_hosts):
            lo, hi = host_record_range(total, p, n_hosts)
            packed, filtered = pack_host_range(files, lo, hi,
                                               word_length=word_length)
            u, c, f, _ = unique_words(packed[~filtered])
            fg = (np.flatnonzero(~filtered) + lo)[f] if len(f) else f
            per.append((u, c, fg))
        return per

    def all_gather(arrs):
        if len(arrs) == 1:
            # Single-array gathers are replicated: the known callers —
            # engine-choice broadcast (int64 scalar), join_cap agreement
            # (int64 scalar), scaling-report timings (float row) — all
            # gather values that are HOST-INDEPENDENT in this one-process
            # simulation (same calibration cache, same free memory, same
            # process), so replication is exact for them.  The dtype
            # assert below fences off only shapes no known caller sends;
            # a future gather of genuinely host-DEPENDENT data must be
            # added to host_tables()-style per-host recomputation instead
            # of relying on this replication.
            a0 = np.asarray(arrs[0])
            assert (a0.dtype.kind in "iu" and a0.size == 1) or \
                a0.dtype.kind == "f", \
                f"unrecognized single-array gather: {a0.dtype} {a0.shape}"
            return [[a0] * n_hosts]
        if len(arrs) == 5:
            # Distributed cluster gather (parallel/cluster.py): every
            # simulated host's owned-component contribution, recomputed
            # over the same merged table + edge list each real host
            # derives (the 2-array recursion below supplies the merged
            # pair list).
            from humid_tpu.ops import pairs_to_csr
            from humid_tpu.parallel.cluster import cluster_sharded_local
            from humid_tpu.parallel.multihost import merge_edge_lists

            per = host_tables()
            uniq_g, counts_g, _ = combine_unique_tables(*[
                [t[slot] for t in per] for slot in range(3)])
            z = np.zeros(0, np.int64)
            pa, pb = merge_edge_lists(z, z, all_gather=all_gather)
            indptr, indices = pairs_to_csr(pa, pb, len(uniq_g))
            outs = [cluster_sharded_local(
                counts_g, indptr, indices, pa, pb, maximum=maximum,
                shard=(q, n_hosts)) for q in range(n_hosts)]
            return [[o[slot] for o in outs] for slot in range(5)]
        per = host_tables()
        if len(arrs) == 3:
            return [[t[slot] for t in per] for slot in range(3)]
        assert len(arrs) == 2, "unexpected gather shape"
        uniq_g, _, _ = combine_unique_tables(*[
            [t[slot] for t in per] for slot in range(3)])
        pa_all, pb_all = [], []
        for p in range(n_hosts):
            nb = dict(neighbor_opts or {})
            nb.setdefault("shard", (p, n_hosts))
            if not edit and "strategy" not in nb and not os.environ.get(
                    "HUMID_TPU_STRATEGY"):
                # Mirror the driver: every host adopts the broadcast
                # engine decision (parallel/pipeline.py).
                from humid_tpu.parallel.multihost import (
                    broadcast_engine_choice)

                nb["strategy"] = broadcast_engine_choice(
                    all_gather=all_gather)
            pa, pb = find_neighbor_pairs(
                uniq_g, distance, metric="edit" if edit else "hamming",
                word_length=word_length, **nb)
            pa_all.append(pa)
            pb_all.append(pb)
        return [pa_all, pb_all]

    return all_gather

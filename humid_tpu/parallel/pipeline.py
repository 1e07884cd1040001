"""Distributed (multi-host) pipeline driver for WGS-scale runs.

Composes the single-host building blocks into the full data-parallel
flow of BASELINE.json's north star:

  1. every host ingests its record range of every input file (lockstep,
     so tuples stay aligned) and packs fingerprints locally;
  2. per-host unique tables merge into the global table over DCN
     (humid_tpu.parallel.multihost) — counts summed, globally smallest
     first-occurrence kept, so representative selection stays byte-exact;
  3. the neighbour search + clustering run on the global unique table:
     on every host for the host-local outputs (the table is ~100x
     smaller than the input), sharded over each host's local chip mesh
     (humid_tpu.parallel.neighbors / labelprop);
  4. every host writes the output records of its own range.

Single-process testing injects ``all_gather`` (see tests/test_multihost
and tests/test_distributed_pipeline); under a real multi-host job call
``init_distributed()`` first and every process runs ``run_sharded``
with its own ``process_id``/``num_processes``.
"""

from __future__ import annotations

import jax
import numpy as np

from .. import words as W
from ..cluster import cluster_exact
from ..io import read_tuples
from ..ops import find_neighbor_pairs, pairs_to_csr
from ..ops.unique import unique_words
from ..pipeline import _batch_words, peek_umi_size
from .multihost import combine_unique_tables, host_record_range


def count_records(files) -> int:
    """Number of lockstep record-tuples across ``files`` (framing pass
    only).  The lockstep reader stops at the shortest file
    (fastq.cc:41-43), so with unequal-length inputs the tuple count is
    the MIN over files — counting only the first file would overstate
    the total and starve the trailing hosts' ranges."""
    if isinstance(files, str):
        files = [files]
    n = 0
    for batch in read_tuples(list(files)):
        n += batch[0].n
    return n


def pack_host_range(files, lo: int, hi: int, *, word_length: int = 24):
    """Pack fingerprints for record-tuples [lo, hi) of every file.

    Returns (packed [n, W], filtered [n]); indices are LOCAL (add ``lo``
    for global read indices).
    """
    umi_len = peek_umi_size(files[0])
    header_umi_size, nt_to_take = W.pre_compute(
        umi_len, len(files), word_length
    )
    packed_parts, filt_parts = [], []
    base = 0
    for batches in read_tuples(files):
        n = batches[0].n
        s = max(lo - base, 0)
        e = min(hi - base, n)
        base += n
        if e <= s:
            if base >= hi:
                break
            continue
        sub = [b.slice_records(s, e) for b in batches]
        packed, filtered = _batch_words(sub, nt_to_take, header_umi_size)
        packed_parts.append(packed)
        filt_parts.append(filtered)
        if base >= hi:
            break
    if not packed_parts:
        wl = header_umi_size + sum(nt_to_take)
        return (np.zeros((0, W.num_lanes(wl)), np.uint32),
                np.zeros(0, bool))
    return np.concatenate(packed_parts), np.concatenate(filt_parts)


def run_sharded(
    files,
    *,
    word_length: int = 24,
    distance: int = 1,
    maximum: bool = False,
    total_records: int | None = None,
    process_id: int | None = None,
    num_processes: int | None = None,
    all_gather=None,
    neighbor_opts: dict | None = None,
):
    """Host-sharded dedup: this host packs its record range, merges
    unique tables globally, and computes the global clustering.

    Returns (labels [U], counts [U], first_occ [U] global read indices,
    uniq [U, W]) — identical on every host, and identical to a
    single-host :func:`humid_tpu.ops.unique.unique_words` +
    clustering run over the whole input.
    """
    n_proc = (num_processes if num_processes is not None
              else jax.process_count())
    if total_records is None:
        total_records = count_records(files)
    lo, hi = host_record_range(total_records, process_id, n_proc)
    packed, filtered = pack_host_range(
        files, lo, hi, word_length=word_length
    )
    usable = packed[~filtered]
    local_to_read = np.flatnonzero(~filtered) + lo
    uniq_l, counts_l, first_l, _ = unique_words(usable)
    first_global = (local_to_read[first_l] if len(first_l)
                    else first_l)

    if all_gather is None and n_proc == 1:
        uniq, counts, first_occ = uniq_l, counts_l, first_global
    else:
        from .multihost import merge_unique_tables

        uniq, counts, first_occ = merge_unique_tables(
            uniq_l, counts_l, first_global, all_gather=all_gather
        )

    nb = dict(neighbor_opts or {})
    pa, pb = find_neighbor_pairs(
        uniq, distance, word_length=word_length, **nb
    )
    indptr, indices = pairs_to_csr(pa, pb, len(uniq))
    cl = cluster_exact(counts, indptr, indices, maximum=maximum)
    return cl, counts, first_occ, uniq

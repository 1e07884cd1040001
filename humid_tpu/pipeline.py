"""End-to-end deduplication pipeline.

TPU-native rebuild of the reference's ``humid()`` driver (humid.cc:369-409):

  pass 1  read + pack words     (host, vectorized)     <- readData
  unique  sort/unique counting  (host lexsort)         <- trie leaf counts
  search  XOR+popcount blocks   (TPU, jax/pallas)      <- asymmetricHamming
  cluster exact traversal       (host/C++, iterative)  <- cluster.cc
  pass 2  write outputs         (host, streaming)      <- writeFiltered/
                                                          writeAnnotated

The output contract (duplicate sets, annotations, statistics files, file
naming, log phases) is bit-compatible with the reference binary.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

from . import words as W
from .io import FastqWriter, make_file_names, peek_first_record, read_tuples
from .ops import find_neighbor_pairs, pairs_to_csr, unique_words
from .cluster import cluster_exact
from .phaselog import PhaseLog
from .stats import write_statistics


@dataclass
class PipelineResult:
    total: int = 0
    usable: int = 0
    unique: int = 0
    clusters: int = 0
    # Arrays for inspection/testing:
    labels: np.ndarray | None = None        # [U] cluster id per unique word
    counts: np.ndarray | None = None        # [U] duplicate count
    rep_reads: np.ndarray | None = None     # representative read indices
    cluster_of_read: np.ndarray | None = None  # [N] id per read (0=filtered)
    degree: np.ndarray | None = None        # [U] neighbour count
    sizes: np.ndarray | None = None         # [K] cluster sizes
    extra: dict = field(default_factory=dict)


def peek_umi_size(path: str) -> int:
    """UMI length of the first record of ``path`` (humid.cc:24-33)."""
    name, _seq = peek_first_record(path)
    return len(W.extract_umi(name.decode("latin1")))


try:
    from .io._fastqio import encode_pack as _encode_pack
    from .io._fastqio import gather_prefix as _gather_prefix
except ImportError:  # pragma: no cover - extension not built
    _encode_pack = _gather_prefix = None


def _batch_words(batches, nt_to_take, header_umi_size):
    """One batch tuple -> (packed [n, W], filtered [n]), via the fused
    native path (gather + encode + pack in C) when available."""
    n = batches[0].n
    wl = header_umi_size + sum(nt_to_take)
    if _encode_pack is not None:
        chars = np.empty((n, wl), np.uint8)
        col = 0
        if header_umi_size > 0:
            chars[:, :header_umi_size] = W.extract_umi_matrix(
                batches[0].name_matrix(), header_umi_size
            )
            col = header_umi_size
        for b, k in zip(batches, nt_to_take):
            if k:
                _gather_prefix(b.buf, b.starts[:, 1], b.ends[:, 1],
                               chars, col, k)
                col += k
        return _encode_pack(chars)
    umi_chars = None
    if header_umi_size > 0:
        umi_chars = W.extract_umi_matrix(
            batches[0].name_matrix(), header_umi_size
        )
    seq_chars = [b.seq_prefix(k) for b, k in zip(batches, nt_to_take)]
    codes, filtered = W.build_words(umi_chars, seq_chars)
    return W.pack_words(codes), filtered


def _input_bytes_estimate(files) -> int:
    """Approximate in-memory size of the parsed inputs (gz assumed ~4x)."""
    total = 0
    for f in files:
        try:
            sz = os.path.getsize(f)
        except OSError:
            return 1 << 62
        total += sz * 4 if f.endswith(".gz") else sz
    return total


def _pass1(files, nt_to_take, header_umi_size, batch_records,
           cache: list | None = None, pack_workers: int = 3):
    """Stream all files in lockstep; return (packed [N,W], filtered [N]).
    When ``cache`` is a list, parsed batch tuples are appended to it for
    reuse by the output pass.

    Packing (UMI gather + base encode, all GIL-releasing C calls) runs on
    a small thread pool so it overlaps the reader thread's
    decompression + framing; in-flight futures are bounded so memory
    stays proportional to the pool size."""
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    packed_parts: list[np.ndarray] = []
    filt_parts: list[np.ndarray] = []

    def _drain(fut):
        packed, filtered = fut.result()
        packed_parts.append(packed)
        filt_parts.append(filtered)

    with ThreadPoolExecutor(max_workers=max(1, pack_workers)) as ex:
        inflight: deque = deque()
        for batches in read_tuples(files, batch_records):
            if cache is not None:
                cache.append(batches)
            inflight.append(ex.submit(_batch_words, batches, nt_to_take,
                                      header_umi_size))
            while len(inflight) > pack_workers + 1:
                _drain(inflight.popleft())
        while inflight:
            _drain(inflight.popleft())
    if not packed_parts:
        wl = header_umi_size + sum(nt_to_take)
        return (np.zeros((0, W.num_lanes(wl)), np.uint32),
                np.zeros(0, bool))
    return np.concatenate(packed_parts), np.concatenate(filt_parts)


def run(
    files: list[str],
    *,
    word_length: int = 24,
    distance: int = 1,
    log_name: str = "/dev/stderr",
    dir_name: str = ".",
    run_stats: bool = False,
    write_dedup: bool = True,
    write_annotated: bool = False,
    edit: bool = False,
    maximum: bool = False,
    batch_records: int = 1 << 17,
    neighbor_opts: dict | None = None,
    cache_records: bool | None = None,
    profile_dir: str | None = None,
) -> PipelineResult:
    """Deduplicate ``files``; mirrors humid(wordLength, distance, ...)
    (humid.cc:369-409 and CLI defaults humid.cc:413-429).

    ``profile_dir`` (or env HUMID_TPU_PROFILE) captures a jax.profiler
    trace of the whole run, with kernels attributed to pipeline phases.
    """
    if not files:
        raise ValueError("at least one FastQ file required")
    if profile_dir is None:
        profile_dir = os.environ.get("HUMID_TPU_PROFILE")
    if profile_dir:
        import jax.profiler as _prof

        with _prof.trace(profile_dir):
            return run(
                files, word_length=word_length, distance=distance,
                log_name=log_name, dir_name=dir_name, run_stats=run_stats,
                write_dedup=write_dedup, write_annotated=write_annotated,
                edit=edit, maximum=maximum, batch_records=batch_records,
                neighbor_opts=neighbor_opts, cache_records=cache_records,
                profile_dir="",
            )
    log = PhaseLog(log_name)
    res = PipelineResult()

    # --- nucleotide budgeting (humid.cc:38-59) ---
    t = log.start("Determing nucleotides to take")
    umi_len = peek_umi_size(files[0])
    header_umi_size, nt_to_take = W.pre_compute(
        umi_len, len(files), word_length
    )
    log.end(t)
    log.write(f"  header: {header_umi_size}")
    for f, k in zip(files, nt_to_take):
        log.write(f"\n  {f}: {k}")
    log.write("\n")

    # --- pass 1: read + pack (readData, humid.cc:70-103) ---
    # Inputs up to 16GB parsed keep their record batches in memory so the
    # output pass skips the second read entirely (the reference always
    # re-reads, humid.cc:203-292).
    cache: list | None = None
    if cache_records is None:
        try:
            avail = (os.sysconf("SC_AVPHYS_PAGES")
                     * os.sysconf("SC_PAGE_SIZE"))
        except (ValueError, OSError):
            avail = 1 << 33
        cache_records = (
            _input_bytes_estimate(files) < min(1 << 34, avail // 3)
        )
    if cache_records and (write_dedup or write_annotated):
        cache = []

    t = log.start("Reading data")
    packed, filtered = _pass1(files, nt_to_take, header_umi_size,
                              batch_records, cache)
    res.total = int(len(packed))
    res.usable = int((~filtered).sum())
    log.end(t)

    # --- exact duplicate counting (replaces trie leaf counts) ---
    import time as _time

    _t_uni = _time.time()
    any_filtered = bool(filtered.any())
    usable_packed = packed[~filtered] if any_filtered else packed
    # The row->unique inverse (and with it the per-read cluster-id
    # vector) is only needed for annotated output; skipping it saves a
    # 100M-row random scatter + gather at WGS scale.
    uniq, counts, first_occ_usable, inverse = unique_words(
        usable_packed, want_inverse=write_annotated)
    log.timings.append(("unique counting", _time.time() - _t_uni))
    res.unique = len(uniq)
    res.counts = counts
    # first_occ indexes usable rows; convert to global read indices.
    if any_filtered:
        usable_to_read = np.flatnonzero(~filtered)
        first_occ = (usable_to_read[first_occ_usable]
                     if len(first_occ_usable) else first_occ_usable)
    else:
        usable_to_read = None  # identity mapping
        first_occ = first_occ_usable

    # --- neighbour search (humid.cc:113-158) ---
    if edit:
        t = log.start("Calculating neighbours using Levenshtein distance")
    else:
        t = log.start("Calculating neighbours using Hamming distance")
    nb = dict(neighbor_opts or {})
    # (HUMID_TPU_STRATEGY / HUMID_TPU_IMPL env overrides are honored
    # inside find_neighbor_pairs, so every driver — single-host,
    # sharded, tests — sees them.)
    pa, pb = find_neighbor_pairs(
        uniq, distance,
        metric="edit" if edit else "hamming",
        word_length=word_length, **nb,
    )
    indptr, indices = pairs_to_csr(pa, pb, len(uniq))
    res.degree = np.diff(indptr)
    log.end(t)

    # --- clustering (humid.cc:167-193, cluster.cc) ---
    if maximum:
        t = log.start("Calculating maximum clusters")
    else:
        t = log.start("Calculating directional clusters")
    cl = cluster_exact(counts, indptr, indices, maximum=maximum)
    res.clusters = cl.num_clusters
    res.labels = cl.labels
    res.sizes = cl.size
    log.end(t)

    os.makedirs(dir_name, exist_ok=True)

    # Representative read per cluster: the first read (file order) whose
    # word is the cluster's maxLeaf (humid.cc:223-232).
    if cl.num_clusters:
        rep_reads = np.sort(first_occ[cl.max_leaf])
    else:
        rep_reads = np.zeros(0, np.int64)
    res.rep_reads = rep_reads

    # Per-read cluster id (0 for filtered reads; humid.cc:271-278),
    # only materialized for annotated output.
    cluster_of_read = None
    if write_annotated:
        if res.unique and usable_to_read is None:
            cluster_of_read = cl.labels[inverse]
        else:
            cluster_of_read = np.zeros(res.total, dtype=np.int64)
            if res.unique:
                cluster_of_read[usable_to_read] = cl.labels[inverse]
    res.cluster_of_read = cluster_of_read

    # --- pass 2: outputs ---
    if write_dedup:
        t = log.start("Writing filtered results")
        _write_selected(files, dir_name, "dedup", rep_reads, batch_records,
                        cache)
        log.end(t)
    if write_annotated:
        t = log.start("Writing annotated results")
        _write_annotated(files, dir_name, cluster_of_read, batch_records,
                         cache)
        log.end(t)

    if run_stats:
        t = log.start("Calculating count and neighbour stats")
        log.end(t)
        write_statistics(
            counts=res.counts,
            degrees=res.degree,
            sizes=res.sizes,
            total=res.total,
            usable=res.usable,
            unique=res.unique,
            num_clusters=res.clusters,
            dir_name=dir_name,
        )

    res.extra["timings"] = dict(log.timings)
    log.close()
    return res


def _pipelined_write(source, names, build_one,
                     build_workers: int | None = None):
    """Drive an output pass with builds overlapped against writes.

    ``build_one(batches) -> list[np.ndarray]`` (one record buffer per
    file) runs on a thread pool (record assembly is GIL-releasing native
    gather); gzip outputs are also compressed on the pool, each batch
    becoming an independent gzip member (valid multi-member stream with
    byte-identical decompressed content).  The main thread writes
    completed payloads in order; bounded in-flight futures keep memory
    proportional to the pool size.
    """
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    from .io.writer import compress_member

    writers = [FastqWriter(n) for n in names]
    if build_workers is None:
        # Gzip outputs spend their time in member compression — give
        # them the whole pool; plain outputs are gather-bound.
        build_workers = 4 if any(w.is_gz for w in writers) else 2

    def _build_and_pack(item):
        outs = build_one(item)
        return [
            compress_member(o, w.compression)
            if w.is_gz and len(o) else o
            for w, o in zip(writers, outs)
        ]

    def _flush(fut):
        for w, out in zip(writers, fut.result()):
            w.write_payload(out)

    try:
        with ThreadPoolExecutor(max_workers=build_workers) as ex:
            inflight: deque = deque()
            for batches in source:
                inflight.append(ex.submit(_build_and_pack, batches))
                while len(inflight) > build_workers + 1:
                    _flush(inflight.popleft())
            while inflight:
                _flush(inflight.popleft())
    finally:
        for w in writers:
            w.close()


def _write_selected(files, dir_name, suffix, selected, batch_records,
                    cache=None):
    """Second pass: write only reads whose global index is in ``selected``
    (sorted)."""
    from .io import build_records

    names = make_file_names(list(files), dir_name, suffix)
    source = cache if cache is not None else read_tuples(
        files, batch_records)

    # Selection state advances per batch, so the plan (which records of
    # this batch are selected) is computed on the main thread during
    # submission; only the record assembly runs on the pool.
    state = {"base": 0, "ptr": 0}

    def _planned_source():
        for batches in source:
            n = batches[0].n
            base, ptr = state["base"], state["ptr"]
            end = int(np.searchsorted(selected, base + n, side="left"))
            local = (selected[ptr:end] - base).astype(np.int64)
            state["base"] = base + n
            state["ptr"] = end
            yield (batches, local)

    def _build_planned(item):
        batches, local = item
        return [build_records(b, local) for b in batches]

    _pipelined_write(_planned_source(), names, _build_planned)


def _write_annotated(files, dir_name, cluster_of_read, batch_records,
                     cache=None):
    """Second pass: every read annotated with ``:<cluster_id>``
    (humid.cc:251-292)."""
    from .io import build_records_annotated

    names = make_file_names(list(files), dir_name, "annotated")
    source = cache if cache is not None else read_tuples(
        files, batch_records)

    state = {"base": 0}

    def _planned_source():
        for batches in source:
            n = batches[0].n
            ids = cluster_of_read[state["base"]:state["base"] + n]
            state["base"] += n
            yield (batches, ids)

    def _build_planned(item):
        batches, ids = item
        return [build_records_annotated(b, ids) for b in batches]

    _pipelined_write(_planned_source(), names, _build_planned)

"""Exact-duplicate counting over packed word fingerprints.

Replaces the reference's trie insertion + leaf counts (humid.cc:92-99,
trie.add at humid.cc:95).  The trie's lexicographic ``walk()`` order
(humid.cc:117,178) is reproduced for free: unique fingerprints are returned
in ascending lane-lexicographic order, which equals lexicographic word
order because :func:`humid_tpu.words.pack_words` packs big-endian.
"""

from __future__ import annotations

import numpy as np

try:
    from .._hostops import argsort_u64 as _argsort_u64
    from .._hostops import unique_u64 as _unique_u64
    from .._hostops import unique_packed as _unique_packed
except ImportError:  # pragma: no cover - extension not built
    _argsort_u64 = None
    _unique_u64 = None
    _unique_packed = None


def _unique_packed_native(packed: np.ndarray, want_inverse: bool):
    """Fully fused native path: key build + stable radix sort + group
    structure all in C (csrc/hostops.cpp unique_packed).  Outputs are
    np.empty buffers sized n of which only k entries are faulted, so
    the visible cost is ~two parallel passes over the keys."""
    n, w = packed.shape
    packed = np.ascontiguousarray(packed)
    uniq = np.empty((n, w), np.uint32)
    counts = np.empty(n, np.int64)
    first_occ = np.empty(n, np.int64)
    inverse = np.empty(n if want_inverse else 1, np.int64)
    k = _unique_packed(packed, w, uniq, counts, first_occ, inverse,
                       int(want_inverse))
    return (uniq[:k].copy(), counts[:k].copy(), first_occ[:k].copy(),
            inverse if want_inverse else None)


def _unique_by_key_native(packed: np.ndarray, key: np.ndarray,
                          want_inverse: bool = True):
    """Fused native sort + group structure (csrc/hostops.cpp)."""
    n = len(key)
    order = np.empty(n, np.int64)
    group_start = np.empty(n, np.int64)
    counts = np.empty(n, np.int64)
    first_occ = np.empty(n, np.int64)
    inverse = np.empty(n if want_inverse else 1, np.int64)
    k = _unique_u64(np.ascontiguousarray(key), order, group_start,
                    counts, first_occ, inverse, int(want_inverse))
    uniq = packed[order[group_start[:k]]]
    return (uniq, counts[:k].copy(), first_occ[:k].copy(),
            inverse if want_inverse else None)


def _stable_argsort_u64(key: np.ndarray) -> np.ndarray:
    if _argsort_u64 is not None:
        order = np.empty(len(key), np.int64)
        _argsort_u64(np.ascontiguousarray(key), order)
        return order
    return np.argsort(key, kind="stable")


def unique_words(packed: np.ndarray, want_inverse: bool = True):
    """Group identical fingerprints.

    Args:
      packed: [N, W] uint32 fingerprint lanes (unfiltered words only).
      want_inverse: skip building the [N] row->unique map when the
        caller doesn't need per-read labels (dedup-only runs) — the
        random-scatter inverse write is a large share of unique time at
        WGS scale.

    Returns:
      uniq:       [U, W] uint32, ascending lexicographic order.
      counts:     [U]   int64 exact-duplicate count per unique word
                  (== trie leaf ``count``).
      first_occ:  [U]   int64 index (into the N input rows) of the first
                  occurrence of each unique word in input order — the
                  representative the dedup writer emits (humid.cc:224-231).
      inverse:    [N]   int64 mapping row -> unique index (None when
                  ``want_inverse`` is False).
    """
    n, w = packed.shape
    if n == 0:
        return (
            np.zeros((0, w), np.uint32),
            np.zeros(0, np.int64),
            np.zeros(0, np.int64),
            np.zeros(0, np.int64),
        )
    # Stable sort in lane-lexicographic order.  For <= 2 lanes a single
    # uint64 key suffices, and the fused native path does sort + group
    # structure + inverse in one call.
    if w <= 2 and _unique_packed is not None and n <= np.iinfo(np.int32).max:
        return _unique_packed_native(packed, want_inverse)
    if w <= 2 and _unique_u64 is not None:
        if w == 1:
            key = packed[:, 0].astype(np.uint64)
        else:
            key = (packed[:, 0].astype(np.uint64) << np.uint64(32)) | \
                packed[:, 1].astype(np.uint64)
        return _unique_by_key_native(packed, key, want_inverse)
    if w == 1:
        order = _stable_argsort_u64(packed[:, 0].astype(np.uint64))
    elif w == 2:
        key = (packed[:, 0].astype(np.uint64) << np.uint64(32)) | \
            packed[:, 1].astype(np.uint64)
        order = _stable_argsort_u64(key)
    elif w <= 4 and _argsort_u64 is not None:
        # 3-4 lanes (word length 33-64): LSD two-pass over u64 halves
        # through the native radix sort — sort by the low half, then
        # stable-sort that order by the high half.
        def _half(lo_lane: int) -> np.ndarray:
            k = packed[:, lo_lane].astype(np.uint64) << np.uint64(32)
            if lo_lane + 1 < w:
                k |= packed[:, lo_lane + 1].astype(np.uint64)
            return k
        order = _stable_argsort_u64(_half(2))
        order = order[_stable_argsort_u64(_half(0)[order])]
    else:
        # Least-significant key last in np.lexsort's tuple.
        order = np.lexsort(tuple(packed[:, w - 1 - i] for i in range(w)))
    s = packed[order]
    new_group = np.empty(n, dtype=bool)
    new_group[0] = True
    new_group[1:] = (s[1:] != s[:-1]).any(axis=1)
    group_start = np.flatnonzero(new_group)
    uniq = s[group_start]
    counts = np.diff(np.append(group_start, n)).astype(np.int64)
    # lexsort is stable -> within a group original indices ascend, so the
    # group's first sorted element is the first occurrence in input order.
    first_occ = order[group_start].astype(np.int64)
    if want_inverse:
        gid = np.cumsum(new_group) - 1
        inverse = np.empty(n, dtype=np.int64)
        inverse[order] = gid
    else:
        inverse = None
    return uniq, counts, first_occ, inverse

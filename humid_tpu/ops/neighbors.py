"""Neighbour-pair search driver.

Tiles the U x U fingerprint distance problem into device blocks
(:mod:`humid_tpu.ops.hamming`, :mod:`humid_tpu.ops.edit`), handles pair
buffer capacity adaptively, and assembles the CSR adjacency the clustering
stage consumes.

CSR ordering invariant: every node's neighbour list is sorted ascending by
unique-word index.  This equals the reference's neighbour-list order — the
lexicographic outer walk (humid.cc:117) appends all lexicographically
smaller neighbours (discovered earlier) in ascending order, then all larger
neighbours (yielded by the in-order asymmetric trie search) in ascending
order (humid.cc:118-124).
"""

from __future__ import annotations

import numpy as np

from .hamming import hamming_block_xor
from .edit import edit_block


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def find_neighbor_pairs(
    packed: np.ndarray,
    max_dist: int,
    *,
    metric: str = "hamming",
    word_length: int | None = None,
    row_block: int = 4096,
    col_block: int = 32768,
    cap_per_block: int = 1 << 17,
) -> tuple[np.ndarray, np.ndarray]:
    """All unordered pairs (a, b), a < b, of unique words within
    ``max_dist``.

    Args:
      packed: [U, W] uint32 unique fingerprints in ascending order.
      max_dist: distance threshold (-m flag).
      metric: "hamming" (default) or "edit" (-e flag, Levenshtein).

    Returns:
      (a, b): int64 arrays with a < b, sorted by (a, b).
    """
    u, w = packed.shape
    if u <= 1:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)

    rb = min(_round_up(u, 8), row_block)
    cb = min(_round_up(u, 128), col_block)
    # Pad to full blocks with all-ones sentinel rows; sentinels sit at
    # global index >= u and are filtered out after extraction.  A sentinel
    # can never alias a real word because indices, not values, are compared.
    u_pad = _round_up(u, rb)
    u_pad = max(u_pad, _round_up(u, cb))
    pad = np.full((u_pad - u, w), 0xFFFFFFFF, dtype=np.uint32)
    data = np.concatenate([packed, pad], axis=0) if u_pad > u else packed

    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    for r0 in range(0, u, rb):
        rows = data[r0:r0 + rb]
        # Column blocks start at the row block: only col > row pairs needed.
        for c0 in range(r0, u, cb):
            cols = data[c0:c0 + cb]
            cap = cap_per_block
            while True:
                ra, ca, cnt = _run_block(
                    metric, rows, cols, r0, c0, max_dist, cap, word_length
                )
                cnt = int(cnt)
                if cnt <= cap:
                    break
                cap = _round_up(cnt, 1024)
            if cnt:
                ra = np.asarray(ra[:cnt])
                ca = np.asarray(ca[:cnt])
                keep = (ra < u) & (ca < u) & (ra >= 0)
                out_a.append(ra[keep].astype(np.int64))
                out_b.append(ca[keep].astype(np.int64))

    if not out_a:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    a = np.concatenate(out_a)
    b = np.concatenate(out_b)
    order = np.lexsort((b, a))
    return a[order], b[order]


def _run_block(metric, rows, cols, r0, c0, max_dist, cap, word_length):
    if metric == "hamming":
        return hamming_block_xor(
            rows, cols, np.int32(r0), np.int32(c0), np.int32(max_dist), cap
        )
    elif metric == "edit":
        if word_length is None:
            raise ValueError("edit metric requires word_length")
        return edit_block(
            rows, cols, np.int32(r0), np.int32(c0), np.int32(max_dist),
            cap, word_length
        )
    raise ValueError(f"unknown metric {metric!r}")


def pairs_to_csr(
    a: np.ndarray, b: np.ndarray, num_nodes: int
) -> tuple[np.ndarray, np.ndarray]:
    """Symmetrize pair list into CSR with ascending neighbour lists.

    Returns (indptr [U+1], indices [2E]) int64.
    """
    src = np.concatenate([a, b])
    dst = np.concatenate([b, a])
    order = np.lexsort((dst, src))
    src = src[order]
    dst = dst[order]
    indptr = np.zeros(num_nodes + 1, dtype=np.int64)
    np.add.at(indptr, src + 1, 1)
    np.cumsum(indptr, out=indptr)
    return indptr, dst

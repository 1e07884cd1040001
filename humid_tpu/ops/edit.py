"""Banded Levenshtein distance blocks (the ``-e`` flag).

Replaces ``trie.asymmetricLevenshtein`` (humid.cc:140-158).  All words have
the same static length L, so edit distance uses an Ukkonen band of width
2*max_dist+1 around the main diagonal: any cell outside the band already
exceeds the threshold.  The DP runs vectorized over an [R, C] pair tile
with the L-step outer loop unrolled at trace time (static shapes, fused
elementwise ops — XLA/VPU friendly; no data-dependent control flow).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _unpack(packed: jnp.ndarray, word_length: int) -> jnp.ndarray:
    """[N, W] uint32 -> [N, L] int32 2-bit codes."""
    n, w = packed.shape
    shifts = (2 * (15 - jnp.arange(16, dtype=jnp.uint32)))[None, None, :]
    codes = (packed[:, :, None] >> shifts) & jnp.uint32(3)
    return codes.reshape(n, w * 16)[:, :word_length].astype(jnp.int32)


def _banded_levenshtein(a_codes, b_codes, max_dist: int, word_length: int):
    """[R, L] x [C, L] -> [R, C] int32 edit distance, clamped at
    max_dist + 1.

    Ukkonen band of width 2m+1 around the diagonal; the row loop is a
    ``lax.scan`` (the fully unrolled trace compiled for minutes at
    L=24), with only the k-within-band dependency chain (<= 2m+1 steps)
    unrolled.
    """
    r = a_codes.shape[0]
    c = b_codes.shape[0]
    L = word_length
    m = max_dist
    band = 2 * m + 1
    inf = jnp.int32(m + 1)

    # Row 0: D[0][j] = j for j in [0, m]; band coord k = j + m.
    init = jnp.stack(
        [jnp.full((r, c), k - m if 0 <= k - m <= m else m + 1,
                  dtype=jnp.int32)
         for k in range(band)]
    )                                           # [band, R, C]

    # bpad[:, i + k] == b_codes[:, j-1] for j = i+k-m (valid range only).
    bpad = jnp.pad(b_codes, ((0, 0), (m + 1, m)),
                   constant_values=-1)          # [C, L + band]

    def row_step(prev, xs):
        ai, bwin, i = xs                        # [R], [C, band], scalar
        aii = ai[:, None]                       # [R, 1]

        cur = []
        for k in range(band):
            j = i + k - m
            bj = bwin[None, :, k]               # [1, C]
            sub = (aii != bj).astype(jnp.int32)
            best = prev[k] + sub                # diagonal: D[i-1][j-1]
            if k + 1 < band:
                best = jnp.minimum(best, prev[k + 1] + 1)  # up: D[i-1][j]
            if k - 1 >= 0:
                best = jnp.minimum(best, cur[k - 1] + 1)   # left: D[i][j-1]
            best = jnp.minimum(best, inf)
            # Out-of-range j: +inf.  j == 0 boundary: D[i][0] = i.
            best = jnp.where((j < 1) | (j > L), inf, best)
            best = jnp.where(j == 0, jnp.minimum(i, inf), best)
            cur.append(best)
        return jnp.stack(cur), None

    a_rows = a_codes.T                          # [L, R]
    iidx = jnp.arange(1, L + 1, dtype=jnp.int32)
    # Window for row i covers bpad columns [i, i + band).
    bwins = jnp.stack(
        [jax.lax.dynamic_slice_in_dim(bpad, i, band, axis=1)
         for i in range(1, L + 1)]
    )                                           # [L, C, band]
    final, _ = jax.lax.scan(row_step, init, (a_rows, bwins, iidx))
    return final[m]  # D[L][L]


def _banded_levenshtein_pairs(a_codes, b_codes, max_dist: int,
                              word_length: int):
    """[N, L] x [N, L] -> [N] int32 edit distance, clamped at
    max_dist + 1 — the pairwise (diagonal) variant of
    :func:`_banded_levenshtein`, vectorized over candidate pairs
    instead of a block cross product."""
    n = a_codes.shape[0]
    L = word_length
    m = max_dist
    band = 2 * m + 1
    inf = jnp.int32(m + 1)

    init = jnp.stack(
        [jnp.full((n,), k - m if 0 <= k - m <= m else m + 1,
                  dtype=jnp.int32)
         for k in range(band)]
    )                                           # [band, N]
    bpad = jnp.pad(b_codes, ((0, 0), (m + 1, m)),
                   constant_values=-1)          # [N, L + band]

    def row_step(prev, xs):
        ai, bwin, i = xs                        # [N], [N, band], scalar
        cur = []
        for k in range(band):
            j = i + k - m
            bj = bwin[:, k]                     # [N]
            sub = (ai != bj).astype(jnp.int32)
            best = prev[k] + sub                # diagonal: D[i-1][j-1]
            if k + 1 < band:
                best = jnp.minimum(best, prev[k + 1] + 1)  # up
            if k - 1 >= 0:
                best = jnp.minimum(best, cur[k - 1] + 1)   # left
            best = jnp.minimum(best, inf)
            best = jnp.where((j < 1) | (j > L), inf, best)
            best = jnp.where(j == 0, jnp.minimum(i, inf), best)
            cur.append(best)
        return jnp.stack(cur), None

    a_rows = a_codes.T                          # [L, R]
    iidx = jnp.arange(1, L + 1, dtype=jnp.int32)
    # Window for row i covers bpad columns [i, i + band).
    bwins = jnp.stack(
        [jax.lax.dynamic_slice_in_dim(bpad, i, band, axis=1)
         for i in range(1, L + 1)]
    )                                           # [L, C, band]
    final, _ = jax.lax.scan(row_step, init, (a_rows, bwins, iidx))
    return final[m]


@functools.partial(jax.jit,
                   static_argnames=("word_length", "max_dist_static"))
def _edit_pairs_impl(packed_a, packed_b, word_length: int,
                     max_dist_static: int):
    dist = _banded_levenshtein_pairs(
        _unpack(packed_a, word_length), _unpack(packed_b, word_length),
        max_dist_static, word_length)
    return dist <= jnp.int32(max_dist_static)


def edit_pairs_verify(packed, a, b, max_dist, word_length,
                      batch: int = 1 << 20):
    """Device-side banded Levenshtein verification of candidate pairs:
    keep (a[i], b[i]) iff edit distance <= max_dist.  Order-preserving,
    same contract as the native host filter
    (csrc/hostops.cpp::edit_filter_pairs); batches are padded to powers
    of two so the jitted program is reused across candidate counts.
    The pair rows are gathered on the host per batch — only [batch, W]
    lanes ship to the device, never the whole unique table's unpacked
    codes (which would be ~GBs at WGS scale)."""
    n = len(a)
    if n == 0:
        return a, b
    keep = np.empty(n, bool)
    lo = 0
    while lo < n:
        hi = min(n, lo + batch)
        k = hi - lo
        kp = 1 << max(k - 1, 0).bit_length()
        pa = np.zeros((kp, packed.shape[1]), packed.dtype)
        pb = np.zeros((kp, packed.shape[1]), packed.dtype)
        pa[:k] = packed[a[lo:hi]]
        pb[:k] = packed[b[lo:hi]]
        mask = _edit_pairs_impl(jnp.asarray(pa), jnp.asarray(pb),
                                word_length, int(max_dist))
        keep[lo:hi] = np.asarray(mask)[:k]
        lo = hi
    return a[keep], b[keep]


@functools.partial(jax.jit, static_argnames=("cap", "word_length", "max_dist_static"))
def _edit_block_impl(rows, cols, row_off, col_off, cap: int,
                     word_length: int, max_dist_static: int):
    a = _unpack(rows, word_length)
    b = _unpack(cols, word_length)
    dist = _banded_levenshtein(a, b, max_dist_static, word_length)
    r = rows.shape[0]
    c = cols.shape[0]
    gr = row_off + jax.lax.broadcasted_iota(jnp.int32, (r, c), 0)
    gc = col_off + jax.lax.broadcasted_iota(jnp.int32, (r, c), 1)
    mask = (dist <= max_dist_static) & (gc > gr)
    count = mask.sum(dtype=jnp.int32)
    ri, ci = jnp.nonzero(mask, size=cap, fill_value=-1)
    r_idx = jnp.where(ri >= 0, ri + row_off, -1).astype(jnp.int32)
    c_idx = jnp.where(ci >= 0, ci + col_off, -1).astype(jnp.int32)
    return r_idx, c_idx, count


def edit_block(rows, cols, row_off, col_off, max_dist, cap: int,
               word_length: int):
    """Levenshtein analogue of hamming_block_xor; max_dist must be a host
    int (band width is a static shape parameter).  Test oracle for the
    dense edit scan and the shifted-segment path — the pipeline drives
    find_neighbor_pairs(metric="edit")."""
    return _edit_block_impl(
        rows, cols, row_off, col_off, cap, word_length, int(max_dist)
    )

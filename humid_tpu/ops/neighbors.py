"""Neighbour-pair search driver.

Replaces the reference's per-word fuzzy trie traversal
(``findHammingNeighbours``/``findEditNeighbours``, humid.cc:113-158) with
ONE fused device program: a ``lax.scan`` over the upper-triangular grid of
B x B fingerprint tiles that, per tile, computes the XOR+popcount (or
banded-Levenshtein) distance matrix, masks hits, and compacts the matching
(row, col) pairs into a single global device buffer with a running offset.
All shapes are static (one XLA compile regardless of input size), padding
rows are masked by index bound inside the kernel, and the pair buffer is
transferred to the host exactly once — the design that keeps both HBM
traffic and host<->device round-trips minimal.

Capacity overflow (per-tile or total) is detected from the returned
counts and retried with a larger static capacity (new compile, rare).

CSR ordering invariant: every node's neighbour list is sorted ascending by
unique-word index.  This equals the reference's neighbour-list order — the
lexicographic outer walk (humid.cc:117) appends all lexicographically
smaller neighbours (discovered earlier) in ascending order, then all larger
neighbours (yielded by the in-order asymmetric trie search) in ascending
order (humid.cc:118-124).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .hamming import MASK_LO
from .edit import _banded_levenshtein, _unpack


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _tile_distance(rows, cols, metric: str, max_dist_static: int,
                   word_length: int | None):
    """[B, Wa] x [B, Wb] -> [B, B] int32 distances (clamped for edit)."""
    if metric == "hamming":
        z = rows[:, None, :] ^ cols[None, :, :]
        m = (z | (z >> 1)) & MASK_LO
        return jax.lax.population_count(m).sum(axis=-1).astype(jnp.int32)
    elif metric == "hamming_mxu":
        # rows/cols are one-hot bf16 [B, 4*L]; #matching bases of a pair is
        # <onehot(a), onehot(b)>, so dist = L - matches.  One MXU matmul
        # per tile — the speed-of-light path on TPU (exact: counts <= 256
        # are representable in bf16/f32).
        matches = jnp.dot(rows, cols.T, preferred_element_type=jnp.float32)
        return (word_length - matches).astype(jnp.int32)
    elif metric == "edit":
        return _banded_levenshtein(rows, cols, max_dist_static, word_length)
    raise ValueError(f"unknown metric {metric!r}")


def onehot_bases(packed, word_length: int):
    """[N, W] uint32 packed fingerprints -> [N, 4*L] one-hot bf16."""
    codes = _unpack(packed, word_length)  # [N, L] int32
    onehot = (codes[:, :, None] ==
              jnp.arange(4, dtype=jnp.int32)[None, None, :])
    return onehot.reshape(codes.shape[0], 4 * word_length).astype(
        jnp.bfloat16)


def scan_tile_pairs(
    row_data,
    col_data,
    pairs_ij,
    u_rows,
    u_cols,
    max_dist,
    upper_only,
    enabled,
    row_base,
    col_base,
    state,
    *,
    tile: int,
    cap_row: int,
    metric: str = "hamming",
    max_dist_static: int = 0,
    word_length: int | None = None,
):
    """Scan over tile pairs, compacting matches into ``state``.

    Match extraction is per-row ``lax.top_k`` over masked column indices —
    on TPU this is ~50x faster than ``jnp.nonzero`` (which lowers to a
    whole-tile sort) and turns the tile pipeline into pure
    MXU-matmul + VPU work.  Each row of a tile may contribute at most
    ``cap_row`` matches; the per-tile row maximum is returned so the
    driver can detect truncation and retry with a larger ``cap_row``.

    Args:
      row_data / col_data: [Tr*tile, D] / [Tc*tile, D] padded fingerprint
        representations (packed uint32 lanes, one-hot bf16, or unpacked
        codes, depending on ``metric``).
      pairs_ij: [nb, 2] int32 tile indices (i into rows, j into cols).
      u_rows / u_cols: valid LOCAL row/col counts (padding masked beyond).
      max_dist: distance threshold (traced).
      upper_only: traced bool — keep only global_col > global_row.
      enabled: traced bool — if False, emit nothing (still scans).
      row_base / col_base: traced GLOBAL index offsets of row 0 / col 0.
      state: (out_a [cap_total], out_b [cap_total], offset) carry; writes
        beyond cap_total are dropped (detected via the total offset).
      tile / cap_row: static tile size and per-row match capacity.

    Returns (state', counts [nb, 2]) with counts[:, 0] the per-tile pair
    count and counts[:, 1] the per-tile max matches-per-row.  Emitted
    global pairs are normalized to (min, max).
    """
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
    iota_rk = jax.lax.broadcasted_iota(jnp.int32, (tile, cap_row), 0)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (tile, cap_row), 1)
    w = row_data.shape[1]
    cap_total = state[0].shape[0]

    def body(carry, ij):
        out_a, out_b, off = carry
        i, j = ij[0], ij[1]
        rows = jax.lax.dynamic_slice(row_data, (i * tile, 0), (tile, w))
        cols = jax.lax.dynamic_slice(col_data, (j * tile, 0), (tile, w))
        dist = _tile_distance(rows, cols, metric, max_dist_static,
                              word_length)
        lr = i * tile + iota_r           # local row index
        lc = j * tile + iota_c           # local col index
        gr = row_base + lr
        gc = col_base + lc
        mask = (dist <= max_dist) & (lr < u_rows) & (lc < u_cols)
        mask &= jnp.where(upper_only, gc > gr, gr != gc)
        mask &= enabled
        rowcnt = mask.sum(axis=1, dtype=jnp.int32)       # [tile]
        rowmax = rowcnt.max()
        n = rowcnt.sum()
        # All matching columns of a row == its top-cap_row masked indices.
        vals = jnp.where(mask, lc, -1)
        topv, _ = jax.lax.top_k(vals, cap_row)           # [tile, cap_row]
        valid = (iota_k < rowcnt[:, None]) & (topv >= 0)
        roff = off + jnp.cumsum(rowcnt) - rowcnt
        tgt = jnp.where(valid, roff[:, None] + iota_k, cap_total)
        ga = row_base + i * tile + iota_rk
        gb = col_base + topv                             # already j*tile+lc
        pa = jnp.minimum(ga, gb).astype(jnp.int32)
        pb = jnp.maximum(ga, gb).astype(jnp.int32)
        out_a = out_a.at[tgt.ravel()].set(pa.ravel(), mode="drop")
        out_b = out_b.at[tgt.ravel()].set(pb.ravel(), mode="drop")
        return (out_a, out_b, off + n), jnp.stack([n, rowmax])

    return jax.lax.scan(body, state, pairs_ij)


@functools.partial(jax.jit, static_argnames=(
    "tile", "cap_row", "cap_total", "metric", "max_dist_static",
    "word_length"))
def _all_pairs(
    data, pairs_ij, u, max_dist, *,
    tile: int, cap_row: int, cap_total: int,
    metric: str, max_dist_static: int, word_length: int | None,
):
    out_a = jnp.full((cap_total,), -1, jnp.int32)
    out_b = jnp.full((cap_total,), -1, jnp.int32)
    state = (out_a, out_b, jnp.int32(0))
    t = jnp.bool_(True)
    (out_a, out_b, total), counts = scan_tile_pairs(
        data, data, pairs_ij, u, u, max_dist,
        upper_only=t, enabled=t,
        row_base=jnp.int32(0), col_base=jnp.int32(0),
        state=state,
        tile=tile, cap_row=cap_row, metric=metric,
        max_dist_static=max_dist_static, word_length=word_length,
    )
    return out_a, out_b, total, counts


def find_neighbor_pairs(
    packed: np.ndarray,
    max_dist: int,
    *,
    metric: str = "hamming",
    word_length: int | None = None,
    tile: int = 2048,
    cap_row: int = 16,
    cap_total: int | None = None,
    impl: str | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """All unordered pairs (a, b), a < b, of unique words within
    ``max_dist``.

    Args:
      packed: [U, W] uint32 unique fingerprints in ascending order.
      max_dist: distance threshold (-m flag).
      metric: "hamming" (default) or "edit" (-e flag, Levenshtein).
      impl: Hamming tile backend — "mxu" (one-hot bf16 matmul; default on
        TPU) or "xor" (VPU bitops; default elsewhere).

    Returns:
      (a, b): int64 arrays with a < b, sorted by (a, b).
    """
    u, w = packed.shape
    if u <= 1:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)

    if metric == "edit":
        if word_length is None:
            raise ValueError("edit metric requires word_length")
        tile = min(tile, 512)
    elif metric == "hamming":
        if impl is None:
            impl = "mxu" if jax.default_backend() == "tpu" else "xor"
        if impl == "mxu":
            if word_length is None:
                raise ValueError("mxu impl requires word_length")
            metric = "hamming_mxu"
    data_host: np.ndarray = packed

    b = min(tile, _round_up(u, 256))
    u_pad = _round_up(u, b)
    if u_pad > u:
        pad = np.zeros((u_pad - u, w), dtype=packed.dtype)
        data_host = np.concatenate([data_host, pad], axis=0)
    t = u_pad // b
    ii, jj = np.triu_indices(t)
    pairs_ij = np.stack([ii, jj], axis=1).astype(np.int32)

    data = jnp.asarray(data_host)
    if metric == "edit":
        data = _unpack(data, word_length)
    elif metric == "hamming_mxu":
        data = onehot_bases(data, word_length)

    if cap_total is None:
        cap_total = max(1 << 20, 4 * u)
    cap_row = min(cap_row, b)
    while True:
        out_a, out_b, total, counts = _all_pairs(
            data, jnp.asarray(pairs_ij), jnp.int32(u), jnp.int32(max_dist),
            tile=b, cap_row=cap_row, cap_total=cap_total,
            metric=metric, max_dist_static=int(max_dist),
            word_length=word_length,
        )
        counts_h = np.asarray(counts)
        total_h = int(total)
        row_max = int(counts_h[:, 1].max(initial=0))
        if row_max > cap_row:
            cap_row = min(1 << (row_max - 1).bit_length(), b)
            continue
        if total_h > cap_total:
            cap_total = _round_up(total_h + 1024, 1 << 16)
            continue
        break

    a = np.asarray(out_a)[:total_h].astype(np.int64)
    bb = np.asarray(out_b)[:total_h].astype(np.int64)
    order = np.lexsort((bb, a))
    return a[order], bb[order]


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

"""Multi-chip neighbour search: ring-rotated block compare under shard_map.

Replaces the reference's sequential per-word trie queries
(``findHammingNeighbours``, humid.cc:113-130) at scale: unique-word
fingerprint blocks are sharded over the ``'data'`` mesh axis; each step of
a ``lax.ppermute`` ring rotation gives every chip a partner shard's block,
against which it runs the same fused tile-scan pair compaction as the
single-chip path (humid_tpu.ops.neighbors.scan_tile_pairs) — XOR+popcount
distance tiles on the VPU, matches compacted into one per-shard device
buffer.

Round-robin coverage: with D shards, steps s = 0..D//2 cover every
unordered block pair exactly once —

* s = 0: local block vs itself, upper triangle only;
* 0 < s < D/2 (and s <= (D-1)/2 for odd D): block pair {me, me+s mod D},
  seen by exactly one of its two shards at s <= D/2;
* s = D/2 (even D): both endpoints see the pair, so only shards with
  index < D/2 emit.

All pairs are emitted as (min, max) global indices, reproducing the
"each unordered pair once" contract of the asymmetric trie search
(humid.cc:118-124).  Pair buffers are fixed-capacity (static shapes for
XLA); true match counts are returned so the driver can detect overflow
and retry with a larger capacity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.neighbors import scan_tile_pairs, _round_up
from .mesh import DATA_AXIS, data_mesh, pad_to_shards


def _ring_pairs_local(local, u, max_dist, *, tile: int, cap_row: int,
                      cap_total: int, n_shards: int):
    """shard_map body: local [B, W] shard block -> compacted pair buffer.

    Returns (out_a [cap_total], out_b [cap_total], total [1],
    counts [S*nb, 2]) with pairs as (min, max) global indices, -1 padded.
    """
    d = n_shards
    bsh = local.shape[0]
    me = jax.lax.axis_index(DATA_AXIS)
    steps = d // 2 + 1
    t = bsh // tile
    ii, jj = np.meshgrid(np.arange(t), np.arange(t), indexing="ij")
    pairs_ij = jnp.asarray(np.stack(
        [ii.ravel(), jj.ravel(), np.ones(t * t)], axis=1
    ).astype(np.int32))
    perm = [(i, (i - 1) % d) for i in range(d)]

    out_a = jnp.full((cap_total,), -1, jnp.int32)
    out_b = jnp.full((cap_total,), -1, jnp.int32)
    state0 = (out_a, out_b, jnp.int32(0))

    def step(carry, s):
        rot, state = carry
        q = (me + s) % d
        u_rows = jnp.clip(u - me * bsh, 0, bsh)
        u_cols = jnp.clip(u - q * bsh, 0, bsh)
        upper_only = s == 0
        if d % 2 == 0:
            enabled = jnp.where(s == d // 2, me < d // 2, True)
        else:
            enabled = jnp.bool_(True)
        state, counts = scan_tile_pairs(
            local, rot, pairs_ij, u_rows, u_cols, max_dist,
            upper_only=upper_only, enabled=enabled,
            row_base=me * bsh, col_base=q * bsh,
            state=state, tile=tile, cap_row=cap_row,
        )
        nxt = jax.lax.ppermute(rot, DATA_AXIS, perm) if d > 1 else rot
        return (nxt, state), counts

    (_, (out_a, out_b, total)), counts = jax.lax.scan(
        step, (local, state0), jnp.arange(steps, dtype=jnp.int32)
    )
    return out_a, out_b, total[None], counts.reshape(-1, 2)


@functools.partial(jax.jit, static_argnames=(
    "tile", "cap_row", "cap_total", "n_shards", "mesh"))
def _ring_pairs(packed, u, max_dist, *, tile: int, cap_row: int,
                cap_total: int, n_shards: int, mesh):
    fn = shard_map(
        functools.partial(
            _ring_pairs_local, tile=tile, cap_row=cap_row,
            cap_total=cap_total, n_shards=n_shards,
        ),
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(), P()),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                   P(DATA_AXIS)),
        check_vma=False,
    )
    return fn(packed, u, max_dist)


def sharded_neighbor_pairs(
    packed: np.ndarray,
    max_dist: int,
    *,
    mesh=None,
    tile: int = 2048,
    cap_row: int = 16,
    cap_total: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """All unordered fingerprint pairs within ``max_dist``, computed on the
    device mesh.  Returns (a, b) int64, a < b, sorted by (a, b) — the same
    contract as :func:`humid_tpu.ops.neighbors.find_neighbor_pairs`.
    """
    mesh = mesh or data_mesh()
    d = mesh.devices.size
    u, w = packed.shape
    if u <= 1:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    tile = min(tile, _round_up(-(-u // d), 256))
    cap_row = min(cap_row, tile)
    data = pad_to_shards(packed, d, multiple=tile, fill=0)
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    dev = jax.device_put(data, sharding)
    if cap_total is None:
        cap_total = max(1 << 18, 8 * (u // d + 1))
    while True:
        out_a, out_b, totals, counts = _ring_pairs(
            dev, jnp.int32(u), jnp.int32(max_dist),
            tile=tile, cap_row=cap_row, cap_total=cap_total,
            n_shards=d, mesh=mesh,
        )
        counts_h = np.asarray(counts)
        totals_h = np.asarray(totals)
        row_max = int(counts_h[:, 1].max(initial=0))
        if row_max > cap_row:
            cap_row = min(1 << (row_max - 1).bit_length(), tile)
            continue
        if int(totals_h.max(initial=0)) > cap_total:
            cap_total = _round_up(int(totals_h.max()) + 1024, 1 << 14)
            continue
        break
    a = np.asarray(out_a)
    b = np.asarray(out_b)
    keep = a >= 0
    a = a[keep].astype(np.int64)
    b = b[keep].astype(np.int64)
    order = np.lexsort((b, a))
    return a[order], b[order]

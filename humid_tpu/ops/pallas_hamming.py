"""Pallas TPU kernel: fused Hamming-match sweep over tile pairs.

The XLA path (humid_tpu.ops.neighbors, ``lax.scan`` over tile pairs)
materializes each [tile, tile] distance matrix in HBM between the MXU
matmul and the masking/extraction consumers, and serializes tile pairs in
a While loop.  This kernel walks the tile-pair LIST as its grid and runs
the whole per-tile pipeline in VMEM:

  manual async DMA of the paired PACKED row/col blocks from HBM
  (tile indices come from the pair list in SMEM — scalar-prefetch grids
  hang this backend's AOT compiler; manual DMA with dynamic slices
  compiles fine)
  -> in-kernel 2-bit -> one-hot bf16 expansion (packed words in HBM are
     64x smaller than one-hot; phantom matches from zero-padded lane
     bits are a constant, so dist = 16*W - matches stays exact)
  -> one-hot matmul on the MXU, bm rows at a time
  -> distance threshold + index masks on the VPU
  -> per-row match counts
  -> per-row top-``cap_row`` matching column extraction via iterative
     masked argmax (columns are unique per row, so equality masking
     removes exactly the taken column)

Only counts and column indices return to HBM.  Everything
data-dependent (row counts, partition stride) rides in SMEM scalars, so
compiled programs depend only on (quantized row count, lanes, tile, bm,
cap_row, cap_total) and are reused across datasets.

Scalar operands:
  pairs [nb, 3] int32 — (tile_i, tile_j, on); disabled rows emit nothing.
  glob  [1, 8] int32 — part_stride, part_valid, max_dist; slots 3-7 are
    RESERVED/IGNORED (the kernel hardcodes upper-triangle semantics with
    zero row/col bases — its only production caller's configuration;
    legacy callers passing upper_only=0 or nonzero bases would silently
    get upper-triangle behavior, so there are none — use the XLA tile
    path for general pair scans).
    Rows r with (r % part_stride) >= part_valid are padding and never
    match (the fused pigeonhole driver stacks several permuted copies of
    the data; each partition occupies part_stride rows of which the
    first part_valid are real).  Padding exclusion rides the one-hot
    build: padding words get all-zero features, so their matches are 0
    and dist = 16*w stays above the threshold.  PRECONDITIONS:
    part_stride % tile == 0 (partitions are padded to whole tiles, so
    validity is a per-128-word-block lane comparison), and
    max_dist < 16*w (enforced by the launcher).

Replaces the per-word fuzzy trie queries of ``findHammingNeighbours``
(humid.cc:113-130).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(groups_ref, pairs_ref, glob_ref, data_r_ref, data_c_ref,
            counts_ref, topv_ref, lanes_r_v, lanes_c_v, oht_r_ref,
            oht_c_ref, counts_v, topv_v, sems, *, bm: int, tile: int,
            cap_row: int, w: int, rows_per_lane: int):
    """Row-grouped sweep: one grid step per ROW tile, a dynamic inner
    loop over that row's column partners (the pair list is i-major, so
    `group_pairs` turns it into (ti, start, count) spans).  The row-side
    DMA and one-hot build are paid once per group instead of once per
    pair, and per-grid-step machinery amortizes over the whole group —
    the per-pair skeleton was ~17 us of a ~30 us/pair kernel.

    Outputs live in ANY (HBM) and are written per pair by manual DMA at
    the dynamic pair index from one VMEM staging slot; the copy's
    in-flight window overlaps the NEXT pair's column DMA + one-hot
    build, and is drained just before the staging slot is rewritten.

    topv is stored TRANSPOSED, [nb, cap_row, tile]: a manual HBM DMA
    needs the minor dim 128-aligned (Mosaic rejects a [1, tile, 16]
    slice), and tile is a multiple of 128 while cap_row is not.
    """
    g = pl.program_id(0)
    ti = groups_ref[g, 0]
    start = groups_ref[g, 1]
    cnt = groups_ref[g, 2]
    part_stride = glob_ref[0, 0]
    part_valid = glob_ref[0, 1]
    max_dist = glob_ref[0, 2]
    # glob slots 3-6 (upper_only, enabled, row/col base) are fixed at
    # (1, 1, 0, 0) by the only production caller (pallas_all_pairs);
    # hardcoding upper-triangle semantics removes 4 dynamic boolean
    # passes over every [bm, tile] block (~20% of the kernel, v5e).

    sub = tile // 128  # 128-word groups per tile

    def out_copies(idx):
        """Descriptors for the staging-slot -> HBM copies of pair
        ``idx`` (wait() only needs matching shapes, so a descriptor
        rebuilt at a different idx drains an earlier same-shape copy)."""
        return (
            pltpu.make_async_copy(
                counts_v, counts_ref.at[pl.ds(idx, 1)], sems.at[2 * w]),
            pltpu.make_async_copy(
                topv_v, topv_ref.at[pl.ds(idx, 1)], sems.at[2 * w + 1]),
        )

    @pl.when(cnt > 0)
    def _group():
        # Lane-major layout: data[l*rows_per_lane + r, c] = lane l of
        # word r*128 + c.  One DMA per lane; every slice is [sub, 128].
        rcopies = []
        for l in range(w):
            cr = pltpu.make_async_copy(
                data_r_ref.at[pl.ds(l * rows_per_lane + ti * sub, sub),
                              :],
                lanes_r_v.at[l * sub:(l + 1) * sub, :], sems.at[2 * l],
            )
            cr.start()
            rcopies.append(cr)
        for c in rcopies:
            c.wait()

        # Build TRANSPOSED one-hots oht[feature, word] in VMEM: feature
        # e = l*64 + pos*4 + sym; columns grouped in `sub` blocks of 128
        # words.  All slices are static multiples of (8, 128).
        #
        # Partition-padding words (global id % part_stride >= part_valid)
        # get an ALL-ZERO one-hot: their matches come out 0, so dist =
        # n_bases > max_dist and they can never pass the threshold —
        # folding the row/col validity masks into the matmul operands
        # once per tile instead of two [bm, tile] compare+ands per block
        # per pair in the hot loop (~6 us/pair of mask work measured on
        # v5e).  Requires max_dist < 16*w, asserted by the caller.
        shift = 2 * (15 - (jax.lax.broadcasted_iota(
            jnp.int32, (64, 128), 0) // 4))
        sym = jax.lax.broadcasted_iota(jnp.int32, (64, 128), 0) % 4
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (64, 128), 1)
        row_off0 = (ti * tile) % part_stride            # scalar (SMEM)
        for l in range(w):
            for r in range(sub):
                vr = lanes_r_v[l * sub + r:l * sub + r + 1, :].astype(
                    jnp.int32)
                br = jnp.broadcast_to(vr, (64, 128))
                vok = lane_iota < part_valid - row_off0 - r * 128
                oht_r_ref[l * 64:(l + 1) * 64,
                          r * 128:(r + 1) * 128] = (
                    ((jax.lax.shift_right_logical(br, shift) & 3) == sym)
                    & vok
                ).astype(jnp.bfloat16)

        iota_c = jax.lax.broadcasted_iota(jnp.int32, (bm, tile), 1)
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (bm, tile), 0)
        n_bases = 16 * w  # includes constant phantom matches beyond L

        # The remaining index mask reduces to scalar comparisons against
        # a hoisted iota: the upper/diagonal predicates on global ids
        # become comparisons of (iota_c - iota_r) against a per-block
        # scalar (part_stride % tile == 0 by construction — partitions
        # are padded to whole tiles and tile pairs never straddle
        # partitions).  Per-element integer mods here measured ~21
        # us/pair of a 48 us/pair kernel (v5e bisect); the row/col
        # validity masks ride the one-hot build above.
        diff_cr = iota_c - iota_r

        def pair_body(pi, _):
            idx = start + pi
            tj = pairs_ref[idx, 1]
            on = pairs_ref[idx, 2]
            ccopies = []
            for l in range(w):
                cc = pltpu.make_async_copy(
                    data_c_ref.at[
                        pl.ds(l * rows_per_lane + tj * sub, sub), :],
                    lanes_c_v.at[l * sub:(l + 1) * sub, :],
                    sems.at[2 * l + 1],
                )
                cc.start()
                ccopies.append(cc)
            for c in ccopies:
                c.wait()
            col_off0 = (tj * tile) % part_stride
            for l in range(w):
                for r in range(sub):
                    vc = lanes_c_v[
                        l * sub + r:l * sub + r + 1, :].astype(jnp.int32)
                    bc = jnp.broadcast_to(vc, (64, 128))
                    vok = lane_iota < part_valid - col_off0 - r * 128
                    oht_c_ref[l * 64:(l + 1) * 64,
                              r * 128:(r + 1) * 128] = (
                        ((jax.lax.shift_right_logical(bc, shift) & 3)
                         == sym) & vok
                    ).astype(jnp.bfloat16)

            cols_oht = oht_c_ref[...]                   # [64w, tile]
            base_delta = (tj - ti) * tile
            gate = on > 0
            # f32 threshold on raw matches: dist <= max_dist  <=>
            # matches >= n_bases - max_dist (exact: small ints in f32).
            thresh = (n_bases - max_dist).astype(jnp.float32)

            # Drain the previous pair's output copies before rewriting
            # the staging slot (their flight overlapped the col DMA +
            # one-hot build above).
            @pl.when(pi > 0)
            def _drain():
                for c in out_copies(idx - 1):
                    c.wait()

            # fori_loops, not Python loops: an unrolled body (sub x
            # cap_row argmax steps) explodes the Mosaic IR and hangs
            # the AOT compiler.
            def block_body(b, _, with_diag):
                a = oht_r_ref[:, pl.ds(b * bm, bm)]     # [64w, bm]
                matches = jax.lax.dot_general(
                    a, cols_oht,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                       # [bm, tile]
                mask = matches >= thresh
                if with_diag:
                    # Upper triangle within the diagonal tile pair:
                    # gc > gr <=> diff_cr > nd.  Off-diagonal pairs
                    # (tj > ti) skip this pass entirely — there nd <
                    # -(bm-1) = min(diff_cr) makes it vacuously true,
                    # and the [bm, tile] compare+and cost ~1 us/pair
                    # on v5e for nothing.
                    nd = b * bm - base_delta
                    mask &= diff_cr > nd

                # Scalar gate applies to the [bm] counts, not the
                # [bm, tile] mask (the consumer ignores topv wherever
                # counts are 0, so gated pairs may write stale topv).
                # (An MXU ones-matmul row count was tried here and
                # measured SLOWER — 17.0 vs 12.9 us/pair on v5e: the
                # i1 -> bf16 select pass costs more than the cross-lane
                # reduction it replaces.)
                rowcnt = jnp.where(
                    gate, mask.sum(axis=1, dtype=jnp.int32), 0)
                counts_v[0, 0, pl.ds(b * bm, bm)] = rowcnt

                # Iterative masked argmax == top-k over unique column
                # indices (LOCAL within the tile, -1 when exhausted).
                # The k results accumulate in a register carry (a
                # dynamic lane-dim store is not provably 128-aligned)
                # and store once per block.  Blocks with no match skip
                # extraction — stale staging memory is masked by the
                # consumer via the row counts.
                @pl.when(rowcnt.max() > 0)
                def _extract():
                    iota_k = jax.lax.broadcasted_iota(
                        jnp.int32, (cap_row, bm), 0)

                    def k_body(k, carry):
                        vals, out = carry
                        best = vals.max(axis=1)          # [bm]
                        out = jnp.where(iota_k == k, best[None, :], out)
                        return (jnp.where(vals == best[:, None], -1,
                                          vals), out)

                    _, out = jax.lax.fori_loop(
                        0, cap_row, k_body,
                        (jnp.where(mask, iota_c, -1),
                         jnp.full((cap_row, bm), -1, jnp.int32)),
                    )
                    topv_v[0, :, pl.ds(b * bm, bm)] = out

                return 0

            @pl.when(tj == ti)
            def _diag():
                jax.lax.fori_loop(
                    0, tile // bm,
                    functools.partial(block_body, with_diag=True), 0)

            @pl.when(tj != ti)
            def _offdiag():
                jax.lax.fori_loop(
                    0, tile // bm,
                    functools.partial(block_body, with_diag=False), 0)
            for c in out_copies(idx):
                c.start()
            return 0

        jax.lax.fori_loop(0, cnt, pair_body, 0)
        # Drain the last pair's copies before the next grid step (which
        # reuses the staging slot).
        for c in out_copies(start + cnt - 1):
            c.wait()


def group_pairs(pairs_np: "np.ndarray") -> "np.ndarray":
    """[nb, 3] i-major tile-pair list -> [ng_pad, 3] int32 groups
    (ti, start, count): maximal spans of consecutive pairs sharing the
    row tile.  Works (just amortizes less) on unsorted lists.  Padded
    to a power of two with count-0 groups so grid lengths are bucketed
    into few distinct compiles."""
    import numpy as np

    if len(pairs_np) == 0:
        return np.zeros((1, 3), np.int32)  # one count-0 padding group
    ti = pairs_np[:, 0]
    cuts = np.flatnonzero(np.diff(ti) != 0) + 1
    starts = np.concatenate([np.zeros(1, np.int64), cuts])
    counts = np.diff(np.concatenate([starts, [len(ti)]]))
    g = np.stack([ti[starts], starts, counts], axis=1).astype(np.int32)
    ng = len(g)
    ng_pad = 1 << max(0, (ng - 1).bit_length())
    if ng_pad > ng:
        g = np.concatenate([g, np.zeros((ng_pad - ng, 3), np.int32)])
    return g


@functools.partial(
    jax.jit,
    static_argnames=("tile", "bm", "cap_row", "w", "interpret"))
def hamming_pairs_sweep(
    lanemaj, pairs, groups, glob, *,
    tile: int, bm: int = 512, cap_row: int = 16, w: int = 2,
    interpret: bool = False,
):
    """Sweep a tile-pair list: -> (counts [nb, tile], topv [nb, k, tile]).

    lanemaj: [w * N/128, 128] uint32 — lane-major packed fingerprints:
      row l*(N/128) + r, column c holds lane l of word r*128 + c.
    pairs:   [nb, 3] int32 (tile_i, tile_j, on).
    groups:  [ng, 3] int32 (tile_i, start, count) row-tile spans of the
      pair list (:func:`group_pairs`); count-0 rows are padding.
    glob:    [1, 8] int32 scalars (see module docstring).
    topv holds LOCAL column indices within the paired tile, -1 padded,
    TRANSPOSED (k-major) so the manual HBM DMA's minor dim is tile.
    """
    nb = pairs.shape[0]
    ng = groups.shape[0]
    rows_per_lane = lanemaj.shape[0] // w
    bm = min(bm, tile)  # small test tiles; v5e sweep: 512 > 256 > 128
    while tile % bm:    # tiles are multiples of 256, not always of 512
        bm //= 2
    assert tile % bm == 0, (tile, bm)
    sub = tile // 128
    grid = (ng,)
    counts, topv = pl.pallas_call(
        functools.partial(
            _kernel, bm=bm, tile=tile, cap_row=cap_row, w=w,
            rows_per_lane=rows_per_lane,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, 1, tile), jnp.int32),
            jax.ShapeDtypeStruct((nb, cap_row, tile), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((w * sub, 128), jnp.uint32),
            pltpu.VMEM((w * sub, 128), jnp.uint32),
            pltpu.VMEM((64 * w, tile), jnp.bfloat16),
            pltpu.VMEM((64 * w, tile), jnp.bfloat16),
            pltpu.VMEM((1, 1, tile), jnp.int32),
            pltpu.VMEM((1, cap_row, tile), jnp.int32),
            pltpu.SemaphoreType.DMA((2 * w + 2,)),
        ],
        interpret=interpret,
    )(groups, pairs, glob, lanemaj, lanemaj)
    return counts[:, 0, :], topv


@functools.partial(jax.jit, static_argnames=(
    "tile", "bm", "cap_row", "cap_total", "w", "interpret", "rsel",
    "ksel"))
def pallas_all_pairs(
    lanemaj, pairs, groups, part_stride, part_valid, max_dist, *,
    tile: int, bm: int = 512, cap_row: int = 16, cap_total: int,
    w: int = 2, interpret: bool = False, rsel: int | None = None,
    ksel: int | None = None,
):
    """Kernel sweep + vectorized compaction: one chunk of tile pairs ->
    (out_a [cap_total], out_b [cap_total], total, counts [nb, 3]).

    Same output contract as humid_tpu.ops.neighbors._all_pairs (pairs
    normalized (min, max), -1 padded; counts columns are per-tile true
    pair count / max matches-per-row / matched-row count, feeding the
    capacity-retry loop).  upper_only is always on (drivers using this
    path emit each unordered pair once by construction).

    ``rsel``: static row-selection cap for the compaction scatter.  The
    TPU scatter costs ~15 ns/element regardless of masking, so scattering
    the full [nb*tile, k] candidate block dominates end-to-end time
    (measured ~500 us/pair vs ~48 us for the kernel itself on v5e).
    With ``rsel``, a ``top_k`` gathers only the <= rsel rows per tile
    pair that actually matched, shrinking the scatter tile/rsel-fold.
    A pair with more matched rows under-reports; the driver detects it
    via counts[:, 2] > rsel and retries with a larger rsel.

    ``ksel``: static per-row match-count cap for the same scatter (the
    column analogue of rsel): only the first ksel of each row's cap_row
    candidate slots are scattered, shrinking the scatter a further
    cap_row/ksel-fold (typical dedup rows match 1-2 columns).  A row
    with more matches under-reports — detected via counts[:, 1] > ksel
    and retried with a larger ksel.
    """
    nb = pairs.shape[0]
    glob = jnp.stack(
        [part_stride, part_valid, max_dist, jnp.int32(1), jnp.int32(1),
         jnp.int32(0), jnp.int32(0), jnp.int32(0)]
    ).astype(jnp.int32)[None, :]
    rowcnt, topv = hamming_pairs_sweep(
        lanemaj, pairs, groups, glob,
        tile=tile, bm=bm, cap_row=cap_row, w=w, interpret=interpret,
    )                                        # [nb, tile], [nb, k, tile]
    k = topv.shape[1]
    matched = rowcnt > 0
    nmatched = matched.sum(axis=1, dtype=jnp.int32)      # [nb]
    n_tile = rowcnt.sum(axis=1)
    rowmax_tile = rowcnt.max(axis=1)
    counts = jnp.stack([n_tile, rowmax_tile, nmatched], axis=1)
    if rsel is not None and rsel >= tile:
        rsel = None                          # selection would be a no-op
    if ksel is not None and ksel >= k:
        ksel = None                          # slicing would be a no-op
    kk = k if ksel is None else ksel
    if rsel is not None:
        iota_t = jax.lax.broadcasted_iota(jnp.int32, (nb, tile), 1)
        mrow = jnp.where(matched, iota_t, -1)
        rowselv, _ = jax.lax.top_k(mrow, rsel)           # [nb, rsel]
        have = rowselv >= 0
        rs = jnp.where(have, rowselv, 0)
        selcnt = jnp.where(
            have, jnp.take_along_axis(rowcnt, rs, axis=1), 0)
        # topv is k-major; gather rsel columns then swap to [nb, rsel, kk]
        # (a tiny transpose vs transposing the full [nb, k, tile] block).
        seltv = jnp.take_along_axis(
            topv[:, :kk, :], rs[:, None, :], axis=2).transpose(0, 2, 1)
        flat_cnt = selcnt.reshape(-1)                    # [nb*rsel]
        ga = (pairs[:, 0:1] * tile + rs).reshape(-1)
        gb = pairs[:, 1:2, None] * tile + seltv          # [nb, rsel, kk]
        flat_tv = seltv.reshape(-1, kk)
        rows_flat = nb * rsel
    else:
        flat_cnt = rowcnt.reshape(-1)                    # [nb*tile]
        row_in_tile = jax.lax.broadcasted_iota(
            jnp.int32, (nb, tile), 1)
        ga = (pairs[:, 0:1] * tile + row_in_tile).reshape(-1)
        tv = topv[:, :kk, :].transpose(0, 2, 1)          # [nb, tile, kk]
        gb = pairs[:, 1:2, None] * tile + tv
        flat_tv = tv.reshape(-1, kk)
        rows_flat = nb * tile
    # Clamp to ksel so offsets stay consistent mid-launch; a clamped row
    # means counts[:, 1] > ksel, so the driver discards and retries.
    flat_cnt = jnp.minimum(flat_cnt, kk)
    roff = jnp.cumsum(flat_cnt) - flat_cnt
    total = flat_cnt.sum()
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (rows_flat, kk), 1)
    valid = (iota_k < flat_cnt[:, None]) & (flat_tv >= 0)
    tgt = jnp.where(valid, roff[:, None] + iota_k, cap_total)
    ga = jnp.broadcast_to(ga[:, None], (rows_flat, kk))
    gb = gb.reshape(-1, kk)
    pa = jnp.minimum(ga, gb).astype(jnp.int32)
    pb = jnp.maximum(ga, gb).astype(jnp.int32)
    out_a = jnp.full((cap_total,), -1, jnp.int32)
    out_b = jnp.full((cap_total,), -1, jnp.int32)
    out_a = out_a.at[tgt.ravel()].set(pa.ravel(), mode="drop")
    out_b = out_b.at[tgt.ravel()].set(pb.ravel(), mode="drop")
    return out_a, out_b, total, counts

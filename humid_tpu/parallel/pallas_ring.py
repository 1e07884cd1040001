"""Pallas TPU kernel-level ICI ring for the sharded neighbour search.

The XLA mesh ring (humid_tpu.parallel.neighbors._ring_pairs) rotates
fingerprint blocks with ``lax.ppermute`` — correct, but each rotation is
a discrete collective between compute steps, so ICI latency sits on the
critical path.  This module is the SURVEY §2.5-specified alternative
(VERDICT r3 #4): ONE Pallas kernel per shard runs the whole ring with
``pltpu.make_async_remote_copy`` — the RDMA of block s+1 to the left
neighbour is IN FLIGHT while the MXU computes matches against block s,
hiding the interconnect behind compute.

Design notes:

* The rotating payload is the lane-major PACKED block ([w*sub, 128]
  uint32 — 64x smaller than its one-hot), expanded to bf16 one-hots in
  VMEM per step; match counting is the same exact one-hot matmul as the
  single-chip sweep kernel (ops/pallas_hamming.py), with validity folded
  into the one-hot build and the s=0 upper-triangle mask reduced to a
  scalar iota comparison.
* Each ring step has its OWN comm slot (steps = d//2 + 1 slots): a
  block is received into slot s+1 exactly once and never overwritten,
  so no credit/flow-control protocol is needed — the send of slot s
  can only start after slot s was received, which bounds every
  neighbour's lead structurally.
* A neighbour barrier (pltpu.get_barrier_semaphore) runs before the
  first RDMA so no device writes into a kernel that has not started.
* Per-(step, row) match counts and top-``cap_row`` column indices
  return to HBM; the host maps them to global pairs (the compaction
  contract of the XLA ring).

Replaces findHammingNeighbours (humid.cc:113-130) at mesh scale with
kernel-level comm; the XLA-collective ring remains the default engine
(see sharded_neighbor_pairs) — this path is selected with
``impl="pallas_ring"``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.neighbors import _round_up
from .mesh import DATA_AXIS, data_mesh

__all__ = ["sharded_neighbor_pairs_pallas_ring"]


def _build_oht(oht_ref, lanes, valid_rows, *, w: int, sub: int):
    """Expand a lane-major packed block ([w*sub, 128] uint32 in VMEM)
    into its transposed one-hot ([64w, sub*128] bf16), zeroing features
    of rows >= valid_rows (they can then never reach the distance
    threshold — the validity-mask trick of ops/pallas_hamming.py)."""
    shift = 2 * (15 - (jax.lax.broadcasted_iota(
        jnp.int32, (64, 128), 0) // 4))
    sym = jax.lax.broadcasted_iota(jnp.int32, (64, 128), 0) % 4
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (64, 128), 1)
    for l in range(w):
        for r in range(sub):
            vr = lanes[l * sub + r:l * sub + r + 1, :].astype(jnp.int32)
            br = jnp.broadcast_to(vr, (64, 128))
            vok = lane_iota < valid_rows - r * 128
            oht_ref[l * 64:(l + 1) * 64, r * 128:(r + 1) * 128] = (
                ((jax.lax.shift_right_logical(br, shift) & 3) == sym)
                & vok
            ).astype(jnp.bfloat16)


def _ring_kernel(glob_ref, data_ref, counts_ref, topv_ref, comm,
                 lanes_r, lanes_c, oht_l, oht_r, cnt_v, topv_v,
                 load_sem, chunk_sems, out_sems, ring_sems, *,
                 steps: int, d: int, b: int, bc: int, bm: int,
                 cap_row: int, w: int, interpret: bool):
    """One shard's whole ring: compute on slot s overlaps the RDMA of
    slot s -> left neighbour's slot s+1.

    Blocks of arbitrary size: comm slots live in HBM (the RDMA rotates
    HBM->HBM); compute streams ``bc``-row sub-chunks HBM->VMEM, builds
    their one-hots, and runs the MXU matmuls per (row-chunk, col-chunk)
    pair — so the per-shard block is no longer bounded by VMEM (the
    round-4 verdict's 4096-row cap, now lifted).  Per-row match counts
    and top-``cap_row`` column indices accumulate across col chunks in
    VMEM (per-row running fill offsets merged with cap_row selects) and
    drain to HBM per row chunk."""
    me = glob_ref[0, 0, 0]
    u = glob_ref[0, 0, 1]
    max_dist = glob_ref[0, 0, 2]
    subc = bc // 128
    ncc = b // bc
    left = jax.lax.rem(me - 1 + d, d)

    # Local block HBM -> comm slot 0 (the step-0 rotating block).
    cp = pltpu.make_async_copy(data_ref, comm.at[0], load_sem)
    cp.start()
    cp.wait()

    if d > 1 and not interpret:
        # Neighbour barrier: no RDMA may target a kernel that has not
        # started yet.  (Interpret mode simulates all shards in one
        # process, so no barrier is needed — and its global semaphore
        # is unsupported there.)
        bar = pltpu.get_barrier_semaphore()
        right = jax.lax.rem(me + 1, d)
        pltpu.semaphore_signal(bar, inc=1, device_id=left,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)
        pltpu.semaphore_signal(bar, inc=1, device_id=right,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)
        pltpu.semaphore_wait(bar, 2)

    iota_r_bm = jax.lax.broadcasted_iota(jnp.int32, (bm, bc), 0)
    iota_c_bc = jax.lax.broadcasted_iota(jnp.int32, (bm, bc), 1)
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (cap_row, bm), 0)
    n_bases = 16 * w
    thresh = (n_bases - max_dist).astype(jnp.float32)

    for s in range(steps):
        rdma = None
        if s + 1 < steps:
            # Slot s is fully received (s=0: local load); forward it NOW
            # so the wire is busy while the MXU works on it.
            rdma = pltpu.make_async_remote_copy(
                comm.at[s], comm.at[s + 1],
                ring_sems.at[2 * s], ring_sems.at[2 * s + 1],
                device_id=left,
                device_id_type=pltpu.DeviceIdType.LOGICAL)
            rdma.start()

        q = jax.lax.rem(me + s, d)

        # Even d, last step: the pair {me, me+d/2} is seen by both ends;
        # only the lower half emits (parallel/neighbors.py coverage).
        if d % 2 == 0 and s == steps - 1 and steps > 1:
            gate = me < d // 2
        else:
            gate = jnp.bool_(True)

        def rc_body(rc, _, s=s, q=q, gate=gate):
            cpr = pltpu.make_async_copy(
                comm.at[0, pl.ds(rc * w * subc, w * subc)], lanes_r,
                chunk_sems.at[0])
            cpr.start()
            cpr.wait()
            u_rows = jnp.clip(u - me * b - rc * bc, 0, bc)
            _build_oht(oht_l, lanes_r[...], u_rows, w=w, sub=subc)
            cnt_v[0, 0, :] = jnp.zeros((bc,), jnp.int32)
            topv_v[0, :, :] = jnp.full((cap_row, bc), -1, jnp.int32)

            def cc_body(cc, _):
                cpc = pltpu.make_async_copy(
                    comm.at[s, pl.ds(cc * w * subc, w * subc)], lanes_c,
                    chunk_sems.at[1])
                cpc.start()
                cpc.wait()
                u_cols = jnp.clip(u - q * b - cc * bc, 0, bc)
                _build_oht(oht_r, lanes_c[...], u_cols, w=w, sub=subc)
                cols_oht = oht_r[...]

                def t_body(t, _):
                    a = oht_l[:, pl.ds(t * bm, bm)]
                    matches = jax.lax.dot_general(
                        a, cols_oht,
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    mask = matches >= thresh
                    if s == 0:
                        # Same block both sides: global upper triangle.
                        diff = (iota_c_bc + cc * bc) - (
                            iota_r_bm + rc * bc + t * bm)
                        mask &= diff > 0
                    rowcnt = jnp.where(
                        gate, mask.sum(axis=1, dtype=jnp.int32), 0)
                    cur = cnt_v[0, 0, pl.ds(t * bm, bm)]

                    @pl.when(rowcnt.max() > 0)
                    def _extract():
                        def k_body(kk, carry):
                            vals, out = carry
                            best = vals.max(axis=1)
                            out = jnp.where(iota_k == kk,
                                            best[None, :], out)
                            return (jnp.where(vals == best[:, None],
                                              -1, vals), out)

                        _, tmp = jax.lax.fori_loop(
                            0, cap_row, k_body,
                            (jnp.where(mask, iota_c_bc + cc * bc, -1),
                             jnp.full((cap_row, bm), -1, jnp.int32)))
                        # Merge the chunk's top-K into the row chunk's
                        # accumulator at each row's fill offset; rows
                        # past cap_row are dropped (the true count in
                        # cnt_v still records them -> host retry).
                        tv = topv_v[0, :, pl.ds(t * bm, bm)]
                        for j in range(cap_row):
                            val = tmp[j]
                            pos = cur + j
                            tv = jnp.where(
                                (iota_k == pos[None, :])
                                & (val >= 0)[None, :],
                                val[None, :], tv)
                        topv_v[0, :, pl.ds(t * bm, bm)] = tv

                    cnt_v[0, 0, pl.ds(t * bm, bm)] = cur + rowcnt
                    return 0

                jax.lax.fori_loop(0, bc // bm, t_body, 0)
                return 0

            # s == 0 scans only the upper-triangle col chunks.
            cc_lo = rc if s == 0 else jnp.int32(0)
            jax.lax.fori_loop(cc_lo, ncc, cc_body, 0)

            co = pltpu.make_async_copy(
                cnt_v, counts_ref.at[pl.ds(s, 1), :, pl.ds(rc * bc, bc)],
                out_sems.at[0])
            to = pltpu.make_async_copy(
                topv_v, topv_ref.at[pl.ds(s, 1), :, pl.ds(rc * bc, bc)],
                out_sems.at[1])
            co.start()
            to.start()
            co.wait()
            to.wait()
            return 0

        jax.lax.fori_loop(0, ncc, rc_body, 0)
        if rdma is not None:
            # Send of slot s drained; arrival of slot s+1 (the right
            # neighbour's symmetric send) confirmed — both overlapped
            # the chunk loop above.
            rdma.wait()


@functools.partial(jax.jit, static_argnames=(
    "steps", "d", "b", "bc", "bm", "cap_row", "w", "mesh", "interpret"))
def _ring_sweep(lanemaj, glob, *, steps: int, d: int, b: int, bc: int,
                bm: int, cap_row: int, w: int, mesh, interpret: bool):
    subc = bc // 128
    ncc = b // bc

    def body(lanes_l, glob_l):
        return pl.pallas_call(
            functools.partial(
                _ring_kernel, steps=steps, d=d, b=b, bc=bc, bm=bm,
                cap_row=cap_row, w=w, interpret=interpret),
            grid=(),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((steps, 1, b), jnp.int32),
                jax.ShapeDtypeStruct((steps, cap_row, b), jnp.int32),
                # Comm slots: declared as an (ignored) OUTPUT because
                # Mosaic only allocates VMEM/SMEM/semaphore scratch —
                # an ANY-space output gives the kernel its HBM ring
                # buffer, so blocks are VMEM-unbounded and the RDMA
                # rotates HBM->HBM while compute streams bc-row chunks
                # into VMEM below.  Never fetched by the host.
                jax.ShapeDtypeStruct((steps, ncc * w * subc, 128),
                                     jnp.uint32),
            ],
            scratch_shapes=[
                pltpu.VMEM((w * subc, 128), jnp.uint32),   # row lanes
                pltpu.VMEM((w * subc, 128), jnp.uint32),   # col lanes
                pltpu.VMEM((64 * w, bc), jnp.bfloat16),    # oht_l
                pltpu.VMEM((64 * w, bc), jnp.bfloat16),    # oht_r
                pltpu.VMEM((1, 1, bc), jnp.int32),         # cnt acc
                pltpu.VMEM((1, cap_row, bc), jnp.int32),   # topv acc
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2 * steps,)),
            ],
            # collective_id is only legal when the kernel really uses
            # the global barrier semaphore (d > 1 on hardware).
            compiler_params=(pltpu.CompilerParams(collective_id=7)
                             if d > 1 and not interpret else None),
            interpret=interpret,
        )(glob_l, lanes_l)

    fn = shard_map(body, mesh=mesh,
                   in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
                   out_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
                   check_vma=False)
    counts, topv, _comm = fn(lanemaj, glob)
    return counts, topv


#: per-shard block chunk streamed HBM->VMEM per compute step (rows).
_RING_CHUNK = 2048

#: sanity bound on per-shard block rows (HBM comm slots + outputs stay
#: well under a chip's HBM at this size; the dense O(b^2) scan is
#: compute-hopeless long before it).
_RING_MAX_BLOCK = 1 << 22

#: cap_row ceiling: the VMEM top-K accumulator is (cap_row, chunk) and
#: the per-chunk merge unrolls cap_row selects, so the overflow-retry
#: ladder must not grow it unboundedly (the pre-round block cap used to
#: bound it implicitly).  Rows with more matches than this raise
#: RingLimitExceeded and the caller falls back to the XLA tile scan.
_RING_MAX_CAP_ROW = 128


class RingLimitExceeded(ValueError):
    """The table exceeds the ring kernel's block or cap_row bounds —
    callers fall back to the XLA dense tile scan."""


def ring_fits(u: int, d: int | None = None) -> bool:
    """Would the per-shard block fit the ring kernel's HBM sanity cap?"""
    if d is None:
        d = (data_mesh().devices.size
             if jax.default_backend() == "tpu" else 1)
    from ..ops.runs_device import _quantize_n

    return _quantize_n(max(-(-u // max(d, 1)), 1)) <= _RING_MAX_BLOCK


def sharded_neighbor_pairs_pallas_ring(
    packed: np.ndarray,
    max_dist: int,
    *,
    word_length: int,
    mesh=None,
    cap_row: int = 16,
    block_cap: int | None = None,
    chunk: int | None = None,
    interpret: bool | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Mesh Hamming neighbour pairs via the Pallas RDMA ring kernel.

    Same contract as find_neighbor_pairs ((a, b) int64, a < b, sorted)
    and same coverage scheme as :func:`sharded_neighbor_pairs`.  Blocks
    are NOT VMEM-bounded (VERDICT r4 #2): comm slots live in HBM, the
    ring RDMA rotates HBM->HBM, and compute streams 2048-row chunks
    into VMEM per (row, col) chunk pair — per-shard blocks up to
    ``block_cap`` (default ~4M rows, an HBM sanity bound) run through
    ``make_async_remote_copy``.  Degenerate 1-device meshes skip the
    RDMA entirely (the hardware smoke path on single-chip hosts).
    """
    mesh = mesh or data_mesh()
    d = mesh.devices.size
    u, w = packed.shape
    if u <= 1 or max_dist == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    bc0 = chunk or _RING_CHUNK
    assert bc0 % 128 == 0, "chunk must be a multiple of 128"
    # Power-of-two-ish block quantum (cf. runs_device._quantize_n):
    # distinct dataset sizes share compiled kernels; padding rows are
    # masked by the validity clip inside the kernel.
    from ..ops.runs_device import _quantize_n

    b = _quantize_n(-(-u // d))
    if b > bc0:
        b = _round_up(b, bc0)
    if b > (block_cap or _RING_MAX_BLOCK):
        raise RingLimitExceeded(
            f"per-shard block {b} exceeds block_cap "
            f"{block_cap or _RING_MAX_BLOCK}; shard the table first")
    bc = min(b, bc0)
    cap_row = min(cap_row, _RING_MAX_CAP_ROW)
    bm = min(512, bc)
    while bc % bm:  # bc is a multiple of 128, not always of 512
        bm //= 2
    steps = d // 2 + 1
    sub = b // 128
    subc = bc // 128

    lanemaj = np.zeros((d * w * sub, 128), np.uint32)
    # Per shard: CHUNK-major lane layout — chunk cc of its rows is the
    # contiguous [w*subc, 128] slab at cc*w*subc (one DMA per chunk in
    # the kernel), each slab lane-major within the chunk.
    for si in range(d):
        rows = packed[si * b:(si + 1) * b]
        blk = np.zeros((b, w), packed.dtype)
        blk[:len(rows)] = rows
        for cc in range(b // bc):
            lm = blk[cc * bc:(cc + 1) * bc].T.reshape(w * subc, 128)
            lanemaj[si * w * sub + cc * w * subc:
                    si * w * sub + (cc + 1) * w * subc] = lm
    glob = np.zeros((d, 1, 8), np.int32)
    glob[:, 0, 0] = np.arange(d)
    glob[:, 0, 1] = u
    glob[:, 0, 2] = max_dist

    sharding = NamedSharding(mesh, P(DATA_AXIS))
    dev_lanes = jax.device_put(lanemaj, sharding)
    dev_glob = jax.device_put(glob, sharding)

    while True:
        counts, topv = _ring_sweep(
            dev_lanes, dev_glob, steps=steps, d=d, b=b, bc=bc, bm=bm,
            cap_row=cap_row, w=w, mesh=mesh, interpret=interpret)
        counts_h, topv_h = jax.device_get((counts, topv))
        row_max = int(counts_h.max(initial=0))
        if row_max > cap_row:
            if row_max > _RING_MAX_CAP_ROW:
                # The (cap_row, chunk) VMEM accumulator and the
                # cap_row-unrolled merge must stay bounded; rows this
                # dense belong to the XLA tile scan.
                raise RingLimitExceeded(
                    f"row match count {row_max} exceeds the ring "
                    f"kernel's cap_row ceiling {_RING_MAX_CAP_ROW}")
            cap_row = min(1 << (row_max - 1).bit_length(),
                          _RING_MAX_CAP_ROW)
            continue
        break

    # Host compaction: counts/topv are [d*steps, ...] stacked by shard.
    counts_h = counts_h.reshape(d, steps, b)
    topv_h = topv_h.reshape(d, steps, cap_row, b)
    parts_a, parts_b = [], []
    for me in range(d):
        for s in range(steps):
            cnt = counts_h[me, s]
            rows = np.flatnonzero(cnt > 0)
            if not len(rows):
                continue
            q = (me + s) % d
            # Vectorized ragged gather: row r contributes its first
            # cnt[r] topv slots (one repeat + within-row iota instead of
            # a Python loop allocating per-row arrays).
            k = cnt[rows].astype(np.int64)
            from .._util import concat_aranges

            within = concat_aranges(k)
            r_rep = np.repeat(rows, k)
            cols = topv_h[me, s, within, r_rep]
            ga = me * b + r_rep.astype(np.int64)
            gb = q * b + cols.astype(np.int64)
            parts_a.append(np.minimum(ga, gb))
            parts_b.append(np.maximum(ga, gb))
    if not parts_a:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    a = np.concatenate(parts_a)
    bb = np.concatenate(parts_b)
    # Shard-padded positions -> original unique indices: row i of shard
    # si is unique index si*b + i only while < u; padding never matches
    # (zeroed one-hot features).  Positions are already global here.
    order = np.lexsort((bb, a))
    return a[order], bb[order]

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


def _ring_kernel(glob_ref, data_ref, counts_ref, topv_ref,
                 comm, oht_l, oht_r, counts_v, topv_v, load_sem,
                 out_sems, ring_sems, *, steps: int, d: int, b: int,
                 bm: int, cap_row: int, w: int, interpret: bool):
    """One shard's whole ring: compute on slot s overlaps the RDMA of
    slot s -> left neighbour's slot s+1."""
    me = glob_ref[0, 0, 0]
    u = glob_ref[0, 0, 1]
    max_dist = glob_ref[0, 0, 2]
    sub = b // 128
    left = jax.lax.rem(me - 1 + d, d)

    # Local block HBM -> comm slot 0 (the step-0 rotating block).
    cp = pltpu.make_async_copy(data_ref, comm.at[0], load_sem)
    cp.start()
    cp.wait()

    # Row-side one-hot once (rows never rotate).
    u_rows = jnp.clip(u - me * b, 0, b)
    _build_oht(oht_l, comm[0], u_rows, w=w, sub=sub)

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

    iota_c = jax.lax.broadcasted_iota(jnp.int32, (bm, b), 1)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (bm, b), 0)
    diff_cr = iota_c - iota_r
    n_bases = 16 * w
    thresh = (n_bases - max_dist).astype(jnp.float32)

    def out_copies(s):
        return (
            pltpu.make_async_copy(
                counts_v, counts_ref.at[pl.ds(s, 1)], out_sems.at[0]),
            pltpu.make_async_copy(
                topv_v, topv_ref.at[pl.ds(s, 1)], out_sems.at[1]),
        )

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
        u_cols = jnp.clip(u - q * b, 0, b)
        _build_oht(oht_r, comm[s], u_cols, w=w, sub=sub)
        cols_oht = oht_r[...]

        # Even d, last step: the pair {me, me+d/2} is seen by both ends;
        # only the lower half emits (parallel/neighbors.py coverage).
        if d % 2 == 0 and s == steps - 1 and steps > 1:
            gate = me < d // 2
        else:
            gate = jnp.bool_(True)

        if s > 0:
            drain = out_copies(s - 1)
            for c in drain:
                c.wait()

        def block_body(blk, _):
            a = oht_l[:, pl.ds(blk * bm, bm)]
            matches = jax.lax.dot_general(
                a, cols_oht, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            mask = matches >= thresh
            if s == 0:
                # Same block on both sides: upper triangle only.
                mask &= diff_cr > blk * bm
            rowcnt = jnp.where(gate, mask.sum(axis=1, dtype=jnp.int32), 0)
            counts_v[0, 0, pl.ds(blk * bm, bm)] = rowcnt

            @pl.when(rowcnt.max() > 0)
            def _extract():
                iota_k = jax.lax.broadcasted_iota(
                    jnp.int32, (cap_row, bm), 0)

                def k_body(k, carry):
                    vals, out = carry
                    best = vals.max(axis=1)
                    out = jnp.where(iota_k == k, best[None, :], out)
                    return (jnp.where(vals == best[:, None], -1, vals),
                            out)

                _, out = jax.lax.fori_loop(
                    0, cap_row, k_body,
                    (jnp.where(mask, iota_c, -1),
                     jnp.full((cap_row, bm), -1, jnp.int32)))
                topv_v[0, :, pl.ds(blk * bm, bm)] = out

            return 0

        jax.lax.fori_loop(0, b // bm, block_body, 0)
        for c in out_copies(s):
            c.start()
        if rdma is not None:
            # Send of slot s drained; arrival of slot s+1 (the right
            # neighbour's symmetric send) confirmed — both overlapped
            # the matmuls above.
            rdma.wait()
    for c in out_copies(steps - 1):
        c.wait()


@functools.partial(jax.jit, static_argnames=(
    "steps", "d", "b", "bm", "cap_row", "w", "mesh", "interpret"))
def _ring_sweep(lanemaj, glob, *, steps: int, d: int, b: int, bm: int,
                cap_row: int, w: int, mesh, interpret: bool):
    sub = b // 128

    def body(lanes_l, glob_l):
        return pl.pallas_call(
            functools.partial(
                _ring_kernel, steps=steps, d=d, b=b, bm=bm,
                cap_row=cap_row, w=w, interpret=interpret),
            grid=(),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((steps, 1, b), jnp.int32),
                jax.ShapeDtypeStruct((steps, cap_row, b), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((steps, w * sub, 128), jnp.uint32),
                pltpu.VMEM((64 * w, b), jnp.bfloat16),
                pltpu.VMEM((64 * w, b), jnp.bfloat16),
                pltpu.VMEM((1, 1, b), jnp.int32),
                pltpu.VMEM((1, cap_row, b), jnp.int32),
                pltpu.SemaphoreType.DMA(()),
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
                   out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
                   check_vma=False)
    return fn(lanemaj, glob)


def sharded_neighbor_pairs_pallas_ring(
    packed: np.ndarray,
    max_dist: int,
    *,
    word_length: int,
    mesh=None,
    cap_row: int = 16,
    block_cap: int = 4096,
    interpret: bool | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Mesh Hamming neighbour pairs via the Pallas RDMA ring kernel.

    Same contract as find_neighbor_pairs ((a, b) int64, a < b, sorted)
    and same coverage scheme as :func:`sharded_neighbor_pairs`; per-shard
    blocks are limited to ``block_cap`` rows (the whole block is
    VMEM-resident per step) — the intended regime is the unique tables
    of a single bucket/shard, and the demonstration of kernel-level ICI
    streaming (SURVEY §2.5).  Degenerate 1-device meshes skip the RDMA
    entirely (the hardware smoke path on single-chip hosts).
    """
    mesh = mesh or data_mesh()
    d = mesh.devices.size
    u, w = packed.shape
    if u <= 1 or max_dist == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    b = _round_up(-(-u // d), 128)
    if b > block_cap:
        raise ValueError(
            f"per-shard block {b} exceeds block_cap {block_cap}; use "
            "sharded_neighbor_pairs (XLA ring) for large tables")
    bm = min(512, b)
    while b % bm:  # b is a multiple of 128, not always of 512
        bm //= 2
    steps = d // 2 + 1

    lanemaj = np.zeros((d * w * (b // 128), 128), np.uint32)
    # Per shard: lane-major layout of its rows (row l*sub + r, col c =
    # lane l of shard-local word r*128 + c).
    for si in range(d):
        rows = packed[si * b:(si + 1) * b]
        blk = np.zeros((b, w), packed.dtype)
        blk[:len(rows)] = rows
        lm = blk.T.reshape(w * (b // 128), 128)
        lanemaj[si * w * (b // 128):(si + 1) * w * (b // 128)] = lm
    glob = np.zeros((d, 1, 8), np.int32)
    glob[:, 0, 0] = np.arange(d)
    glob[:, 0, 1] = u
    glob[:, 0, 2] = max_dist

    sharding = NamedSharding(mesh, P(DATA_AXIS))
    dev_lanes = jax.device_put(lanemaj, sharding)
    dev_glob = jax.device_put(glob, sharding)

    while True:
        counts, topv = _ring_sweep(
            dev_lanes, dev_glob, steps=steps, d=d, b=b, bm=bm,
            cap_row=cap_row, w=w, mesh=mesh, interpret=interpret)
        counts_h, topv_h = jax.device_get((counts, topv))
        row_max = int(counts_h.max(initial=0))
        if row_max > cap_row:
            cap_row = min(1 << (row_max - 1).bit_length(), b)
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
            cum = np.cumsum(k)
            within = np.arange(int(cum[-1]), dtype=np.int64) - np.repeat(
                cum - k, k)
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

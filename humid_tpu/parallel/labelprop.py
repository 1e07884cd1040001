"""Distributed connected components and the fused multi-chip dedup step.

The reference clusters by recursive pointer-chasing flood fill
(cluster.cc:72-80) — single-threaded and stack-bound.  Here cluster
membership is a data-parallel fixed point: labels start as node indices,
every sweep scatter-mins edge endpoints and pointer-jumps, and shards
merge their views with a ``pmin`` collective over the mesh axis, so the
component minimum propagates both within and across shards in
O(log diameter) sweeps.

``dedup_step`` is the whole device-side pipeline as ONE jitted program:
sharded ring neighbour search -> edge buffers -> distributed label
propagation.  It is the "training step" analogue this framework's
multi-chip path is built around (see __graft_entry__.dryrun_multichip).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from .mesh import DATA_AXIS, data_mesh, pad_to_shards
from .neighbors import _ring_pairs_local


def _labelprop_local(ea, eb, num_nodes: int, n_shards: int):
    """shard_map body: local edge shard [E] -> converged labels [U]
    (replicated).  Invalid edges must be (0, 0) self-loops."""
    init = jnp.arange(num_nodes, dtype=jnp.int32)

    def sweep(labels):
        la = labels[ea]
        lb = labels[eb]
        m = jnp.minimum(la, lb)
        labels = labels.at[ea].min(m)
        labels = labels.at[eb].min(m)
        if n_shards > 1:
            labels = jax.lax.pmin(labels, DATA_AXIS)
        labels = labels[labels]
        labels = labels[labels]
        return labels

    def cond(state):
        labels, prev = state
        return jnp.any(labels != prev)

    def body(state):
        labels, _ = state
        return sweep(labels), labels

    labels, _ = jax.lax.while_loop(cond, body, (sweep(init), init))
    return labels


@functools.partial(jax.jit, static_argnames=("num_nodes", "mesh"))
def _labelprop_sharded(ea, eb, *, num_nodes: int, mesh):
    d = mesh.devices.size
    fn = shard_map(
        functools.partial(
            _labelprop_local, num_nodes=num_nodes, n_shards=d
        ),
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(),
        check_vma=False,
    )
    return fn(ea, eb)


def distributed_components(
    a: np.ndarray, b: np.ndarray, num_nodes: int, *, mesh=None,
    node_sharded: bool | None = None,
) -> np.ndarray:
    """Component labels (= min node index) for an undirected edge list,
    with the edge set sharded over the mesh.  Matches
    :func:`humid_tpu.cluster.labelprop.connected_components_device`.

    ``node_sharded`` switches to
    :func:`distributed_components_node_sharded` (O(U/D) label memory per
    chip); by default it engages above 2^16 nodes on multi-device
    meshes, and the replicated variant (faster to converge via pointer
    jumping) serves small inputs.
    """
    mesh = mesh or data_mesh()
    d = mesh.devices.size
    if num_nodes == 0:
        return np.zeros(0, np.int32)
    if node_sharded is None:
        node_sharded = num_nodes >= (1 << 16) and d > 1
    if node_sharded:
        return distributed_components_node_sharded(
            a, b, num_nodes, mesh=mesh)
    if len(a) == 0:
        return np.arange(num_nodes, dtype=np.int32)
    edges = np.stack([np.asarray(a, np.int32), np.asarray(b, np.int32)],
                     axis=1)
    edges = pad_to_shards(edges, d, multiple=8, fill=np.int32(0))
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    ea = jax.device_put(np.ascontiguousarray(edges[:, 0]), sharding)
    eb = jax.device_put(np.ascontiguousarray(edges[:, 1]), sharding)
    labels = _labelprop_sharded(ea, eb, num_nodes=num_nodes, mesh=mesh)
    return np.asarray(labels)


# ---------------------------------------------------------------------------
# Node-sharded label propagation (labels P(DATA_AXIS), O(U/D) per chip)
# ---------------------------------------------------------------------------

def _labelprop_nodes_local(init, ea, eb, msg_src, recv_dst, n_shards: int,
                           us: int):
    """shard_map body over NODE-sharded labels.

    init [us]: this shard's initial labels (global node ids).
    ea/eb [El]: intra-shard edges in LOCAL indices (padded with us -> the
      labels array carries one sentinel slot at index us).
    msg_src [D, K]: local source index of each outgoing boundary message
      to shard d (padded -1).
    recv_dst [D, K]: local target index of each incoming boundary message
      from shard d (padded us).

    Min-propagation without pointer jumping (label targets may live on
    other shards); converges in O(component diameter) sweeps — UMI
    cluster diameters are small.  Global convergence via psum.
    """
    big = jnp.int32(np.iinfo(np.int32).max)
    labels0 = jnp.concatenate([init, jnp.full((1,), big, jnp.int32)])
    src = msg_src.reshape(n_shards, -1)   # [D, K] (shard_map local [1, D*K])
    dst = recv_dst.reshape(n_shards, -1)

    def sweep(labels):
        la = labels[ea]
        lb = labels[eb]
        m = jnp.minimum(la, lb)
        labels = labels.at[ea].min(m)
        labels = labels.at[eb].min(m)
        if n_shards > 1:
            vals = jnp.where(src >= 0, labels[src], big)
            recv = jax.lax.all_to_all(
                vals, DATA_AXIS, split_axis=0, concat_axis=0, tiled=True)
            labels = labels.at[dst].min(recv)
        return labels.at[us].set(big)

    def cond(state):
        labels, prev = state
        changed = jnp.any(labels != prev).astype(jnp.int32)
        if n_shards > 1:
            changed = jax.lax.psum(changed, DATA_AXIS)
        return changed > 0

    def body(state):
        labels, _ = state
        return sweep(labels), labels

    labels, _ = jax.lax.while_loop(cond, body, (sweep(labels0), labels0))
    return labels[:us]


@functools.partial(jax.jit, static_argnames=("n_shards", "us", "mesh"))
def _labelprop_nodes(init, ea, eb, msg_src, recv_dst, *, n_shards: int,
                     us: int, mesh):
    fn = shard_map(
        functools.partial(_labelprop_nodes_local, n_shards=n_shards,
                          us=us),
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                  P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
        check_vma=False,
    )
    return fn(init, ea, eb, msg_src, recv_dst)


def distributed_components_node_sharded(
    a: np.ndarray, b: np.ndarray, num_nodes: int, *, mesh=None
) -> np.ndarray:
    """Component labels with the LABEL vector sharded over nodes: per-chip
    label memory is O(U/D) (VERDICT r1 item 6; the replicated
    :func:`distributed_components` keeps a full [U] copy per chip, a
    >=400MB ceiling at WGS scale).

    Host prep partitions nodes into contiguous ranges of size U/D and
    splits edges into intra-shard edges plus directed boundary messages
    bucketed by (source shard, destination shard); the static buckets
    ride one ``all_to_all`` per sweep, so each sweep moves only boundary
    traffic, never the label vector.
    """
    mesh = mesh or data_mesh()
    d = mesh.devices.size
    if num_nodes == 0:
        return np.zeros(0, np.int32)
    a = np.asarray(a, np.int64)
    b = np.asarray(b, np.int64)
    us = -(-num_nodes // d)
    us = max(8, -(-us // 8) * 8)

    own_a = a // us
    own_b = b // us
    la = (a % us).astype(np.int32)
    lb = (b % us).astype(np.int32)

    # Intra-shard edges, padded to a common per-shard length.
    intra = own_a == own_b
    ea_s, eb_s = [], []
    for s in range(d):
        sel = intra & (own_a == s)
        ea_s.append(la[sel])
        eb_s.append(lb[sel])
    el = max(8, 1 << int(max(1, max(len(x) for x in ea_s)) - 1)
             .bit_length())
    ea_pad = np.full((d, el), us, np.int32)
    eb_pad = np.full((d, el), us, np.int32)
    for s in range(d):
        ea_pad[s, :len(ea_s[s])] = ea_s[s]
        eb_pad[s, :len(eb_s[s])] = eb_s[s]

    # Directed boundary messages x->y for every cross edge (both
    # directions).  Same (src, dst) bucket ordering on both sides, so
    # sender slot k and receiver slot k describe the same message.
    cross = ~intra
    srcs = np.concatenate([own_a[cross], own_b[cross]])
    dsts = np.concatenate([own_b[cross], own_a[cross]])
    sloc = np.concatenate([la[cross], lb[cross]]).astype(np.int32)
    dloc = np.concatenate([lb[cross], la[cross]]).astype(np.int32)
    order = np.lexsort((dloc, sloc, dsts, srcs))
    srcs, dsts, sloc, dloc = (srcs[order], dsts[order], sloc[order],
                              dloc[order])
    counts = np.zeros((d, d), np.int64)
    np.add.at(counts, (srcs, dsts), 1)
    k = max(1, 1 << int(max(1, counts.max()) - 1).bit_length())
    msg_src = np.full((d, d, k), -1, np.int32)
    recv_dst = np.full((d, d, k), us, np.int32)
    if len(srcs):
        # Slot of each message within its (src, dst) bucket: position
        # minus bucket start (messages are bucket-sorted).
        key = srcs * d + dsts
        pos = np.arange(len(key))
        new = np.empty(len(key), bool)
        new[0] = True
        np.not_equal(key[1:], key[:-1], out=new[1:])
        j = pos - np.maximum.accumulate(np.where(new, pos, 0))
        msg_src[srcs, dsts, j] = sloc
        recv_dst[dsts, srcs, j] = dloc

    init = np.arange(d * us, dtype=np.int32)

    sharding = NamedSharding(mesh, P(DATA_AXIS))
    labels = _labelprop_nodes(
        jax.device_put(init, sharding),
        jax.device_put(np.ascontiguousarray(ea_pad.reshape(-1)), sharding),
        jax.device_put(np.ascontiguousarray(eb_pad.reshape(-1)), sharding),
        jax.device_put(np.ascontiguousarray(msg_src.reshape(d, d * k)),
                       sharding),
        jax.device_put(np.ascontiguousarray(recv_dst.reshape(d, d * k)),
                       sharding),
        n_shards=d, us=us, mesh=mesh,
    )
    full = np.asarray(labels)
    out = np.empty(num_nodes, np.int32)
    for s in range(d):
        lo = s * us
        hi = min(lo + us, num_nodes)
        if hi > lo:
            out[lo:hi] = full[s * us:s * us + (hi - lo)]
    return out


# ---------------------------------------------------------------------------
# Fused device-side dedup step (neighbour search + clustering in one jit)
# ---------------------------------------------------------------------------

def _dedup_step_local(local, u, max_dist, *, tile: int, cap_row: int,
                      cap_total: int, n_shards: int):
    out_a, out_b, total, counts = _ring_pairs_local(
        local, u, max_dist, tile=tile, cap_row=cap_row,
        cap_total=cap_total, n_shards=n_shards,
    )
    valid = out_a >= 0
    ea = jnp.where(valid, out_a, 0)
    eb = jnp.where(valid, out_b, 0)
    num_nodes = local.shape[0] * n_shards
    labels = _labelprop_local(ea, eb, num_nodes, n_shards)
    return labels, counts


@functools.partial(jax.jit, static_argnames=(
    "tile", "cap_row", "cap_total", "n_shards", "mesh"))
def _dedup_step(packed, u, max_dist, *, tile: int, cap_row: int,
                cap_total: int, n_shards: int, mesh):
    fn = shard_map(
        functools.partial(
            _dedup_step_local, tile=tile, cap_row=cap_row,
            cap_total=cap_total, n_shards=n_shards,
        ),
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(), P()),
        out_specs=(P(), P(DATA_AXIS)),
        check_vma=False,
    )
    return fn(packed, u, max_dist)


def dedup_step(
    packed: np.ndarray,
    max_dist: int,
    *,
    mesh=None,
    tile: int = 2048,
    cap_row: int = 16,
    cap_total: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """One fused device pass: unique fingerprints -> component labels.

    Returns (labels [U] int32 = min unique-word index per component,
    per-tile match counts) — membership identical to the reference's
    maximum clustering flood fill (cluster.cc:72-80) on the same graph.
    """
    from .neighbors import _round_up

    mesh = mesh or data_mesh()
    d = mesh.devices.size
    u, w = packed.shape
    if u == 0:
        return np.zeros(0, np.int32), np.zeros(0, np.int32)
    tile = min(tile, _round_up(-(-u // d), 256))
    cap_row = min(cap_row, tile)
    data = pad_to_shards(packed, d, multiple=tile, fill=0)
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    dev = jax.device_put(data, sharding)
    if cap_total is None:
        cap_total = max(1 << 18, 8 * (u // d + 1))
    while True:
        labels, counts = _dedup_step(
            dev, jnp.int32(u), jnp.int32(max_dist),
            tile=tile, cap_row=cap_row, cap_total=cap_total,
            n_shards=d, mesh=mesh,
        )
        counts_h = np.asarray(counts)
        row_max = int(counts_h[:, 1].max(initial=0))
        if row_max > cap_row:
            cap_row = min(1 << (row_max - 1).bit_length(), tile)
            continue
        per_shard_total = counts_h.reshape(d, -1, 3)[:, :, 0].sum(axis=1)
        if int(per_shard_total.max(initial=0)) > cap_total:
            cap_total = _round_up(
                int(per_shard_total.max()) + 1024, 1 << 14
            )
            continue
        break
    return np.asarray(labels)[:u], counts_h

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
    a: np.ndarray, b: np.ndarray, num_nodes: int, *, mesh=None
) -> np.ndarray:
    """Component labels (= min node index) for an undirected edge list,
    with the edge set sharded over the mesh.  Matches
    :func:`humid_tpu.cluster.labelprop.connected_components_device`.
    """
    mesh = mesh or data_mesh()
    d = mesh.devices.size
    if num_nodes == 0:
        return np.zeros(0, np.int32)
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
        per_shard_total = counts_h.reshape(d, -1, 2)[:, :, 0].sum(axis=1)
        if int(per_shard_total.max(initial=0)) > cap_total:
            cap_total = _round_up(
                int(per_shard_total.max()) + 1024, 1 << 14
            )
            continue
        break
    return np.asarray(labels)[:u], counts_h

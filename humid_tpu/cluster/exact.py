"""Bit-exact clustering, reproducing the reference's traversal semantics.

The reference's two methods (cluster.cc):

* Maximum (-x): recursive flood fill of the connected component; every leaf
  visited updates maxCount/maxLeaf with STRICT ``>`` — ties keep the
  earlier leaf in DFS pre-order (cluster.cc:20-25, 72-80).
* Directional (default, UMI-tools style):
    1. hill-climb ``maxNeighbour_``: scan neighbours in list order, jump to
       the FIRST unassigned neighbour with count >= 2*current and restart
       the scan; repeat until stuck (cluster.cc:39-51).
    2. ``updateMaxCount_`` once on the hill-climb result (cluster.cc:84-85).
    3. recursive descent from that local max absorbing unassigned
       neighbours with leaf.count >= 2*neighbour.count (cluster.cc:58-69).

Seeds iterate in trie-walk (lexicographic) order (humid.cc:178); ids start
at 1 (humid.cc:177).  With unique words sorted ascending and CSR neighbour
lists ascending (see humid_tpu.ops.neighbors), this module replays the
exact same visit order iteratively — an explicit stack removes the
reference's documented stack-overflow segfault on deep clusters
(docs/troubleshooting.rst:6-18).

A C++ fast path (csrc/cluster.cpp) implements the same algorithm for large
graphs; this numpy/python version is the always-available fallback and the
test oracle for the native one.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

try:
    from . import _native
except ImportError:  # pragma: no cover - extension not built
    _native = None


@dataclass
class ClusterResult:
    """Per-node cluster ids (1-based; 0 = unassigned, never final) and
    per-cluster tables indexed by cluster id - 1."""

    labels: np.ndarray      # [U] int64 cluster id per unique word
    max_leaf: np.ndarray    # [K] int64 node index of cluster->maxLeaf
    max_count: np.ndarray   # [K] int64 cluster->maxCount
    size: np.ndarray        # [K] int64 cluster->size (sum of member counts)

    @property
    def num_clusters(self) -> int:
        return len(self.size)


#: auto-selection gate for the component-parallel native variant.
#: Round-5 re-measurement (BASELINE.md, OMP_NUM_THREADS=1/2/4 trend at
#: 2.9M AND 18M uniques, prologue already shrunk: one union per
#: unordered edge + parallel root resolution) REFUTED the round-4
#: ">=16 cores" extrapolation: the variant's fixed term GROWS with
#: table size (375 ns/u at T=1/18M vs 88 sequential) because the
#: component-grouped traversal replaces the sequential walk's linear
#: streaming with cache-hostile per-component jumps — a cost no core
#: count removes on this memory system.  Auto therefore stays
#: sequential everywhere; ``parallel=True`` / HUMID_TPU_CLUSTER=
#: parallel remain for machines whose own measurement disagrees.
_PARALLEL_AUTO = False          # auto: never (measured; see above)


def cluster_exact(
    counts: np.ndarray,
    indptr: np.ndarray,
    indices: np.ndarray,
    *,
    maximum: bool = False,
    use_native: bool = True,
    parallel: bool | None = None,
) -> ClusterResult:
    """Cluster unique words given exact-duplicate ``counts`` and CSR
    adjacency (ascending neighbour lists).

    ``parallel=None`` follows ``_PARALLEL_AUTO`` (measured: sequential
    everywhere on this class of machine — see the gate comment above);
    ``parallel=True`` / HUMID_TPU_CLUSTER=parallel force the
    component-parallel native variant (bit-identical; clusters in
    distinct connected components cannot interact, so they run
    concurrently and renumber by seed rank — VERDICT r3 #8)."""
    counts = np.ascontiguousarray(counts, dtype=np.int64)
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    if use_native and _native is not None:
        if parallel is None:
            import os

            env = os.environ.get("HUMID_TPU_CLUSTER", "auto")
            if env == "parallel":
                parallel = True
            elif env in ("seq", "sequential"):
                parallel = False
            else:
                parallel = _PARALLEL_AUTO
        labels, max_leaf, max_count, size = _native.cluster(
            counts, indptr, indices, bool(maximum), parallel=parallel
        )
        return ClusterResult(labels, max_leaf, max_count, size)
    if maximum:
        return _cluster_max_py(counts, indptr, indices)
    return _cluster_directional_py(counts, indptr, indices)


def cluster_max_from_components(
    counts: np.ndarray,
    indptr: np.ndarray,
    indices: np.ndarray,
    cc_labels: np.ndarray,
) -> ClusterResult:
    """Finalize maximum (-x) clustering from precomputed connected
    component labels (min-node-index per component — e.g. the device
    label propagation, cluster/labelprop.py), bit-exactly matching
    :func:`cluster_exact`'s DFS (cluster.cc:72-80 semantics).

    Membership, 1-based ids in seed order, ``size`` and ``maxCount`` are
    order-independent reductions over the labels.  ``maxLeaf`` carries
    the reference's order dependence: strict ``>`` updates during a
    pre-order DFS keep the FIRST max-count leaf in DFS order — which is
    only ambiguous when several members share the max count.  Such tied
    components are re-walked with the same DFS, early-exiting at the
    first max-count node; everything else never touches the adjacency.
    """
    from .labelprop import renumber_components

    counts = np.ascontiguousarray(counts, dtype=np.int64)
    u = len(counts)
    cid, k, seeds = renumber_components(cc_labels)  # ids, k, comp minima
    if k == 0:
        z = np.zeros(0, np.int64)
        return ClusterResult(np.zeros(0, np.int64), z, z, z)
    g = cid - 1
    size = np.bincount(g, weights=counts, minlength=k).astype(np.int64)
    max_count = np.zeros(k, np.int64)
    np.maximum.at(max_count, g, counts)
    # Index-order-first max per component; equals DFS-order-first when
    # the max is unique in its component.
    is_max = counts == max_count[g]
    n_max = np.bincount(g[is_max], minlength=k)
    max_leaf = np.full(k, u, np.int64)
    np.minimum.at(max_leaf, g[is_max], np.flatnonzero(is_max))
    tied = np.flatnonzero(n_max > 1)
    if len(tied):
        # seeds (from renumber_components) are the component minima ==
        # the cc label values — no extra scatter pass needed.
        tied_set = max_count[tied]
        for comp, mc in zip(tied.tolist(), tied_set.tolist()):
            seed = int(seeds[comp])
            if counts[seed] == mc:  # pre-order starts at the seed
                max_leaf[comp] = seed
                continue
            # Restricted pre-order DFS (ascending adjacency), early
            # exit at the first max-count node — the reference's
            # strict-> update never replaces it (cluster.cc:20-25).
            visited = {seed}
            stack = [(seed, int(indptr[seed]))]
            while stack:
                node, ptr = stack[-1]
                if ptr == indptr[node + 1]:
                    stack.pop()
                    continue
                stack[-1] = (node, ptr + 1)
                nb = int(indices[ptr])
                if nb not in visited:
                    visited.add(nb)
                    if counts[nb] == mc:
                        max_leaf[comp] = nb
                        break
                    stack.append((nb, int(indptr[nb])))
    return ClusterResult(cid.astype(np.int64), max_leaf, max_count, size)


def _cluster_max_py(counts, indptr, indices) -> ClusterResult:
    u = len(counts)
    labels = np.zeros(u, dtype=np.int64)
    max_leaf: list[int] = []
    max_count: list[int] = []
    sizes: list[int] = []
    for seed in range(u):
        if labels[seed]:
            continue
        cid = len(sizes) + 1
        ml, mc, size = -1, 0, 0
        # Iterative pre-order DFS == the recursion in cluster.cc:72-80:
        # assign + updateMaxCount on entry, then neighbours in list order.
        labels[seed] = cid
        size += counts[seed]
        if counts[seed] > mc:
            mc, ml = counts[seed], seed
        stack = [(seed, indptr[seed])]
        while stack:
            node, ptr = stack[-1]
            if ptr == indptr[node + 1]:
                stack.pop()
                continue
            stack[-1] = (node, ptr + 1)
            nb = indices[ptr]
            if labels[nb] == 0:
                labels[nb] = cid
                size += counts[nb]
                if counts[nb] > mc:
                    mc, ml = counts[nb], nb
                stack.append((nb, indptr[nb]))
        max_leaf.append(int(ml))
        max_count.append(int(mc))
        sizes.append(int(size))
    return ClusterResult(
        labels,
        np.asarray(max_leaf, np.int64),
        np.asarray(max_count, np.int64),
        np.asarray(sizes, np.int64),
    )


def _cluster_directional_py(counts, indptr, indices) -> ClusterResult:
    u = len(counts)
    labels = np.zeros(u, dtype=np.int64)
    max_leaf: list[int] = []
    max_count: list[int] = []
    sizes: list[int] = []
    for seed in range(u):
        if labels[seed]:
            continue
        cid = len(sizes) + 1
        # Hill climb (cluster.cc:39-51): restart the scan after every jump.
        node = seed
        i = indptr[node]
        end = indptr[node + 1]
        while i < end:
            nb = indices[i]
            i += 1
            if labels[nb] == 0 and counts[nb] >= 2 * counts[node]:
                node = nb
                i = indptr[node]
                end = indptr[node + 1]
        # updateMaxCount_ once on the local max (cluster.cc:84-85); the
        # cluster starts with maxCount 0 so the local max always wins.
        ml, mc = int(node), int(counts[node])
        size = 0
        # Descent (cluster.cc:58-69): assign on entry; absorb unassigned
        # neighbours with current.count >= 2*neighbour.count.
        labels[node] = cid
        size += counts[node]
        stack = [(node, indptr[node])]
        while stack:
            cur, ptr = stack[-1]
            if ptr == indptr[cur + 1]:
                stack.pop()
                continue
            stack[-1] = (cur, ptr + 1)
            nb = indices[ptr]
            if labels[nb] == 0 and counts[cur] >= 2 * counts[nb]:
                labels[nb] = cid
                size += counts[nb]
                stack.append((nb, indptr[nb]))
        max_leaf.append(ml)
        max_count.append(mc)
        sizes.append(int(size))
    return ClusterResult(
        labels,
        np.asarray(max_leaf, np.int64),
        np.asarray(max_count, np.int64),
        np.asarray(sizes, np.int64),
    )

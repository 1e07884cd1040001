"""ctypes-free wrapper around the native clustering extension.

Raises ImportError when the extension is not built, which makes
:func:`humid_tpu.cluster.exact.cluster_exact` fall back to the pure
Python implementation (same semantics, slower).
Build with: python setup.py build_ext --inplace
"""

from __future__ import annotations

import numpy as np

from . import _ccluster


def cluster(counts, indptr, indices, maximum, parallel=False):
    """Native CSR clustering; mirrors the pure-Python reference in
    humid_tpu/cluster/exact.py (semantics of cluster.cc).

    ``parallel`` runs the component-parallel variant (union-find the
    components, the exact sequential algorithm per component under
    OpenMP, global renumber by seed rank) — bit-identical output."""
    u = len(counts)
    labels = np.zeros(u, dtype=np.int64)
    cap = max(u, 1)
    max_leaf = np.empty(cap, dtype=np.int64)
    max_count = np.empty(cap, dtype=np.int64)
    size = np.empty(cap, dtype=np.int64)
    if u:
        fn = (_ccluster.cluster_parallel_into if parallel
              else _ccluster.cluster_into)
        k = fn(
            counts, indptr, indices, bool(maximum),
            labels, max_leaf, max_count, size,
        )
    else:
        k = 0
    return labels, max_leaf[:k].copy(), max_count[:k].copy(), size[:k].copy()


def cluster_masked(counts, indptr, indices, maximum, own):
    """Exact walk restricted to seeds of OWNED components (own: uint8
    [u]); walks never leave their component, so this equals clustering
    the owned components' induced subgraph without building one.
    Returns (labels [u] local ids 0/1..k, seeds [k], max_leaf [k],
    max_count [k], size [k]) with seeds/max_leaf as global indices."""
    u = len(counts)
    labels = np.zeros(u, dtype=np.int64)
    cap = max(u, 1)
    seeds = np.empty(cap, dtype=np.int64)
    max_leaf = np.empty(cap, dtype=np.int64)
    max_count = np.empty(cap, dtype=np.int64)
    size = np.empty(cap, dtype=np.int64)
    k = 0
    if u:
        k = _ccluster.cluster_masked_into(
            np.ascontiguousarray(counts, np.int64),
            np.ascontiguousarray(indptr, np.int64),
            np.ascontiguousarray(indices, np.int64), bool(maximum),
            np.ascontiguousarray(own, np.uint8), labels, seeds,
            max_leaf, max_count, size)
    return (labels, seeds[:k].copy(), max_leaf[:k].copy(),
            max_count[:k].copy(), size[:k].copy())


def components(pa, pb, u):
    """Connected-component labels (min node index per component) from
    an (a, b) edge list — one native O(u + E) union-find pass."""
    labels = np.empty(u, dtype=np.int64)
    _ccluster.components_into(
        np.ascontiguousarray(pa, np.int64),
        np.ascontiguousarray(pb, np.int64), labels)
    return labels

"""Clustering semantics tests.

Includes the reference's hand-built chain scenario
(/root/reference/tests/test_cluster.cc:73-137) and randomized equivalence
against the literal-recursion oracle.
"""

import numpy as np

from humid_tpu.cluster import cluster_exact
from humid_tpu.cluster.exact import _cluster_directional_py, _cluster_max_py

from oracle import _Leaf, _Cluster, _assign_directional, _assign_max


def _csr(neigh_lists):
    indptr = np.zeros(len(neigh_lists) + 1, np.int64)
    indices = []
    for i, lst in enumerate(neigh_lists):
        indptr[i + 1] = indptr[i] + len(lst)
        indices.extend(lst)
    return indptr, np.asarray(indices, np.int64)


def test_reference_chain_directional():
    # test_cluster.cc:73-137 — chain 2-4-8-10-3 splits into {2,4,8} and
    # {10,3} with maxLeafs 8 and 10.
    counts = np.array([2, 4, 8, 10, 3], np.int64)
    neigh = [[1], [0, 2], [1, 3], [2, 4], [3]]
    indptr, indices = _csr(neigh)
    res = cluster_exact(counts, indptr, indices, maximum=False)
    assert res.labels.tolist() == [1, 1, 1, 2, 2]
    assert res.size.tolist() == [14, 13]
    assert res.max_leaf.tolist() == [2, 3]
    assert res.max_count.tolist() == [8, 10]


def test_reference_chain_max():
    counts = np.array([2, 4, 8, 10, 3], np.int64)
    neigh = [[1], [0, 2], [1, 3], [2, 4], [3]]
    indptr, indices = _csr(neigh)
    res = cluster_exact(counts, indptr, indices, maximum=True)
    # Flood fill from node 0 gets the whole chain; global max is node 3.
    assert res.labels.tolist() == [1, 1, 1, 1, 1]
    assert res.size.tolist() == [27]
    assert res.max_leaf.tolist() == [3]
    assert res.max_count.tolist() == [10]


def test_hillclimb_blocked_by_assigned():
    # test_cluster.cc:30-43 — an already-assigned neighbour is not climbed.
    # Simulate: node1 (count 2) already in cluster via earlier seed; node0
    # (count 1) seeds its own cluster.
    counts = np.array([4, 2, 1], np.int64)
    # node1 neighbours: node0 (bigger, absorbs it), node2 too small to climb
    neigh = [[1], [0, 2], [1]]
    indptr, indices = _csr(neigh)
    res = cluster_exact(counts, indptr, indices, maximum=False)
    # seed 0: climb stuck (4 -> no neighbour >= 8). descend: absorb node1
    # (4 >= 4), from node1 absorb node2 (2 >= 2). One cluster.
    assert res.labels.tolist() == [1, 1, 1]
    assert res.max_leaf.tolist() == [0]


def _random_graph(rng, n):
    counts = rng.integers(1, 20, n).astype(np.int64)
    neigh = [[] for _ in range(n)]
    for i in range(n):
        for j in range(i + 1, n):
            if rng.random() < 3.0 / max(n, 1):
                neigh[i].append(j)
                neigh[j].append(i)
    # ascending lists (matches CSR construction from sorted pairs)
    for lst in neigh:
        lst.sort()
    return counts, neigh


def _oracle_cluster(counts, neigh, maximum):
    leaves = [_Leaf(count=int(c)) for c in counts]
    for i, lst in enumerate(neigh):
        leaves[i].neighbours = list(lst)
    clusters = []
    nid = 1
    for i in range(len(leaves)):
        if leaves[i].cluster is None:
            c = _Cluster(nid)
            nid += 1
            if maximum:
                _assign_max(leaves, i, c)
            else:
                _assign_directional(leaves, i, c)
            clusters.append(c)
    labels = [l.cluster.id for l in leaves]
    return labels, clusters


def test_random_equivalence_with_oracle():
    rng = np.random.default_rng(7)
    for trial in range(30):
        n = int(rng.integers(2, 120))
        counts, neigh = _random_graph(rng, n)
        indptr, indices = _csr(neigh)
        for maximum in (False, True):
            res = cluster_exact(counts, indptr, indices, maximum=maximum)
            labels, clusters = _oracle_cluster(counts, neigh, maximum)
            assert res.labels.tolist() == labels, (trial, maximum)
            assert res.size.tolist() == [c.size for c in clusters]
            assert res.max_leaf.tolist() == [c.max_leaf for c in clusters]
            assert res.max_count.tolist() == [c.max_count for c in clusters]


def test_python_vs_native_paths_agree():
    rng = np.random.default_rng(11)
    for _ in range(10):
        n = int(rng.integers(2, 200))
        counts, neigh = _random_graph(rng, n)
        indptr, indices = _csr(neigh)
        for maximum in (False, True):
            a = cluster_exact(counts, indptr, indices, maximum=maximum,
                              use_native=True)
            fn = _cluster_max_py if maximum else _cluster_directional_py
            b = fn(counts, indptr, indices)
            np.testing.assert_array_equal(a.labels, b.labels)
            np.testing.assert_array_equal(a.max_leaf, b.max_leaf)
            np.testing.assert_array_equal(a.size, b.size)


def test_component_parallel_matches_oracle_and_sequential():
    """The component-parallel native route (VERDICT r3 #8) is
    bit-identical to the sequential walk AND the literal-recursion
    oracle, both methods, including the reference chain scenario."""
    counts = np.array([2, 4, 8, 10, 3], np.int64)
    neigh = [[1], [0, 2], [1, 3], [2, 4], [3]]
    indptr, indices = _csr(neigh)
    res = cluster_exact(counts, indptr, indices, maximum=False,
                        parallel=True)
    assert res.labels.tolist() == [1, 1, 1, 2, 2]
    assert res.max_leaf.tolist() == [2, 3]

    rng = np.random.default_rng(23)
    for trial in range(20):
        n = int(rng.integers(2, 150))
        counts, neigh = _random_graph(rng, n)
        indptr, indices = _csr(neigh)
        for maximum in (False, True):
            par = cluster_exact(counts, indptr, indices,
                                maximum=maximum, parallel=True)
            seq = cluster_exact(counts, indptr, indices,
                                maximum=maximum, parallel=False)
            labels, clusters = _oracle_cluster(counts, neigh, maximum)
            assert par.labels.tolist() == labels, (trial, maximum)
            for fld in ("labels", "max_leaf", "max_count", "size"):
                np.testing.assert_array_equal(
                    getattr(par, fld), getattr(seq, fld),
                    err_msg=f"{trial} {maximum} {fld}")


def test_component_parallel_interleaved_seed_order():
    """Cluster ids from different components interleave by seed rank:
    component {0,2} seeds clusters at 0 and 2, component {1,3} at 1 —
    global ids must follow 0 < 1 < 2 regardless of component order."""
    # node0 count 1, node2 count 9 (not absorbable from 0: climb 1->9?
    # 9 >= 2*1 so hill-climb JUMPS to 2... choose counts to split).
    counts = np.array([5, 7, 2, 3], np.int64)
    neigh = [[2], [3], [0], [1]]  # components {0,2}, {1,3}
    indptr, indices = _csr(neigh)
    seq = cluster_exact(counts, indptr, indices, parallel=False)
    par = cluster_exact(counts, indptr, indices, parallel=True)
    np.testing.assert_array_equal(seq.labels, par.labels)
    np.testing.assert_array_equal(seq.max_leaf, par.max_leaf)
    # seed order: 0 (cluster 1, absorbs 2: 5 >= 4), 1 (cluster 2,
    # absorbs 3: 7 >= 6) — interleaving check.
    assert seq.labels.tolist() == [1, 2, 1, 2]


def test_deep_chain_no_stack_overflow():
    # The reference segfaults on deep clusters (docs/troubleshooting.rst);
    # the iterative implementation must not.
    n = 50_000
    counts = np.full(n, 4, np.int64)
    counts[0] = 8
    neigh = [[] for _ in range(n)]
    for i in range(n - 1):
        neigh[i].append(i + 1)
        neigh[i + 1].append(i)
    indptr, indices = _csr(neigh)
    res = cluster_exact(counts, indptr, indices, maximum=True)
    assert res.labels.max() == 1
    assert res.size[0] == counts.sum()


def _cc_host(indptr, indices, n):
    """Host connected components (min index per component) — an oracle
    stand-in for connected_components_device in these tests."""
    labels = np.arange(n, dtype=np.int64)
    for seed in range(n):
        if labels[seed] != seed:
            continue
        stack = [seed]
        while stack:
            v = stack.pop()
            for p in range(indptr[v], indptr[v + 1]):
                nb = indices[p]
                if labels[nb] != seed:
                    labels[nb] = seed
                    stack.append(nb)
    return labels


def test_max_from_components_matches_exact_random():
    """cluster_max_from_components == cluster_exact(maximum=True) on
    random graphs — including maxLeaf under shared-max-count ties."""
    from humid_tpu.cluster import cluster_max_from_components

    rng = np.random.default_rng(41)
    for trial in range(20):
        n = int(rng.integers(2, 120))
        counts, neigh = _random_graph(rng, n)
        if trial % 3 == 0:
            counts[:] = 1  # everything tied: maximal DFS tie-breaking
        elif trial % 3 == 1:
            counts = rng.integers(1, 3, n).astype(np.int64)  # many ties
        indptr, indices = _csr(neigh)
        ref = cluster_exact(counts, indptr, indices, maximum=True)
        cc = _cc_host(indptr, indices, n)
        got = cluster_max_from_components(counts, indptr, indices, cc)
        np.testing.assert_array_equal(got.labels, ref.labels)
        np.testing.assert_array_equal(got.max_leaf, ref.max_leaf)
        np.testing.assert_array_equal(got.max_count, ref.max_count)
        np.testing.assert_array_equal(got.size, ref.size)


def test_max_from_components_device_labels():
    """The same finalize fed by the DEVICE label propagation."""
    from humid_tpu.cluster import (
        cluster_max_from_components,
        connected_components_device,
    )

    rng = np.random.default_rng(43)
    n = 300
    counts, neigh = _random_graph(rng, n)
    counts[rng.integers(0, n, n // 2)] = 5  # force some shared maxima
    indptr, indices = _csr(neigh)
    pa, pb = [], []
    for i, lst in enumerate(neigh):
        for j in lst:
            if j > i:
                pa.append(i)
                pb.append(j)
    cc = connected_components_device(
        np.asarray(pa, np.int64), np.asarray(pb, np.int64), n)
    ref = cluster_exact(counts, indptr, indices, maximum=True)
    got = cluster_max_from_components(counts, indptr, indices, cc)
    np.testing.assert_array_equal(got.labels, ref.labels)
    np.testing.assert_array_equal(got.max_leaf, ref.max_leaf)
    np.testing.assert_array_equal(got.max_count, ref.max_count)
    np.testing.assert_array_equal(got.size, ref.size)


def test_cluster_dispatch_device_x_path(monkeypatch):
    """cluster_dispatch routes -x through the device components when the
    backend probe reports a co-located chip, bit-exactly."""
    import humid_tpu._backend as B
    from humid_tpu.pipeline import cluster_dispatch

    rng = np.random.default_rng(47)
    n = 400
    counts, neigh = _random_graph(rng, n)
    indptr, indices = _csr(neigh)
    pa, pb = [], []
    for i, lst in enumerate(neigh):
        for j in lst:
            if j > i:
                pa.append(i)
                pb.append(j)
    pairs = (np.asarray(pa, np.int64), np.asarray(pb, np.int64))
    ref = cluster_exact(counts, indptr, indices, maximum=True)

    monkeypatch.setenv("HUMID_TPU_DEVICE_ENGINE", "1")
    B._reset_profile_for_tests()
    try:
        got = cluster_dispatch(counts, indptr, indices, maximum=True,
                               pairs=pairs, device_threshold=0)
    finally:
        B._reset_profile_for_tests()
    np.testing.assert_array_equal(got.labels, ref.labels)
    np.testing.assert_array_equal(got.max_leaf, ref.max_leaf)
    np.testing.assert_array_equal(got.size, ref.size)


def test_cluster_sharded_matches_exact():
    """Host-sharded clustering (parallel/cluster.py, VERDICT r4 #3):
    owned-component local walks + seed-rank merge equal the full-table
    exact clustering — both methods, several shard counts, including
    singleton components, empty graphs, and a 1-host degenerate."""
    from humid_tpu.cluster.exact import cluster_exact
    from humid_tpu.ops import pairs_to_csr
    from humid_tpu.parallel.cluster import (
        cluster_sharded_local, cluster_sharded_merge)

    rng = np.random.default_rng(42)
    for trial in range(6):
        u = int(rng.integers(2, 400))
        n_edges = int(rng.integers(0, 3 * u))
        if n_edges:
            a = rng.integers(0, u, n_edges)
            b = rng.integers(0, u, n_edges)
            keep = a != b
            pa = np.minimum(a, b)[keep].astype(np.int64)
            pb = np.maximum(a, b)[keep].astype(np.int64)
            from humid_tpu.ops.neighbors import _dedupe_pairs

            pa, pb = _dedupe_pairs(pa, pb)
        else:
            pa = pb = np.zeros(0, np.int64)
        counts = rng.integers(1, 50, u).astype(np.int64)
        indptr, indices = pairs_to_csr(pa, pb, u)
        for maximum in (False, True):
            ref = cluster_exact(counts, indptr, indices,
                                maximum=maximum)
            for n_hosts in (1, 2, 3, 5):
                outs = [cluster_sharded_local(
                    counts, indptr, indices, pa, pb, maximum=maximum,
                    shard=(q, n_hosts)) for q in range(n_hosts)]
                got = cluster_sharded_merge(
                    u, [[o[s] for o in outs] for s in range(5)])
                np.testing.assert_array_equal(got.labels, ref.labels)
                np.testing.assert_array_equal(got.max_leaf,
                                              ref.max_leaf)
                np.testing.assert_array_equal(got.max_count,
                                              ref.max_count)
                np.testing.assert_array_equal(got.size, ref.size)
                # Ownership is an exact partition: every node owned by
                # exactly one host.
                owned_cat = np.sort(np.concatenate(
                    [o[0] for o in outs]))
                np.testing.assert_array_equal(owned_cat, np.arange(u))


def _random_pair_graph(rng, u, e_factor=2.0, count_hi=50):
    n_edges = int(u * e_factor)
    if n_edges:
        a = rng.integers(0, u, n_edges)
        b = rng.integers(0, u, n_edges)
        keep = a != b
        pa = np.minimum(a, b)[keep].astype(np.int64)
        pb = np.maximum(a, b)[keep].astype(np.int64)
        from humid_tpu.ops.neighbors import _dedupe_pairs

        pa, pb = _dedupe_pairs(pa, pb)
    else:
        pa = pb = np.zeros(0, np.int64)
    counts = rng.integers(1, count_hi, u).astype(np.int64)
    return counts, pa, pb


def test_directional_device_matches_exact():
    """The device formulation of DIRECTIONAL clustering (SURVEY §7
    step 5, round-5 prototype): per-component rounds of masked
    hill-climbs + descent spreads equal the host walk bit-exactly —
    random graphs, TIE-HEAVY graphs (counts from {1,2,4} maximize
    ambiguous >=2x frontiers), deep doubling chains, and the
    reference's own 2-4-8-10-3 chain."""
    from humid_tpu.cluster.directional_device import (
        cluster_directional_device)
    from humid_tpu.cluster.exact import cluster_exact
    from humid_tpu.ops import pairs_to_csr

    rng = np.random.default_rng(77)

    def check(counts, pa, pb):
        indptr, indices = pairs_to_csr(pa, pb, len(counts))
        ref = cluster_exact(counts, indptr, indices, maximum=False)
        got = cluster_directional_device(counts, pa, pb)
        np.testing.assert_array_equal(got.labels, ref.labels)
        np.testing.assert_array_equal(got.max_leaf, ref.max_leaf)
        np.testing.assert_array_equal(got.max_count, ref.max_count)
        np.testing.assert_array_equal(got.size, ref.size)

    # Reference chain (tests/test_cluster.cc:73-137 semantics): counts
    # 2-4-8-10-3 in a path; splits into {2,4,8} maxLeaf=8 and {10,3}.
    counts = np.array([2, 4, 8, 10, 3], np.int64)
    pa = np.array([0, 1, 2, 3], np.int64)
    pb = np.array([1, 2, 3, 4], np.int64)
    check(counts, pa, pb)

    # Deep doubling chain: one component, many sequential clusters.
    u = 40
    counts = (1 << (np.arange(u, dtype=np.int64) % 20))
    pa = np.arange(u - 1, dtype=np.int64)
    pb = pa + 1
    check(counts, pa, pb)

    for trial in range(8):
        u = int(rng.integers(2, 500))
        counts, pa, pb = _random_pair_graph(
            rng, u, e_factor=float(rng.uniform(0, 4)))
        check(counts, pa, pb)
    # Tie-heavy: tiny count alphabet, dense-ish graphs.
    for trial in range(8):
        u = int(rng.integers(2, 400))
        counts, pa, pb = _random_pair_graph(rng, u, e_factor=3.0, count_hi=5)
        counts = np.choose(counts % 3, [1, 2, 4]).astype(np.int64)
        check(counts, pa, pb)
    # Edgeless + empty.
    check(np.array([3, 1, 2], np.int64), np.zeros(0, np.int64),
          np.zeros(0, np.int64))
    got = cluster_directional_device(np.zeros(0, np.int64),
                                     np.zeros(0, np.int64),
                                     np.zeros(0, np.int64))
    assert got.num_clusters == 0


def test_directional_device_dispatch_route(monkeypatch):
    """HUMID_TPU_CLUSTER=device routes directional clustering through
    the device formulation in cluster_dispatch."""
    from humid_tpu import pipeline as P
    from humid_tpu.cluster.exact import cluster_exact
    from humid_tpu.ops import pairs_to_csr

    rng = np.random.default_rng(79)
    counts, pa, pb = _random_pair_graph(rng, 300)
    indptr, indices = pairs_to_csr(pa, pb, len(counts))
    ref = cluster_exact(counts, indptr, indices, maximum=False)
    monkeypatch.setenv("HUMID_TPU_CLUSTER", "device")
    got = P.cluster_dispatch(counts, indptr, indices, maximum=False,
                             pairs=(pa, pb))
    np.testing.assert_array_equal(got.labels, ref.labels)
    np.testing.assert_array_equal(got.max_leaf, ref.max_leaf)


def test_directional_device_count_bound(monkeypatch):
    """Counts past the device formulation's int32 doubling range keep
    the host walk (dispatch pre-check) instead of raising mid-run."""
    from humid_tpu import pipeline as P
    from humid_tpu.cluster.directional_device import (
        cluster_directional_device)
    from humid_tpu.ops import pairs_to_csr

    counts = np.array([1 << 31, 3, 2], np.int64)
    pa = np.array([0, 1], np.int64)
    pb = np.array([1, 2], np.int64)
    indptr, indices = pairs_to_csr(pa, pb, 3)
    monkeypatch.setenv("HUMID_TPU_CLUSTER", "device")
    got = P.cluster_dispatch(counts, indptr, indices, maximum=False,
                             pairs=(pa, pb))
    ref = cluster_exact(counts, indptr, indices, maximum=False)
    np.testing.assert_array_equal(got.labels, ref.labels)
    # The module itself still guards direct callers.
    import pytest as _pytest

    with _pytest.raises(ValueError, match="doubling range"):
        cluster_directional_device(counts, pa, pb)

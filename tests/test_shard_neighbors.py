"""Host-sharded neighbour search: the union of the per-part pair lists
equals the unsharded list, per-part candidate work is ~1/P, and every
fallback decision is identical on all parts (VERDICT r2 #3).

Each part's slice is computed with find_neighbor_pairs(shard=(p, P));
the distributed driver gathers + dedupes them (multihost.merge_edge_lists)
before clustering, so these invariants are the byte-exactness keystone of
the multi-host neighbour phase.
"""

import numpy as np
import pytest

from humid_tpu import words as W
from humid_tpu.ops.neighbors import (
    LAST_DECISION,
    find_neighbor_pairs,
    _dedupe_pairs,
)
from humid_tpu.ops.unique import unique_words
from humid_tpu.parallel.multihost import merge_edge_lists


def _near_dup_uniques(rng, n, length, pool_size=None):
    """Sorted unique fingerprints from a near-duplicate read population
    (pool + single substitutions), like the pipeline would produce."""
    pool_size = pool_size or max(n // 8, 4)
    pool = rng.integers(0, 4, size=(pool_size, length)).astype(np.uint8)
    codes = pool[rng.integers(0, pool_size, n)].copy()
    muts = rng.integers(0, length, n)
    flip = rng.random(n) < 0.7
    codes[np.arange(n)[flip], muts[flip]] = rng.integers(
        0, 4, int(flip.sum()))
    uniq, _, _, _ = unique_words(W.pack_words(codes), want_inverse=False)
    return uniq


def _pairs(uniq, m, **kw):
    a, b = find_neighbor_pairs(uniq, m, word_length=24, **kw)
    return a, b


def _union(parts):
    a = np.concatenate([p[0] for p in parts])
    b = np.concatenate([p[1] for p in parts])
    if not len(a):
        return a.astype(np.int64), b.astype(np.int64)
    return _dedupe_pairs(a.astype(np.int64), b.astype(np.int64))


@pytest.mark.parametrize("strategy",
                         ["runs", "dense", "bucketed", "runs_device"])
@pytest.mark.parametrize("n_parts", [2, 3])
def test_shard_union_equals_full_hamming(strategy, n_parts):
    rng = np.random.default_rng(17 * n_parts)
    uniq = _near_dup_uniques(rng, 4000, 24)
    full = _pairs(uniq, 1, strategy=strategy)
    parts = [_pairs(uniq, 1, strategy=strategy, shard=(p, n_parts))
             for p in range(n_parts)]
    ua, ub = _union(parts)
    assert np.array_equal(ua, full[0]) and np.array_equal(ub, full[1])


@pytest.mark.parametrize("n_parts", [2, 4])
def test_shard_union_equals_full_edit(n_parts):
    rng = np.random.default_rng(5 + n_parts)
    uniq = _near_dup_uniques(rng, 1500, 24)
    full = _pairs(uniq, 1, metric="edit", strategy="runs")
    parts = [_pairs(uniq, 1, metric="edit", strategy="runs",
                    shard=(p, n_parts)) for p in range(n_parts)]
    ua, ub = _union(parts)
    assert np.array_equal(ua, full[0]) and np.array_equal(ub, full[1])


def test_shard_candidates_are_work_proportional():
    """Per-part candidate counts sum exactly to the full count (each run
    is owned by exactly one part) and no part hoards the work."""
    rng = np.random.default_rng(99)
    uniq = _near_dup_uniques(rng, 20000, 24, pool_size=2500)
    _pairs(uniq, 1, strategy="runs")
    full_cand = LAST_DECISION["candidates"]
    assert full_cand > 0
    n_parts = 4
    per_part = []
    for p in range(n_parts):
        _pairs(uniq, 1, strategy="runs", shard=(p, n_parts))
        assert LAST_DECISION["shard"] == (p, n_parts)
        per_part.append(LAST_DECISION["candidates"])
    assert sum(per_part) == full_cand
    # Salted-hash balance: no part owns more than ~2x its fair share.
    assert max(per_part) <= max(2.0 * full_cand / n_parts, 64)


def test_shard_m2_multi_partition_dupes_dedupe():
    """m=2 has three pigeonhole partitions: a pair agreeing on two
    segments can be owned by DIFFERENT parts in each — the gather-side
    dedupe must reconcile them."""
    rng = np.random.default_rng(7)
    uniq = _near_dup_uniques(rng, 2500, 24)
    full = _pairs(uniq, 2, strategy="runs")
    parts = [_pairs(uniq, 2, strategy="runs", shard=(p, 3))
             for p in range(3)]
    ua, ub = _union(parts)
    assert np.array_equal(ua, full[0]) and np.array_equal(ub, full[1])


def test_shard_degenerate_dense_fallback_is_uniform():
    """Low-entropy data whose giant runs trip the dense fallback: every
    part must take the fallback (decided pre-ownership) and the striped
    dense slices must union to the full list."""
    rng = np.random.default_rng(3)
    # m=2 -> three 8-base segments.  Segments 0 and 1 each drawn from a
    # pool of 2 values (runs of ~u/2 >> run_cap in BOTH partitions, so
    # big rows sum to ~2u > u); segment 2 random keeps words unique.
    n = 6000
    pool0 = rng.integers(0, 4, (2, 8)).astype(np.uint8)
    pool1 = rng.integers(0, 4, (2, 8)).astype(np.uint8)
    codes = np.concatenate([
        pool0[rng.integers(0, 2, n)],
        pool1[rng.integers(0, 2, n)],
        rng.integers(0, 4, (n, 8)).astype(np.uint8),
    ], axis=1)
    uniq, _, _, _ = unique_words(W.pack_words(codes), want_inverse=False)
    assert len(uniq) > 4096
    full = _pairs(uniq, 2, strategy="runs")
    strategies = []
    parts = []
    for p in range(2):
        parts.append(_pairs(uniq, 2, strategy="runs", shard=(p, 2)))
        strategies.append(LAST_DECISION["strategy"])
    assert strategies == ["dense", "dense"]
    ua, ub = _union(parts)
    assert np.array_equal(ua, full[0]) and np.array_equal(ub, full[1])


def test_shard_edit_join_cap_fallback_is_uniform():
    """A join_cap too small for the (pre-counted, shard-independent)
    join size sends EVERY part to the dense edit scan together."""
    rng = np.random.default_rng(11)
    uniq = _near_dup_uniques(rng, 800, 24, pool_size=12)
    full = _pairs(uniq, 1, metric="edit", strategy="dense")
    parts, strategies = [], []
    for p in range(2):
        parts.append(find_neighbor_pairs(
            uniq, 1, metric="edit", word_length=24, strategy="auto",
            join_cap=8, shard=(p, 2)))
        strategies.append(LAST_DECISION["strategy"])
    assert strategies == ["dense", "dense"]
    ua, ub = _union(parts)
    assert np.array_equal(ua, full[0]) and np.array_equal(ub, full[1])


def test_merge_edge_lists_dedupes_and_sorts():
    pa0 = np.array([0, 2, 5], np.int64)
    pb0 = np.array([1, 3, 7], np.int64)
    pa1 = np.array([2, 0], np.int64)
    pb1 = np.array([3, 4], np.int64)

    def fake_gather(arrs):
        data = {id(arrs[0]): [pa0, pa1], id(arrs[1]): [pb0, pb1]}
        return [data[id(a)] for a in arrs]

    a, b = merge_edge_lists(pa0, pb0, all_gather=lambda arrs: [
        [pa0, pa1], [pb0, pb1]])
    assert a.tolist() == [0, 0, 2, 5]
    assert b.tolist() == [1, 4, 3, 7]


def test_shard_single_part_is_identity():
    rng = np.random.default_rng(1)
    uniq = _near_dup_uniques(rng, 1200, 24)
    full = _pairs(uniq, 1, strategy="runs")
    one = _pairs(uniq, 1, strategy="runs", shard=(0, 1))
    assert np.array_equal(one[0], full[0])
    assert np.array_equal(one[1], full[1])

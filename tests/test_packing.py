"""Fingerprint packing: round-trip and order-preservation invariants."""

import numpy as np

from humid_tpu import words as W


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    for length in (1, 8, 16, 17, 24, 32, 33, 48, 64):
        codes = rng.integers(0, 4, size=(200, length)).astype(np.uint8)
        packed = W.pack_words(codes)
        assert packed.shape == (200, W.num_lanes(length))
        out = W.unpack_words(packed, length)
        np.testing.assert_array_equal(out, codes)


def test_pack_order_is_lexicographic():
    """Lane-tuple order must equal word lexicographic order — the invariant
    the clustering stage relies on to replicate trie-walk order."""
    rng = np.random.default_rng(1)
    for length in (5, 16, 24, 31):
        codes = rng.integers(0, 4, size=(300, length)).astype(np.uint8)
        packed = W.pack_words(codes)
        w = packed.shape[1]
        order = np.lexsort(tuple(packed[:, w - 1 - i] for i in range(w)))
        sorted_codes = [tuple(codes[i]) for i in order]
        assert sorted_codes == sorted(sorted_codes)


def test_unique_words_counts_and_first_occurrence():
    from humid_tpu.ops import unique_words
    codes = np.array(
        [[0, 1], [3, 3], [0, 1], [2, 0], [0, 1], [3, 3]], dtype=np.uint8
    )
    packed = W.pack_words(codes)
    uniq, counts, first_occ, inverse = unique_words(packed)
    got = [tuple(r) for r in W.unpack_words(uniq, 2)]
    assert got == [(0, 1), (2, 0), (3, 3)]
    assert counts.tolist() == [3, 1, 2]
    assert first_occ.tolist() == [0, 3, 1]
    assert inverse.tolist() == [0, 2, 0, 1, 0, 2]


def test_unique_packed_matches_numpy_reference():
    """The fused native path (unique_packed: key build + radix sort +
    group structure in one C call) must agree exactly with a pure-numpy
    lexsort reference on both lane widths, across the comparison-sort
    (n < kRadixMin) and radix regimes, with and without the inverse."""
    from humid_tpu.ops.unique import _unique_packed, _unique_packed_native

    if _unique_packed is None:
        import pytest

        pytest.skip("native extension not built")
    rng = np.random.default_rng(17)
    for n, w, want_inv in [
        (1, 2, True), (7, 1, True), (1000, 2, True), (1000, 1, False),
        (50_000, 2, True), (50_000, 2, False), (50_000, 1, True),
    ]:
        # Small key pool -> many duplicate groups of varying size.
        pool = rng.integers(0, 1 << (48 if w == 2 else 32),
                            size=max(1, n // 4), dtype=np.uint64)
        keys = pool[rng.integers(0, len(pool), n)]
        packed = np.empty((n, w), np.uint32)
        if w == 2:
            packed[:, 0] = (keys >> 32).astype(np.uint32)
            packed[:, 1] = keys.astype(np.uint32)
        else:
            packed[:, 0] = keys.astype(np.uint32)
        got = _unique_packed_native(packed, want_inv)
        order = np.lexsort(tuple(packed[:, w - 1 - i] for i in range(w)))
        s = packed[order]
        ng = np.empty(n, bool)
        ng[0] = True
        ng[1:] = (s[1:] != s[:-1]).any(axis=1)
        gs = np.flatnonzero(ng)
        np.testing.assert_array_equal(got[0], s[gs])
        np.testing.assert_array_equal(
            got[1], np.diff(np.append(gs, n)))
        np.testing.assert_array_equal(got[2], order[gs])
        if want_inv:
            gid = np.cumsum(ng) - 1
            inv = np.empty(n, np.int64)
            inv[order] = gid
            np.testing.assert_array_equal(got[3], inv)
        else:
            assert got[3] is None


def test_unique_words_without_inverse():
    """want_inverse=False returns identical uniq/counts/first_occ and a
    None inverse (both native and fallback paths)."""
    from humid_tpu.ops import unique_words

    rng = np.random.default_rng(8)
    packed = rng.integers(0, 50, (40_000, 2), dtype=np.int64).astype(
        np.uint32)
    u1, c1, f1, inv = unique_words(packed)
    u2, c2, f2, no_inv = unique_words(packed, want_inverse=False)
    assert no_inv is None and inv is not None
    np.testing.assert_array_equal(u1, u2)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(f1, f2)
    # wide-word fallback path
    packed3 = rng.integers(0, 3, (500, 3), dtype=np.int64).astype(np.uint32)
    u1, c1, f1, inv = unique_words(packed3)
    u2, c2, f2, no_inv = unique_words(packed3, want_inverse=False)
    assert no_inv is None
    np.testing.assert_array_equal(u1, u2)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(f1, f2)


def test_unique_words_wide_lanes_match_lexsort():
    """The 3-4 lane (word length 33-64) two-pass radix path equals the
    np.lexsort fallback exactly."""
    from humid_tpu.ops import unique as U

    rng = np.random.default_rng(21)
    for w in (3, 4):
        n = 5000
        # Few distinct values per lane -> plenty of ties across lanes,
        # exercising stability.
        packed = rng.integers(0, 7, size=(n, w)).astype(np.uint32)
        got = U.unique_words(packed)
        order = np.lexsort(tuple(packed[:, w - 1 - i] for i in range(w)))
        s = packed[order]
        new = np.empty(n, bool)
        new[0] = True
        new[1:] = (s[1:] != s[:-1]).any(axis=1)
        gs = np.flatnonzero(new)
        np.testing.assert_array_equal(got[0], s[gs])
        np.testing.assert_array_equal(
            got[1], np.diff(np.append(gs, n)).astype(np.int64))
        np.testing.assert_array_equal(got[2], order[gs].astype(np.int64))
        inv = np.empty(n, np.int64)
        inv[order] = np.cumsum(new) - 1
        np.testing.assert_array_equal(got[3], inv)


import pytest


@pytest.mark.parametrize("w", [1, 2, 3])
@pytest.mark.parametrize("want_inverse", [True, False])
def test_unique_words_device_matches_host(w, want_inverse):
    """Device unique counting (lax.sort + segment scatters) equals the
    host path exactly — incl. power-of-two padding boundaries and the
    all-ones fencepost word."""
    from humid_tpu.ops import unique_words, unique_words_device

    rng = np.random.default_rng(123 + w)
    for n in (1, 7, 100, 1000, 4097):
        packed = rng.integers(0, 5, size=(n, w)).astype(np.uint32)
        host = unique_words(packed, want_inverse=want_inverse)
        dev = unique_words_device(packed, want_inverse=want_inverse)
        for x, y in zip(host, dev):
            if x is None:
                assert y is None
            else:
                np.testing.assert_array_equal(x, y)
    # A real all-ones word must not merge with the all-ones padding.
    packed = np.full((8, w), 0xFFFFFFFF, np.uint32)
    dev = unique_words_device(packed)
    assert len(dev[1]) == 1 and dev[1][0] == 8


def test_unique_env_device_switch(monkeypatch):
    from humid_tpu.ops import unique_words

    rng = np.random.default_rng(9)
    packed = rng.integers(0, 4, size=(300, 2)).astype(np.uint32)
    host = unique_words(packed)
    monkeypatch.setenv("HUMID_TPU_UNIQUE", "device")
    dev = unique_words(packed)
    for x, y in zip(host, dev):
        np.testing.assert_array_equal(x, y)

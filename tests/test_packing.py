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

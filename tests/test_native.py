"""Native C++ extensions vs their pure-Python reference implementations."""

import numpy as np
import pytest

from humid_tpu.cluster.exact import (
    _cluster_directional_py,
    _cluster_max_py,
    cluster_exact,
)
from humid_tpu.ops.neighbors import pairs_to_csr

native_cluster = pytest.importorskip("humid_tpu.cluster._native")
native_fastqio = pytest.importorskip("humid_tpu.io._fastqio")


def _random_graph(rng, u, n_edges):
    counts = rng.integers(1, 40, u).astype(np.int64)
    a = rng.integers(0, u, n_edges)
    b = rng.integers(0, u, n_edges)
    keep = a != b
    a, b = np.minimum(a, b)[keep], np.maximum(a, b)[keep]
    pairs = np.unique(np.stack([a, b], 1), axis=0)
    indptr, indices = pairs_to_csr(pairs[:, 0], pairs[:, 1], u)
    return counts, indptr, indices


@pytest.mark.parametrize("maximum", [False, True])
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_native_cluster_matches_python(maximum, seed):
    rng = np.random.default_rng(seed)
    u = int(rng.integers(10, 400))
    counts, indptr, indices = _random_graph(rng, u, u * 3)
    ref = (_cluster_max_py if maximum else _cluster_directional_py)(
        counts, indptr, indices
    )
    got = cluster_exact(counts, indptr, indices, maximum=maximum,
                        use_native=True)
    np.testing.assert_array_equal(got.labels, ref.labels)
    np.testing.assert_array_equal(got.max_leaf, ref.max_leaf)
    np.testing.assert_array_equal(got.max_count, ref.max_count)
    np.testing.assert_array_equal(got.size, ref.size)


def test_native_cluster_empty():
    got = cluster_exact(
        np.zeros(0, np.int64), np.zeros(1, np.int64), np.zeros(0, np.int64),
        use_native=True,
    )
    assert got.num_clusters == 0


def test_native_frame_matches_numpy():
    from humid_tpu.io import reader as R

    rng = np.random.default_rng(5)
    recs = []
    for i in range(200):
        name = b"@r%d some description" % i
        seq = bytes(rng.choice(list(b"ACGTN"), rng.integers(1, 150)))
        qual = b"I" * len(seq)
        crlf = b"\r\n" if i % 7 == 0 else b"\n"
        recs.append(crlf.join([name, seq, b"+", qual]) + crlf)
    data = b"".join(recs) + b"@partial\nACGT\n"  # incomplete trailing record
    buf = np.frombuffer(data, dtype=np.uint8)

    s1, e1, c1 = native_fastqio.frame(buf)
    # numpy fallback
    orig = R._frame_native
    R._frame_native = None
    try:
        s2, e2, c2 = R._frame(buf)
    finally:
        R._frame_native = orig
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(e1, e2)
    assert c1 == c2


def test_native_frame_empty():
    s, e, c = native_fastqio.frame(np.zeros(0, np.uint8))
    assert s.shape == (0, 4) and c == 0


def test_gzip_decompress_corrupt_returns_none():
    from humid_tpu.io import _fastqio

    if not hasattr(_fastqio._cfastqio, "gzip_decompress_member"):
        pytest.skip("built without libdeflate")
    assert _fastqio.gzip_decompress(b"\x1f\x8bgarbagegarbage") is None


def test_reader_prefetch_propagates_errors(tmp_path):
    from humid_tpu.io.reader import read_tuples

    with pytest.raises(FileNotFoundError):
        for _ in read_tuples([str(tmp_path / "missing.fastq")]):
            pass


def test_reader_prefetch_early_abandon(tmp_path):
    """Abandoning iteration mid-way must not hang the worker thread."""
    import threading

    from humid_tpu.io.reader import read_tuples

    p = tmp_path / "big.fastq"
    with open(p, "wb") as f:
        for i in range(5000):
            f.write(b"@r%d\nACGT\n+\nIIII\n" % i)
    before = threading.active_count()
    it = read_tuples([str(p)], batch_records=100)
    next(it)
    it.close()
    # worker should exit promptly
    import time

    for _ in range(50):
        if threading.active_count() <= before:
            break
        time.sleep(0.1)
    assert threading.active_count() <= before


def test_concat_segments_final_segment_without_newline():
    from humid_tpu.io._fastqio import concat_segments

    src = np.frombuffer(b"HELLOWORLD", np.uint8)
    got = concat_segments(src, np.array([0, 5], np.int64),
                          np.array([5, 5], np.int64),
                          np.array([1, 0], np.uint8))
    assert bytes(got) == b"HELLO\nWORLD"


def test_native_hostops_pair_primitives():
    """Exercise the _hostops pair primitives (also under the ASan gate):
    radix argsort stability, run_pairs_hamming, merge_join_pairs
    overflow/retry, edit_filter_pairs banded DP."""
    from humid_tpu import _hostops

    rng = np.random.default_rng(9)
    # radix argsort == numpy stable argsort (with duplicate keys)
    keys = rng.integers(0, 1 << 20, 1 << 16, dtype=np.uint64)
    order = np.empty(len(keys), np.int64)
    _hostops.argsort_u64(keys, order)
    np.testing.assert_array_equal(order, np.argsort(keys, kind="stable"))

    # run_pairs_hamming on a hand-built run
    words = np.array([0b00, 0b01, 0b11, 0b00], np.uint64)
    order = np.array([0, 1, 2, 3], np.int64)
    rs = np.array([0], np.int64)
    rl = np.array([4], np.int64)
    oa = np.empty(6, np.int64)
    ob = np.empty(6, np.int64)
    n = _hostops.run_pairs_hamming(words, order, rs, rl, 1, oa, ob)
    got = sorted(zip(oa[:n], ob[:n]))
    # distances: d(0,1)=1 d(0,2)=1(2-bit=1 base) d(0,3)=0 d(1,2)=1 d(1,3)=1 d(2,3)=1
    assert got == [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]

    # merge_join_pairs: -needed on overflow, then exact pairs.  Key-5
    # block crosses A rows {0,1} x B rows {0,2}; (0,0) is the same row
    # on both sides and is skipped, leaving (0,2), (1,0), (1,2)
    # normalized to (0,1), (0,2), (1,2).
    ka = np.array([5, 5, 7], np.uint64)
    kb = np.array([5, 9, 5], np.uint64)
    oa_ = np.argsort(ka, kind="stable").astype(np.int64)
    ob_ = np.argsort(kb, kind="stable").astype(np.int64)
    tiny_a = np.empty(1, np.int64)
    tiny_b = np.empty(1, np.int64)
    n = _hostops.merge_join_pairs(ka, oa_, kb, ob_, 0, tiny_a, tiny_b)
    assert n == -3
    outa = np.empty(3, np.int64)
    outb = np.empty(3, np.int64)
    n = _hostops.merge_join_pairs(ka, oa_, kb, ob_, 0, outa, outb)
    assert n == 3
    assert sorted(zip(outa[:n], outb[:n])) == [(0, 1), (0, 2), (1, 2)]


def test_native_merge_join_self_skip_and_edit_filter():
    from humid_tpu import _hostops

    # self pairs (a == b index) are skipped; self_join emits i<j once
    ka = np.array([5, 5, 5], np.uint64)
    oa = np.argsort(ka, kind="stable").astype(np.int64)
    outa = np.empty(8, np.int64)
    outb = np.empty(8, np.int64)
    n = _hostops.merge_join_pairs(ka, oa, ka, oa, 1, outa, outb)
    assert sorted(zip(outa[:n], outb[:n])) == [(0, 1), (0, 2), (1, 2)]

    # edit_filter_pairs: shifted word within distance 1, random far pair
    codes = np.array([
        [0, 1, 2, 3, 0, 1],
        [1, 0, 1, 2, 3, 0],   # right-shift of row 0 -> edit dist 2 (del+ins)? verified below
        [0, 1, 2, 3, 0, 2],   # 1 substitution vs row 0
        [3, 3, 3, 3, 3, 3],
    ], np.uint8)
    a = np.array([0, 0, 0], np.int64)
    b = np.array([1, 2, 3], np.int64)
    oa2 = np.empty(3, np.int64)
    ob2 = np.empty(3, np.int64)
    n = _hostops.edit_filter_pairs(codes, 6, a, b, 2, oa2, ob2)
    kept = sorted(zip(oa2[:n], ob2[:n]))
    from oracle import _levenshtein
    expect = sorted(
        (int(x), int(y)) for x, y in zip(a, b)
        if _levenshtein(tuple(codes[x]), tuple(codes[y])) <= 2)
    assert kept == expect

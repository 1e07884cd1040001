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

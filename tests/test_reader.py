"""Parallel (mmap/one-shot) reader vs sequential framing equivalence."""

import gzip
import os

import numpy as np
import pytest

from humid_tpu.io.reader import FastqReader


def _records(path, workers, chunk_bytes):
    r = FastqReader(path, chunk_bytes=chunk_bytes, frame_workers=workers)
    out = []
    for b in r.batches():
        for i in range(b.n):
            out.append(b.record_bytes(i))
    return out


@pytest.mark.parametrize("chunk_bytes", [97, 1024, 1 << 15])
def test_parallel_framing_fuzz_crlf_and_ragged(tmp_path, chunk_bytes):
    """Random records (CRLF mixed in, huge + tiny reads) framed by the
    parallel chunk path must equal the sequential framing at arbitrary
    chunk sizes (records straddling many chunks included)."""
    rng = np.random.default_rng(chunk_bytes)
    recs = []
    for i in range(400):
        nl = b"\r\n" if i % 5 == 0 else b"\n"
        seq = bytes(rng.choice(list(b"ACGTN"),
                               int(rng.integers(1, 700))))
        name = b"@r%d desc" % i
        recs.append(nl.join([name, seq, b"+", b"I" * len(seq)]) + nl)
    data = b"".join(recs)
    p = tmp_path / "fuzz.fastq"
    p.write_bytes(data)
    par = _records(str(p), 3, chunk_bytes)
    seq_ = _records(str(p), 1, chunk_bytes)
    assert par == seq_
    assert len(par) == 400


def test_oneshot_gz_matches_streaming(tmp_path):
    """Small gzip files go through one-shot inflate + parallel framing;
    the records must equal the streaming path's."""
    rng = np.random.default_rng(3)
    recs = []
    for i in range(500):
        seq = bytes(rng.choice(list(b"ACGT"), int(rng.integers(5, 200))))
        recs.append(b"\n".join([b"@g%d" % i, seq, b"+",
                                b"F" * len(seq)]) + b"\n")
    p = tmp_path / "t.fastq.gz"
    with gzip.open(p, "wb") as f:
        f.write(b"".join(recs))
    par = _records(str(p), 4, 1 << 14)
    seq_ = _records(str(p), 1, 1 << 14)
    assert par == seq_
    assert len(par) == 500


def test_record_larger_than_chunk(tmp_path):
    """A single record spanning many chunks (head_end < 0 path)."""
    seq = b"A" * 5000
    rec = b"@big\n" + seq + b"\n+\n" + b"I" * 5000 + b"\n"
    small = b"@s\nACGT\n+\nIIII\n"
    p = tmp_path / "big.fastq"
    p.write_bytes(small + rec + small)
    par = _records(str(p), 3, 256)
    assert par == [small, rec, small]


@pytest.mark.parametrize("chunk_bytes", [97, 1 << 15])
def test_fused_prefix_matches_line_matrix(tmp_path, chunk_bytes):
    """FastqBatch.prefix from the fused framing-time gather equals the
    span-based seq_prefix fallback, across chunk straddles, CRLF, and
    short (padded) reads."""
    pytest.importorskip("humid_tpu.io._fastqio")
    rng = np.random.default_rng(chunk_bytes + 1)
    recs = []
    for i in range(300):
        nl = b"\r\n" if i % 7 == 0 else b"\n"
        seq = bytes(rng.choice(list(b"ACGTN"), int(rng.integers(1, 80))))
        recs.append(nl.join([b"@p%d" % i, seq, b"+",
                             b"J" * len(seq)]) + nl)
    p = tmp_path / "pref.fastq"
    p.write_bytes(b"".join(recs))
    k = 24
    for workers in (1, 3):
        r = FastqReader(str(p), chunk_bytes=chunk_bytes,
                        frame_workers=workers, prefix_k=k)
        total = 0
        for b in r.batches():
            assert b.prefix is not None and b.prefix.shape == (b.n, k)
            np.testing.assert_array_equal(
                b.prefix, b.line_matrix(1, k, fill=ord("N")))
            total += b.n
        assert total == 300


def test_simd_encode_pack_parity_hostile_bytes():
    """The SIMD encode_pack path equals the pure-python packer across
    widths (tail lanes, multi-lane) and hostile bytes (NUL, 0xFF,
    lowercase, '@')."""
    fastqio = pytest.importorskip("humid_tpu.io._fastqio")
    from humid_tpu import words as W

    rng = np.random.default_rng(11)
    alphabet = np.frombuffer(b"ACGTNacgtX\0\xff@", np.uint8)
    for L in [1, 8, 15, 16, 17, 24, 33, 48]:
        n = int(rng.integers(1, 700))
        chars = np.ascontiguousarray(
            rng.choice(alphabet, size=(n, L)))
        lanes, filt = fastqio.encode_pack(chars)
        codes, filt2 = W.build_words(None, [chars])
        np.testing.assert_array_equal(filt, filt2)
        np.testing.assert_array_equal(lanes, W.pack_words(codes))


def test_skip_to_record_offsets(tmp_path):
    """skip_to_record(k) points at record k's first byte; gz and
    too-short files return None."""
    import gzip as _gzip

    from humid_tpu.io import read_tuples, skip_to_record

    recs = [f"@r{i}\nACGTAC\n+\nIIIIII\n".encode() for i in range(37)]
    p = tmp_path / "x.fastq"
    p.write_bytes(b"".join(recs))
    raw = p.read_bytes()
    for k in (0, 1, 5, 36):
        off = skip_to_record(str(p), k)
        assert off == sum(len(r) for r in recs[:k])
        # Reading from the offset yields exactly records k..36.
        names = []
        for (b,) in read_tuples([str(p)], start_offsets=[off]):
            names += [b.line_bytes(i, 0) for i in range(b.n)]
        assert names == [f"@r{i}".encode() for i in range(k, 37)]
    assert skip_to_record(str(p), 38) is None
    g = tmp_path / "x.fastq.gz"
    g.write_bytes(_gzip.compress(raw))
    assert skip_to_record(str(g), 3) is None


def test_gzip_decompress_many_members():
    """Many-member gz (bgzip/pigz-style, or this framework's own
    batch-per-member outputs) decompresses correctly — and the reused
    output buffer keeps it linear (was quadratic in zero-fill)."""
    import gzip as _gzip

    try:
        from humid_tpu.io._fastqio import gzip_decompress
    except ImportError:
        pytest.skip("native extension not built")
    payloads = [bytes([65 + (i % 4)]) * (1000 + 37 * (i % 7))
                for i in range(300)]
    data = b"".join(_gzip.compress(p, 1) for p in payloads)
    out = gzip_decompress(data)
    if out is None:
        pytest.skip("libdeflate not built in")
    assert out == b"".join(payloads)

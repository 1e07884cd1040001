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

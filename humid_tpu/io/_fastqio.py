"""Wrapper around the native FastQ framing extension.

Raises ImportError when the extension is not built; the reader falls back
to the numpy framing path.  Build with: python setup.py build_ext --inplace
"""

from __future__ import annotations

import numpy as np

from . import _cfastqio


def gather_prefix(buf: np.ndarray, starts: np.ndarray, ends: np.ndarray,
                  out: np.ndarray, col_off: int, k: int) -> None:
    """Copy the first ``k`` bytes of each (start, end) span of ``buf`` into
    ``out[:, col_off:col_off+k]`` (row-major, C-contiguous), padding short
    spans with 'N'."""
    _cfastqio.gather_prefix(
        buf, np.ascontiguousarray(starts, np.int64),
        np.ascontiguousarray(ends, np.int64), out, out.strides[0],
        col_off, k,
    )


def encode_pack(chars: np.ndarray):
    """[N, L] ASCII -> ([N, W] uint32 big-endian 2-bit lanes,
    [N] bool filtered); mirrors humid_tpu.words.pack_words +
    the ACGT validity rule (fastq.cc:146-161)."""
    n, L = chars.shape
    w = max(1, -(-L // 16))
    lanes = np.empty((n, w), np.uint32)
    filtered = np.empty(n, np.uint8)
    _cfastqio.encode_pack(
        np.ascontiguousarray(chars), n, L, lanes, w, filtered
    )
    return lanes, filtered.astype(bool)


def concat_segments(src: np.ndarray, seg_start: np.ndarray,
                    seg_len: np.ndarray, nl_after: np.ndarray) -> np.ndarray:
    """Ragged segment concat with optional newline after each segment."""
    out_len = int(seg_len.sum()) + int(nl_after.sum())
    out = np.empty(out_len, np.uint8)
    written = _cfastqio.concat_segments(
        src, np.ascontiguousarray(seg_start, np.int64),
        np.ascontiguousarray(seg_len, np.int64),
        np.ascontiguousarray(nl_after, np.uint8), out,
    )
    assert written == out_len, (written, out_len)
    return out


def gzip_decompress(data: bytes) -> bytes | None:
    """Whole-buffer multi-member gzip decompression via libdeflate
    (~2-3x faster than zlib).  Returns None if the extension was built
    without libdeflate or the data is not clean gzip."""
    if not hasattr(_cfastqio, "gzip_decompress_member"):
        return None
    parts = []
    view = memoryview(data)
    out = None  # reused across members: a fresh 4x-remaining bytearray
    # per member would make many-member (bgzip/pigz-style, or our own
    # batch-per-member writer) files quadratic in zero-fill alone.
    while len(view):
        # ISIZE (uncompressed size mod 2^32) from the FILE trailer gives
        # the exact buffer size for single-member files — no grow-retry
        # double decompression.  It is the LAST member's size, so for a
        # later member it is only a guess — engaged when the 64MB-capped
        # default would clearly be too small (a >64MB final member then
        # skips the doubling grow-retry ladder; a wrong-member guess
        # costs at most a bounded over-allocation, and ``out`` is reused
        # across members so each high-water mark is paid once).
        isize = int.from_bytes(data[-4:], "little")
        default = max(min(4 * len(view), 64 << 20), 1 << 20)
        first = len(parts) == 0 and isize >= len(view)
        need = isize if (first or isize > default) else default
        if out is None or len(out) < need:
            out = bytearray(need)
        while True:
            try:
                consumed, written = _cfastqio.gzip_decompress_member(
                    view, out
                )
            except NotImplementedError:
                return None
            if written == -2:
                return None
            if written >= 0:
                break
            out = bytearray(len(out) * 2)
        view = view[consumed:]
        if not len(view) and not parts:
            del out[written:]
            return bytes(out)
        parts.append(bytes(out[:written]))
    return b"".join(parts)


def count_newlines(buf: np.ndarray) -> int:
    """memchr-speed newline count (for chunk phase bookkeeping)."""
    return int(_cfastqio.count_newlines(buf))


def scan_frames(buf: np.ndarray, max_records: int):
    """Single-pass framing of up to ``max_records`` complete records.
    Returns (starts [n,4] int64, ends [n,4] int64, consumed)."""
    cap = max(int(max_records), 16)
    starts = np.empty((cap, 4), dtype=np.int64)
    ends = np.empty((cap, 4), dtype=np.int64)
    n, consumed = _cfastqio.scan_frames(buf, starts, ends, cap)
    return starts[:n], ends[:n], int(consumed)


def scan_frames_prefix(buf: np.ndarray, max_records: int, k: int):
    """scan_frames fused with the sequence-prefix gather: additionally
    returns a [n, k] uint8 matrix of each record's first ``k`` sequence
    bytes, cut/padded with 'N' (fastq.cc:131-142), copied while the
    record is cache-hot."""
    cap = max(int(max_records), 16)
    starts = np.empty((cap, 4), dtype=np.int64)
    ends = np.empty((cap, 4), dtype=np.int64)
    pref = np.empty((cap, k), dtype=np.uint8)
    n, consumed = _cfastqio.scan_frames_prefix(buf, starts, ends, cap,
                                               pref, k)
    return starts[:n], ends[:n], pref[:n], int(consumed)


def frame(buf: np.ndarray):
    """Frame complete 4-line records in ``buf`` (uint8).

    Returns (starts [n,4] int64, ends [n,4] int64, consumed_bytes), with
    trailing carriage returns stripped from the span ends.
    """
    n_nl = _cfastqio.count_newlines(buf)
    n = n_nl // 4
    if n == 0:
        return (np.zeros((0, 4), np.int64), np.zeros((0, 4), np.int64), 0)
    starts = np.empty((n, 4), dtype=np.int64)
    ends = np.empty((n, 4), dtype=np.int64)
    consumed = _cfastqio.fill_frames(buf, starts, ends, n)
    return starts, ends, int(consumed)

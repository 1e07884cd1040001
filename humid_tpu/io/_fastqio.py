"""Wrapper around the native FastQ framing extension.

Raises ImportError when the extension is not built; the reader falls back
to the numpy framing path.  Build with: python setup.py build_ext --inplace
"""

from __future__ import annotations

import numpy as np

from . import _cfastqio


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

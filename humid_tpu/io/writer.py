"""FastQ output with transparent gzip compression.

The reference uses fastp's ``Writer`` which gzip-compresses when the output
name ends in ``.gz`` (humid.cc:216-217).  Records are written as canonical
4-line blocks, byte-identical to fastp's ``Read::toString()``.
"""

from __future__ import annotations

import gzip
from typing import Iterable

import numpy as np

from .reader import FastqBatch


class FastqWriter:
    def __init__(self, path: str, compression: int = 4):
        self.path = path
        if path.endswith(".gz"):
            self._f = gzip.open(path, "wb", compresslevel=compression)
        else:
            self._f = open(path, "wb")

    def write_bytes(self, data: bytes) -> None:
        self._f.write(data)

    def write_records(self, batch: FastqBatch, indices: np.ndarray) -> None:
        """Write the selected records of a batch in index order."""
        if len(indices) == 0:
            return
        parts: list[bytes] = []
        starts, ends, buf = batch.starts, batch.ends, batch.buf
        nl = b"\n"
        for i in indices:
            parts.append(buf[starts[i, 0]:ends[i, 0]].tobytes())
            parts.append(nl)
            parts.append(buf[starts[i, 1]:ends[i, 1]].tobytes())
            parts.append(nl)
            parts.append(buf[starts[i, 2]:ends[i, 2]].tobytes())
            parts.append(nl)
            parts.append(buf[starts[i, 3]:ends[i, 3]].tobytes())
            parts.append(nl)
        self._f.write(b"".join(parts))

    def write_records_annotated(
        self, batch: FastqBatch, cluster_ids: np.ndarray
    ) -> None:
        """Write ALL records, appending ``:<cluster_id>`` to every name line
        (humid.cc:280-284)."""
        parts: list[bytes] = []
        starts, ends, buf = batch.starts, batch.ends, batch.buf
        nl = b"\n"
        for i in range(batch.n):
            parts.append(buf[starts[i, 0]:ends[i, 0]].tobytes())
            parts.append(b":%d" % int(cluster_ids[i]))
            parts.append(nl)
            parts.append(buf[starts[i, 1]:ends[i, 1]].tobytes())
            parts.append(nl)
            parts.append(buf[starts[i, 2]:ends[i, 2]].tobytes())
            parts.append(nl)
            parts.append(buf[starts[i, 3]:ends[i, 3]].tobytes())
            parts.append(nl)
        self._f.write(b"".join(parts))

    def close(self) -> None:
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

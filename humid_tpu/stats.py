"""Statistics files, byte-compatible with the reference (-s flag).

Formats per humid.cc:328-357 and docs/output.rst:20-54; consumed by
MultiQC >= 1.14:

  counts.dat    histogram of exact-duplicate counts over unique words
  neigh.dat     histogram of neighbour-list sizes over unique words
  clusters.dat  histogram of cluster sizes
  stats.dat     total / usable / unique / clusters scalars

Histogram files are ``key value\\n`` lines in ascending key order (the
reference iterates std::map).
"""

from __future__ import annotations

import numpy as np

from .io.names import add_dir


def _histogram(values: np.ndarray) -> list[tuple[int, int]]:
    if values is None or len(values) == 0:
        return []
    keys, cnts = np.unique(np.asarray(values, np.int64), return_counts=True)
    return list(zip(keys.tolist(), cnts.tolist()))


def _write_hist(path: str, hist: list[tuple[int, int]]) -> None:
    with open(path, "wb") as f:
        for k, v in hist:
            f.write(f"{k} {v}\n".encode())


def write_statistics(
    *,
    counts: np.ndarray,
    degrees: np.ndarray,
    sizes: np.ndarray,
    total: int,
    usable: int,
    unique: int,
    num_clusters: int,
    dir_name: str,
) -> None:
    _write_hist(add_dir("counts.dat", dir_name), _histogram(counts))
    _write_hist(add_dir("neigh.dat", dir_name), _histogram(degrees))
    _write_hist(add_dir("clusters.dat", dir_name), _histogram(sizes))
    with open(add_dir("stats.dat", dir_name), "wb") as f:
        f.write(f"total: {total}\n".encode())
        f.write(f"usable: {usable}\n".encode())
        f.write(f"unique: {unique}\n".encode())
        f.write(f"clusters: {num_clusters}\n".encode())

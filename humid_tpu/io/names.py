"""Output file naming, mirroring the reference (fastq.cc:170-190).

``make_file_name`` inserts ``_<suffix>`` before the FIRST ``.`` of the
basename: ``forward.fastq.gz`` -> ``forward_dedup.fastq.gz``.
"""

from __future__ import annotations

import os


def add_dir(filename: str, dir_name: str) -> str:
    """dir + '/' + filename (fastq.cc:170-172)."""
    return dir_name + "/" + filename


def make_file_name(filename: str, dir_name: str, suffix: str) -> str:
    """Insert ``_<suffix>`` before the first '.' of the basename
    (fastq.cc:174-181)."""
    name = os.path.basename(filename)
    pos = name.find(".")
    if pos == -1:
        stem, ext = name, ""
    else:
        stem, ext = name[:pos], name[pos:]
    return add_dir(stem + "_" + suffix + ext, dir_name)


def make_file_names(files: list[str], dir_name: str, suffix: str) -> list[str]:
    return [make_file_name(f, dir_name, suffix) for f in files]

"""Random FastQ dataset generation for golden end-to-end tests."""

from __future__ import annotations

import gzip
import os

import numpy as np

BASES = "ACGT"


def _rand_seq(rng, n):
    return "".join(BASES[i] for i in rng.integers(0, 4, n))


def gen_dataset(
    rng: np.random.Generator,
    out_dir: str,
    *,
    n_reads: int = 300,
    n_files: int = 1,
    umi_style: str = "none",      # none | underscore | colon
    umi_len: int = 4,
    read_len: int = 30,
    ragged: bool = False,         # some short reads (padding filters them)
    n_frac: float = 0.05,         # fraction of reads containing an N
    pool_size: int = 40,          # small pool -> duplicates
    mutate_frac: float = 0.5,     # near-duplicates via 1-2 substitutions
    gz: bool = False,
    unequal_lengths: bool = False,  # one file shorter than the others
):
    """Returns (paths, files_records) where files_records[i] is a list of
    (name_line, seq) strings per file — the oracle's input format."""
    pool_seqs = [[_rand_seq(rng, read_len) for _ in range(pool_size)]
                 for _ in range(n_files)]
    pool_umis = [_rand_seq(rng, umi_len) for _ in range(pool_size)]

    files_records: list[list[tuple[str, str]]] = [[] for _ in range(n_files)]
    for r in range(n_reads):
        k = int(rng.integers(0, pool_size))
        umi = pool_umis[k]
        if rng.random() < mutate_frac and umi_len:
            u = list(umi)
            u[int(rng.integers(0, umi_len))] = BASES[int(rng.integers(0, 4))]
            umi = "".join(u)
        for f in range(n_files):
            seq = pool_seqs[f][k]
            if rng.random() < mutate_frac:
                s = list(seq)
                for _ in range(int(rng.integers(1, 3))):
                    s[int(rng.integers(0, len(s)))] = BASES[int(rng.integers(0, 4))]
                seq = "".join(s)
            if ragged and rng.random() < 0.1:
                seq = seq[: int(rng.integers(1, len(seq)))]
            if rng.random() < n_frac:
                s = list(seq)
                s[int(rng.integers(0, len(s)))] = "N"
                seq = "".join(s)
            if umi_style == "underscore" and f == 0:
                name = f"@inst:{r}:xyz_{umi}"
            elif umi_style == "colon" and f == 0:
                name = f"@inst:1:flow:2:{r}:10:20:{umi}"
            else:
                name = f"@read{r}:f{f} comment text"
            files_records[f].append((name, seq))

    if unequal_lengths and n_files > 1:
        files_records[-1] = files_records[-1][: max(n_reads - 3, 1)]

    paths = []
    for f in range(n_files):
        ext = ".fastq.gz" if gz else ".fastq"
        path = os.path.join(out_dir, f"file{f}{ext}")
        op = gzip.open if gz else open
        with op(path, "wt") as fh:
            for name, seq in files_records[f]:
                fh.write(f"{name}\n{seq}\n+\n{'F' * len(seq)}\n")
        paths.append(path)
    return paths, files_records


def parse_fastq(path: str) -> list[tuple[str, str, str, str]]:
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as fh:
        lines = [l.rstrip("\n") for l in fh]
    recs = []
    for i in range(0, len(lines) - len(lines) % 4, 4):
        recs.append((lines[i], lines[i + 1], lines[i + 2], lines[i + 3]))
    return recs

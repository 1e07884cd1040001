"""Independent oracle implementing the reference's semantics naively.

This is a deliberately slow, string-based, literal transcription of the
behaviour documented in /root/reference/src (see SURVEY.md) used ONLY to
validate the framework in golden tests.  It shares no code with
humid_tpu's production paths: words are Python strings, the neighbour
search is O(U^2) over decoded words in the literal trie-walk order, and
clustering is the recursive algorithm from cluster.cc.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass, field


# --- word extraction (fastq.cc) -------------------------------------------

def _last_field(s: str, sep: str) -> str:
    i = s.rfind(sep)
    return s[i + 1:] if i != -1 else ""


def _valid(umi: str) -> bool:
    return bool(umi) and all(c in "ACGT" for c in umi)


def oracle_extract_umi(header: str) -> str:
    sp = header.find(" ")
    prefix = header[:sp] if sp != -1 else header
    for sep in ("_", ":"):
        umi = _last_field(prefix, sep)
        if _valid(umi):
            return umi
    return ""


def _sized(s: str, size: int) -> str:
    return s[:size] if size <= len(s) else s + "N" * (size - len(s))


_NUC = {"A": 0, "C": 1, "G": 2, "T": 3}


def oracle_word(reads: list[tuple[str, str]], nt_to_take: list[int],
                header_umi_size: int) -> tuple[tuple[int, ...], bool]:
    """reads: [(name, seq)] per file.  Returns (codes, filtered)."""
    chars = []
    if header_umi_size > 0:
        umi = _sized(oracle_extract_umi(reads[0][0]), header_umi_size)
        chars.extend(umi)
    for (name, seq), k in zip(reads, nt_to_take):
        chars.extend(_sized(seq, k))
    codes = []
    filtered = False
    for c in chars:
        if c in _NUC:
            codes.append(_NUC[c])
        else:
            codes.append(2)
            filtered = True
    return tuple(codes), filtered


def oracle_nt_from_file(files: int, length: int) -> list[int]:
    div = length // files
    return [div] * (files - 1) + [div + length % files]


def oracle_pre_compute(umi_len: int, n_files: int, word_length: int):
    from_file = word_length - umi_len if word_length > umi_len else 0
    take = oracle_nt_from_file(n_files, from_file)
    return min(umi_len, word_length), take


# --- distances -------------------------------------------------------------

def _hamming(a, b) -> int:
    return sum(1 for x, y in zip(a, b) if x != y)


def _levenshtein(a, b) -> int:
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(
                prev[j - 1] + (a[i - 1] != b[j - 1]),
                prev[j] + 1,
                cur[j - 1] + 1,
            )
        prev = cur
    return prev[lb]


# --- clustering (cluster.cc, literal recursion) ----------------------------

@dataclass
class _Cluster:
    id: int
    max_count: int = 0
    max_leaf: int = -1
    size: int = 0
    visited: bool = False


@dataclass
class _Leaf:
    count: int = 0
    neighbours: list[int] = field(default_factory=list)
    cluster: _Cluster | None = None


def _assign_max(leaves, i, cluster):
    leaf = leaves[i]
    leaf.cluster = cluster
    cluster.size += leaf.count
    if leaf.count > cluster.max_count:
        cluster.max_leaf = i
        cluster.max_count = leaf.count
    for nb in leaf.neighbours:
        if leaves[nb].cluster is None:
            _assign_max(leaves, nb, cluster)


def _max_neighbour(leaves, i):
    k = 0
    while k < len(leaves[i].neighbours):
        nb = leaves[i].neighbours[k]
        k += 1
        if leaves[nb].cluster is None and leaves[nb].count >= 2 * leaves[i].count:
            i = nb
            k = 0
    return i


def _assign_directional_(leaves, i, cluster):
    leaf = leaves[i]
    leaf.cluster = cluster
    cluster.size += leaf.count
    for nb in leaf.neighbours:
        if leaves[nb].cluster is None and leaf.count >= 2 * leaves[nb].count:
            _assign_directional_(leaves, nb, cluster)


def _assign_directional(leaves, i, cluster):
    node = _max_neighbour(leaves, i)
    if leaves[node].count > cluster.max_count:
        cluster.max_leaf = node
        cluster.max_count = leaves[node].count
    _assign_directional_(leaves, node, cluster)


# --- full pipeline ----------------------------------------------------------

@dataclass
class OracleResult:
    total: int
    usable: int
    unique: int
    clusters: list[_Cluster]
    rep_tuples: list[int]          # tuple indices written by -q, in order
    cluster_of_read: list[int]     # per tuple, 0 = filtered
    counts_hist: dict
    neigh_hist: dict
    cluster_hist: dict
    words: list
    leaves: list


def oracle_run(
    files_records: list[list[tuple[str, str]]],
    word_length: int = 24,
    distance: int = 1,
    edit: bool = False,
    maximum: bool = False,
) -> OracleResult:
    """files_records: per file, list of (name_line_without_@, seq)."""
    sys.setrecursionlimit(1_000_000)
    n_files = len(files_records)
    n_tuples = min(len(f) for f in files_records)

    umi_len = (len(oracle_extract_umi(files_records[0][0][0]))
               if files_records[0] else 0)
    header_umi_size, nt_to_take = oracle_pre_compute(
        umi_len, n_files, word_length
    )

    words = []
    filtered = []
    for t in range(n_tuples):
        reads = [files_records[i][t] for i in range(n_files)]
        w, f = oracle_word(reads, nt_to_take, header_umi_size)
        words.append(w)
        filtered.append(f)

    total = n_tuples
    usable = sum(1 for f in filtered if not f)

    # trie: word -> leaf, walk order = sorted lexicographic
    uniq_words = sorted({w for w, f in zip(words, filtered) if not f})
    index = {w: i for i, w in enumerate(uniq_words)}
    leaves = [_Leaf() for _ in uniq_words]
    for w, f in zip(words, filtered):
        if not f:
            leaves[index[w]].count += 1

    dist_fn = _levenshtein if edit else _hamming
    # findHammingNeighbours (humid.cc:113-130): outer walk in lex order,
    # asymmetric search yields lexicographically larger words in lex order.
    u = len(uniq_words)
    for i in range(u):
        for j in range(i + 1, u):
            if dist_fn(uniq_words[i], uniq_words[j]) <= distance:
                leaves[i].neighbours.append(j)
                leaves[j].neighbours.append(i)

    # findClusters (humid.cc:167-193)
    clusters: list[_Cluster] = []
    next_id = 1
    for i in range(u):
        if leaves[i].cluster is None:
            c = _Cluster(next_id)
            next_id += 1
            if maximum:
                _assign_max(leaves, i, c)
            else:
                _assign_directional(leaves, i, c)
            clusters.append(c)

    # writeFiltered (humid.cc:203-241)
    rep_tuples = []
    for t in range(n_tuples):
        if filtered[t]:
            continue
        leaf = leaves[index[words[t]]]
        c = leaf.cluster
        if not c.visited and c.max_leaf == index[words[t]]:
            rep_tuples.append(t)
            c.visited = True

    # writeAnnotated (humid.cc:251-292)
    cluster_of_read = []
    for t in range(n_tuples):
        if filtered[t]:
            cluster_of_read.append(0)
        else:
            cluster_of_read.append(leaves[index[words[t]]].cluster.id)

    def hist(vals):
        h: dict[int, int] = {}
        for v in vals:
            h[v] = h.get(v, 0) + 1
        return dict(sorted(h.items()))

    return OracleResult(
        total=total,
        usable=usable,
        unique=u,
        clusters=clusters,
        rep_tuples=rep_tuples,
        cluster_of_read=cluster_of_read,
        counts_hist=hist([l.count for l in leaves]),
        neigh_hist=hist([len(l.neighbours) for l in leaves]),
        cluster_hist=hist([c.size for c in clusters]),
        words=words,
        leaves=leaves,
    )

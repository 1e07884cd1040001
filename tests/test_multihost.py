"""Multi-host merge logic, simulated in-process."""

import numpy as np

from humid_tpu import words as W
from humid_tpu.ops import unique_words
from humid_tpu.parallel.multihost import (
    combine_unique_tables,
    host_record_range,
)


def test_host_record_range_split():
    assert host_record_range(10, 0, 3) == (0, 3)
    assert host_record_range(10, 1, 3) == (3, 6)
    assert host_record_range(10, 2, 3) == (6, 10)  # remainder to last


def test_combined_tables_equal_single_host():
    """Sharded unique + merge == single-host unique over the whole input,
    including counts and global first-occurrence indices."""
    rng = np.random.default_rng(8)
    pool = rng.integers(0, 4, (20, 24)).astype(np.uint8)
    codes = pool[rng.integers(0, 20, 5000)]
    packed = W.pack_words(codes)

    ref_u, ref_c, ref_f, _ = unique_words(packed)

    n_hosts = 4
    per_host = []
    for h in range(n_hosts):
        lo, hi = host_record_range(len(packed), h, n_hosts)
        u, c, f, _ = unique_words(packed[lo:hi])
        per_host.append((u, c, f + lo))  # local -> global read indices

    uniq_g, counts_g, first_g = combine_unique_tables(
        [p[0] for p in per_host],
        [p[1] for p in per_host],
        [p[2] for p in per_host],
    )
    np.testing.assert_array_equal(uniq_g, ref_u)
    np.testing.assert_array_equal(counts_g, ref_c)
    np.testing.assert_array_equal(first_g, ref_f)


def test_combined_tables_wide_words():
    """Merge path for words wider than 2 lanes (lexsort branch)."""
    rng = np.random.default_rng(9)
    pool = rng.integers(0, 4, (10, 40)).astype(np.uint8)
    codes = pool[rng.integers(0, 10, 900)]
    packed = W.pack_words(codes)
    ref_u, ref_c, ref_f, _ = unique_words(packed)
    mid = 450
    u1, c1, f1, _ = unique_words(packed[:mid])
    u2, c2, f2, _ = unique_words(packed[mid:])
    uniq_g, counts_g, first_g = combine_unique_tables(
        [u1, u2], [c1, c2], [f1, f2 + mid]
    )
    np.testing.assert_array_equal(uniq_g, ref_u)
    np.testing.assert_array_equal(counts_g, ref_c)
    np.testing.assert_array_equal(first_g, ref_f)


def test_count_records_matches_framer(tmp_path):
    """The fast newline-scan count_records equals the framing pass,
    incl. gz, unequal lengths, and a missing trailing newline."""
    import gzip as _gzip

    from humid_tpu.io import read_tuples
    from humid_tpu.parallel.pipeline import count_records

    rec = b"@r%d\nACGTACGT\n+\nIIIIIIII\n"
    f1 = tmp_path / "a.fastq"
    f1.write_bytes(b"".join(rec % i for i in range(23)))
    # no trailing newline on the last record
    f2 = tmp_path / "b.fastq"
    f2.write_bytes(b"".join(rec % i for i in range(31))[:-1])
    f3 = tmp_path / "c.fastq.gz"
    f3.write_bytes(_gzip.compress(b"".join(rec % i for i in range(17))))

    for files in ([str(f1)], [str(f2)], [str(f3)],
                  [str(f1), str(f2)], [str(f1), str(f2), str(f3)]):
        expect = sum(b[0].n for b in read_tuples(files))
        assert count_records(files) == expect, files


def test_count_records_whitespace_tail_matches_framer(tmp_path):
    """A trailing whitespace-only segment whose newlines would complete a
    4-newline group must NOT mint a phantom record: the framer drops a
    whitespace-only leftover (reader.py), and the counter mirrors that
    (ADVICE r2).  Covers plain scan, gz scan, and the chunk-table scan."""
    import gzip as _gzip

    import humid_tpu.parallel.pipeline as pp
    from humid_tpu.io import read_tuples
    from humid_tpu.parallel.pipeline import count_records

    rec = b"@r%d\nACGTACGT\n+\nIIIIIIII\n"
    body = b"".join(rec % i for i in range(7))
    for tail in (b"\n\n\n  ", b" \n\t\n\n ", b"   ", b"\n\n\n\r"):
        f1 = tmp_path / "w.fastq"
        f1.write_bytes(body + tail)
        f2 = tmp_path / "w.fastq.gz"
        f2.write_bytes(_gzip.compress(body + tail))
        for files in ([str(f1)], [str(f2)]):
            expect = sum(b[0].n for b in read_tuples(files))
            assert count_records(files) == expect, (files, tail)
        n_tab, _ = pp._scan_plain_counts(str(f1))
        assert n_tab == expect, tail


def test_offset_from_table_matches_skip_to_record(tmp_path):
    """The count-scan chunk-table offset lookup equals skip_to_record,
    including records straddling the count-chunk size."""
    import humid_tpu.parallel.pipeline as pp
    from humid_tpu.io import skip_to_record

    rec = b"@read%05d\nACGTACGTAC\n+\nIIIIIIIIII\n"
    p = tmp_path / "t.fastq"
    p.write_bytes(b"".join(rec % i for i in range(5000)))

    old = pp._COUNT_CHUNK
    pp._COUNT_CHUNK = 4096  # force many chunks + straddling records
    try:
        n, table = pp._scan_plain_counts(str(p))
        assert n == 5000
        for k in (0, 1, 100, 117, 4999):
            assert pp._offset_from_table(str(p), k, table) == \
                skip_to_record(str(p), k), k
        assert pp._offset_from_table(str(p), 5001, table) is None
    finally:
        pp._COUNT_CHUNK = old

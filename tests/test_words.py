"""Word extraction unit tests.

Vectors transcribed from the reference suite
(/root/reference/tests/test_fastq.cc) plus vectorized-vs-scalar property
tests for the batch paths.
"""

import numpy as np
import pytest

from humid_tpu import words as W


# --- extractUMI (test_fastq.cc:9-46) ---------------------------------------

@pytest.mark.parametrize("header,expected", [
    ("header_AATT", "AATT"),
    ("Instrument:RunID:FlowCellID:Lane:Tile:X:Y:ATCG", "ATCG"),
    ("header", ""),
    ("header with spaces", ""),
    ("header_with_many_underscores and space", ""),
    ("header_ignore_lowercase_umi_aatt", ""),
    ("header space then_underscore", ""),
    ("header space then_underscore_AATT", ""),
    ("header_AATT with spaces", "AATT"),
    ("header_with_many_underscores_AATT", "AATT"),
    ("header_with_many_underscores_AATT and space", "AATT"),
    ("Instrument:RunID:FlowCellID:Lane:Tile:X:Y more stuf", ""),
    ("Instrument:RunID:FlowCellID:Lane:Tile:X:Y:ATCG more stuf", "ATCG"),
    ("Instrument:RunID:FlowCellID:Lane:Tile:X:Y:ATCG more_underscore", "ATCG"),
    # '@'-prefixed full header lines behave the same
    ("@A31886:289:T5D5W10Y2:2:12686:4678:1110_AGTA", "AGTA"),
    ("@1:::::::AGTA", "AGTA"),
])
def test_extract_umi(header, expected):
    assert W.extract_umi(header) == expected


# --- validUMI (test_fastq.cc:168-181) ---------------------------------------

@pytest.mark.parametrize("umi,ok", [
    ("", False), ("atcg", False), ("ATCGP", False), ("1234", False),
    ("ATCGN", False), ("A", True), ("ATCG", True),
])
def test_valid_umi(umi, ok):
    assert W.valid_umi(umi) is ok


# --- extractLastField (test_fastq.cc:184-195) -------------------------------

@pytest.mark.parametrize("s,sep,expected", [
    ("", ":", ""), ("nothing", ":", ""), ("empty:", ":", ""),
    ("last:field", ":", "field"), ("three:differient:fields", ":", "fields"),
])
def test_extract_last_field(s, sep, expected):
    assert W.extract_last_field(s, sep) == expected


# --- makeStringSize_ (test_fastq.cc:197-202) ---------------------------------

@pytest.mark.parametrize("s,size,expected", [
    ("AA", 0, ""), ("AA", 1, "A"), ("AA", 2, "AA"), ("AA", 3, "AAN"),
])
def test_make_string_size(s, size, expected):
    assert W.make_string_size(s, size) == expected


# --- ntFromFile (test_fastq.cc:112-155) --------------------------------------

@pytest.mark.parametrize("files,length,expected", [
    (1, 10, [10]), (3, 1, [0, 0, 1]), (3, 2, [0, 0, 2]), (3, 3, [1, 1, 1]),
    (3, 13, [4, 4, 5]), (3, 12, [4, 4, 4]), (3, 11, [3, 3, 5]),
    (3, 10, [3, 3, 4]), (3, 9, [3, 3, 3]), (3, 0, [0, 0, 0]),
])
def test_nt_from_file(files, length, expected):
    assert W.nt_from_file(files, length) == expected


# --- pre_compute (humid.cc:38-59) --------------------------------------------

def test_pre_compute_umi_shorter_than_word():
    hus, take = W.pre_compute(4, 2, 24)
    assert hus == 4 and take == [10, 10]


def test_pre_compute_umi_longer_than_word():
    hus, take = W.pre_compute(30, 2, 24)
    assert hus == 24 and take == [0, 0]


def test_pre_compute_no_umi():
    hus, take = W.pre_compute(0, 3, 23)
    assert hus == 0 and take == [7, 7, 9]


# --- makeWord / getNucleotides (test_fastq.cc:48-110) ------------------------

def _mat(rows: list[str]) -> np.ndarray:
    width = max(len(r) for r in rows)
    out = np.full((len(rows), width), ord("N"), np.uint8)
    for i, r in enumerate(rows):
        out[i, :len(r)] = np.frombuffer(r.encode(), np.uint8)
        out[i, len(r):] = ord("N")
    return out


def _seq_prefix(seqs: list[str], k: int) -> np.ndarray:
    out = np.full((len(seqs), k), ord("N"), np.uint8)
    for i, s in enumerate(seqs):
        cut = s[:k]
        out[i, :len(cut)] = np.frombuffer(cut.encode(), np.uint8)
    return out


def test_make_word_basic():
    # Read1 AAAA + read2 TTTT, take {4,4}, no UMI -> 0,0,0,0,3,3,3,3
    codes, filtered = W.build_words(
        None, [_seq_prefix(["AAAA"], 4), _seq_prefix(["TTTT"], 4)]
    )
    assert codes.tolist() == [[0, 0, 0, 0, 3, 3, 3, 3]]
    assert not filtered[0]


def test_get_nucleotides_sections():
    # headers: file1 has UMI AAAA; seqs TTTT / GGGG
    names = [b"header_AAAA"]
    seq1, seq2 = ["TTTT"], ["GGGG"]

    def chars(umi_size, take):
        umi = W.extract_umi_batch(names, umi_size) if umi_size else None
        blocks = []
        if umi is not None:
            blocks.append(umi)
        blocks.append(_seq_prefix(seq1, take[0]))
        blocks.append(_seq_prefix(seq2, take[1]))
        return b"".join(
            bytes(bytearray(row)) for row in np.concatenate(blocks, 1)
        ).decode()

    assert chars(4, [4, 4]) == "AAAATTTTGGGG"
    assert chars(6, [4, 4]) == "AAAANNTTTTGGGG"
    assert chars(4, [5, 5]) == "AAAATTTTNGGGGN"
    assert chars(3, [0, 0]) == "AAA"
    assert chars(0, [2, 2]) == "TTGG"
    assert chars(0, [1, 3]) == "TGGG"


def test_large_umi_cut():
    # test_fastq.cc:157-166: UMI AAAAAA cut to 4.
    umi = W.extract_umi_batch([b"header_AAAAAA"], 4)
    assert umi.tobytes() == b"AAAA"


def test_filtered_on_n_and_lowercase():
    codes, filtered = W.build_words(None, [_seq_prefix(["ACNT"], 4)])
    assert filtered[0]
    assert codes.tolist() == [[0, 1, 2, 3]]  # N encodes as G=2
    codes, filtered = W.build_words(None, [_seq_prefix(["acgt"], 4)])
    assert filtered[0]


def test_padding_filters_short_reads():
    # A 3-base read taking 5 nt pads with NN -> filtered (SURVEY 2.4 step 3).
    codes, filtered = W.build_words(None, [_seq_prefix(["ACG"], 5)])
    assert filtered[0]


# --- vectorized UMI extraction == scalar ------------------------------------

def test_umi_batch_matches_scalar():
    rng = np.random.default_rng(42)
    pools = [
        "header", "h_ACGT", "x:ACGT", "a_b_c_GATTACA", "@inst:1:2:ACGT",
        "read one_ACGT", "plain", "x_acgt", "y:NNNN", "z_ACGTN", "q_A",
        "_ACGT", ":TTTT", "a_ b:CCC", "@1:::::::AGTA", "s_TTTT extra:GGGG",
        "", "A", "_", ":", "a__TTTT", "x_:GG", "m:n_oo:GG pp",
    ]
    headers = [pools[i] for i in rng.integers(0, len(pools), 500)]
    for umi_size in (0, 1, 3, 4, 8):
        batch = W.extract_umi_batch([h.encode() for h in headers], umi_size)
        for row, h in zip(batch, headers):
            expected = W.make_string_size(W.extract_umi(h), umi_size)
            assert row.tobytes().decode() == expected, (h, umi_size)


def test_extract_umi_batch_interior_nul_matches_scalar():
    """Interior NUL bytes in a header must not shift the inferred string
    end (NULs are also the matrix padding): the vectorized extractor
    threads true lengths and matches the scalar oracle byte for byte."""
    names = [b"@\x00r_ACGT", b"@r2_GGTA extra", b"@x\x00y:TTTT",
             b"@plain", b"@z_AC\x00T"]
    got = W.extract_umi_batch(names, 4)
    for nm, row in zip(names, got):
        want = (W.extract_umi(nm.decode("latin1")) + "NNNN")[:4]
        assert row.tobytes().decode("latin1") == want, nm


def test_encode_pack_zero_width_words():
    """word_length 0 (-n 0): every read packs to the same empty word —
    native and numpy paths agree, nothing crashes (the SIMD encoder used
    to SIGFPE on L == 0)."""
    try:
        from humid_tpu.io._fastqio import encode_pack
    except ImportError:
        pytest.skip("native extension not built")
    chars = np.zeros((5, 0), np.uint8)
    lanes, filtered = encode_pack(chars)
    assert lanes.shape == (5, 1) and not lanes.any()
    assert not filtered.any()

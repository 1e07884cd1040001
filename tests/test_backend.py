"""Engine-selection tests: the auto strategy must route the hot phases
to the device kernels on a co-located TPU and to the host engines
elsewhere (VERDICT r2 #2), with env overrides still winning."""

import numpy as np
import pytest

import humid_tpu._backend as B
from humid_tpu import words as W
from humid_tpu.ops import find_neighbor_pairs, unique_words
from humid_tpu.ops import neighbors as nbmod


@pytest.fixture(autouse=True)
def _fresh_profile(monkeypatch):
    B._reset_profile_for_tests()
    yield
    B._reset_profile_for_tests()


def _rand_packed(n, wl=24, seed=0):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, size=(n, wl)).astype(np.uint8)
    packed = W.pack_words(codes)
    uniq, _, _, _ = unique_words(packed)
    return uniq


def test_profile_env_force(monkeypatch):
    monkeypatch.setenv("HUMID_TPU_DEVICE_ENGINE", "device")
    assert B.backend_profile(refresh=True)["colocated_device"] is True
    monkeypatch.setenv("HUMID_TPU_DEVICE_ENGINE", "host")
    assert B.backend_profile(refresh=True)["colocated_device"] is False


def test_profile_cpu_backend_is_host():
    # The test env forces the CPU backend (conftest): never co-located.
    prof = B.backend_profile(refresh=True)
    assert prof["backend"] == "cpu"
    assert prof["colocated_device"] is False
    assert prof["dispatch_s"] is None


def test_auto_picks_runs_on_host_backend():
    uniq = _rand_packed(6000)
    assert len(uniq) > 2048
    find_neighbor_pairs(uniq, 1, word_length=24, strategy="auto")
    assert nbmod.LAST_DECISION["strategy"] == "runs"


def test_auto_picks_bucketed_when_colocated(monkeypatch):
    """Same pairs, device strategy, when the probe reports co-location."""
    uniq = _rand_packed(6000, seed=1)
    assert len(uniq) > 2048
    ra, rb = find_neighbor_pairs(uniq, 1, word_length=24, strategy="runs")
    monkeypatch.setitem(
        B.__dict__, "_PROFILE",
        {"backend": "cpu", "dispatch_s": 1e-4, "colocated_device": True})
    ba, bb = find_neighbor_pairs(uniq, 1, word_length=24, strategy="auto")
    assert nbmod.LAST_DECISION["strategy"] == "bucketed"
    np.testing.assert_array_equal(ra, ba)
    np.testing.assert_array_equal(rb, bb)


def test_auto_small_input_stays_dense(monkeypatch):
    monkeypatch.setitem(
        B.__dict__, "_PROFILE",
        {"backend": "cpu", "dispatch_s": 1e-4, "colocated_device": True})
    uniq = _rand_packed(256, seed=2)
    find_neighbor_pairs(uniq, 1, word_length=24, strategy="auto")
    assert nbmod.LAST_DECISION["strategy"] == "dense"


def test_env_strategy_beats_profile(monkeypatch):
    monkeypatch.setitem(
        B.__dict__, "_PROFILE",
        {"backend": "cpu", "dispatch_s": 1e-4, "colocated_device": True})
    monkeypatch.setenv("HUMID_TPU_STRATEGY", "runs")
    uniq = _rand_packed(6000, seed=3)
    find_neighbor_pairs(uniq, 1, word_length=24, strategy="auto")
    assert nbmod.LAST_DECISION["strategy"] == "runs"


def test_unique_auto_device_when_colocated(monkeypatch):
    """unique_words folds the same co-location decision in: identical
    output through the device path above the size gate."""
    rng = np.random.default_rng(4)
    codes = rng.integers(0, 4, size=(70_000, 24)).astype(np.uint8)
    packed = W.pack_words(codes)
    # duplicate some rows so counts differ from all-ones
    packed[1::3] = packed[0::3][: len(packed[1::3])]
    host = unique_words(packed)
    monkeypatch.setitem(
        B.__dict__, "_PROFILE",
        {"backend": "cpu", "dispatch_s": 1e-4, "colocated_device": True})
    dev = unique_words(packed)
    for h, d in zip(host, dev):
        np.testing.assert_array_equal(h, d)
    monkeypatch.setenv("HUMID_TPU_UNIQUE", "host")
    forced_host = unique_words(packed)
    for h, d in zip(host, forced_host):
        np.testing.assert_array_equal(h, d)

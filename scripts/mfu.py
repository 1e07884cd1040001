"""MXU utilization (MFU) measurement for the neighbour-search kernels.

VERDICT r2 #6: put the achieved FLOP/s of the Pallas Hamming sweep and
the XLA MXU tile scan against the chip's bf16 peak, so kernel work is
judged by a roofline, not by relative claims.

FLOP accounting (the one-hot trick turns Hamming distance into a
matmul, replacing the reference's per-word fuzzy trie walk,
humid.cc:113-130):

  Pallas sweep: per tile pair in the grid, the kernel contracts
  oht_r [64w, tile] x oht_c [64w, tile] on the MXU in bm-row blocks
  -> executed FLOPs = 2 * (64*w) * tile^2 per pair (w uint32 lanes,
  16 bases/lane; phantom lanes beyond the word length L still ride the
  MXU).  Useful FLOPs = 2 * (4*L) * tile^2 (the verdict's formula —
  4L one-hot features per word).

  XLA MXU scan: data is the unpadded one-hot [N, 4L], so executed =
  useful = 2 * (4*L) * tile^2 per pair.

Arithmetic intensity is ~6 kFLOP/byte (32 KB of packed rows DMA'd per
pair vs ~1 GFLOP of matmul), so the kernels are compute-bound and MXU
utilization is the honest efficiency metric.  A pure bf16 matmul
timing on the same chip is printed as the practically-achievable peak.

Timing methodology — the tunneled backend's ``block_until_ready``
returns before the computation finishes (measured 22,650 "TFLOP/s" on
a plain matmul), so every timing here (a) forces completion by fetching
a scalar that depends on the whole computation, and (b) uses a DELTA:
the same workload at two grid lengths, per-step time = (t_big -
t_small) / (n_big - n_small), which also cancels dispatch + transfer
overhead.  Validated on a pure 8192 bf16 matmul chain: 168.7 TFLOP/s =
85.6% of the v5e's 197 TFLOP/s peak.

Usage (on the TPU host):  python scripts/mfu.py
Prints one JSON line per engine.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

# Published bf16 peak FLOP/s per chip by device kind.
PEAK_BF16 = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,  # v5e
    "TPU v5e": 197e12,
    "TPU v5p": 459e12,
    "TPU v6 lite": 918e12,  # v6e / Trillium
    "TPU v6e": 918e12,
    "TPU v5": 459e12,       # keep AFTER the longer v5* prefixes
}


def chip_peak_bf16() -> tuple[str, float | None]:
    import jax

    kind = jax.devices()[0].device_kind
    for k, v in PEAK_BF16.items():
        if kind.startswith(k):
            return kind, v
    return kind, None


def _best(fn, runs: int) -> float:
    fn()  # warmup (compile + first dispatch)
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def gen_packed(u: int, word_length: int, seed: int = 0) -> np.ndarray:
    """[u, W] uint32 random unique fingerprints (sorted), W=ceil(L/16)."""
    rng = np.random.default_rng(seed)
    w = (word_length + 15) // 16
    packed = rng.integers(
        0, 1 << 32, size=(u, w), dtype=np.uint64).astype(np.uint32)
    rem = word_length - 16 * (w - 1)
    if rem < 16:  # mask unused low bits like the production packer
        packed[:, w - 1] &= np.uint32(
            ((1 << (2 * rem)) - 1) << (32 - 2 * rem))
    view = packed.view([("", np.uint32)] * w).ravel()
    packed = np.unique(view).view(np.uint32).reshape(-1, w)
    return packed


def upper_pairs(n_tiles: int) -> np.ndarray:
    ij = [(i, j) for i in range(n_tiles) for j in range(i, n_tiles)]
    out = np.zeros((len(ij), 3), np.int32)
    out[:, :2] = ij
    out[:, 2] = 1
    return out


def measure_matmul_peak(runs: int) -> dict:
    """Pure bf16 matmul via a dependent on-device chain (delta k=1/k=9)."""
    import jax
    import jax.numpy as jnp

    n = 8192
    a = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (n, n), jnp.bfloat16)

    def timer(k):
        @jax.jit
        def g(x, y):
            def body(i, acc):
                return (acc @ y).astype(jnp.bfloat16)
            return jax.lax.fori_loop(
                0, k, body, x).astype(jnp.float32).sum()

        return _best(lambda: float(g(a, b)), runs)

    d1, d9 = timer(1), timer(9)
    per = (d9 - d1) / 8
    flops = 2.0 * n ** 3
    return {"engine": "bf16_matmul_8192", "time_per_matmul_s": round(per, 6),
            "tflops": round(flops / per / 1e12, 2)}


def _prep_pallas(packed: np.ndarray):
    from humid_tpu.ops.neighbors import _quantize_rows

    rows = packed
    if rows.shape[1] % 2:
        rows = np.concatenate(
            [rows, np.zeros((len(rows), 1), rows.dtype)], axis=1)
    rows = _quantize_rows(rows)
    n, w = rows.shape
    lanemaj = np.ascontiguousarray(rows.T.reshape(w * (n // 128), 128))
    return lanemaj, w


def measure_pallas(packed: np.ndarray, pairs: np.ndarray, *, tile: int,
                   bm: int, word_length: int, runs: int,
                   nb_pair=(256, 1024), rsel: int | None = None,
                   ksel: int | None = None) -> dict:
    import jax
    import jax.numpy as jnp

    from humid_tpu.ops.pallas_hamming import group_pairs, pallas_all_pairs

    lanemaj, w = _prep_pallas(packed)
    data = jnp.asarray(lanemaj)
    cap_total = 1 << 22

    def timer(nb):
        chunk = jnp.asarray(pairs[:nb])
        groups = jnp.asarray(group_pairs(pairs[:nb]))

        def run():
            # part_stride=part_valid=2^30: one giant all-valid partition
            # (the kernel requires part_stride % tile == 0 or >= total
            # rows; a bare 1 would trip the scalarized padding mask).
            out = pallas_all_pairs(
                data, chunk, groups, jnp.int32(1 << 30),
                jnp.int32(1 << 30), jnp.int32(1), tile=tile, bm=bm,
                cap_row=16, cap_total=cap_total, w=w, rsel=rsel,
                ksel=ksel)
            return int(jax.device_get(out[2]))  # forces completion

        return _best(run, runs)

    n1, n2 = nb_pair
    assert len(pairs) >= n2, (len(pairs), n2)
    t1, t2 = timer(n1), timer(n2)
    per = (t2 - t1) / (n2 - n1)
    executed = 2.0 * (64 * w) * tile * tile
    useful = 2.0 * (4 * word_length) * tile * tile
    return {
        "engine": "pallas_sweep", "tile": tile, "bm": bm, "w": w,
        "rsel": rsel, "ksel": ksel,
        "time_per_pair_s": round(per, 8),
        "executed_tflops": round(executed / per / 1e12, 2),
        "useful_tflops": round(useful / per / 1e12, 2),
    }


def measure_xla(packed: np.ndarray, pairs: np.ndarray, *, tile: int,
                word_length: int, runs: int, nb_pair=(256, 1024),
                rsel: int | None = None) -> dict:
    import jax
    import jax.numpy as jnp

    from humid_tpu.ops.neighbors import _all_pairs, _device_rep

    assert len(packed) % tile == 0
    data = _device_rep(packed, "hamming_mxu", word_length)
    cap_total = 1 << 22
    u = jnp.int32(len(packed))

    def timer(nb):
        chunk = jnp.asarray(pairs[:nb])

        def run():
            out = _all_pairs(
                data, chunk, u, jnp.int32(1),
                tile=tile, cap_row=16, cap_total=cap_total,
                metric="hamming_mxu", max_dist_static=1,
                word_length=word_length, rsel=rsel)
            return int(jax.device_get(out[2]))

        return _best(run, runs)

    n1, n2 = nb_pair
    t1, t2 = timer(n1), timer(n2)
    per = (t2 - t1) / (n2 - n1)
    flops = 2.0 * (4 * word_length) * tile * tile
    return {
        "engine": "xla_mxu_scan", "tile": tile, "rsel": rsel,
        "time_per_pair_s": round(per, 8),
        "executed_tflops": round(flops / per / 1e12, 2),
        "useful_tflops": round(flops / per / 1e12, 2),
    }


def measure_edit(packed: np.ndarray, *, word_length: int, max_dist: int,
                 runs: int, n_pair=(1 << 16, 1 << 18)) -> dict:
    """Device banded-Levenshtein verifier (HUMID_TPU_EDIT_VERIFY=device;
    the -e candidate filter).  VPU-bound, so the roofline metric is
    GCUPS (DP cell updates/s): cells per pair = L * (2m+1) band cells,
    each costing ~8 VPU element ops (sub cmp+add, two min+add chains,
    clamp, two boundary selects)."""
    import jax
    import jax.numpy as jnp

    from humid_tpu.ops.edit import _edit_pairs_impl

    rng = np.random.default_rng(7)
    n1, n2 = n_pair
    ia = rng.integers(0, len(packed), n2)
    ib = rng.integers(0, len(packed), n2)

    def timer(n):
        pa = jnp.asarray(packed[ia[:n]])
        pb = jnp.asarray(packed[ib[:n]])

        def run():
            mask = _edit_pairs_impl(pa, pb, word_length, int(max_dist))
            return int(np.asarray(jax.device_get(mask)).sum())

        return _best(run, runs)

    t1, t2 = timer(n1), timer(n2)
    per = (t2 - t1) / (n2 - n1)
    band = 2 * max_dist + 1
    cells = word_length * band
    return {
        "engine": "edit_verify", "word_length": word_length,
        "max_dist": max_dist,
        "time_per_pair_s": round(per, 10),
        "gcups": round(cells / per / 1e9, 2),
        "vpu_element_ops_per_s": round(8 * cells / per / 1e9, 2),
    }


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--tiles", type=int, default=64,
                   help="number of row tiles (pairs = t*(t+1)/2)")
    p.add_argument("--tile", type=int, default=2048)
    p.add_argument("--bm", type=int, default=512)
    p.add_argument("--word-length", type=int, default=24)
    p.add_argument("--runs", type=int, default=4)
    p.add_argument("--rsel", type=int, default=None,
                   help="row-selection cap for the compaction epilogue "
                        "(production default: neighbors._RSEL_START)")
    p.add_argument("--ksel", type=int, default=None,
                   help="per-row match cap for the compaction epilogue "
                        "(production default: neighbors._KSEL_START)")
    p.add_argument("--engines", default="pallas,xla,matmul")
    args = p.parse_args()

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from bench import _probe_backend

    _probe_backend()
    import jax

    kind, peak = chip_peak_bf16()
    backend = jax.default_backend()
    u = args.tiles * args.tile
    packed = gen_packed(u + u // 4, args.word_length)[:u]
    assert len(packed) == u, (len(packed), u)
    pairs = upper_pairs(args.tiles)

    for eng in args.engines.split(","):
        if eng == "matmul":
            rec = measure_matmul_peak(args.runs)
        elif eng == "pallas":
            rec = measure_pallas(
                packed, pairs, tile=args.tile, bm=args.bm,
                word_length=args.word_length, runs=args.runs,
                rsel=args.rsel, ksel=args.ksel)
        elif eng == "xla":
            rec = measure_xla(
                packed, pairs, tile=args.tile,
                word_length=args.word_length, runs=args.runs,
                rsel=args.rsel)
        elif eng == "edit":
            rec = measure_edit(
                packed, word_length=args.word_length,
                max_dist=2, runs=args.runs)
        else:
            raise SystemExit(f"unknown engine {eng!r}")
        rec["backend"] = backend
        rec["device_kind"] = kind
        key = "tflops" if "tflops" in rec else (
            "executed_tflops" if "executed_tflops" in rec else None)
        if peak is not None and key is not None:
            rec["peak_bf16_tflops"] = round(peak / 1e12, 1)
            rec["mfu"] = round(rec[key] * 1e12 / peak, 4)
        print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    sys.exit(main())

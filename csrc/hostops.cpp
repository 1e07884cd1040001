// Parallel host primitives for humid_tpu (module humid_tpu._hostops).
//
// argsort_u64: stable parallel argsort of uint64 keys (gnu parallel mode
// + OpenMP).  Replaces numpy's single-threaded argsort on the unique-
// counting path (humid_tpu/ops/unique.py), which dominates host time at
// WGS scale (sorting 1e8 fingerprints).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <utility>

#include <cstdlib>
#include <cstring>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#include <parallel/algorithm>
#define SORT __gnu_parallel::stable_sort
#else
#define SORT std::stable_sort
#endif

namespace {

// Stable parallel LSD radix argsort of uint64 keys (8-bit digits).
// Passes whose digit is constant across all keys are skipped, so
// sorting K-bit keys costs ceil(K/8) passes (e.g. 3 for 24-bit segment
// keys, 6 for 48-bit packed words).  Each pass: per-thread-chunk
// histograms, digit-major exclusive prefix (which preserves stability),
// parallel scatter.  ~5-10x faster than comparison stable_sort at
// n >= 1e6 on a few cores.
// Grow-only scratch reused across calls (first-touch page zeroing of
// multi-GB buffers costs seconds at WGS scale).  thread_local: the runs
// strategy sorts partitions from concurrent Python threads.
// Non-zeroing grow-only buffer: malloc'd, so fresh pages are first
// touched by the parallel fill loops (std::vector::resize would zero
// them serially first — seconds of wasted memset at WGS scale, paid
// again by every fresh pool thread since the arenas are thread_local).
struct RawArena {
  void* p = nullptr;
  size_t cap = 0;
  ~RawArena() { std::free(p); }
  void* ensure(size_t bytes) {
    if (cap < bytes) {
      std::free(p);
      p = std::malloc(bytes);
      cap = p ? bytes : 0;
    }
    return p;
  }
};

// Parallel LSD radix passes over (keys, payload) with empty-digit pass
// skipping — the SINGLE definition shared by radix_argsort_u64 (int64
// payload) and unique_packed (uint32 payload), so histogram/prefix/
// scatter fixes land in both.  Ping-pongs the src/dst pointers; the
// sorted data ends in *ksrc/*isrc.  Stability: digit-major exclusive
// prefix over (digit, thread) keeps earlier input chunks first within a
// digit, and each pass is a stable scatter.  Chunk index loops (not
// omp_get_thread_num chunking): correct even if the runtime delivers a
// team smaller than nt.
template <typename Idx>
void radix_passes_u64(uint64_t*& ksrc, uint64_t*& kdst, Idx*& isrc,
                      Idx*& idst, Py_ssize_t n, int nt, Py_ssize_t chunk,
                      uint64_t orall, uint64_t andall) {
  std::vector<int64_t> hist(static_cast<size_t>(nt) * 256);
  for (int p = 0; p < 8; ++p) {
    const int shift = 8 * p;
    if (((orall >> shift) & 0xff) == ((andall >> shift) & 0xff)) continue;
    // Local pointer copies: the by-reference parameters would force the
    // compiler to reload ksrc/kdst on every store inside the hot loops
    // (a store through kdst may alias the reference itself) — measured
    // ~1.7x slower at 100M rows when the loops read the references.
    uint64_t* const ks = ksrc;
    uint64_t* const kd = kdst;
    Idx* const is = isrc;
    Idx* const id = idst;
#if defined(_OPENMP)
#pragma omp parallel for schedule(static, 1)
#endif
    for (int t = 0; t < nt; ++t) {
      const Py_ssize_t lo = t * chunk;
      const Py_ssize_t hi = std::min(n, lo + chunk);
      int64_t* h = &hist[static_cast<size_t>(t) * 256];
      std::memset(h, 0, 256 * sizeof(int64_t));
      for (Py_ssize_t i = lo; i < hi; ++i) {
        ++h[(ks[i] >> shift) & 0xff];
      }
    }
    int64_t run = 0;
    for (int d = 0; d < 256; ++d) {
      for (int t = 0; t < nt; ++t) {
        int64_t& slot = hist[static_cast<size_t>(t) * 256 + d];
        const int64_t c = slot;
        slot = run;
        run += c;
      }
    }
#if defined(_OPENMP)
#pragma omp parallel for schedule(static, 1)
#endif
    for (int t = 0; t < nt; ++t) {
      const Py_ssize_t lo = t * chunk;
      const Py_ssize_t hi = std::min(n, lo + chunk);
      int64_t* h = &hist[static_cast<size_t>(t) * 256];
      for (Py_ssize_t i = lo; i < hi; ++i) {
        const int64_t pos = h[(ks[i] >> shift) & 0xff]++;
        kd[pos] = ks[i];
        id[pos] = is[i];
      }
    }
    std::swap(ksrc, kdst);
    std::swap(isrc, idst);
  }
}

// Returns false if scratch allocation failed (caller raises MemoryError).
bool radix_argsort_u64(const uint64_t* keys, int64_t* order, Py_ssize_t n,
                       uint64_t* sorted_keys = nullptr) {
  thread_local RawArena a_k0, a_k1, a_i0, a_i1;
  uint64_t* kbuf0 = static_cast<uint64_t*>(a_k0.ensure(n * 8));
  uint64_t* kbuf1 = static_cast<uint64_t*>(a_k1.ensure(n * 8));
  int64_t* ibuf0 = static_cast<int64_t*>(a_i0.ensure(n * 8));
  int64_t* ibuf1 = static_cast<int64_t*>(a_i1.ensure(n * 8));
  if (n > 0 && (!kbuf0 || !kbuf1 || !ibuf0 || !ibuf1)) return false;
  uint64_t orall = 0, andall = ~0ull;
#if defined(_OPENMP)
#pragma omp parallel for reduction(|:orall) reduction(&:andall)
#endif
  for (Py_ssize_t i = 0; i < n; ++i) {
    kbuf0[i] = keys[i];
    ibuf0[i] = i;
    orall |= keys[i];
    andall &= keys[i];
  }
  int nt = 1;
#if defined(_OPENMP)
  nt = omp_get_max_threads();
#endif
  const Py_ssize_t chunk = (n + nt - 1) / nt;
  uint64_t* ksrc = kbuf0;
  uint64_t* kdst = kbuf1;
  int64_t* isrc = ibuf0;
  int64_t* idst = ibuf1;
  radix_passes_u64(ksrc, kdst, isrc, idst, n, nt, chunk, orall, andall);
  std::memcpy(order, isrc, static_cast<size_t>(n) * sizeof(int64_t));
  if (sorted_keys) {
    std::memcpy(sorted_keys, ksrc,
                static_cast<size_t>(n) * sizeof(uint64_t));
  }
  return true;
}

constexpr Py_ssize_t kRadixMin = 1 << 15;

PyObject* argsort_u64(PyObject* /*self*/, PyObject* args) {
  Py_buffer keys_b, order_b;
  if (!PyArg_ParseTuple(args, "y*w*", &keys_b, &order_b)) return nullptr;
  const Py_ssize_t n = keys_b.len / 8;
  bool ok = order_b.len / 8 >= n;
  bool oom = false;
  if (ok) {
    const uint64_t* keys = static_cast<const uint64_t*>(keys_b.buf);
    int64_t* order = static_cast<int64_t*>(order_b.buf);
    Py_BEGIN_ALLOW_THREADS;
    if (n >= kRadixMin) {
      oom = !radix_argsort_u64(keys, order, n);
    } else {
      for (Py_ssize_t i = 0; i < n; ++i) order[i] = i;
      SORT(order, order + n, [keys](int64_t a, int64_t b) {
        return keys[a] < keys[b];
      });
    }
    Py_END_ALLOW_THREADS;
  }
  PyBuffer_Release(&keys_b);
  PyBuffer_Release(&order_b);
  if (!ok) {
    PyErr_SetString(PyExc_ValueError, "argsort_u64: bad buffer sizes");
    return nullptr;
  }
  if (oom) return PyErr_NoMemory();
  Py_RETURN_NONE;
}

// Fused unique-counting over uint64 keys: stable parallel argsort, then
// one pass emitting group structure.  Buffers (caller-allocated, int64
// except noted):
//   order[n]      sorted permutation (stable)
//   group_start[n] (first k entries used) index into `order` of each
//                  group's first element
//   counts[n]      (first k) group sizes
//   first_occ[n]   (first k) smallest ORIGINAL index in the group
//                  (== first occurrence, since the sort is stable)
//   inverse[n]     original index -> group id
// Returns k (number of distinct keys).
PyObject* unique_u64(PyObject* /*self*/, PyObject* args) {
  Py_buffer keys_b, order_b, gs_b, cnt_b, fo_b, inv_b;
  long want_inv = 1;
  if (!PyArg_ParseTuple(args, "y*w*w*w*w*w*|l", &keys_b, &order_b, &gs_b,
                        &cnt_b, &fo_b, &inv_b, &want_inv)) {
    return nullptr;
  }
  const Py_ssize_t n = keys_b.len / 8;
  bool ok = order_b.len / 8 >= n && gs_b.len / 8 >= n &&
            cnt_b.len / 8 >= n && fo_b.len / 8 >= n &&
            (!want_inv || inv_b.len / 8 >= n);
  Py_ssize_t k = 0;
  bool oom = false;
  if (ok && n > 0) {
    const uint64_t* keys = static_cast<const uint64_t*>(keys_b.buf);
    int64_t* order = static_cast<int64_t*>(order_b.buf);
    int64_t* gs = static_cast<int64_t*>(gs_b.buf);
    int64_t* cnt = static_cast<int64_t*>(cnt_b.buf);
    int64_t* fo = static_cast<int64_t*>(fo_b.buf);
    int64_t* inv = static_cast<int64_t*>(inv_b.buf);
    Py_BEGIN_ALLOW_THREADS;
    if (n >= kRadixMin) {
      // Radix sort exporting the sorted keys, then a fully parallel
      // group-structure pass: per-block group counts -> block prefix ->
      // per-block emit (the sequential loop dominated unique time at
      // 30M+ keys).
      thread_local RawArena skeys_arena;
      uint64_t* skeys = static_cast<uint64_t*>(skeys_arena.ensure(n * 8));
      oom = !skeys || !radix_argsort_u64(keys, order, n, skeys);
      int nt = 1;
#if defined(_OPENMP)
      nt = omp_get_max_threads();
#endif
      if (oom) nt = 0;  // skip the group passes below
      const Py_ssize_t chunk = (n + std::max(nt, 1) - 1) / std::max(nt, 1);
      std::vector<int64_t> block_groups(std::max(nt, 1), 0);
#if defined(_OPENMP)
#pragma omp parallel for schedule(static, 1)
#endif
      for (int t = 0; t < nt; ++t) {
        const Py_ssize_t lo = t * chunk;
        const Py_ssize_t hi = std::min(n, lo + chunk);
        int64_t local = 0;
        for (Py_ssize_t i = lo; i < hi; ++i) {
          local += (i == 0) || (skeys[i] != skeys[i - 1]);
        }
        block_groups[t] = local;
      }
      std::vector<int64_t> block_off(std::max(nt, 1) + 1, 0);
      for (int t = 0; t < nt; ++t) {
        block_off[t + 1] = block_off[t] + block_groups[t];
      }
      k = block_off[std::max(nt, 0)];
#if defined(_OPENMP)
#pragma omp parallel for schedule(static, 1)
#endif
      for (int t = 0; t < nt; ++t) {
        const Py_ssize_t lo = t * chunk;
        const Py_ssize_t hi = std::min(n, lo + chunk);
        int64_t g = block_off[t];
        if (want_inv) {
          for (Py_ssize_t i = lo; i < hi; ++i) {
            if ((i == 0) || (skeys[i] != skeys[i - 1])) {
              gs[g] = i;
              fo[g] = order[i];  // stable sort: group start == first occ
              ++g;
            }
            inv[order[i]] = g - 1;
          }
        } else {
          for (Py_ssize_t i = lo; i < hi; ++i) {
            if ((i == 0) || (skeys[i] != skeys[i - 1])) {
              gs[g] = i;
              fo[g] = order[i];
              ++g;
            }
          }
        }
      }
#if defined(_OPENMP)
#pragma omp parallel for
#endif
      for (Py_ssize_t g = 0; g < k; ++g) {
        cnt[g] = (g + 1 < k ? gs[g + 1] : n) - gs[g];
      }
    } else {
      for (Py_ssize_t i = 0; i < n; ++i) order[i] = i;
      SORT(order, order + n, [keys](int64_t a, int64_t b) {
        return keys[a] < keys[b];
      });
      uint64_t prev = keys[order[0]];
      gs[0] = 0;
      fo[0] = order[0];
      if (want_inv) inv[order[0]] = 0;
      k = 1;
      for (Py_ssize_t i = 1; i < n; ++i) {
        const int64_t oi = order[i];
        const uint64_t key = keys[oi];
        if (key != prev) {
          cnt[k - 1] = i - gs[k - 1];
          gs[k] = i;
          fo[k] = oi;  // stable sort: first in group == first occurrence
          prev = key;
          ++k;
        }
        if (want_inv) inv[oi] = k - 1;
      }
      cnt[k - 1] = n - gs[k - 1];
    }
    Py_END_ALLOW_THREADS;
  }
  PyBuffer_Release(&keys_b);
  PyBuffer_Release(&order_b);
  PyBuffer_Release(&gs_b);
  PyBuffer_Release(&cnt_b);
  PyBuffer_Release(&fo_b);
  PyBuffer_Release(&inv_b);
  if (!ok) {
    PyErr_SetString(PyExc_ValueError, "unique_u64: bad buffer sizes");
    return nullptr;
  }
  if (oom) return PyErr_NoMemory();
  return PyLong_FromLongLong(static_cast<long long>(k));
}

// Fully fused unique counting over packed word lanes: builds the uint64
// sort key from the uint32 lanes in C (no numpy temporaries), stable
// LSD radix argsort with uint32 payload indices, then the group pass
// emits compact outputs directly — unique lanes, counts, first
// occurrences, and optionally the row->group inverse.  All n-sized
// scratch lives in non-zeroing arenas whose pages are first touched by
// parallel loops; outputs are caller-allocated np.empty buffers of
// which only ~k entries are written (np.empty does not fault pages, so
// oversizing them is free).  Replaces trie leaf counting
// (humid.cc:92-99) on the single-host hot path.
//
//   unique_packed(packed u32[n*w], w, uniq u32[n*w], counts i64[n],
//                 first_occ i64[n], inverse i64[n or 1], want_inv) -> k
PyObject* unique_packed(PyObject* /*self*/, PyObject* args) {
  Py_buffer packed_b, uniq_b, cnt_b, fo_b, inv_b;
  long w_l = 0, want_inv = 0;
  if (!PyArg_ParseTuple(args, "y*lw*w*w*w*l", &packed_b, &w_l, &uniq_b,
                        &cnt_b, &fo_b, &inv_b, &want_inv)) {
    return nullptr;
  }
  const int w = static_cast<int>(w_l);
  const Py_ssize_t n = (w > 0) ? packed_b.len / (4 * w) : 0;
  bool ok = (w == 1 || w == 2) && n <= INT32_MAX &&
            uniq_b.len >= packed_b.len && cnt_b.len / 8 >= n &&
            fo_b.len / 8 >= n && (!want_inv || inv_b.len / 8 >= n);
  Py_ssize_t k = 0;
  bool oom = false;
  if (ok && n > 0) {
    const uint32_t* packed = static_cast<const uint32_t*>(packed_b.buf);
    uint32_t* uniq = static_cast<uint32_t*>(uniq_b.buf);
    int64_t* cnt = static_cast<int64_t*>(cnt_b.buf);
    int64_t* fo = static_cast<int64_t*>(fo_b.buf);
    int64_t* inv = static_cast<int64_t*>(inv_b.buf);
    Py_BEGIN_ALLOW_THREADS;
    thread_local RawArena a_k0, a_k1, a_i0, a_i1;
    uint64_t* k0 = static_cast<uint64_t*>(a_k0.ensure(n * 8));
    uint64_t* k1 = static_cast<uint64_t*>(a_k1.ensure(n * 8));
    uint32_t* i0 = static_cast<uint32_t*>(a_i0.ensure(n * 4));
    uint32_t* i1 = static_cast<uint32_t*>(a_i1.ensure(n * 4));
    oom = !k0 || !k1 || !i0 || !i1;
    int nt = 1;
#if defined(_OPENMP)
    nt = omp_get_max_threads();
#endif
    const Py_ssize_t chunk = (n + nt - 1) / nt;
    if (!oom) {
    // Fused key build + parallel first touch of the arenas.
    uint64_t orall = 0, andall = ~0ull;
#if defined(_OPENMP)
#pragma omp parallel for reduction(|:orall) reduction(&:andall) \
    schedule(static)
#endif
    for (Py_ssize_t i = 0; i < n; ++i) {
      const uint64_t key =
          (w == 2) ? (static_cast<uint64_t>(packed[2 * i]) << 32) |
                         packed[2 * i + 1]
                   : packed[i];
      k0[i] = key;
      i0[i] = static_cast<uint32_t>(i);
      orall |= key;
      andall &= key;
    }
    uint64_t* ksrc = k0;
    uint64_t* kdst = k1;
    uint32_t* isrc = i0;
    uint32_t* idst = i1;
    if (n >= kRadixMin) {
      radix_passes_u64(ksrc, kdst, isrc, idst, n, nt, chunk, orall,
                       andall);
    } else {
      // Small inputs: stable comparison sort of the index payload.
      std::stable_sort(isrc, isrc + n, [ksrc](uint32_t a, uint32_t b) {
        return ksrc[a] < ksrc[b];
      });
      for (Py_ssize_t i = 0; i < n; ++i) kdst[i] = ksrc[isrc[i]];
      std::swap(ksrc, kdst);
    }
    // Parallel group structure: per-block boundary counts -> prefix ->
    // per-block compact emit.
    std::vector<int64_t> block_off(nt + 1, 0);
#if defined(_OPENMP)
#pragma omp parallel for schedule(static, 1)
#endif
    for (int t = 0; t < nt; ++t) {
      const Py_ssize_t lo = t * chunk;
      const Py_ssize_t hi = std::min(n, lo + chunk);
      int64_t local = 0;
      for (Py_ssize_t i = lo; i < hi; ++i) {
        local += (i == 0) || (ksrc[i] != ksrc[i - 1]);
      }
      block_off[t + 1] = local;
    }
    for (int t = 0; t < nt; ++t) block_off[t + 1] += block_off[t];
    k = block_off[nt];
    thread_local RawArena a_gs;
    int64_t* gs = static_cast<int64_t*>(a_gs.ensure(k * 8));
    if (!gs) {
      oom = true;
      k = 0;
    }
    const int nte = oom ? 0 : nt;  // skip emit passes on alloc failure
#if defined(_OPENMP)
#pragma omp parallel for schedule(static, 1)
#endif
    for (int t = 0; t < nte; ++t) {
      const Py_ssize_t lo = t * chunk;
      const Py_ssize_t hi = std::min(n, lo + chunk);
      int64_t g = block_off[t];
      if (want_inv) {
        for (Py_ssize_t i = lo; i < hi; ++i) {
          if ((i == 0) || (ksrc[i] != ksrc[i - 1])) {
            gs[g] = i;
            fo[g] = isrc[i];  // stable sort: group start == first occ
            ++g;
          }
          inv[isrc[i]] = g - 1;
        }
      } else {
        for (Py_ssize_t i = lo; i < hi; ++i) {
          if ((i == 0) || (ksrc[i] != ksrc[i - 1])) {
            gs[g] = i;
            fo[g] = isrc[i];
            ++g;
          }
        }
      }
    }
#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
    for (Py_ssize_t g = 0; g < k; ++g) {
      cnt[g] = (g + 1 < k ? gs[g + 1] : n) - gs[g];
      const uint64_t key = ksrc[gs[g]];
      if (w == 2) {
        uniq[2 * g] = static_cast<uint32_t>(key >> 32);
        uniq[2 * g + 1] = static_cast<uint32_t>(key);
      } else {
        uniq[g] = static_cast<uint32_t>(key);
      }
    }
    }  // if (!oom)
    Py_END_ALLOW_THREADS;
  }
  PyBuffer_Release(&packed_b);
  PyBuffer_Release(&uniq_b);
  PyBuffer_Release(&cnt_b);
  PyBuffer_Release(&fo_b);
  PyBuffer_Release(&inv_b);
  if (!ok) {
    PyErr_SetString(PyExc_ValueError, "unique_packed: bad arguments");
    return nullptr;
  }
  if (oom) return PyErr_NoMemory();
  return PyLong_FromLongLong(static_cast<long long>(k));
}

// Fused k-way merge + group structure over pre-sorted (key, idx) runs —
// the tail step of the overlapped unique-counting path: pass 1 sorts
// bounded runs on the packing pool while I/O streams, and this merge
// (visible time ~ one pass over the data instead of a full radix sort)
// produces the global unique table.
//
// Inputs: keys/idx concatenated in run order (each run ascending by
// key), run_offsets [C+1].  Outputs (caller-allocated): ukeys [<=n],
// counts [<=n], first_occ [<=n] (MIN idx per key — no stability
// requirement), and optionally inverse scatter inv[idx[j]] = group id
// (inv sized to max idx + 1, prefilled by the caller).  Returns k.
//
// Parallel: sampled splitter keys partition the key space into one
// range per thread; runs are subdivided by binary search, each thread
// merges its ranges with a small heap into thread-local buffers, and a
// prefix over per-thread group counts places them in the output.
PyObject* merge_unique_runs(PyObject* /*self*/, PyObject* args) {
  Py_buffer keys_b, idx_b, off_b, uk_b, cnt_b, fo_b, inv_b;
  long want_inv;
  if (!PyArg_ParseTuple(args, "y*y*y*w*w*w*lw*", &keys_b, &idx_b, &off_b,
                        &uk_b, &cnt_b, &fo_b, &want_inv, &inv_b)) {
    return nullptr;
  }
  const uint64_t* keys = static_cast<const uint64_t*>(keys_b.buf);
  const int64_t* idx = static_cast<const int64_t*>(idx_b.buf);
  const int64_t* off = static_cast<const int64_t*>(off_b.buf);
  uint64_t* ukeys = static_cast<uint64_t*>(uk_b.buf);
  int64_t* cnt = static_cast<int64_t*>(cnt_b.buf);
  int64_t* fo = static_cast<int64_t*>(fo_b.buf);
  int64_t* inv = static_cast<int64_t*>(inv_b.buf);
  const Py_ssize_t nruns = off_b.len / 8 - 1;
  const Py_ssize_t n = keys_b.len / 8;
  // Validate like the sibling entry points: k <= n unique outputs, runs
  // within [0, n] and nondecreasing, idx in range of the inv scatter.
  bool ok = idx_b.len / 8 >= n && uk_b.len / 8 >= n &&
            cnt_b.len / 8 >= n && fo_b.len / 8 >= n;
  if (ok && nruns > 0) {
    ok = off[0] >= 0 && off[nruns] <= n;
    for (Py_ssize_t r = 0; ok && r < nruns; ++r) {
      ok = off[r] <= off[r + 1];
    }
  }
  if (ok && want_inv && n > 0) {
    const Py_ssize_t inv_cap = inv_b.len / 8;
    bool in_range = true;
#if defined(_OPENMP)
#pragma omp parallel for reduction(&&:in_range) schedule(static)
#endif
    for (Py_ssize_t j = 0; j < n; ++j) {
      in_range = in_range && idx[j] >= 0 && idx[j] < inv_cap;
    }
    ok = in_range;
  }
  Py_ssize_t k_total = 0;
  if (ok && n > 0 && nruns > 0) {
    Py_BEGIN_ALLOW_THREADS;
    int nt = 1;
#if defined(_OPENMP)
    nt = omp_get_max_threads();
#endif
    // Splitters: sample keys, sort the sample, take nt-1 quantiles.
    std::vector<uint64_t> sample;
    const Py_ssize_t stride = std::max<Py_ssize_t>(1, n / 4096);
    for (Py_ssize_t i = 0; i < n; i += stride) sample.push_back(keys[i]);
    std::sort(sample.begin(), sample.end());
    std::vector<uint64_t> split(nt - 1);
    for (int t = 0; t + 1 < nt; ++t) {
      split[t] = sample[(t + 1) * sample.size() / nt];
    }
    // Range boundaries per (thread, run): elements with key < split[t]
    // belong to threads <= t, so groups never span threads.
    std::vector<Py_ssize_t> bounds(
        static_cast<size_t>(nt + 1) * nruns);
    for (Py_ssize_t r = 0; r < nruns; ++r) {
      bounds[r] = off[r];
      bounds[static_cast<size_t>(nt) * nruns + r] = off[r + 1];
    }
    for (int t = 0; t + 1 < nt; ++t) {
      for (Py_ssize_t r = 0; r < nruns; ++r) {
        const uint64_t* lo = keys + off[r];
        const uint64_t* hi = keys + off[r + 1];
        bounds[static_cast<size_t>(t + 1) * nruns + r] =
            std::lower_bound(lo, hi, split[t]) - keys;
      }
    }
    struct ThreadOut {
      std::vector<uint64_t> uk;
      std::vector<int64_t> cnt, fo;
    };
    std::vector<ThreadOut> touts(nt);
#if defined(_OPENMP)
#pragma omp parallel for schedule(static, 1)
#endif
    for (int t = 0; t < nt; ++t) {
      ThreadOut& out = touts[t];
      // Heap of (key, run) over this thread's subranges.
      std::vector<Py_ssize_t> pos(nruns), end(nruns);
      Py_ssize_t total = 0;
      for (Py_ssize_t r = 0; r < nruns; ++r) {
        pos[r] = bounds[static_cast<size_t>(t) * nruns + r];
        end[r] = bounds[static_cast<size_t>(t + 1) * nruns + r];
        total += end[r] - pos[r];
      }
      out.uk.reserve(total);
      out.cnt.reserve(total);
      out.fo.reserve(total);
      using HK = std::pair<uint64_t, Py_ssize_t>;  // (key, run)
      std::vector<HK> heap;
      auto cmp = [](const HK& a, const HK& b) { return a.first > b.first; };
      for (Py_ssize_t r = 0; r < nruns; ++r) {
        if (pos[r] < end[r]) heap.push_back({keys[pos[r]], r});
      }
      std::make_heap(heap.begin(), heap.end(), cmp);
      bool have = false;
      uint64_t cur = 0;
      int64_t ccount = 0, cmin = 0;
      while (!heap.empty()) {
        std::pop_heap(heap.begin(), heap.end(), cmp);
        const Py_ssize_t r = heap.back().second;
        heap.pop_back();
        const Py_ssize_t p = pos[r];
        const uint64_t key = keys[p];
        const int64_t id = idx[p];
        if (have && key == cur) {
          ++ccount;
          if (id < cmin) cmin = id;
        } else {
          if (have) {
            out.uk.push_back(cur);
            out.cnt.push_back(ccount);
            out.fo.push_back(cmin);
          }
          have = true;
          cur = key;
          ccount = 1;
          cmin = id;
        }
        if (want_inv) {
          inv[id] = static_cast<int64_t>(out.uk.size());  // group id,
          // offset by this thread's base later
        }
        if (++pos[r] < end[r]) {
          heap.push_back({keys[pos[r]], r});
          std::push_heap(heap.begin(), heap.end(), cmp);
        }
      }
      if (have) {
        out.uk.push_back(cur);
        out.cnt.push_back(ccount);
        out.fo.push_back(cmin);
      }
    }
    // Compact thread outputs (ascending thread id == ascending keys).
    std::vector<Py_ssize_t> base(nt + 1, 0);
    for (int t = 0; t < nt; ++t) {
      base[t + 1] = base[t] +
          static_cast<Py_ssize_t>(touts[t].uk.size());
    }
    k_total = base[nt];
#if defined(_OPENMP)
#pragma omp parallel for schedule(static, 1)
#endif
    for (int t = 0; t < nt; ++t) {
      const ThreadOut& out = touts[t];
      std::memcpy(ukeys + base[t], out.uk.data(),
                  out.uk.size() * sizeof(uint64_t));
      std::memcpy(cnt + base[t], out.cnt.data(),
                  out.cnt.size() * sizeof(int64_t));
      std::memcpy(fo + base[t], out.fo.data(),
                  out.fo.size() * sizeof(int64_t));
      if (want_inv && base[t]) {
        // Shift this thread's scattered group ids by its global base.
        for (Py_ssize_t r = 0; r < nruns; ++r) {
          const Py_ssize_t lo = bounds[static_cast<size_t>(t) * nruns + r];
          const Py_ssize_t hi =
              bounds[static_cast<size_t>(t + 1) * nruns + r];
          for (Py_ssize_t p = lo; p < hi; ++p) {
            inv[idx[p]] += base[t];
          }
        }
      }
    }
    Py_END_ALLOW_THREADS;
  }
  PyBuffer_Release(&keys_b);
  PyBuffer_Release(&idx_b);
  PyBuffer_Release(&off_b);
  PyBuffer_Release(&uk_b);
  PyBuffer_Release(&cnt_b);
  PyBuffer_Release(&fo_b);
  PyBuffer_Release(&inv_b);
  if (!ok) {
    PyErr_SetString(PyExc_ValueError, "merge_unique_runs: bad arguments");
    return nullptr;
  }
  return PyLong_FromLongLong(static_cast<long long>(k_total));
}

// Candidate-pair enumeration over equal-key runs (the pigeonhole
// neighbour search, humid_tpu/ops/neighbors.py strategy="runs").
//
// run_pairs_hamming: for every run [start, start+len) in the SORTED
// order, emit each unordered in-run pair (order[i], order[j]) whose
// 2-bit-packed uint64 words differ in at most max_dist bases
// ((x^y | (x^y)>>1) & 0x5555... popcount).  Pairs are normalized
// (min, max).  Output buffers must hold sum(len*(len-1)/2); returns the
// number written.  Parallel over run blocks with a count+prefix pass.
//
// run_pairs: same enumeration with no distance filter (for words wider
// than 64 bits, whose filter runs in numpy per lane).
constexpr uint64_t kMaskLo = 0x5555555555555555ull;

static inline int base_diff(uint64_t x, uint64_t y) {
  const uint64_t z = x ^ y;
  return __builtin_popcountll((z | (z >> 1)) & kMaskLo);
}

PyObject* run_pairs_hamming(PyObject* /*self*/, PyObject* args) {
  Py_buffer words_b, order_b, rs_b, rl_b, oa_b, ob_b;
  long max_dist;
  if (!PyArg_ParseTuple(args, "y*y*y*y*lw*w*", &words_b, &order_b, &rs_b,
                        &rl_b, &max_dist, &oa_b, &ob_b)) {
    return nullptr;
  }
  const uint64_t* words = static_cast<const uint64_t*>(words_b.buf);
  const int64_t* order = static_cast<const int64_t*>(order_b.buf);
  const int64_t* rs = static_cast<const int64_t*>(rs_b.buf);
  const int64_t* rl = static_cast<const int64_t*>(rl_b.buf);
  int64_t* oa = static_cast<int64_t*>(oa_b.buf);
  int64_t* ob = static_cast<int64_t*>(ob_b.buf);
  const Py_ssize_t nruns = rs_b.len / 8;
  const Py_ssize_t cap = oa_b.len / 8;
  int64_t written = 0;
  std::atomic<bool> overflow{false};
  Py_BEGIN_ALLOW_THREADS;
  // Parallel over runs with thread-local match buffers; each thread
  // reserves a contiguous output slice when its buffer fills.  Output
  // order is irrelevant (the caller dedupes + sorts the union).
#if defined(_OPENMP)
#pragma omp parallel
#endif
  {
    std::vector<int64_t> la, lb;
    la.reserve(1 << 14);
    lb.reserve(1 << 14);
    auto flush = [&]() {
      if (la.empty()) return;
      int64_t off = -1;
#if defined(_OPENMP)
#pragma omp critical(rph_reserve)
#endif
      {
        if (written + static_cast<int64_t>(la.size()) > cap) {
          overflow.store(true, std::memory_order_relaxed);
        } else {
          off = written;
          written += static_cast<int64_t>(la.size());
        }
      }
      if (off >= 0) {
        std::memcpy(oa + off, la.data(), la.size() * sizeof(int64_t));
        std::memcpy(ob + off, lb.data(), lb.size() * sizeof(int64_t));
      }
      la.clear();
      lb.clear();
    };
#if defined(_OPENMP)
#pragma omp for schedule(dynamic, 16) nowait
#endif
    for (Py_ssize_t r = 0; r < nruns; ++r) {
      if (overflow.load(std::memory_order_relaxed)) continue;
      const int64_t s = rs[r], len = rl[r];
      for (int64_t i = 0; i < len; ++i) {
        const int64_t a = order[s + i];
        const uint64_t wa = words[a];
        for (int64_t j = i + 1; j < len; ++j) {
          const int64_t b = order[s + j];
          if (base_diff(wa, words[b]) <= max_dist) {
            la.push_back(a < b ? a : b);
            lb.push_back(a < b ? b : a);
          }
        }
      }
      if (la.size() >= (1 << 14)) flush();
    }
    flush();
  }
  Py_END_ALLOW_THREADS;
  PyBuffer_Release(&words_b);
  PyBuffer_Release(&order_b);
  PyBuffer_Release(&rs_b);
  PyBuffer_Release(&rl_b);
  PyBuffer_Release(&oa_b);
  PyBuffer_Release(&ob_b);
  if (overflow) {
    PyErr_SetString(PyExc_ValueError, "run_pairs_hamming: output overflow");
    return nullptr;
  }
  return PyLong_FromLongLong(static_cast<long long>(written));
}

PyObject* run_pairs(PyObject* /*self*/, PyObject* args) {
  Py_buffer order_b, rs_b, rl_b, oa_b, ob_b;
  if (!PyArg_ParseTuple(args, "y*y*y*w*w*", &order_b, &rs_b, &rl_b, &oa_b,
                        &ob_b)) {
    return nullptr;
  }
  const int64_t* order = static_cast<const int64_t*>(order_b.buf);
  const int64_t* rs = static_cast<const int64_t*>(rs_b.buf);
  const int64_t* rl = static_cast<const int64_t*>(rl_b.buf);
  int64_t* oa = static_cast<int64_t*>(oa_b.buf);
  int64_t* ob = static_cast<int64_t*>(ob_b.buf);
  const Py_ssize_t nruns = rs_b.len / 8;
  const Py_ssize_t cap = oa_b.len / 8;
  int64_t written = 0;
  bool overflow = false;
  Py_BEGIN_ALLOW_THREADS;
  for (Py_ssize_t r = 0; r < nruns && !overflow; ++r) {
    const int64_t s = rs[r], len = rl[r];
    if (written + len * (len - 1) / 2 > cap) { overflow = true; break; }
    for (int64_t i = 0; i < len; ++i) {
      const int64_t a = order[s + i];
      for (int64_t j = i + 1; j < len; ++j) {
        const int64_t b = order[s + j];
        oa[written] = a < b ? a : b;
        ob[written] = a < b ? b : a;
        ++written;
      }
    }
  }
  Py_END_ALLOW_THREADS;
  PyBuffer_Release(&order_b);
  PyBuffer_Release(&rs_b);
  PyBuffer_Release(&rl_b);
  PyBuffer_Release(&oa_b);
  PyBuffer_Release(&ob_b);
  if (overflow) {
    PyErr_SetString(PyExc_ValueError, "run_pairs: output overflow");
    return nullptr;
  }
  return PyLong_FromLongLong(static_cast<long long>(written));
}

// Sorted merge join between two keyed views of the unique-word set (the
// shifted-segment candidate generator for edit distance,
// humid_tpu/ops/neighbors.py find_edit_pairs_shifted).  keys_a/keys_b
// are unsorted; order_a/order_b sort them.  Equal-key blocks emit the
// cross product of (A row, B row) pairs, normalized (min, max), self
// pairs skipped; self_join != 0 means the two views are identical and
// only i < j pairs are emitted.  Returns pairs written, or -(needed) if
// the output capacity is too small (caller reallocates and retries).
PyObject* merge_join_pairs(PyObject* /*self*/, PyObject* args) {
  Py_buffer ka_b, oa_b, kb_b, ob_b, outa_b, outb_b;
  long self_join;
  if (!PyArg_ParseTuple(args, "y*y*y*y*lw*w*", &ka_b, &oa_b, &kb_b, &ob_b,
                        &self_join, &outa_b, &outb_b)) {
    return nullptr;
  }
  const uint64_t* ka = static_cast<const uint64_t*>(ka_b.buf);
  const int64_t* oa = static_cast<const int64_t*>(oa_b.buf);
  const uint64_t* kb = static_cast<const uint64_t*>(kb_b.buf);
  const int64_t* ob = static_cast<const int64_t*>(ob_b.buf);
  int64_t* outa = static_cast<int64_t*>(outa_b.buf);
  int64_t* outb = static_cast<int64_t*>(outb_b.buf);
  const Py_ssize_t na = oa_b.len / 8, nb = ob_b.len / 8;
  const Py_ssize_t cap = outa_b.len / 8;
  int64_t written = 0;
  int64_t needed = 0;
  Py_BEGIN_ALLOW_THREADS;
  Py_ssize_t i = 0, j = 0;
  while (i < na && j < nb) {
    const uint64_t key = ka[oa[i]];
    const uint64_t keyb = kb[ob[j]];
    if (key < keyb) { ++i; continue; }
    if (keyb < key) { ++j; continue; }
    Py_ssize_t ie = i, je = j;
    while (ie < na && ka[oa[ie]] == key) ++ie;
    while (je < nb && kb[ob[je]] == key) ++je;
    for (Py_ssize_t x = i; x < ie; ++x) {
      const int64_t a = oa[x];
      for (Py_ssize_t y = j; y < je; ++y) {
        const int64_t b = ob[y];
        if (a == b) continue;
        if (self_join && a > b) continue;  // emit i < j once
        ++needed;
        if (written < cap) {
          outa[written] = a < b ? a : b;
          outb[written] = a < b ? b : a;
          ++written;
        }
      }
    }
    i = ie;
    j = je;
  }
  Py_END_ALLOW_THREADS;
  PyBuffer_Release(&ka_b);
  PyBuffer_Release(&oa_b);
  PyBuffer_Release(&kb_b);
  PyBuffer_Release(&ob_b);
  PyBuffer_Release(&outa_b);
  PyBuffer_Release(&outb_b);
  if (needed > written) {
    return PyLong_FromLongLong(-static_cast<long long>(needed));
  }
  return PyLong_FromLongLong(static_cast<long long>(written));
}

// Banded Levenshtein verification of candidate pairs: keep (a, b) iff
// the full-word edit distance of codes[a] vs codes[b] (uint8 base codes,
// row-major [n, L]) is <= max_dist.  Band half-width = max_dist; cells
// outside the band cannot lie on a <=max_dist path.  Returns pairs kept.
// Parallel over pair chunks (per-chunk keep flags, then a prefix +
// compact emit preserving input order — callers rely on the output
// being a subsequence of the input pair list).
PyObject* edit_filter_pairs(PyObject* /*self*/, PyObject* args) {
  Py_buffer codes_b, a_b, b_b, outa_b, outb_b;
  long L_long, max_dist;
  if (!PyArg_ParseTuple(args, "y*ly*y*lw*w*", &codes_b, &L_long, &a_b,
                        &b_b, &max_dist, &outa_b, &outb_b)) {
    return nullptr;
  }
  const uint8_t* codes = static_cast<const uint8_t*>(codes_b.buf);
  const int64_t* pa = static_cast<const int64_t*>(a_b.buf);
  const int64_t* pb = static_cast<const int64_t*>(b_b.buf);
  int64_t* outa = static_cast<int64_t*>(outa_b.buf);
  int64_t* outb = static_cast<int64_t*>(outb_b.buf);
  const Py_ssize_t np = a_b.len / 8;
  const int L = static_cast<int>(L_long);
  const int m = static_cast<int>(max_dist);
  const int INF = 1 << 20;
  int64_t written = 0;
  bool oom = false;
  Py_BEGIN_ALLOW_THREADS;
  int nt = 1;
#if defined(_OPENMP)
  nt = omp_get_max_threads();
#endif
  const Py_ssize_t chunk = (np + nt - 1) / nt;
  thread_local RawArena a_keep;
  uint8_t* keep =
      np ? static_cast<uint8_t*>(a_keep.ensure(np)) : nullptr;
  oom = np && !keep;
  std::vector<int64_t> chunk_counts(nt + 1, 0);
  const int nte = oom ? 0 : nt;  // alloc failure -> emit none
#if defined(_OPENMP)
#pragma omp parallel for schedule(static, 1)
#endif
  for (int t = 0; t < nte; ++t) {
    const Py_ssize_t lo = t * chunk;
    const Py_ssize_t hi = std::min(np, lo + chunk);
    std::vector<int> row(static_cast<size_t>(L) + 1);
    std::vector<int> nrow(static_cast<size_t>(L) + 1);
    int64_t cnt = 0;
    for (Py_ssize_t p = lo; p < hi; ++p) {
      const uint8_t* x = codes + pa[p] * L;
      const uint8_t* y = codes + pb[p] * L;
      for (int j = 0; j <= L; ++j) row[j] = j <= m ? j : INF;
      bool alive = true;
      for (int i = 1; i <= L && alive; ++i) {
        const int jlo = i - m > 1 ? i - m : 1;
        const int jhi = i + m < L ? i + m : L;
        nrow[jlo - 1] = (jlo - 1 == 0) ? i : INF;
        int best = nrow[jlo - 1];
        for (int j = jlo; j <= jhi; ++j) {
          const int sub = row[j - 1] + (x[i - 1] == y[j - 1] ? 0 : 1);
          const int del = (j <= i + m - 1) ? row[j] + 1 : INF;
          const int ins = nrow[j - 1] + 1;
          int v = sub < del ? sub : del;
          if (ins < v) v = ins;
          nrow[j] = v;
          if (v < best) best = v;
        }
        if (jhi < L) nrow[jhi + 1] = INF;
        if (best > m) alive = false;
        std::swap(row, nrow);
      }
      const bool k = alive && row[L] <= m;
      keep[p] = k;
      cnt += k;
    }
    chunk_counts[t + 1] = cnt;
  }
  for (int t = 0; t < nt; ++t) chunk_counts[t + 1] += chunk_counts[t];
  written = chunk_counts[nt];
#if defined(_OPENMP)
#pragma omp parallel for schedule(static, 1)
#endif
  for (int t = 0; t < nte; ++t) {
    const Py_ssize_t lo = t * chunk;
    const Py_ssize_t hi = std::min(np, lo + chunk);
    int64_t w = chunk_counts[t];
    for (Py_ssize_t p = lo; p < hi; ++p) {
      if (keep[p]) {
        outa[w] = pa[p];
        outb[w] = pb[p];
        ++w;
      }
    }
  }
  Py_END_ALLOW_THREADS;
  PyBuffer_Release(&codes_b);
  PyBuffer_Release(&a_b);
  PyBuffer_Release(&b_b);
  PyBuffer_Release(&outa_b);
  PyBuffer_Release(&outb_b);
  if (oom) return PyErr_NoMemory();
  return PyLong_FromLongLong(static_cast<long long>(written));
}

PyMethodDef methods[] = {
    {"argsort_u64", argsort_u64, METH_VARARGS,
     "argsort_u64(keys, order_out): stable parallel argsort of uint64 "
     "keys into a preallocated int64 index buffer."},
    {"unique_u64", unique_u64, METH_VARARGS,
     "unique_u64(keys, order, group_start, counts, first_occ, inverse) "
     "-> k: fused stable sort + group structure over uint64 keys."},
    {"unique_packed", unique_packed, METH_VARARGS,
     "unique_packed(packed, w, uniq, counts, first_occ, inverse, "
     "want_inverse) -> k: fused key build + stable radix sort + group "
     "structure over uint32 word lanes (w <= 2)."},
    {"run_pairs_hamming", run_pairs_hamming, METH_VARARGS,
     "run_pairs_hamming(words_u64, order, run_start, run_len, max_dist, "
     "out_a, out_b) -> n: enumerate in-run candidate pairs and keep those "
     "within max_dist differing bases (2-bit packed uint64 words)."},
    {"run_pairs", run_pairs, METH_VARARGS,
     "run_pairs(order, run_start, run_len, out_a, out_b) -> n: enumerate "
     "all unordered in-run candidate pairs (no distance filter)."},
    {"merge_unique_runs", merge_unique_runs, METH_VARARGS,
     "merge_unique_runs(keys, idx, run_offsets, ukeys, counts, "
     "first_occ, want_inverse, inv) -> k: fused k-way merge + group "
     "structure over pre-sorted (key, idx) runs."},
    {"merge_join_pairs", merge_join_pairs, METH_VARARGS,
     "merge_join_pairs(keys_a, order_a, keys_b, order_b, self_join, "
     "out_a, out_b) -> n (or -needed on overflow): equal-key cross "
     "product pairs between two sorted key views."},
    {"edit_filter_pairs", edit_filter_pairs, METH_VARARGS,
     "edit_filter_pairs(codes_u8, L, a, b, max_dist, out_a, out_b) -> n: "
     "keep candidate pairs within banded Levenshtein max_dist."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {
    PyModuleDef_HEAD_INIT, "_hostops",
    "Parallel host primitives.", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__hostops(void) { return PyModule_Create(&module); }

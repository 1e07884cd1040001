// Parallel host primitives for humid_tpu (module humid_tpu._hostops).
//
// argsort_u64: stable parallel argsort of uint64 keys (gnu parallel mode
// + OpenMP).  Replaces numpy's single-threaded argsort on the unique-
// counting path (humid_tpu/ops/unique.py), which dominates host time at
// WGS scale (sorting 1e8 fingerprints).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cstdint>
#include <utility>

#if defined(_OPENMP)
#include <parallel/algorithm>
#define SORT __gnu_parallel::stable_sort
#else
#define SORT std::stable_sort
#endif

namespace {

PyObject* argsort_u64(PyObject* /*self*/, PyObject* args) {
  Py_buffer keys_b, order_b;
  if (!PyArg_ParseTuple(args, "y*w*", &keys_b, &order_b)) return nullptr;
  const Py_ssize_t n = keys_b.len / 8;
  bool ok = order_b.len / 8 >= n;
  if (ok) {
    const uint64_t* keys = static_cast<const uint64_t*>(keys_b.buf);
    int64_t* order = static_cast<int64_t*>(order_b.buf);
    Py_BEGIN_ALLOW_THREADS;
    for (Py_ssize_t i = 0; i < n; ++i) order[i] = i;
    SORT(order, order + n, [keys](int64_t a, int64_t b) {
      return keys[a] < keys[b];
    });
    Py_END_ALLOW_THREADS;
  }
  PyBuffer_Release(&keys_b);
  PyBuffer_Release(&order_b);
  if (!ok) {
    PyErr_SetString(PyExc_ValueError, "argsort_u64: bad buffer sizes");
    return nullptr;
  }
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
  if (!PyArg_ParseTuple(args, "y*w*w*w*w*w*", &keys_b, &order_b, &gs_b,
                        &cnt_b, &fo_b, &inv_b)) {
    return nullptr;
  }
  const Py_ssize_t n = keys_b.len / 8;
  bool ok = order_b.len / 8 >= n && gs_b.len / 8 >= n &&
            cnt_b.len / 8 >= n && fo_b.len / 8 >= n && inv_b.len / 8 >= n;
  Py_ssize_t k = 0;
  if (ok && n > 0) {
    const uint64_t* keys = static_cast<const uint64_t*>(keys_b.buf);
    int64_t* order = static_cast<int64_t*>(order_b.buf);
    int64_t* gs = static_cast<int64_t*>(gs_b.buf);
    int64_t* cnt = static_cast<int64_t*>(cnt_b.buf);
    int64_t* fo = static_cast<int64_t*>(fo_b.buf);
    int64_t* inv = static_cast<int64_t*>(inv_b.buf);
    Py_BEGIN_ALLOW_THREADS;
    for (Py_ssize_t i = 0; i < n; ++i) order[i] = i;
    SORT(order, order + n, [keys](int64_t a, int64_t b) {
      return keys[a] < keys[b];
    });
    uint64_t prev = keys[order[0]];
    gs[0] = 0;
    fo[0] = order[0];
    inv[order[0]] = 0;
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
      inv[oi] = k - 1;
    }
    cnt[k - 1] = n - gs[k - 1];
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
  return PyLong_FromLongLong(static_cast<long long>(k));
}

PyMethodDef methods[] = {
    {"argsort_u64", argsort_u64, METH_VARARGS,
     "argsort_u64(keys, order_out): stable parallel argsort of uint64 "
     "keys into a preallocated int64 index buffer."},
    {"unique_u64", unique_u64, METH_VARARGS,
     "unique_u64(keys, order, group_start, counts, first_occ, inverse) "
     "-> k: fused stable sort + group structure over uint64 keys."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {
    PyModuleDef_HEAD_INIT, "_hostops",
    "Parallel host primitives.", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__hostops(void) { return PyModule_Create(&module); }

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

PyMethodDef methods[] = {
    {"argsort_u64", argsort_u64, METH_VARARGS,
     "argsort_u64(keys, order_out): stable parallel argsort of uint64 "
     "keys into a preallocated int64 index buffer."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {
    PyModuleDef_HEAD_INIT, "_hostops",
    "Parallel host primitives.", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__hostops(void) { return PyModule_Create(&module); }

// Native FastQ record framing for humid_tpu.
//
// The reference reads records one at a time through fastp's FastqReader
// (/root/reference/src/fastq.cc:37-47).  Here decompressed chunks are
// framed in bulk: memchr-scan for newlines, emit [n, 4] line-span tables
// (name, seq, strand, qual) with trailing '\r' stripped — the layout
// humid_tpu.io.reader.FastqBatch consumes.  ~10x faster than the numpy
// flatnonzero framing path on large chunks.
//
// Exposed as the CPython module humid_tpu.io._cfastqio, wrapped by
// humid_tpu/io/_fastqio.py.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>

namespace {

PyObject* count_newlines(PyObject* /*self*/, PyObject* args) {
  Py_buffer data_b;
  if (!PyArg_ParseTuple(args, "y*", &data_b)) return nullptr;
  const char* p = static_cast<const char*>(data_b.buf);
  const char* end = p + data_b.len;
  int64_t n = 0;
  Py_BEGIN_ALLOW_THREADS;
  while (p < end) {
    const char* nl = static_cast<const char*>(memchr(p, '\n', end - p));
    if (!nl) break;
    ++n;
    p = nl + 1;
  }
  Py_END_ALLOW_THREADS;
  PyBuffer_Release(&data_b);
  return PyLong_FromLongLong(static_cast<long long>(n));
}

PyObject* fill_frames(PyObject* /*self*/, PyObject* args) {
  Py_buffer data_b, starts_b, ends_b;
  Py_ssize_t n_records;
  if (!PyArg_ParseTuple(args, "y*w*w*n", &data_b, &starts_b, &ends_b,
                        &n_records)) {
    return nullptr;
  }
  if (starts_b.len < static_cast<Py_ssize_t>(n_records * 4 * 8) ||
      ends_b.len < static_cast<Py_ssize_t>(n_records * 4 * 8)) {
    PyBuffer_Release(&data_b);
    PyBuffer_Release(&starts_b);
    PyBuffer_Release(&ends_b);
    PyErr_SetString(PyExc_ValueError, "fill_frames: span buffers too small");
    return nullptr;
  }
  const char* base = static_cast<const char*>(data_b.buf);
  const char* end = base + data_b.len;
  int64_t* st = static_cast<int64_t*>(starts_b.buf);
  int64_t* en = static_cast<int64_t*>(ends_b.buf);
  int64_t consumed = 0;
  bool ok = true;
  Py_BEGIN_ALLOW_THREADS;
  const char* p = base;
  for (Py_ssize_t i = 0; ok && i < n_records * 4; ++i) {
    const char* nl = static_cast<const char*>(memchr(p, '\n', end - p));
    if (!nl) {
      ok = false;
      break;
    }
    int64_t s = p - base;
    int64_t e = nl - base;
    if (e > s && base[e - 1] == '\r') --e;  // strip trailing \r
    st[i] = s;
    en[i] = e;
    p = nl + 1;
  }
  consumed = p - base;
  Py_END_ALLOW_THREADS;
  PyBuffer_Release(&data_b);
  PyBuffer_Release(&starts_b);
  PyBuffer_Release(&ends_b);
  if (!ok) {
    PyErr_SetString(PyExc_ValueError,
                    "fill_frames: fewer newlines than 4*n_records");
    return nullptr;
  }
  return PyLong_FromLongLong(static_cast<long long>(consumed));
}

PyMethodDef methods[] = {
    {"count_newlines", count_newlines, METH_VARARGS,
     "count_newlines(buf) -> number of '\\n' bytes."},
    {"fill_frames", fill_frames, METH_VARARGS,
     "fill_frames(buf, starts, ends, n_records) -> consumed bytes.  Fills "
     "[n, 4] int64 line spans with trailing \\r stripped."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {
    PyModuleDef_HEAD_INIT, "_cfastqio",
    "Native FastQ record framing.", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__cfastqio(void) { return PyModule_Create(&module); }

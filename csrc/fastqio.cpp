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

#ifdef HAVE_LIBDEFLATE
#include <libdeflate.h>
#endif

namespace {

// Newline counting gates the parallel framer (each chunk's record
// phase is the cumulative newline count mod 4, reader.py), so it runs
// serially on the producer thread — memchr per line topped out at
// ~4 GB/s, a visible fraction of pass 1.  The AVX2 path accumulates
// cmpeq results bytewise (bounded by 255 rounds before overflow) and
// drains with psadbw: one pass at memory speed.
#if defined(__x86_64__) || defined(__i386__)
#include <immintrin.h>

__attribute__((target("avx2")))
int64_t count_nl_avx2(const unsigned char* p, Py_ssize_t len) {
  const __m256i nl = _mm256_set1_epi8('\n');
  const __m256i zero = _mm256_setzero_si256();
  int64_t n = 0;
  Py_ssize_t i = 0;
  while (i + 32 <= len) {
    // Up to 255 unsaturated byte accumulations before draining.
    Py_ssize_t rounds = (len - i) / 32;
    if (rounds > 255) rounds = 255;
    __m256i acc = zero;
    for (Py_ssize_t r = 0; r < rounds; ++r, i += 32) {
      const __m256i v =
          _mm256_loadu_si256(reinterpret_cast<const __m256i*>(p + i));
      // cmpeq gives 0xFF per match; subtracting adds 1 per match.
      acc = _mm256_sub_epi8(acc, _mm256_cmpeq_epi8(v, nl));
    }
    const __m256i sums = _mm256_sad_epu8(acc, zero);  // 4 x u64 lane sums
    n += _mm256_extract_epi64(sums, 0) + _mm256_extract_epi64(sums, 1) +
         _mm256_extract_epi64(sums, 2) + _mm256_extract_epi64(sums, 3);
  }
  for (; i < len; ++i) n += (p[i] == '\n');
  return n;
}
#endif

int64_t count_nl_range(const unsigned char* p, Py_ssize_t len) {
#if defined(__x86_64__) || defined(__i386__)
  if (__builtin_cpu_supports("avx2")) return count_nl_avx2(p, len);
#endif
  int64_t n = 0;
  Py_ssize_t i = 0;
  const Py_ssize_t B = 16384;
  for (; i + B <= len; i += B) {
    uint32_t local = 0;
    for (Py_ssize_t j = i; j < i + B; ++j) local += (p[j] == '\n');
    n += local;
  }
  uint32_t tail = 0;
  for (; i < len; ++i) tail += (p[i] == '\n');
  return n + tail;
}

PyObject* count_newlines(PyObject* /*self*/, PyObject* args) {
  Py_buffer data_b;
  if (!PyArg_ParseTuple(args, "y*", &data_b)) return nullptr;
  const unsigned char* p = static_cast<const unsigned char*>(data_b.buf);
  int64_t n = 0;
  Py_BEGIN_ALLOW_THREADS;
  n = count_nl_range(p, data_b.len);
  Py_END_ALLOW_THREADS;
  PyBuffer_Release(&data_b);
  return PyLong_FromLongLong(static_cast<long long>(n));
}

// Core of scan_frames: walk newlines, emitting [n, 4] line spans of
// complete records.  Returns records found; *consumed_out = bytes up to
// and including the last complete record's newline.  The AVX2 variant
// finds newlines 32 bytes at a time via cmpeq + movemask (memchr per
// ~100-byte line left >4x throughput on the table).
struct FrameState {
  const char* base;
  int64_t* st;
  int64_t* en;
  Py_ssize_t max_records;
  // Optional fused prefix gather: first pref_k bytes of every sequence
  // line (padded with 'N'), written while the record bytes are still
  // cache-hot — replaces a separate scattered gather pass over the
  // whole buffer (fastq.cc:131-142 cut/pad semantics).
  uint8_t* pref = nullptr;
  Py_ssize_t pref_k = 0;
  Py_ssize_t n = 0;
  int line = 0;
  int64_t ls[4], le[4];
  int64_t line_start = 0;
  int64_t consumed = 0;
  // Record the newline at offset e; true when max_records is reached.
  inline bool emit(int64_t e) {
    int64_t ee = (e > line_start && base[e - 1] == '\r') ? e - 1 : e;
    ls[line] = line_start;
    le[line] = ee;
    if (pref && line == 1) {
      uint8_t* row = pref + n * pref_k;
      const int64_t len = ee - line_start;
      const Py_ssize_t c = len < pref_k ? Py_ssize_t(len) : pref_k;
      memcpy(row, base + line_start, size_t(c));
      if (c < pref_k) memset(row + c, 'N', size_t(pref_k - c));
    }
    line_start = e + 1;
    if (++line == 4) {
      line = 0;
      for (int k = 0; k < 4; ++k) {
        st[n * 4 + k] = ls[k];
        en[n * 4 + k] = le[k];
      }
      consumed = line_start;
      return ++n >= max_records;
    }
    return false;
  }
};

#if defined(__x86_64__) || defined(__i386__)
__attribute__((target("avx2")))
Py_ssize_t scan_bulk_avx2(FrameState& fs, Py_ssize_t len) {
  const __m256i nlv = _mm256_set1_epi8('\n');
  Py_ssize_t i = 0;
  while (i + 32 <= len) {
    const __m256i v = _mm256_loadu_si256(
        reinterpret_cast<const __m256i*>(fs.base + i));
    uint32_t m = static_cast<uint32_t>(
        _mm256_movemask_epi8(_mm256_cmpeq_epi8(v, nlv)));
    while (m) {
      const int b = __builtin_ctz(m);
      m &= m - 1;
      if (fs.emit(i + b)) return -1;  // hit max_records
    }
    i += 32;
  }
  return i;  // resume offset for the scalar tail
}
#endif

Py_ssize_t scan_frames_core(const char* base, Py_ssize_t len, int64_t* st,
                            int64_t* en, Py_ssize_t max_records,
                            int64_t* consumed_out, uint8_t* pref = nullptr,
                            Py_ssize_t pref_k = 0) {
  FrameState fs{base, st, en, max_records, pref, pref_k};
  Py_ssize_t i = 0;
#if defined(__x86_64__) || defined(__i386__)
  if (__builtin_cpu_supports("avx2")) {
    i = scan_bulk_avx2(fs, len);
    if (i < 0) {
      *consumed_out = fs.consumed;
      return fs.n;
    }
  }
#endif
  for (; i < len; ++i) {
    if (base[i] == '\n' && fs.emit(i)) break;
  }
  *consumed_out = fs.consumed;
  return fs.n;
}

// Single-pass framing: fill up to max_records complete 4-line records,
// returning (n_records, consumed).  Unlike fill_frames, the newline count
// need not be known in advance; unconsumed complete records simply stay
// in the caller's leftover for the next chunk.
PyObject* scan_frames(PyObject* /*self*/, PyObject* args) {
  Py_buffer data_b, starts_b, ends_b;
  Py_ssize_t max_records;
  if (!PyArg_ParseTuple(args, "y*w*w*n", &data_b, &starts_b, &ends_b,
                        &max_records)) {
    return nullptr;
  }
  if (starts_b.len < max_records * 4 * 8 ||
      ends_b.len < max_records * 4 * 8) {
    PyBuffer_Release(&data_b);
    PyBuffer_Release(&starts_b);
    PyBuffer_Release(&ends_b);
    PyErr_SetString(PyExc_ValueError, "scan_frames: span buffers too small");
    return nullptr;
  }
  const char* base = static_cast<const char*>(data_b.buf);
  int64_t* st = static_cast<int64_t*>(starts_b.buf);
  int64_t* en = static_cast<int64_t*>(ends_b.buf);
  Py_ssize_t n = 0;
  int64_t consumed = 0;
  Py_BEGIN_ALLOW_THREADS;
  n = scan_frames_core(base, data_b.len, st, en, max_records, &consumed);
  Py_END_ALLOW_THREADS;
  PyBuffer_Release(&data_b);
  PyBuffer_Release(&starts_b);
  PyBuffer_Release(&ends_b);
  return Py_BuildValue("nn", n, Py_ssize_t(consumed));
}

// scan_frames with the fused sequence-prefix gather (see FrameState).
PyObject* scan_frames_prefix(PyObject* /*self*/, PyObject* args) {
  Py_buffer data_b, starts_b, ends_b, pref_b;
  Py_ssize_t max_records, k;
  if (!PyArg_ParseTuple(args, "y*w*w*nw*n", &data_b, &starts_b, &ends_b,
                        &max_records, &pref_b, &k)) {
    return nullptr;
  }
  if (starts_b.len < max_records * 4 * 8 ||
      ends_b.len < max_records * 4 * 8 || pref_b.len < max_records * k ||
      k <= 0) {
    PyBuffer_Release(&data_b);
    PyBuffer_Release(&starts_b);
    PyBuffer_Release(&ends_b);
    PyBuffer_Release(&pref_b);
    PyErr_SetString(PyExc_ValueError,
                    "scan_frames_prefix: bad buffer sizes");
    return nullptr;
  }
  const char* base = static_cast<const char*>(data_b.buf);
  int64_t* st = static_cast<int64_t*>(starts_b.buf);
  int64_t* en = static_cast<int64_t*>(ends_b.buf);
  uint8_t* pref = static_cast<uint8_t*>(pref_b.buf);
  Py_ssize_t n = 0;
  int64_t consumed = 0;
  Py_BEGIN_ALLOW_THREADS;
  n = scan_frames_core(base, data_b.len, st, en, max_records, &consumed,
                       pref, k);
  Py_END_ALLOW_THREADS;
  PyBuffer_Release(&data_b);
  PyBuffer_Release(&starts_b);
  PyBuffer_Release(&ends_b);
  PyBuffer_Release(&pref_b);
  return Py_BuildValue("nn", n, Py_ssize_t(consumed));
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

// Gather the first k bytes of each span into a strided output matrix,
// padding short spans with 'N' (fastq.cc:131-142 cut/pad semantics).
PyObject* gather_prefix(PyObject* /*self*/, PyObject* args) {
  Py_buffer data_b, starts_b, ends_b, out_b;
  Py_ssize_t stride, col_off, k;
  if (!PyArg_ParseTuple(args, "y*y*y*w*nnn", &data_b, &starts_b, &ends_b,
                        &out_b, &stride, &col_off, &k)) {
    return nullptr;
  }
  const Py_ssize_t n = starts_b.len / 8;
  bool ok = ends_b.len / 8 >= n &&
            out_b.len >= (n > 0 ? (n - 1) * stride + col_off + k : 0);
  if (ok) {
    const char* base = static_cast<const char*>(data_b.buf);
    const int64_t* st = static_cast<const int64_t*>(starts_b.buf);
    const int64_t* en = static_cast<const int64_t*>(ends_b.buf);
    char* out = static_cast<char*>(out_b.buf);
    Py_BEGIN_ALLOW_THREADS;
    for (Py_ssize_t i = 0; i < n; ++i) {
      char* row = out + i * stride + col_off;
      const int64_t len = en[i] - st[i];
      const int64_t c = len < k ? len : k;
      memcpy(row, base + st[i], size_t(c));
      if (c < k) memset(row + c, 'N', size_t(k - c));
    }
    Py_END_ALLOW_THREADS;
  }
  PyBuffer_Release(&data_b);
  PyBuffer_Release(&starts_b);
  PyBuffer_Release(&ends_b);
  PyBuffer_Release(&out_b);
  if (!ok) {
    PyErr_SetString(PyExc_ValueError, "gather_prefix: bad buffer sizes");
    return nullptr;
  }
  Py_RETURN_NONE;
}

// Scalar ACGT -> 2-bit encode + pack for rows [r0, r1) (tail rows of the
// SIMD path and the portable fallback).
void encode_pack_scalar(const uint8_t* ch, Py_ssize_t r0, Py_ssize_t r1,
                        Py_ssize_t L, uint32_t* lanes, Py_ssize_t W,
                        uint8_t* filt) {
  static uint8_t lut[256];
  static uint8_t bad[256];
  static bool init = false;
  if (!init) {
    for (int i = 0; i < 256; ++i) {
      lut[i] = 2;
      bad[i] = 1;
    }
    lut['A'] = 0; lut['C'] = 1; lut['G'] = 2; lut['T'] = 3;
    bad['A'] = bad['C'] = bad['G'] = bad['T'] = 0;
    init = true;
  }
  for (Py_ssize_t i = r0; i < r1; ++i) {
    const uint8_t* row = ch + i * L;
    uint8_t f = 0;
    uint32_t* out = lanes + i * W;
    for (Py_ssize_t w = 0; w < W; ++w) {
      uint32_t acc = 0;
      const Py_ssize_t lo = w * 16;
      for (Py_ssize_t b = 0; b < 16; ++b) {
        const Py_ssize_t p = lo + b;
        uint32_t code = 0;
        if (p < L) {
          const uint8_t c = row[p];
          code = lut[c];
          f |= bad[c];
        }
        acc = (acc << 2) | code;
      }
      out[w] = acc;
    }
    filt[i] = f;
  }
}

#if defined(__x86_64__) || defined(__i386__)
// SIMD encode: per 16-byte lane group, a pshufb low-nibble LUT maps
// A/C/G/T to 0..3 (low nibbles 1/3/7/4 are distinct), a second LUT
// reconstructs the canonical character for strict validity (anything
// else -> code 2 + filtered, fastq.cc:146-161), and the 2-bit codes are
// packed big-endian via byte reversal + two movemasks + pdep
// interleave.  ~5x the scalar loop.
__attribute__((target("avx2,bmi2")))
void encode_pack_simd(const uint8_t* ch, Py_ssize_t n, Py_ssize_t L,
                      uint32_t* lanes, Py_ssize_t W, uint8_t* filt) {
  // Rows whose last 16-byte lane load would run past the buffer end are
  // handled by the scalar tail.  L == 0 (word width zero, e.g. -n 0)
  // means zero-byte rows: nothing to encode, and the division below
  // would be by zero — the scalar path handles it (as a no-op over
  // zero-width rows).
  if (L == 0) {
    encode_pack_scalar(ch, 0, n, L, lanes, W, filt);
    return;
  }
  const Py_ssize_t overrun = 16 * W - L;  // >= 0 since W = ceil(L/16)
  const Py_ssize_t slack_rows = (overrun + L - 1) / L;
  const Py_ssize_t n_fast = n > slack_rows ? n - slack_rows : 0;
  enum { MAX_W = 16 };
  if (W > MAX_W) {
    encode_pack_scalar(ch, 0, n, L, lanes, W, filt);
    return;
  }
  const __m128i lut_code = _mm_setr_epi8(2, 0, 2, 1, 3, 2, 2, 2,
                                         2, 2, 2, 2, 2, 2, 2, 2);
  // Canonical char per low nibble; non-ACGT nibbles hold 0x80, which no
  // MSB-clear input equals (and MSB-set inputs make pshufb return 0,
  // which never equals them either) — so e.g. NUL stays invalid.
  const __m128i lut_char = _mm_setr_epi8(
      -128, 'A', -128, 'C', 'T', -128, -128, 'G',
      -128, -128, -128, -128, -128, -128, -128, -128);
  const __m128i rev = _mm_setr_epi8(15, 14, 13, 12, 11, 10, 9, 8,
                                    7, 6, 5, 4, 3, 2, 1, 0);
  const __m128i all_a = _mm_set1_epi8('A');
  const __m128i two = _mm_set1_epi8(2);
  // Per-lane mask of columns past L (padded with 'A' -> code 0, valid),
  // matching the scalar p >= L behaviour.
  __m128i pad[MAX_W];
  for (Py_ssize_t w = 0; w < W; ++w) {
    alignas(16) int8_t m[16];
    const Py_ssize_t valid = L - 16 * w < 16 ? L - 16 * w : 16;
    for (int b = 0; b < 16; ++b) m[b] = b < valid ? 0 : -1;
    pad[w] = _mm_load_si128(reinterpret_cast<const __m128i*>(m));
  }
  for (Py_ssize_t i = 0; i < n_fast; ++i) {
    const uint8_t* row = ch + i * L;
    uint32_t* out = lanes + i * W;
    __m128i inv_acc = _mm_setzero_si128();
    for (Py_ssize_t w = 0; w < W; ++w) {
      __m128i v = _mm_loadu_si128(
          reinterpret_cast<const __m128i*>(row + 16 * w));
      v = _mm_blendv_epi8(v, all_a, pad[w]);
      // pshufb: byte MSB set -> 0, else indexed by low nibble.
      const __m128i expect = _mm_shuffle_epi8(lut_char, v);
      const __m128i valid = _mm_cmpeq_epi8(v, expect);
      inv_acc = _mm_or_si128(inv_acc,
                             _mm_andnot_si128(valid, _mm_set1_epi8(-1)));
      __m128i code = _mm_shuffle_epi8(lut_code, v);
      code = _mm_blendv_epi8(two, code, valid);
      const __m128i r = _mm_shuffle_epi8(code, rev);
      const uint32_t hi = static_cast<uint32_t>(
          _mm_movemask_epi8(_mm_slli_epi16(r, 6)));
      const uint32_t lo = static_cast<uint32_t>(
          _mm_movemask_epi8(_mm_slli_epi16(r, 7)));
      out[w] = _pdep_u32(hi, 0xAAAAAAAAu) | _pdep_u32(lo, 0x55555555u);
    }
    filt[i] = _mm_movemask_epi8(inv_acc) != 0;
  }
  if (n_fast < n) {
    encode_pack_scalar(ch, n_fast, n, L, lanes, W, filt);
  }
}
#endif

// ACGT -> 2-bit encode (other chars -> G=2 + filtered flag,
// fastq.cc:146-161) and big-endian packing into uint32 lanes
// (humid_tpu.words.pack_words layout: base 0 in the two most significant
// bits of lane 0).
PyObject* encode_pack(PyObject* /*self*/, PyObject* args) {
  Py_buffer chars_b, lanes_b, filt_b;
  Py_ssize_t n, L, W;
  if (!PyArg_ParseTuple(args, "y*nnw*nw*", &chars_b, &n, &L, &lanes_b, &W,
                        &filt_b)) {
    return nullptr;
  }
  bool ok = chars_b.len >= n * L && lanes_b.len >= n * W * 4 &&
            filt_b.len >= n;
  if (ok) {
    const uint8_t* ch = static_cast<const uint8_t*>(chars_b.buf);
    uint32_t* lanes = static_cast<uint32_t*>(lanes_b.buf);
    uint8_t* filt = static_cast<uint8_t*>(filt_b.buf);
    Py_BEGIN_ALLOW_THREADS;
#if defined(__x86_64__) || defined(__i386__)
    if (__builtin_cpu_supports("avx2") &&
        __builtin_cpu_supports("bmi2")) {
      encode_pack_simd(ch, n, L, lanes, W, filt);
    } else {
      encode_pack_scalar(ch, 0, n, L, lanes, W, filt);
    }
#else
    encode_pack_scalar(ch, 0, n, L, lanes, W, filt);
#endif
    Py_END_ALLOW_THREADS;
  }
  PyBuffer_Release(&chars_b);
  PyBuffer_Release(&lanes_b);
  PyBuffer_Release(&filt_b);
  if (!ok) {
    PyErr_SetString(PyExc_ValueError, "encode_pack: bad buffer sizes");
    return nullptr;
  }
  Py_RETURN_NONE;
}

// Concatenate ragged segments of src into out, appending '\n' after each
// segment whose nl flag is set (vectorized writer backend).
PyObject* concat_segments(PyObject* /*self*/, PyObject* args) {
  Py_buffer src_b, start_b, len_b, nl_b, out_b;
  if (!PyArg_ParseTuple(args, "y*y*y*y*w*", &src_b, &start_b, &len_b,
                        &nl_b, &out_b)) {
    return nullptr;
  }
  const Py_ssize_t m = start_b.len / 8;
  const char* src = static_cast<const char*>(src_b.buf);
  const int64_t* st = static_cast<const int64_t*>(start_b.buf);
  const int64_t* ln = static_cast<const int64_t*>(len_b.buf);
  const uint8_t* nl = static_cast<const uint8_t*>(nl_b.buf);
  char* out = static_cast<char*>(out_b.buf);
  char* const out_end = out + out_b.len;
  bool ok = len_b.len / 8 >= m && Py_ssize_t(nl_b.len) >= m;
  int64_t written = 0;
  if (ok) {
    Py_BEGIN_ALLOW_THREADS;
    char* p = out;
    for (Py_ssize_t i = 0; i < m; ++i) {
      const int64_t L = ln[i];
      if (p + L + (nl[i] ? 1 : 0) > out_end) {
        ok = false;
        break;
      }
      memcpy(p, src + st[i], size_t(L));
      p += L;
      if (nl[i]) *p++ = '\n';
    }
    written = p - out;
    Py_END_ALLOW_THREADS;
  }
  PyBuffer_Release(&src_b);
  PyBuffer_Release(&start_b);
  PyBuffer_Release(&len_b);
  PyBuffer_Release(&nl_b);
  PyBuffer_Release(&out_b);
  if (!ok) {
    PyErr_SetString(PyExc_ValueError, "concat_segments: bad sizes");
    return nullptr;
  }
  return PyLong_FromLongLong(static_cast<long long>(written));
}

// Decompress one gzip member with libdeflate (the reference links isa-l +
// libdeflate for the same purpose, src/Makefile:26).  Returns
// (consumed_in, written_out); written_out == -1 means the output buffer
// is too small (caller grows and retries), -2 means bad data.
PyObject* gzip_decompress_member(PyObject* /*self*/, PyObject* args) {
#ifdef HAVE_LIBDEFLATE
  Py_buffer in_b, out_b;
  if (!PyArg_ParseTuple(args, "y*w*", &in_b, &out_b)) return nullptr;
  size_t consumed = 0, written = 0;
  int rc;
  Py_BEGIN_ALLOW_THREADS;
  struct libdeflate_decompressor* d = libdeflate_alloc_decompressor();
  enum libdeflate_result r = libdeflate_gzip_decompress_ex(
      d, in_b.buf, size_t(in_b.len), out_b.buf, size_t(out_b.len),
      &consumed, &written);
  libdeflate_free_decompressor(d);
  rc = (r == LIBDEFLATE_SUCCESS) ? 0
       : (r == LIBDEFLATE_INSUFFICIENT_SPACE) ? -1 : -2;
  Py_END_ALLOW_THREADS;
  PyBuffer_Release(&in_b);
  PyBuffer_Release(&out_b);
  return Py_BuildValue(
      "nn", Py_ssize_t(consumed),
      rc == 0 ? Py_ssize_t(written) : Py_ssize_t(rc));
#else
  PyErr_SetString(PyExc_NotImplementedError, "built without libdeflate");
  return nullptr;
#endif
}

PyMethodDef methods[] = {
    {"gzip_decompress_member", gzip_decompress_member, METH_VARARGS,
     "gzip_decompress_member(comp, out) -> (consumed, written); "
     "written=-1 if out too small, -2 on corrupt input."},
    {"count_newlines", count_newlines, METH_VARARGS,
     "count_newlines(buf) -> number of '\\n' bytes."},
    {"fill_frames", fill_frames, METH_VARARGS,
     "fill_frames(buf, starts, ends, n_records) -> consumed bytes.  Fills "
     "[n, 4] int64 line spans with trailing \\r stripped."},
    {"scan_frames", scan_frames, METH_VARARGS,
     "scan_frames(buf, starts, ends, max_records) -> (n, consumed). "
     "Single-pass framing of up to max_records complete records."},
    {"scan_frames_prefix", scan_frames_prefix, METH_VARARGS,
     "scan_frames_prefix(buf, starts, ends, max_records, pref, k) -> "
     "(n, consumed).  scan_frames fused with a [n, k] 'N'-padded "
     "sequence-prefix gather."},
    {"gather_prefix", gather_prefix, METH_VARARGS,
     "gather_prefix(buf, starts, ends, out, stride, col_off, k): copy the "
     "first k bytes of each span into a strided matrix, padding with 'N'."},
    {"encode_pack", encode_pack, METH_VARARGS,
     "encode_pack(chars, n, L, lanes, W, filtered): ACGT->2-bit encode and "
     "pack into big-endian uint32 lanes; non-ACGT marks filtered."},
    {"concat_segments", concat_segments, METH_VARARGS,
     "concat_segments(src, seg_start, seg_len, nl_flags, out) -> bytes "
     "written; ragged concat with optional newline after each segment."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {
    PyModuleDef_HEAD_INIT, "_cfastqio",
    "Native FastQ record framing.", -1, methods,
};

}  // namespace

PyMODINIT_FUNC PyInit__cfastqio(void) { return PyModule_Create(&module); }

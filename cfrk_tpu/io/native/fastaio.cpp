/* Native host-side ingest + output formatting for cfrk_tpu.
 *
 * TPU-native replacement of the reference's C host layer:
 *   - FASTA parse + 2-bit encode + flatten: reference src/fastaIO.h:24-71
 *     (ReadFasta, getline loop), :123-139 (encode LUT), :74-102
 *     (ProcessData flatten).  One pass over the raw buffer, no
 *     subprocesses (the reference shelled out to `grep -c ">"`,
 *     src/fastaIO.h:12-22), no per-line allocations.
 *   - .cfrk row formatting: reference src/main.cu:26-62 (PrintFreq).
 *     Dense "idx:count " cells; a hand-rolled u32→ascii emitter avoids
 *     printf overhead (the reference called fprintf per cell).
 *
 * Exposed as a plain CPython extension (no pybind11 in the image; the
 * CPython C API is the stable, dependency-free binding path).
 * Byte-for-byte agreement with the pure-Python implementations in
 * cfrk_tpu/io/fasta.py and cfrk_tpu/format.py is pinned by
 * tests/test_native.py.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>
#include <thread>
#include <type_traits>
#include <vector>

/* Find the end of the line starting at i (position of '\n' or n).
 * memchr is SIMD-accelerated in glibc — line scanning at >10 GB/s vs
 * ~0.4 GB/s for a per-byte loop. */
static inline Py_ssize_t find_eol(const unsigned char* p, Py_ssize_t i,
                                  Py_ssize_t n) {
  const void* hit = memchr(p + i, '\n', (size_t)(n - i));
  return hit ? (const unsigned char*)hit - p : n;
}

namespace {

/* byte -> 2-bit code, -1 for anything not ACGTacgt (identical to the
 * Python ENCODE_LUT and to reference src/fastaIO.h:123-139). */
struct EncodeLut {
  int8_t t[256];
  EncodeLut() {
    std::memset(t, -1, sizeof(t));
    t[(unsigned char)'A'] = t[(unsigned char)'a'] = 0;
    t[(unsigned char)'C'] = t[(unsigned char)'c'] = 1;
    t[(unsigned char)'G'] = t[(unsigned char)'g'] = 2;
    t[(unsigned char)'T'] = t[(unsigned char)'t'] = 3;
  }
};
const EncodeLut kLut;

/* parse_encode(data: bytes, min_qual_byte=0) -> (codes: bytes, lengths: bytes)
 *
 * codes   = all records' int8 codes concatenated (no separators);
 * lengths = int64 little-endian per-record lengths, len(records) * 8 bytes.
 * Format is sniffed from the first non-blank byte: '>' = FASTA,
 * '@' = FASTQ (4-line records, quality skipped).  Headers are dropped
 * (per-read output is positional); multi-line FASTA records are
 * concatenated without interior newlines; blank lines are skipped;
 * \r\n line endings are handled.
 *
 * min_qual_byte > 0 enables FASTQ quality masking: a base whose
 * Phred+33 quality byte is < min_qual_byte encodes as -1 (exactly an
 * 'N' — every window covering it is invalid).  FASTA has no qualities;
 * the flag is a no-op there.  Matches io.fasta._mask_low_qual.
 */
/* FASTQ validation errors, matching iter_fastq (cfrk_tpu/io/fasta.py):
 * raised as ValueError after re-acquiring the GIL. */
const char* kErrHeader = "malformed FASTQ header";
const char* kErrPlus = "malformed FASTQ record: missing '+' line";
const char* kErrQual = "malformed FASTQ record: quality length mismatch";

PyObject* parse_encode(PyObject*, PyObject* args) {
  Py_buffer view;
  int min_qual_byte = 0;
  if (!PyArg_ParseTuple(args, "y*|i", &view, &min_qual_byte)) return nullptr;
  const unsigned char qthr = (unsigned char)(min_qual_byte > 0 ? min_qual_byte : 0);
  const unsigned char* p = (const unsigned char*)view.buf;
  const Py_ssize_t n = view.len;

  std::vector<int8_t> codes;
  std::vector<int64_t> lengths;
  codes.reserve((size_t)n);
  bool in_record = false;
  int64_t cur_len = 0;
  const char* errmsg = nullptr;

  Py_BEGIN_ALLOW_THREADS
  Py_ssize_t sniff = 0;
  while (sniff < n && (p[sniff] == '\n' || p[sniff] == '\r')) sniff++;
  const bool fastq = sniff < n && p[sniff] == '@';

  Py_ssize_t i = sniff;
  int fq_line = 0; /* 0=header 1=seq 2=plus 3=qual */
  int64_t seq_len = 0;
  while (i < n) {
    /* line = [i, eol) */
    Py_ssize_t eol = find_eol(p, i, n);
    Py_ssize_t end = eol;
    if (end > i && p[end - 1] == '\r') end--;
    if (fastq) {
      /* Empty lines ADVANCE the 4-line cycle (a quality-trimmed read
       * can be zero-length) — except before a header, matching the
       * Python parser which skips blanks only at header position. */
      if (end == i && fq_line == 0) {
        i = eol + 1;
        continue;
      }
      if (fq_line == 0 && p[i] != '@') {
        errmsg = kErrHeader;
        break;
      }
      if (fq_line == 1) {
        size_t base = codes.size();
        codes.resize(base + (size_t)(end - i));
        int8_t* dst = codes.data() + base;
        for (Py_ssize_t j = i; j < end; j++) *dst++ = kLut.t[p[j]];
        seq_len = end - i;
        lengths.push_back(seq_len);
      }
      if (fq_line == 2 && (end == i || p[i] != '+')) {
        errmsg = kErrPlus;
        break;
      }
      if (fq_line == 3) {
        if (end - i != seq_len) {
          errmsg = kErrQual;
          break;
        }
        if (qthr) {
          /* quality masking: the record's codes are the last seq_len
           * entries (nothing appends between the seq and qual lines) */
          int8_t* rec = codes.data() + (codes.size() - (size_t)seq_len);
          for (Py_ssize_t j = 0; j < seq_len; j++)
            if (p[i + j] < qthr) rec[j] = -1;
        }
      }
      fq_line = (fq_line + 1) & 3;
    } else if (end > i) {
      if (p[i] == '>') {
        if (in_record) lengths.push_back(cur_len);
        in_record = true;
        cur_len = 0;
      } else if (in_record) {
        size_t base = codes.size();
        codes.resize(base + (size_t)(end - i));
        int8_t* dst = codes.data() + base;
        for (Py_ssize_t j = i; j < end; j++) *dst++ = kLut.t[p[j]];
        cur_len += end - i;
      }
    }
    i = eol + 1;
  }
  if (!errmsg && fastq && fq_line != 0) {
    /* EOF mid-record.  Mirror iter_fastq reading empty lines at EOF:
     * missing plus line -> kErrPlus; missing qual -> mismatch unless
     * the sequence was itself empty. */
    if (fq_line < 3)
      errmsg = kErrPlus;
    else if (seq_len != 0)
      errmsg = kErrQual;
  }
  if (!fastq && in_record) lengths.push_back(cur_len);
  Py_END_ALLOW_THREADS

  PyBuffer_Release(&view);
  if (errmsg) {
    PyErr_SetString(PyExc_ValueError, errmsg);
    return nullptr;
  }
  PyObject* codes_b =
      PyBytes_FromStringAndSize((const char*)codes.data(), (Py_ssize_t)codes.size());
  if (!codes_b) return nullptr;
  PyObject* lens_b = PyBytes_FromStringAndSize(
      (const char*)lengths.data(), (Py_ssize_t)(lengths.size() * sizeof(int64_t)));
  if (!lens_b) {
    Py_DECREF(codes_b);
    return nullptr;
  }
  PyObject* out = PyTuple_Pack(2, codes_b, lens_b);
  Py_DECREF(codes_b);
  Py_DECREF(lens_b);
  return out;
}

/* parse_encode_stream(data, is_fastq, final)
 *     -> (codes: bytes, lengths: bytes/int64-LE, end_offsets: bytes/int64-LE,
 *         consumed: int)
 *
 * Chunked variant for streaming ingest (the reference's ingest was one
 * C pass over the whole file, src/fastaIO.h:24-102; at streaming scale
 * we parse 64 MB blocks instead).  Parses only records COMPLETE within
 * `data`; `consumed` is the byte position where the next chunk must
 * resume (the caller carries data[consumed:] and prepends it to the
 * next block).  `end_offsets[i]` is the position just past record i,
 * relative to this buffer — the caller rebases by the file offset of
 * the buffer start; these are the checkpoint/resume seek points (same
 * contract as io.fasta.iter_encoded_with_offsets).  A FASTA record is
 * complete at the next '>' line or at `final` EOF; a FASTQ record when
 * its 4 lines are complete.  `is_fastq` comes from the caller's sniff
 * of the file head (a mid-file chunk cannot sniff itself).
 */
/* One FASTA segment [lo, hi) parsed with the sequential rules.
 * Non-tail segments end exactly at the start of a '>' line, so they
 * parse with final=true (their last record provably ends at hi, and
 * its end offset IS hi — the start of the next header — matching the
 * sequential emit rule).  Only the tail segment may hold an incomplete
 * trailing record. */
struct SegOut {
  std::vector<int8_t> codes;
  std::vector<int64_t> lengths;
  std::vector<int64_t> offsets;
  Py_ssize_t consumed = 0;
};

void parse_fasta_segment(const unsigned char* p, Py_ssize_t lo,
                         Py_ssize_t hi, bool final_chunk, SegOut* out) {
  std::vector<int8_t>& codes = out->codes;
  codes.reserve((size_t)(hi - lo)); /* no mid-parse reallocation */
  Py_ssize_t i = lo;
  bool in_record = false;
  Py_ssize_t rec_start = lo;
  size_t rec_code_start = 0;
  bool incomplete = false;
  while (i < hi) {
    Py_ssize_t eol = find_eol(p, i, hi);
    if (eol >= hi && !final_chunk) {
      incomplete = true; /* unterminated line: re-parse next chunk */
      break;
    }
    Py_ssize_t end = eol;
    if (end > i && p[end - 1] == '\r') end--;
    if (end > i) {
      if (p[i] == '>') {
        if (in_record) {
          out->lengths.push_back((int64_t)(codes.size() - rec_code_start));
          out->offsets.push_back(i); /* start of the next header line */
          out->consumed = i;
        }
        in_record = true;
        rec_start = i;
        rec_code_start = codes.size();
      } else if (in_record) {
        size_t base = codes.size();
        codes.resize(base + (size_t)(end - i));
        int8_t* dst = codes.data() + base;
        for (Py_ssize_t j = i; j < end; j++) *dst++ = kLut.t[p[j]];
      }
    }
    i = eol < hi ? eol + 1 : hi;
  }
  if (final_chunk) {
    if (in_record) {
      out->lengths.push_back((int64_t)(codes.size() - rec_code_start));
      out->offsets.push_back(hi);
    }
    out->consumed = hi;
  } else if (in_record || incomplete) {
    /* Trailing record may continue in the next chunk: drop its
     * partial codes and hand the bytes back via `consumed`. */
    codes.resize(rec_code_start);
    out->consumed = in_record ? rec_start : i;
  } else {
    out->consumed = i;
  }
}

PyObject* parse_encode_stream(PyObject*, PyObject* args) {
  Py_buffer view;
  int is_fastq, final_chunk;
  int min_qual_byte = 0;
  if (!PyArg_ParseTuple(args, "y*pp|i", &view, &is_fastq, &final_chunk,
                        &min_qual_byte))
    return nullptr;
  const unsigned char qthr = (unsigned char)(min_qual_byte > 0 ? min_qual_byte : 0);
  const unsigned char* p = (const unsigned char*)view.buf;
  const Py_ssize_t n = view.len;

  std::vector<int8_t> codes;
  std::vector<int64_t> lengths;
  std::vector<int64_t> offsets;
  codes.reserve((size_t)n);
  const char* errmsg = nullptr;
  Py_ssize_t consumed = 0;

  Py_BEGIN_ALLOW_THREADS
  if (is_fastq) {
    Py_ssize_t i = 0;
    while (i < n && !errmsg) {
      /* skip blank lines at header position */
      while (i < n && (p[i] == '\n' || p[i] == '\r')) {
        /* only skip blank LINES: \r must be line-final */
        Py_ssize_t j = i;
        while (j < n && p[j] == '\r') j++;
        if (j < n && p[j] == '\n') {
          i = j + 1;
        } else if (j >= n && final_chunk) {
          /* trailing bare CR(s) at EOF: an rstripped-empty line the
           * Python parser skips — not a malformed header */
          i = n;
        } else {
          break; /* '\r' not followed by '\n': part of a (weird) line */
        }
      }
      if (i >= n) break;
      const Py_ssize_t rec = i;
      /* 4 lines: header, seq, plus, qual — all must be complete */
      Py_ssize_t ls[4], le[4];
      Py_ssize_t pos = i;
      bool ok = true;
      for (int l = 0; l < 4; l++) {
        Py_ssize_t eol = find_eol(p, pos, n);
        if (eol >= n && !final_chunk) {
          ok = false;
          break;
        }
        Py_ssize_t end = eol;
        if (end > pos && p[end - 1] == '\r') end--;
        ls[l] = pos;
        le[l] = end;
        pos = eol < n ? eol + 1 : n;
        if (eol >= n && l < 3) {
          /* EOF (final) mid-record: mirror iter_fastq's empty reads */
          for (int m = l + 1; m < 4; m++) {
            ls[m] = n;
            le[m] = n;
          }
          break;
        }
      }
      if (!ok) break; /* incomplete record: consumed stays at rec */
      if (le[0] == ls[0] || p[ls[0]] != '@') {
        errmsg = kErrHeader;
        break;
      }
      const Py_ssize_t seq_len = le[1] - ls[1];
      if (le[2] == ls[2] || p[ls[2]] != '+') {
        errmsg = kErrPlus;
        break;
      }
      if (le[3] - ls[3] != seq_len) {
        errmsg = kErrQual;
        break;
      }
      {
        size_t base = codes.size();
        codes.resize(base + (size_t)seq_len);
        int8_t* dst = codes.data() + base;
        if (qthr) {
          /* quality masking: qual byte < threshold -> -1 (an 'N') */
          const unsigned char* q = p + ls[3];
          for (Py_ssize_t j = 0; j < seq_len; j++)
            dst[j] = q[j] < qthr ? (int8_t)-1 : kLut.t[p[ls[1] + j]];
        } else {
          for (Py_ssize_t j = ls[1]; j < le[1]; j++) *dst++ = kLut.t[p[j]];
        }
      }
      lengths.push_back(seq_len);
      offsets.push_back(pos);
      consumed = pos;
      i = pos;
      (void)rec;
    }
  } else {
    /* FASTA parses segment-parallel: split at '>' line starts (every
     * "\n>" is a record boundary) and parse each segment with the same
     * sequential rules; only the tail segment can hold an incomplete
     * record.  ~Tx the single-thread parse for streaming ingest. */
    int T = 1;
    const Py_ssize_t kParMin = 8 << 20;
    if (n >= kParMin) {
      unsigned hc = std::thread::hardware_concurrency();
      T = hc ? (int)(hc < 4 ? hc : 4) : 1;
    }
    std::vector<Py_ssize_t> bounds;
    bounds.push_back(0);
    for (int t = 1; t < T; t++) {
      Py_ssize_t target = n * t / T;
      if (target <= bounds.back()) target = bounds.back();
      const void* hit =
          target < n ? memmem(p + target, (size_t)(n - target), "\n>", 2)
                     : nullptr;
      bounds.push_back(hit ? ((const unsigned char*)hit - p) + 1 : n);
    }
    bounds.push_back(n);
    std::vector<std::pair<Py_ssize_t, Py_ssize_t>> segs;
    for (size_t t = 0; t + 1 < bounds.size(); t++)
      if (bounds[t] < bounds[t + 1]) segs.push_back({bounds[t], bounds[t + 1]});
    if (segs.empty()) segs.push_back({0, n});

    std::vector<SegOut> outs(segs.size());
    std::vector<std::thread> workers;
    for (size_t t = 0; t < segs.size(); t++) {
      const bool tail = t + 1 == segs.size();
      workers.emplace_back(parse_fasta_segment, p, segs[t].first,
                           segs[t].second,
                           tail ? (bool)final_chunk : true, &outs[t]);
    }
    for (auto& w : workers) w.join();

    size_t ncodes = 0, nrec = 0;
    for (auto& o : outs) {
      ncodes += o.codes.size();
      nrec += o.lengths.size();
    }
    codes.reserve(ncodes);
    lengths.reserve(nrec);
    offsets.reserve(nrec);
    for (auto& o : outs) {
      codes.insert(codes.end(), o.codes.begin(), o.codes.end());
      lengths.insert(lengths.end(), o.lengths.begin(), o.lengths.end());
      offsets.insert(offsets.end(), o.offsets.begin(), o.offsets.end());
    }
    consumed = outs.back().consumed;
  }
  Py_END_ALLOW_THREADS

  PyBuffer_Release(&view);
  if (errmsg) {
    PyErr_SetString(PyExc_ValueError, errmsg);
    return nullptr;
  }
  PyObject* codes_b = PyBytes_FromStringAndSize((const char*)codes.data(),
                                                (Py_ssize_t)codes.size());
  PyObject* lens_b = PyBytes_FromStringAndSize(
      (const char*)lengths.data(), (Py_ssize_t)(lengths.size() * sizeof(int64_t)));
  PyObject* offs_b = PyBytes_FromStringAndSize(
      (const char*)offsets.data(), (Py_ssize_t)(offsets.size() * sizeof(int64_t)));
  if (!codes_b || !lens_b || !offs_b) {
    Py_XDECREF(codes_b);
    Py_XDECREF(lens_b);
    Py_XDECREF(offs_b);
    return nullptr;
  }
  PyObject* out = Py_BuildValue("(NNNn)", codes_b, lens_b, offs_b, consumed);
  return out;
}

/* pack_records(flat: bytes/int8, lengths: bytes/int64-LE, batch_rows,
 *              row_len) -> bytes
 *
 * Assemble a padded [batch_rows, row_len] int8 batch from a flat code
 * buffer + per-record lengths: row i = record i's codes then -1 padding;
 * rows past the record count are all -1.  memcpy/memset per record —
 * the multi-GB/s replacement of the Python boolean-scatter packer
 * (pipeline/batch.pad_reads_flat), and the analog of the reference's
 * OpenMP chunk copies (src/main.cu:186-190).
 */
PyObject* pack_records(PyObject*, PyObject* args) {
  Py_buffer flat_view, lens_view;
  Py_ssize_t batch_rows, row_len;
  if (!PyArg_ParseTuple(args, "y*y*nn", &flat_view, &lens_view, &batch_rows,
                        &row_len))
    return nullptr;
  const int8_t* flat = (const int8_t*)flat_view.buf;
  const int64_t* lens = (const int64_t*)lens_view.buf;
  const Py_ssize_t n_rec = lens_view.len / (Py_ssize_t)sizeof(int64_t);
  if (n_rec > batch_rows) {
    PyBuffer_Release(&flat_view);
    PyBuffer_Release(&lens_view);
    PyErr_SetString(PyExc_ValueError, "more records than batch rows");
    return nullptr;
  }
  int64_t total = 0;
  bool too_long = false;
  for (Py_ssize_t i = 0; i < n_rec; i++) {
    total += lens[i];
    if (lens[i] > row_len) too_long = true;
  }
  if (too_long || total != (int64_t)flat_view.len) {
    PyBuffer_Release(&flat_view);
    PyBuffer_Release(&lens_view);
    PyErr_SetString(
        PyExc_ValueError,
        too_long ? "record longer than row_len"
                 : "lengths do not sum to the flat buffer size");
    return nullptr;
  }
  PyObject* out = PyBytes_FromStringAndSize(nullptr, batch_rows * row_len);
  if (!out) {
    PyBuffer_Release(&flat_view);
    PyBuffer_Release(&lens_view);
    return nullptr;
  }
  int8_t* dst = (int8_t*)PyBytes_AS_STRING(out);
  Py_BEGIN_ALLOW_THREADS
  const int8_t* src = flat;
  for (Py_ssize_t i = 0; i < n_rec; i++) {
    const int64_t L = lens[i];
    std::memcpy(dst, src, (size_t)L);
    std::memset(dst + L, 0xFF, (size_t)(row_len - L)); /* -1 padding */
    src += L;
    dst += row_len;
  }
  std::memset(dst, 0xFF, (size_t)((batch_rows - n_rec) * row_len));
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&flat_view);
  PyBuffer_Release(&lens_view);
  return out;
}

/* Two-digit lookup: "00010203...9899".  Emitting digit PAIRS halves the
 * divide chain of the classic digit-at-a-time itoa — measured 1.5-1.9x
 * single-core on the pair formatters (docs/PERF.md "Native .cfrk
 * formatters"); the divides by 100 compile to multiply-shift. */
static const char kDigits2[201] =
    "00010203040506070809101112131415161718192021222324"
    "25262728293031323334353637383940414243444546474849"
    "50515253545556575859606162636465666768697071727374"
    "75767778798081828384858687888990919293949596979899";

/* Emit a non-negative integer as ascii into out; returns new end. */
inline char* emit_u64(char* out, uint64_t v) {
  if (v < 10) {  /* the overwhelmingly common count=1..9 cell */
    *out++ = (char)('0' + (unsigned)v);
    return out;
  }
  if (v < 100) {
    std::memcpy(out, kDigits2 + 2 * (unsigned)v, 2);
    return out + 2;
  }
  char tmp[20];
  char* p = tmp + sizeof(tmp);
  while (v >= 100) {
    const unsigned r = (unsigned)(v % 100);
    v /= 100;
    p -= 2;
    std::memcpy(p, kDigits2 + 2 * r, 2);
  }
  if (v >= 10) {
    p -= 2;
    std::memcpy(p, kDigits2 + 2 * (unsigned)v, 2);
  } else {
    *--p = (char)('0' + (unsigned)v);
  }
  const size_t len = (size_t)(tmp + sizeof(tmp) - p);
  std::memcpy(out, p, len);
  return out + len;
}

/* Run fn(r0, r1, seg) over [0, n_rows) split into row-contiguous
 * segments, one worker thread + private output buffer each; the caller
 * concatenates the segments in order.  Byte-exactness is structural:
 * the split is at row boundaries and each row's leading-'\n' rule
 * depends only on its GLOBAL index (r > 0 || !first), which fn applies.
 * Serial below ~4 MB of estimated output — thread spawn would dominate.
 * The formatter analog of the 4-way segment-parallel parser above. */
template <typename Fn>
static std::vector<std::vector<char>> format_row_segments(
    Py_ssize_t n_rows, size_t est_total, Fn fn) {
  unsigned hc = std::thread::hardware_concurrency();
  unsigned T = hc ? (hc < 8 ? hc : 8) : 1;
  /* CFRK_FORMAT_THREADS caps the worker count (0/unset = auto).  Used
   * by tools/bench_format.py to pin single-core emitter numbers. */
  if (const char* env = getenv("CFRK_FORMAT_THREADS")) {
    const long cap = atol(env);
    if (cap > 0 && (unsigned)cap < T) T = (unsigned)cap;
  }
  if ((Py_ssize_t)T > n_rows) T = (unsigned)(n_rows > 0 ? n_rows : 1);
  if (est_total < (4u << 20)) T = 1;
  std::vector<std::vector<char>> segs(T);
  for (auto& s : segs) s.reserve(est_total / T + 64);
  if (T == 1) {
    fn((Py_ssize_t)0, n_rows, segs[0]);
    return segs;
  }
  std::vector<std::thread> workers;
  workers.reserve(T);
  for (unsigned t = 0; t < T; t++) {
    const Py_ssize_t r0 = n_rows * (Py_ssize_t)t / (Py_ssize_t)T;
    const Py_ssize_t r1 = n_rows * (Py_ssize_t)(t + 1) / (Py_ssize_t)T;
    workers.emplace_back(
        [&fn, &segs, r0, r1, t] { fn(r0, r1, segs[t]); });
  }
  for (auto& w : workers) w.join();
  return segs;
}

/* Concatenate segments into one PyBytes (called WITH the GIL). */
static PyObject* segments_to_bytes(
    const std::vector<std::vector<char>>& segs) {
  size_t total = 0;
  for (const auto& s : segs) total += s.size();
  PyObject* out = PyBytes_FromStringAndSize(nullptr, (Py_ssize_t)total);
  if (!out) return nullptr;
  char* dst = PyBytes_AS_STRING(out);
  for (const auto& s : segs) {
    std::memcpy(dst, s.data(), s.size());
    dst += s.size();
  }
  return out;
}

/* format_rows(counts: bytes/int32-LE, n_rows, n_cols, first) -> bytes
 *
 * The exact .cfrk byte contract (reference src/main.cu:26-62 + goldens):
 * every row is "idx:count " for ALL idx in [0, n_cols), joined by "\n"
 * with no trailing newline; `first=False` prefixes a "\n" (streaming
 * continuation of an already-started file).
 */
PyObject* format_rows(PyObject*, PyObject* args) {
  Py_buffer view;
  Py_ssize_t n_rows, n_cols;
  int first;
  if (!PyArg_ParseTuple(args, "y*nnp", &view, &n_rows, &n_cols, &first))
    return nullptr;
  if ((Py_ssize_t)(n_rows * n_cols * sizeof(int32_t)) != view.len) {
    PyBuffer_Release(&view);
    PyErr_SetString(PyExc_ValueError, "counts buffer size mismatch");
    return nullptr;
  }
  const int32_t* c = (const int32_t*)view.buf;

  std::vector<std::vector<char>> segs;
  Py_BEGIN_ALLOW_THREADS
  if ((size_t)n_cols <= ((size_t)1 << 22)) {
    /* Template path: rows are overwhelmingly "j:0 " cells, so emit each
     * row as memcpy spans of a precomputed all-zero template broken
     * only at nonzero cells (same structure as format_dense_pairs).
     * tmpl <= ~34 MB at the 4M-column bound; 512 KB at k=8. */
    std::vector<char> tmpl;
    std::vector<size_t> cell_off(n_cols + 1, 0);
    {
      char buf[24];
      for (Py_ssize_t j = 0; j < n_cols; j++) {
        char* e = emit_u64(buf, (uint64_t)j);
        *e++ = ':';
        *e++ = '0';
        *e++ = ' ';
        tmpl.insert(tmpl.end(), buf, e);
        cell_off[j + 1] = tmpl.size();
      }
    }
    segs = format_row_segments(
        n_rows, (size_t)n_rows * (tmpl.size() + 64) + 64,
        [&](Py_ssize_t r0, Py_ssize_t r1, std::vector<char>& out) {
          const char* t = tmpl.data();
          /* Upper bound: every cell's "0" may become <= 10 digits.
           * Sized per CHUNK of rows (not the whole segment) to keep
           * the transient allocation bounded for dense blocks. */
          const size_t row_cap = tmpl.size() + (size_t)n_cols * 9 + 1;
          const Py_ssize_t chunk =
              (Py_ssize_t)((((size_t)64 << 20) / row_cap) + 1);
          for (Py_ssize_t c0 = r0; c0 < r1; c0 += chunk) {
            const Py_ssize_t c1 = c0 + chunk < r1 ? c0 + chunk : r1;
            const size_t base = out.size();
            out.resize(base + (size_t)(c1 - c0) * row_cap);
            char* dst = out.data() + base;
            for (Py_ssize_t r = c0; r < c1; r++) {
              if (r > 0 || !first) *dst++ = '\n';
              const int32_t* row = c + r * n_cols;
              size_t pos = 0;
              for (Py_ssize_t j = 0; j < n_cols; j++) {
                if (row[j] == 0) continue;
                const size_t cs = cell_off[j];
                std::memcpy(dst, t + pos, cs - pos);
                dst += cs - pos;
                const size_t plen = cell_off[j + 1] - 2 - cs;
                std::memcpy(dst, t + cs, plen);
                dst += plen;
                dst = emit_u64(dst, (uint64_t)(uint32_t)row[j]);
                *dst++ = ' ';
                pos = cell_off[j + 1];
              }
              std::memcpy(dst, t + pos, tmpl.size() - pos);
              dst += tmpl.size() - pos;
            }
            out.resize((size_t)(dst - out.data()));
          }
        });
  } else {
  /* Huge-row path (e.g. a dense k=15 row has 4^15 columns — a template
   * would be ~14 GB).  Precompute "idx:" prefixes once per call —
   * shared (read-only) by every worker.  Offsets are size_t: the
   * prefix bytes alone are ~10.7 GB at k=15, overflowing 32-bit
   * offsets. */
  std::vector<char> prefixes;
  std::vector<size_t> pref_off(n_cols + 1, 0);
  {
    char buf[24];
    for (Py_ssize_t j = 0; j < n_cols; j++) {
      char* e = emit_u64(buf, (uint64_t)j);
      *e++ = ':';
      pref_off[j + 1] = pref_off[j] + (size_t)(e - buf);
      prefixes.insert(prefixes.end(), buf, e);
    }
  }
  /* "idx:" ≤ 11 chars + count ≤ 10 + space + newline */
  segs = format_row_segments(
      n_rows, (size_t)n_rows * (size_t)n_cols * 8 + 64,
      [&](Py_ssize_t r0, Py_ssize_t r1, std::vector<char>& out) {
        char num[24];
        for (Py_ssize_t r = r0; r < r1; r++) {
          if (r > 0 || !first) out.push_back('\n');
          const int32_t* row = c + r * n_cols;
          for (Py_ssize_t j = 0; j < n_cols; j++) {
            out.insert(out.end(), prefixes.begin() + pref_off[j],
                       prefixes.begin() + pref_off[j + 1]);
            char* e = emit_u64(num, (uint64_t)(uint32_t)row[j]);
            *e++ = ' ';
            out.insert(out.end(), num, e);
          }
        }
      });
  }
  Py_END_ALLOW_THREADS

  PyBuffer_Release(&view);
  return segments_to_bytes(segs);
}

/* format_pairs(idx: bytes/int32-LE, counts: bytes/int32-LE, n_rows,
 *              n_cols, first) -> bytes
 *
 * Sparse per-read rows: cells "idx:count " only where count > 0 (rows
 * may be empty).  Same separators as the dense format; `first=False`
 * prefixes "\n".  Matches cfrk_tpu.format.format_rows_pairs.
 */
PyObject* format_pairs(PyObject*, PyObject* args) {
  Py_buffer idx_view, cnt_view;
  Py_ssize_t n_rows, n_cols;
  int first;
  if (!PyArg_ParseTuple(args, "y*y*nnp", &idx_view, &cnt_view, &n_rows,
                        &n_cols, &first))
    return nullptr;
  const Py_ssize_t need = n_rows * n_cols * (Py_ssize_t)sizeof(int32_t);
  if (idx_view.len != need || cnt_view.len != need) {
    PyBuffer_Release(&idx_view);
    PyBuffer_Release(&cnt_view);
    PyErr_SetString(PyExc_ValueError, "pair buffer size mismatch");
    return nullptr;
  }
  const int32_t* idx = (const int32_t*)idx_view.buf;
  const int32_t* cnt = (const int32_t*)cnt_view.buf;

  std::vector<std::vector<char>> segs;
  Py_BEGIN_ALLOW_THREADS
  segs = format_row_segments(
      n_rows, (size_t)(n_rows * n_cols) * 4 + 64,
      [&](Py_ssize_t r0, Py_ssize_t r1, std::vector<char>& out) {
        /* Chunked resize + raw-pointer emit: per-cell vector::insert
         * was the dominant cost (capacity check + memmove machinery
         * per 4-12 byte cell) — measured 1.9x single-core. */
        const size_t row_cap = (size_t)n_cols * 23 + 1;
        const Py_ssize_t chunk =
            (Py_ssize_t)((((size_t)64 << 20) / row_cap) + 1);
        for (Py_ssize_t c0 = r0; c0 < r1; c0 += chunk) {
          const Py_ssize_t c1 = c0 + chunk < r1 ? c0 + chunk : r1;
          const size_t base = out.size();
          out.resize(base + (size_t)(c1 - c0) * row_cap);
          char* dst = out.data() + base;
          for (Py_ssize_t r = c0; r < c1; r++) {
            if (r > 0 || !first) *dst++ = '\n';
            const int32_t* ri = idx + r * n_cols;
            const int32_t* rc = cnt + r * n_cols;
            for (Py_ssize_t j = 0; j < n_cols; j++) {
              if (rc[j] <= 0) continue;
              dst = emit_u64(dst, (uint64_t)(uint32_t)ri[j]);
              *dst++ = ':';
              dst = emit_u64(dst, (uint64_t)(uint32_t)rc[j]);
              *dst++ = ' ';
            }
          }
          out.resize((size_t)(dst - out.data()));
        }
      });
  Py_END_ALLOW_THREADS

  PyBuffer_Release(&idx_view);
  PyBuffer_Release(&cnt_view);
  return segments_to_bytes(segs);
}

/* format_dense_pairs(idx: bytes/int32-LE, counts: bytes/int32-LE,
 *                    n_rows, n_cols, fk, first) -> bytes
 *
 * DENSE rows ("idx:count " for ALL idx in [0, fk), reference
 * src/main.cu:26-62) materialised from sparse per-read (idx, counts)
 * pair matrices: each row's valid cells are ascending in idx, cells
 * with count <= 0 are sentinel padding.  Byte-identical to format_rows
 * on the densified matrix, without the caller ever building it — the
 * streaming driver ships 2*W pairs per read off-device instead of the
 * 4^k dense row (~57x less D2H at k=8/150 bp) and densifies here,
 * inside the walk the dense text format forces anyway.
 */
PyObject* format_dense_pairs(PyObject*, PyObject* args) {
  Py_buffer idx_view, cnt_view;
  Py_ssize_t n_rows, n_cols, fk;
  int first;
  if (!PyArg_ParseTuple(args, "y*y*nnnp", &idx_view, &cnt_view, &n_rows,
                        &n_cols, &fk, &first))
    return nullptr;
  const Py_ssize_t need = n_rows * n_cols * (Py_ssize_t)sizeof(int32_t);
  if (idx_view.len != need || cnt_view.len != need || fk <= 0) {
    PyBuffer_Release(&idx_view);
    PyBuffer_Release(&cnt_view);
    PyErr_SetString(PyExc_ValueError, "pair buffer size mismatch");
    return nullptr;
  }
  const int32_t* idx = (const int32_t*)idx_view.buf;
  const int32_t* cnt = (const int32_t*)cnt_view.buf;

  std::vector<std::vector<char>> segs;
  Py_BEGIN_ALLOW_THREADS
  /* Template row "0:0 1:0 ... fk-1:0 " + per-cell start offsets.  A
   * row is overwhelmingly zero cells (a 150 bp read touches <= 143 of
   * 4^8 bins), so each row becomes ~nnz memcpy spans of the template
   * plus one custom "j:count " emit per nonzero cell — instead of fk
   * per-cell emits.  tmpl is 512 KB at k=8 (cache-resident). */
  std::vector<char> tmpl;
  std::vector<size_t> cell_off(fk + 1, 0);
  {
    char buf[24];
    for (Py_ssize_t j = 0; j < fk; j++) {
      char* e = emit_u64(buf, (uint64_t)j);
      *e++ = ':';
      *e++ = '0';
      *e++ = ' ';
      tmpl.insert(tmpl.end(), buf, e);
      cell_off[j + 1] = tmpl.size();
    }
  }
  segs = format_row_segments(
      n_rows,
      (size_t)n_rows * (tmpl.size() + (size_t)n_cols * 12 + 1) + 64,
      [&](Py_ssize_t r0, Py_ssize_t r1, std::vector<char>& out) {
        /* Raw-pointer writes into an upper-bound-sized buffer: each
         * nonzero cell replaces the template's "0" with <= 10 digits,
         * so a row is at most tmpl.size() + 9*n_cols + 1 bytes.  Rows
         * are chunked so the transient over-allocation stays bounded
         * (~64 MB) — the segment shrinks to its real size as it goes. */
        const char* t = tmpl.data();
        const size_t row_cap = tmpl.size() + (size_t)n_cols * 9 + 1;
        const Py_ssize_t chunk =
            (Py_ssize_t)((((size_t)64 << 20) / row_cap) + 1);
        for (Py_ssize_t c0 = r0; c0 < r1; c0 += chunk) {
          const Py_ssize_t c1 = c0 + chunk < r1 ? c0 + chunk : r1;
          const size_t base = out.size();
          out.resize(base + (size_t)(c1 - c0) * row_cap);
          char* dst = out.data() + base;
          for (Py_ssize_t r = c0; r < c1; r++) {
            if (r > 0 || !first) *dst++ = '\n';
            const int32_t* ri = idx + r * n_cols;
            const int32_t* rc = cnt + r * n_cols;
            size_t pos = 0;  // template bytes already emitted
            for (Py_ssize_t p = 0; p < n_cols; p++) {
              if (rc[p] <= 0) continue;  // sentinel padding
              const int32_t j = ri[p];
              if (j < 0 || j >= (int32_t)fk) continue;  // range guard
              const size_t cs = cell_off[j];
              if (cs < pos) continue;  // non-ascending input guard
              std::memcpy(dst, t + pos, cs - pos);  // zero-run span
              dst += cs - pos;
              /* "j:" = the cell's template bytes minus the "0 " tail. */
              const size_t plen = cell_off[j + 1] - 2 - cs;
              std::memcpy(dst, t + cs, plen);
              dst += plen;
              dst = emit_u64(dst, (uint64_t)(uint32_t)rc[p]);
              *dst++ = ' ';
              pos = cell_off[j + 1];
            }
            std::memcpy(dst, t + pos, tmpl.size() - pos);
            dst += tmpl.size() - pos;
          }
          out.resize((size_t)(dst - out.data()));
        }
      });
  Py_END_ALLOW_THREADS

  PyBuffer_Release(&idx_view);
  PyBuffer_Release(&cnt_view);
  return segments_to_bytes(segs);
}

/* format_pairs64(idx: bytes/uint64-LE, counts: bytes/int32-LE, n_rows,
 *                n_cols, first) -> bytes
 *
 * 64-bit variant of format_pairs for k > 15 combined codes. */
PyObject* format_pairs64(PyObject*, PyObject* args) {
  Py_buffer idx_view, cnt_view;
  Py_ssize_t n_rows, n_cols;
  int first;
  if (!PyArg_ParseTuple(args, "y*y*nnp", &idx_view, &cnt_view, &n_rows,
                        &n_cols, &first))
    return nullptr;
  if (idx_view.len != n_rows * n_cols * (Py_ssize_t)sizeof(uint64_t) ||
      cnt_view.len != n_rows * n_cols * (Py_ssize_t)sizeof(int32_t)) {
    PyBuffer_Release(&idx_view);
    PyBuffer_Release(&cnt_view);
    PyErr_SetString(PyExc_ValueError, "pair64 buffer size mismatch");
    return nullptr;
  }
  const uint64_t* idx = (const uint64_t*)idx_view.buf;
  const int32_t* cnt = (const int32_t*)cnt_view.buf;

  std::vector<std::vector<char>> segs;
  Py_BEGIN_ALLOW_THREADS
  segs = format_row_segments(
      n_rows, (size_t)(n_rows * n_cols) * 8 + 64,
      [&](Py_ssize_t r0, Py_ssize_t r1, std::vector<char>& out) {
        /* Chunked resize + raw emit, as in format_pairs; 64-bit idx
         * emits up to 20 digits. */
        const size_t row_cap = (size_t)n_cols * 33 + 1;
        const Py_ssize_t chunk =
            (Py_ssize_t)((((size_t)64 << 20) / row_cap) + 1);
        for (Py_ssize_t c0 = r0; c0 < r1; c0 += chunk) {
          const Py_ssize_t c1 = c0 + chunk < r1 ? c0 + chunk : r1;
          const size_t base = out.size();
          out.resize(base + (size_t)(c1 - c0) * row_cap);
          char* dst = out.data() + base;
          for (Py_ssize_t r = c0; r < c1; r++) {
            if (r > 0 || !first) *dst++ = '\n';
            const uint64_t* ri = idx + r * n_cols;
            const int32_t* rc = cnt + r * n_cols;
            for (Py_ssize_t j = 0; j < n_cols; j++) {
              if (rc[j] <= 0) continue;
              dst = emit_u64(dst, ri[j]);
              *dst++ = ':';
              dst = emit_u64(dst, (uint64_t)(uint32_t)rc[j]);
              *dst++ = ' ';
            }
          }
          out.resize((size_t)(dst - out.data()));
        }
      });
  Py_END_ALLOW_THREADS

  PyBuffer_Release(&idx_view);
  PyBuffer_Release(&cnt_view);
  return segments_to_bytes(segs);
}

/* ---- format_kmer_tsv: sparse-spectrum text rows ----------------------
 *
 * format_kmer_tsv(keys: bytes/uint64-LE, counts: bytes/int64-LE, n, k,
 *                 min_count) -> bytes
 *
 * One "KMERSTRING\tcount\n" row per key with count >= min_count —
 * byte-identical to the pure-Python decode_key writer (cli._write_sparse).
 * The base string decodes 2 bits/base MSB-first over "ACGT".  The
 * round-4 at-scale sparse leg spent ~30 min in the Python row loop at
 * 186M keys; this is the threaded native replacement (same segment
 * discipline as the .cfrk formatters).
 */
PyObject* format_kmer_tsv(PyObject*, PyObject* args) {
  Py_buffer kv, cv;
  Py_ssize_t n, k, min_count;
  if (!PyArg_ParseTuple(args, "y*y*nnn", &kv, &cv, &n, &k, &min_count))
    return nullptr;
  auto fail = [&](const char* msg) -> PyObject* {
    PyBuffer_Release(&kv);
    PyBuffer_Release(&cv);
    PyErr_SetString(PyExc_ValueError, msg);
    return nullptr;
  };
  if (kv.len != n * (Py_ssize_t)sizeof(uint64_t) ||
      cv.len != n * (Py_ssize_t)sizeof(int64_t))
    return fail("format_kmer_tsv buffer size mismatch");
  if (k < 1 || k > 32) return fail("k out of range");
  const uint64_t* keys = (const uint64_t*)kv.buf;
  const int64_t* cnts = (const int64_t*)cv.buf;
  const int64_t mc = min_count < 1 ? 1 : min_count;
  static const char kBases[4] = {'A', 'C', 'G', 'T'};

  std::vector<std::vector<char>> segs;
  Py_BEGIN_ALLOW_THREADS
  segs = format_row_segments(
      n, (size_t)n * ((size_t)k + 8),
      [&](Py_ssize_t r0, Py_ssize_t r1, std::vector<char>& out) {
        const size_t row_cap = (size_t)k + 24;  /* bases + \t + 20 digits + \n */
        const Py_ssize_t chunk =
            (Py_ssize_t)((((size_t)32 << 20) / row_cap) + 1);
        for (Py_ssize_t c0 = r0; c0 < r1; c0 += chunk) {
          const Py_ssize_t c1 = c0 + chunk < r1 ? c0 + chunk : r1;
          const size_t base = out.size();
          out.resize(base + (size_t)(c1 - c0) * row_cap);
          char* dst = out.data() + base;
          for (Py_ssize_t r = c0; r < c1; r++) {
            if (cnts[r] < mc) continue;
            const uint64_t key = keys[r];
            for (Py_ssize_t i = 0; i < k; i++)
              *dst++ = kBases[(key >> (2 * (uint64_t)(k - 1 - i))) & 3];
            *dst++ = '\t';
            dst = emit_u64(dst, (uint64_t)cnts[r]);
            *dst++ = '\n';
          }
          out.resize((size_t)(dst - out.data()));
        }
      });
  Py_END_ALLOW_THREADS
  PyObject* res = segments_to_bytes(segs);
  PyBuffer_Release(&kv);
  PyBuffer_Release(&cv);
  return res;
}

/* ---- fold_pairs: threaded (key, count) -> dense table histogram ----
 *
 * The host side of the sorted spectrum route for k <= 10: the rowsort
 * kernel ships narrowed (idx, count) pair matrices (uint16/int32 idx,
 * uint8/int16/int32 counts); this folds them into a dense int64 table.
 * NumPy's bincount-with-weights measures ~30 ms per 32768-read batch on
 * this VM (float64 weights path); the typed loop with thread-private
 * tables is ~10-20x that.  The TPU-native analog of the reference's
 * device-memory accumulate (reference src/kmer_kernel.cu:87), placed on
 * the host because every DEVICE fold candidate measured 3-15x worse
 * than the one-hot kernel it would replace (tools/fold_probe.py,
 * docs/PERF.md "Device-side fold candidates").
 */
template <typename I, typename C, typename T>
static void fold_range(const I* idx, const C* cnt, Py_ssize_t i0,
                       Py_ssize_t i1, T* table, size_t bins) {
  /* The loop is bound by the random table access: prefetching the bin
   * PF cells ahead overlaps the load misses (round-5 single-core
   * probe: +11% at k=10's 4-8 MB table, ~neutral at k=9 where the
   * int32 table is L2-resident and per-row-sorted keys already stream
   * well).  The bigger lever is the int32 table variant below
   * (1.2-1.3x: half the random-access working set). */
  constexpr Py_ssize_t PF = 16;
  Py_ssize_t i = i0;
  for (; i + PF < i1; i++) {
    const size_t vp = (size_t)(typename std::make_unsigned<I>::type)idx[i + PF];
    if (vp < bins) __builtin_prefetch(&table[vp], 1, 1);
    const int64_t c = (int64_t)cnt[i];
    /* Unsigned cast: a negative int32 (impossible from the kernels,
     * cheap to guard) wraps huge and fails the bounds check.  Sentinel
     * cells carry count 0 and are skipped; the uint16-compacted
     * sentinel wraps to 0 but also always carries count 0. */
    const size_t v = (size_t)(typename std::make_unsigned<I>::type)idx[i];
    if (c > 0 && v < bins) table[v] += (T)c;
  }
  for (; i < i1; i++) {
    const int64_t c = (int64_t)cnt[i];
    const size_t v = (size_t)(typename std::make_unsigned<I>::type)idx[i];
    if (c > 0 && v < bins) table[v] += (T)c;
  }
}

template <typename I, typename C>
static void fold_dispatch(const void* idx_raw, const void* cnt_raw,
                          Py_ssize_t n, int64_t* table, Py_ssize_t bins) {
  const I* idx = (const I*)idx_raw;
  const C* cnt = (const C*)cnt_raw;
  unsigned hc = std::thread::hardware_concurrency();
  unsigned T = hc ? (hc < 8 ? hc : 8) : 1;
  if (const char* env = getenv("CFRK_FOLD_THREADS")) {
    const long cap = atol(env);
    if (cap > 0 && (unsigned)cap < T) T = (unsigned)cap;
  }
  /* Private tables cost T*bins*4-8 bytes: go serial when the elements
   * are few (thread spawn dominates) or the table is large (k > 10
   * never takes this path — the sparse accumulator owns it). */
  if (n < (Py_ssize_t)(1 << 20) || bins > (Py_ssize_t)(16 << 20)) T = 1;
  /* int32 (private/scratch) tables halve the random-access working set
   * (the real bound: an int64 k=10 table is 8 MB — past L2 on any
   * core; measured 1.2-1.3x single-core, round 5).  Exact whenever the
   * call's TOTAL count mass fits int32 — for RLE pair matrices it
   * always does (counts sum to <= windows/batch), but the entry point
   * is generic, so measure it: one sequential SIMD-friendly pass
   * (~0.3 ms for 8M int16) buys the certainty. */
  int64_t total = 0;
  for (Py_ssize_t i = 0; i < n; i++) {
    const int64_t c = (int64_t)cnt[i];
    total += c > 0 ? c : 0;
  }
  const bool narrow = total < (int64_t)INT32_MAX;
  if (T <= 1) {
    if (narrow && n >= (Py_ssize_t)(1 << 18)) {
      std::vector<int32_t> scratch((size_t)bins, 0);
      fold_range<I, C, int32_t>(idx, cnt, 0, n, scratch.data(),
                                (size_t)bins);
      for (Py_ssize_t b = 0; b < bins; b++) table[b] += scratch[(size_t)b];
    } else {
      fold_range<I, C, int64_t>(idx, cnt, 0, n, table, (size_t)bins);
    }
    return;
  }
  std::vector<std::vector<int64_t>> priv64(narrow ? 0 : T);
  std::vector<std::vector<int32_t>> priv32(narrow ? T : 0);
  std::vector<std::thread> workers;
  workers.reserve(T);
  for (unsigned t = 0; t < T; t++) {
    const Py_ssize_t i0 = n * (Py_ssize_t)t / (Py_ssize_t)T;
    const Py_ssize_t i1 = n * (Py_ssize_t)(t + 1) / (Py_ssize_t)T;
    workers.emplace_back([&, t, i0, i1] {
      if (narrow) {
        priv32[t].assign((size_t)bins, 0);
        fold_range<I, C, int32_t>(idx, cnt, i0, i1, priv32[t].data(),
                                  (size_t)bins);
      } else {
        priv64[t].assign((size_t)bins, 0);
        fold_range<I, C, int64_t>(idx, cnt, i0, i1, priv64[t].data(),
                                  (size_t)bins);
      }
    });
  }
  for (auto& w : workers) w.join();
  /* Parallel merge by bin range. */
  std::vector<std::thread> mergers;
  mergers.reserve(T);
  for (unsigned t = 0; t < T; t++) {
    const Py_ssize_t b0 = bins * (Py_ssize_t)t / (Py_ssize_t)T;
    const Py_ssize_t b1 = bins * (Py_ssize_t)(t + 1) / (Py_ssize_t)T;
    mergers.emplace_back([&, b0, b1] {
      if (narrow) {
        for (const auto& p : priv32)
          for (Py_ssize_t b = b0; b < b1; b++) table[b] += p[(size_t)b];
      } else {
        for (const auto& p : priv64)
          for (Py_ssize_t b = b0; b < b1; b++) table[b] += p[(size_t)b];
      }
    });
  }
  for (auto& w : mergers) w.join();
}

/* fold_pairs(idx: bytes, idx_itemsize, counts: bytes, cnt_itemsize,
 *            n, table: writable int64 buffer) -> None
 *
 * idx dtypes: uint16 (itemsize 2) / int32 (4); counts: uint8 (1) /
 * int16 (2) / int32 (4) — exactly the narrow_for_fetch drain dtypes.
 * Cells with count <= 0 or idx >= len(table) are skipped. */
PyObject* fold_pairs(PyObject*, PyObject* args) {
  Py_buffer idx_view, cnt_view, tab_view;
  Py_ssize_t idx_item, cnt_item, n;
  if (!PyArg_ParseTuple(args, "y*ny*nnw*", &idx_view, &idx_item, &cnt_view,
                        &cnt_item, &n, &tab_view))
    return nullptr;
  auto fail = [&](const char* msg) -> PyObject* {
    PyBuffer_Release(&idx_view);
    PyBuffer_Release(&cnt_view);
    PyBuffer_Release(&tab_view);
    PyErr_SetString(PyExc_ValueError, msg);
    return nullptr;
  };
  if (idx_view.len != n * idx_item || cnt_view.len != n * cnt_item)
    return fail("fold buffer size mismatch");
  if (tab_view.len % (Py_ssize_t)sizeof(int64_t))
    return fail("table must be int64");
  const Py_ssize_t bins = tab_view.len / (Py_ssize_t)sizeof(int64_t);
  int64_t* table = (int64_t*)tab_view.buf;
  const void* ib = idx_view.buf;
  const void* cb = cnt_view.buf;
  bool ok = true;
  Py_BEGIN_ALLOW_THREADS
  if (idx_item == 2 && cnt_item == 1)
    fold_dispatch<uint16_t, uint8_t>(ib, cb, n, table, bins);
  else if (idx_item == 2 && cnt_item == 2)
    fold_dispatch<uint16_t, int16_t>(ib, cb, n, table, bins);
  else if (idx_item == 2 && cnt_item == 4)
    fold_dispatch<uint16_t, int32_t>(ib, cb, n, table, bins);
  else if (idx_item == 4 && cnt_item == 1)
    fold_dispatch<int32_t, uint8_t>(ib, cb, n, table, bins);
  else if (idx_item == 4 && cnt_item == 2)
    fold_dispatch<int32_t, int16_t>(ib, cb, n, table, bins);
  else if (idx_item == 4 && cnt_item == 4)
    fold_dispatch<int32_t, int32_t>(ib, cb, n, table, bins);
  else if (idx_item == 2 && cnt_item == 8)
    fold_dispatch<uint16_t, int64_t>(ib, cb, n, table, bins);
  else if (idx_item == 4 && cnt_item == 8)
    fold_dispatch<int32_t, int64_t>(ib, cb, n, table, bins);
  else
    ok = false;
  Py_END_ALLOW_THREADS
  if (!ok) return fail("unsupported fold dtype combination");
  PyBuffer_Release(&idx_view);
  PyBuffer_Release(&cnt_view);
  PyBuffer_Release(&tab_view);
  Py_RETURN_NONE;
}

PyMethodDef kMethods[] = {
    {"parse_encode", parse_encode, METH_VARARGS,
     "parse_encode(fasta_bytes, min_qual_byte=0) -> "
     "(codes_int8_bytes, lengths_int64le_bytes)"},
    {"parse_encode_stream", parse_encode_stream, METH_VARARGS,
     "parse_encode_stream(chunk, is_fastq, final, min_qual_byte=0) -> "
     "(codes, lengths_i64, end_offsets_i64, consumed)"},
    {"pack_records", pack_records, METH_VARARGS,
     "pack_records(flat_int8, lengths_i64, batch_rows, row_len) -> "
     "padded int8 bytes"},
    {"format_rows", format_rows, METH_VARARGS,
     "format_rows(counts_int32le, n_rows, n_cols, first) -> cfrk bytes"},
    {"format_pairs", format_pairs, METH_VARARGS,
     "format_pairs(idx_int32le, counts_int32le, n_rows, n_cols, first) -> bytes"},
    {"format_dense_pairs", format_dense_pairs, METH_VARARGS,
     "format_dense_pairs(idx_int32le, counts_int32le, n_rows, n_cols, fk, "
     "first) -> dense cfrk bytes"},
    {"format_pairs64", format_pairs64, METH_VARARGS,
     "format_pairs64(idx_uint64le, counts_int32le, n_rows, n_cols, first) -> bytes"},
    {"format_kmer_tsv", format_kmer_tsv, METH_VARARGS,
     "format_kmer_tsv(keys_u64le, counts_i64le, n, k, min_count) -> "
     "KMERSTRING\\tcount rows (threaded)"},
    {"fold_pairs", fold_pairs, METH_VARARGS,
     "fold_pairs(idx_bytes, idx_itemsize, cnt_bytes, cnt_itemsize, n, "
     "table_int64_writable) -> None (threaded histogram fold)"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "_fastaio",
    "Native FASTA ingest + .cfrk formatting", -1, kMethods,
};

}  // namespace

PyMODINIT_FUNC PyInit__fastaio(void) { return PyModule_Create(&kModule); }

// Fast point-cloud text parsing + threaded batch loading (C ABI).
//
// Native replacement for the reference data layer's np.loadtxt hot path
// (SURVEY.md §2.2: the ModelNet/ShapeNetPart loaders parse large float
// text tables per shape).  Hand-rolled decimal float scanner (no locale,
// no strtof) + a thread pool for batch loading.  Exposed through ctypes
// (mm3d_tpu/data/native_io.py).

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Parse a text table of `cols` floats per row (separators: spaces,
// commas, tabs, newlines).  Writes at most max_rows*cols floats into
// `out`.  Returns the number of rows parsed, or -1 on I/O error.
int64_t mm3d_parse_table(const char* path, float* out, int64_t max_rows,
                         int64_t cols) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<char> buf(size + 1);
  if (fread(buf.data(), 1, size, f) != (size_t)size) {
    fclose(f);
    return -1;
  }
  fclose(f);
  buf[size] = '\0';

  const char* p = buf.data();
  const char* end = buf.data() + size;
  int64_t n = 0;
  int64_t total = max_rows * cols;
  static const double kPow10[] = {1e0,  1e-1, 1e-2, 1e-3, 1e-4, 1e-5,
                                  1e-6, 1e-7, 1e-8, 1e-9, 1e-10};
  while (p < end && n < total) {
    // skip separators
    while (p < end && (*p == ' ' || *p == ',' || *p == '\t' || *p == '\n' ||
                       *p == '\r'))
      ++p;
    if (p >= end) break;
    // hand-rolled decimal parse: [-+]digits[.digits][eE[-+]digits]
    bool neg = false;
    if (*p == '-') { neg = true; ++p; }
    else if (*p == '+') { ++p; }
    if (p >= end || ((*p < '0' || *p > '9') && *p != '.')) { ++p; continue; }
    double mant = 0.0;
    while (p < end && *p >= '0' && *p <= '9') mant = mant * 10.0 + (*p++ - '0');
    int frac = 0;
    if (p < end && *p == '.') {
      ++p;
      while (p < end && *p >= '0' && *p <= '9' && frac < 10) {
        mant = mant * 10.0 + (*p++ - '0');
        ++frac;
      }
      while (p < end && *p >= '0' && *p <= '9') ++p;  // excess precision
    }
    double v = mant * kPow10[frac];
    if (p < end && (*p == 'e' || *p == 'E')) {
      ++p;
      bool eneg = false;
      if (p < end && (*p == '-' || *p == '+')) eneg = (*p++ == '-');
      int ex = 0;
      while (p < end && *p >= '0' && *p <= '9') ex = ex * 10 + (*p++ - '0');
      double scale = 1.0;
      while (ex >= 8) { scale *= 1e8; ex -= 8; }
      while (ex--) scale *= 10.0;
      v = eneg ? v / scale : v * scale;
    }
    out[n++] = (float)(neg ? -v : v);
  }
  return n / cols;
}

// Parse many files in parallel.  `paths` is
// an array of C strings.  Each file i is parsed into
// out + i*max_rows*cols; rows_out[i] receives its row count.
void mm3d_parse_many(const char** paths, int64_t n_files, float* out,
                     int64_t* rows_out, int64_t max_rows, int64_t cols,
                     int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> workers;
  std::atomic<int64_t> next(0);
  auto work = [&]() {
    while (true) {
      int64_t i = next.fetch_add(1);
      if (i >= n_files) break;
      rows_out[i] =
          mm3d_parse_table(paths[i], out + i * max_rows * cols, max_rows,
                           cols);
    }
  };
  for (int t = 0; t < n_threads; ++t) workers.emplace_back(work);
  for (auto& w : workers) w.join();
}

}  // extern "C"

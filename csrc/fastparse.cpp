// Native data-path kernels for dlrm_yx_tpu.
//
// TPU-native equivalent of the reference's native data tooling: the
// Cython-compiled Criteo preprocessing (/root/reference/cython/) and the
// one-syscall-per-batch binary reader (data_loader_terabyte.py:205-253).
// Exposed through ctypes (see dlrm_yx_tpu/data/fastparse.py).
//
// Functions:
//   fp_parse_raw_tsv   raw Criteo TSV -> (y, X_int, X_cat) int32 arrays
//   fp_read_bin_batch  pread one batch of 40xint32 records, transform to
//                      (y f32, log1p(dense) f32, cat%range i32)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <fcntl.h>
#include <unistd.h>
#include <sys/stat.h>

namespace {

constexpr int kDen = 13;
constexpr int kSpa = 26;
constexpr int kTot = 1 + kDen + kSpa;

// xorshift128+ for sub-sampling decisions (seeded per call for determinism)
struct Rng {
  uint64_t s0, s1;
  explicit Rng(uint64_t seed) : s0(seed ^ 0x9E3779B97F4A7C15ull), s1(seed + 1) {
    for (int i = 0; i < 8; i++) next();
  }
  uint64_t next() {
    uint64_t x = s0, y = s1;
    s0 = y;
    x ^= x << 23;
    s1 = x ^ y ^ (x >> 17) ^ (y >> 26);
    return s1 + y;
  }
  double uniform() { return (next() >> 11) * (1.0 / 9007199254740992.0); }
};

inline int32_t parse_dec(const char* p, const char* end) {
  if (p >= end || *p == '\0') return 0;
  bool neg = false;
  if (*p == '-') { neg = true; ++p; }
  long v = 0;
  while (p < end && *p >= '0' && *p <= '9') v = v * 10 + (*p++ - '0');
  return static_cast<int32_t>(neg ? -v : v);
}

inline uint64_t parse_hex(const char* p, const char* end) {
  uint64_t v = 0;
  while (p < end) {
    char c = *p++;
    uint64_t d;
    if (c >= '0' && c <= '9') d = c - '0';
    else if (c >= 'a' && c <= 'f') d = c - 'a' + 10;
    else if (c >= 'A' && c <= 'F') d = c - 'A' + 10;
    else break;
    v = (v << 4) | d;
  }
  return v;
}

}  // namespace

extern "C" {

// Parses the whole file. Caller passes pre-allocated outputs sized for
// `max_rows` rows (use fp_count_lines first). Returns rows written, or -1.
long fp_parse_raw_tsv(const char* path, long max_rows, long max_ind_range,
                      double sub_sample_rate, uint64_t seed,
                      int32_t* y_out, int32_t* xint_out, int32_t* xcat_out) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  char* line = nullptr;
  size_t cap = 0;
  ssize_t len;
  long n = 0;
  Rng rng(seed);
  while ((len = getline(&line, &cap, f)) >= 0 && n < max_rows) {
    const char* end = line + len;
    // split on tabs in place
    const char* fields[kTot];
    const char* fends[kTot];
    int nf = 0;
    const char* p = line;
    while (nf < kTot) {
      fields[nf] = p;
      const char* q = p;
      while (q < end && *q != '\t' && *q != '\n') ++q;
      fends[nf] = q;
      ++nf;
      if (q >= end || *q == '\n') break;
      p = q + 1;
    }
    int32_t target = nf > 0 ? parse_dec(fields[0], fends[0]) : 0;
    if (target == 0 && sub_sample_rate > 0.0 && rng.uniform() < sub_sample_rate)
      continue;
    y_out[n] = target;
    for (int j = 0; j < kDen; j++) {
      int k = 1 + j;
      xint_out[n * kDen + j] =
          (k < nf && fends[k] > fields[k]) ? parse_dec(fields[k], fends[k]) : 0;
    }
    for (int j = 0; j < kSpa; j++) {
      int k = 1 + kDen + j;
      uint64_t raw =
          (k < nf && fends[k] > fields[k]) ? parse_hex(fields[k], fends[k]) : 0;
      if (max_ind_range > 0) raw %= static_cast<uint64_t>(max_ind_range);
      xcat_out[n * kSpa + j] = static_cast<int32_t>(raw);
    }
    ++n;
  }
  free(line);
  fclose(f);
  return n;
}

long fp_count_lines(const char* path) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  char buf[1 << 20];
  long count = 0;
  ssize_t r;
  char last = '\n';
  while ((r = read(fd, buf, sizeof(buf))) > 0) {
    for (ssize_t i = 0; i < r; i++) count += (buf[i] == '\n');
    last = buf[r - 1];
  }
  close(fd);
  if (last != '\n') count += 1;  // unterminated final line
  return count;
}

// One-syscall batch read + decode. Outputs: y [B] f32, dense [B,13] f32
// (log1p), cat [B,26] i32 (mod range). Returns rows read, or -1.
long fp_read_bin_batch(const char* path, long batch_idx, long batch_size,
                       long max_ind_range, float* y_out, float* dense_out,
                       int32_t* cat_out) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  const long rec_bytes = kTot * 4;
  const long off = batch_idx * batch_size * rec_bytes;
  int32_t* buf = static_cast<int32_t*>(malloc(batch_size * rec_bytes));
  ssize_t got = pread(fd, buf, batch_size * rec_bytes, off);
  close(fd);
  if (got < 0) {
    free(buf);
    return -1;
  }
  long rows = got / rec_bytes;
  for (long i = 0; i < rows; i++) {
    const int32_t* rec = buf + i * kTot;
    y_out[i] = static_cast<float>(rec[0]);
    for (int j = 0; j < kDen; j++)
      dense_out[i * kDen + j] = log1pf(static_cast<float>(rec[1 + j]));
    for (int j = 0; j < kSpa; j++) {
      int64_t v = rec[1 + kDen + j];
      if (max_ind_range > 0) {
        v %= max_ind_range;
        if (v < 0) v += max_ind_range;
      }
      cat_out[i * kSpa + j] = static_cast<int32_t>(v);
    }
  }
  free(buf);
  return rows;
}

}  // extern "C"

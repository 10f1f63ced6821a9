// NDA digest fast path (reference capability: nda_digest_t,
// boda_base.H:1051-1073 — fuzzy tensor summaries for golden tests).
//
// Produces the same fields as boda_tpu/core/digest.py nda_digest():
//   vmin / vmax exact; avg / rms via pairwise (numpy-compatible blocked)
//   summation; qhash = sha256 of int64 round-half-to-even quantization of
//   v / max(|vmin|,|vmax|,1e-30) * 2^20, truncated to 16 hex chars.
#include <cfenv>
#include <cmath>
#include <cstdint>
#include <vector>

#include "sha256.h"

namespace {

// pairwise summation over f(x) to keep error O(log n) like numpy's mean
template <typename F>
double pairwise_sum(const double *v, size_t n, F f) {
  if (n <= 128) {
    double s = 0;
    for (size_t i = 0; i < n; i++) s += f(v[i]);
    return s;
  }
  size_t half = (n / 2) & ~size_t(7);  // 8-aligned split like numpy
  return pairwise_sum(v, half, f) + pairwise_sum(v + half, n - half, f);
}

}  // namespace

extern "C" {

// Computes digest stats for a float64 buffer. Returns 0 on success.
// out_stats = [vmin, vmax, avg, rms]; out_qhash must hold >= 17 bytes.
int boda_nda_digest(const double *v, int64_t cnt, double *out_stats,
                    char *out_qhash) {
  if (cnt < 0) return 1;
  if (cnt == 0) {
    out_stats[0] = out_stats[1] = out_stats[2] = out_stats[3] = 0.0;
    out_qhash[0] = 0;
    return 0;
  }
  double vmin = v[0], vmax = v[0];
  for (int64_t i = 1; i < cnt; i++) {
    if (v[i] < vmin) vmin = v[i];
    if (v[i] > vmax) vmax = v[i];
  }
  double sum = pairwise_sum(v, (size_t)cnt, [](double x) { return x; });
  double sumsq = pairwise_sum(v, (size_t)cnt, [](double x) { return x * x; });
  out_stats[0] = vmin;
  out_stats[1] = vmax;
  out_stats[2] = sum / (double)cnt;
  out_stats[3] = std::sqrt(sumsq / (double)cnt);

  double mag = std::fabs(vmin) > std::fabs(vmax) ? std::fabs(vmin) : std::fabs(vmax);
  if (mag < 1e-30) mag = 1e-30;
  const double scale = double(1 << 20) / mag;
  boda_tpu::Sha256 sha;
  // hash in chunks so we never materialize the whole int64 array
  int64_t q[4096];
  int64_t off = 0;
  while (off < cnt) {
    int64_t take = cnt - off < 4096 ? cnt - off : 4096;
    for (int64_t i = 0; i < take; i++)
      q[i] = (int64_t)std::nearbyint(v[off + i] * scale);  // half-to-even
    sha.update(q, (size_t)take * 8);
    off += take;
  }
  sha.final_hex(out_qhash, 16);
  return 0;
}

}  // extern "C"

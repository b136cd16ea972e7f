// bandbuild: multithreaded diagonal-band scatter + derived reductions.
//
// The TPU engine's per-chromosome prep (hicpeaks_tpu/ops/band.py) turns
// sparse upper-triangle pixels into a dense [num_p, Lp] float32 band plus
// O(L) vectors (per-diagonal balanced sums / NaN counts for the expected
// model of scripts/pyHICCUPS:150-158, per-bin balanced column sums for
// the gap filter of callers.py:238).  In numpy that is several boolean
// fancy-index copies and bincounts over ~1e7 pixels — the dominant host
// cost at genome scale (benchmarks/STAGE_PROFILE_r02*.json).  This kernel
// does it in one threaded pass.
//
// C ABI for ctypes:
//   band_build(bin1, bin2, count, n, weights, L, num, num_p, Lp, ww_min,
//              raw, csum, nan_counts, colsum,
//              out_dd, out_b1, out_cvals, out_ct) -> n_selected (or -1)
//
// Caller contract: raw/csum/nan_counts/colsum are pre-zeroed; the four
// out_* arrays hold >= n elements and come back compacted to the selected
// pixels (0 <= d < num, bins in range).  Pixels are assumed unique
// (ingestion dedups), so the raw scatter is race-free across threads.
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" int64_t band_build(
    const int64_t* bin1, const int64_t* bin2, const double* count, int64_t n,
    const double* weights, int64_t L, int64_t num, int64_t num_p, int64_t Lp,
    int64_t ww_min, float* raw, double* csum, int64_t* nan_counts,
    double* colsum, int64_t* out_dd, int64_t* out_b1, double* out_cvals,
    double* out_ct) {
  if (n < 0 || L <= 0 || num <= 0 || num_p < num || Lp < L) return -1;

  unsigned hw = std::thread::hardware_concurrency();
  int64_t n_threads = hw ? static_cast<int64_t>(hw) : 4;
  if (n_threads > 16) n_threads = 16;
  if (n_threads < 1) n_threads = 1;
  int64_t chunk = (n + n_threads - 1) / n_threads;
  if (chunk < 1) chunk = 1;

  auto selected = [&](int64_t i) -> bool {
    int64_t b1 = bin1[i], b2 = bin2[i];
    int64_t d = b2 - b1;
    return d >= 0 && d < num && b1 >= 0 && b2 < L;
  };

  // phase 1: per-slice selected counts -> compacted output offsets
  std::vector<int64_t> slice_counts(n_threads, 0);
  {
    std::vector<std::thread> ts;
    for (int64_t t = 0; t < n_threads; ++t) {
      ts.emplace_back([&, t] {
        int64_t lo = t * chunk, hi = std::min(n, (t + 1) * chunk);
        int64_t c = 0;
        for (int64_t i = lo; i < hi; ++i) c += selected(i) ? 1 : 0;
        slice_counts[t] = c;
      });
    }
    for (auto& th : ts) th.join();
  }
  std::vector<int64_t> offsets(n_threads + 1, 0);
  for (int64_t t = 0; t < n_threads; ++t)
    offsets[t + 1] = offsets[t] + slice_counts[t];

  // phase 2: scatter + thread-local reductions
  std::vector<std::vector<double>> csum_l(n_threads),
      colsum_l(n_threads);
  std::vector<std::vector<int64_t>> nan_l(n_threads);
  {
    std::vector<std::thread> ts;
    for (int64_t t = 0; t < n_threads; ++t) {
      ts.emplace_back([&, t] {
        csum_l[t].assign(num_p, 0.0);
        colsum_l[t].assign(Lp, 0.0);
        nan_l[t].assign(num_p, 0);
        int64_t lo = t * chunk, hi = std::min(n, (t + 1) * chunk);
        int64_t o = offsets[t];
        for (int64_t i = lo; i < hi; ++i) {
          if (!selected(i)) continue;
          int64_t b1 = bin1[i], b2 = bin2[i];
          int64_t d = b2 - b1;
          double ct = count[i];
          raw[d * Lp + b1] = static_cast<float>(ct);
          double wp = weights[b1] * weights[b2];
          double cval;
          if (std::isnan(wp)) {
            nan_l[t][d] += 1;
            cval = 0.0;
          } else {
            cval = ct * wp;
            csum_l[t][d] += cval;
            if (d >= ww_min) colsum_l[t][b1] += cval;
          }
          out_dd[o] = d;
          out_b1[o] = b1;
          out_cvals[o] = cval;
          out_ct[o] = ct;
          ++o;
        }
      });
    }
    for (auto& th : ts) th.join();
  }

  for (int64_t t = 0; t < n_threads; ++t) {
    for (int64_t d = 0; d < num_p; ++d) {
      csum[d] += csum_l[t][d];
      nan_counts[d] += nan_l[t][d];
    }
    for (int64_t x = 0; x < Lp; ++x) colsum[x] += colsum_l[t][x];
  }
  return offsets[n_threads];
}

// Host-side batched searchsorted — the C++ counterpart of the reference's
// torchsearchsorted CPU extension (d_nerf/torchsearchsorted/src/cpu/
// searchsorted_cpu_wrapper.cpp): row-wise binary search of V values into A
// sorted entries per row, with row broadcasting when one side has a single
// row. On TPU the live importance-sampling path is the Pallas kernel
// (swnerf_tpu/ops/pallas/sample_pdf.py); this library serves host-side data
// prep and as a fast oracle for tests/benchmarks.
//
// C ABI only (consumed via ctypes; no pybind11 in this image).

#include <cstdint>
#include <thread>
#include <vector>

namespace {

// Index of the first (side=0/left) or last+1 (side=1/right) position where
// `val` fits in the sorted row `row[0..len)`.
inline int64_t bisect(const float* row, int64_t len, float val, int side) {
  int64_t lo = 0, hi = len;
  while (lo < hi) {
    int64_t mid = (lo + hi) >> 1;
    bool go_right = side ? !(val < row[mid]) : (row[mid] < val);
    if (go_right)
      lo = mid + 1;
    else
      hi = mid;
  }
  return lo;
}

}  // namespace

extern "C" {

// a: [ba, A] sorted rows; v: [bv, V] query rows; out: [max(ba,bv), V].
// Rows broadcast when ba == 1 or bv == 1 (reference searchsorted.py:20-53).
// side: 0 = left, 1 = right. n_threads <= 0 -> hardware concurrency.
void swnerf_searchsorted(const float* a, int64_t ba, int64_t A,
                         const float* v, int64_t bv, int64_t V,
                         int64_t* out, int side, int n_threads) {
  const int64_t rows = ba > bv ? ba : bv;
  int nt = n_threads > 0 ? n_threads
                         : (int)std::thread::hardware_concurrency();
  if (nt < 1) nt = 1;
  if (nt > rows) nt = (int)rows;

  auto work = [&](int64_t r0, int64_t r1) {
    for (int64_t r = r0; r < r1; ++r) {
      const float* arow = a + (ba == 1 ? 0 : r) * A;
      const float* vrow = v + (bv == 1 ? 0 : r) * V;
      int64_t* orow = out + r * V;
      for (int64_t j = 0; j < V; ++j) orow[j] = bisect(arow, A, vrow[j], side);
    }
  };

  if (nt == 1) {
    work(0, rows);
    return;
  }
  std::vector<std::thread> threads;
  const int64_t chunk = (rows + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    int64_t r0 = t * chunk;
    int64_t r1 = r0 + chunk < rows ? r0 + chunk : rows;
    if (r0 >= r1) break;
    threads.emplace_back(work, r0, r1);
  }
  for (auto& th : threads) th.join();
}

}  // extern "C"

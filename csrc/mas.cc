// Monotonic Alignment Search — host-side native kernel.
//
// Role parity with the reference's numba kernel (monotonic_align/core.py:
// 4-35): batch-parallel Viterbi DP + backtrack on CPU. The TPU training path
// uses the on-device Pallas/scan kernels; this native kernel serves the
// host-side tooling (offline alignment extraction, tests, CPU fallback).
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC -o libmas.so mas.cc
#include <algorithm>
#include <cstdint>

extern "C" {

// paths:   [b, t_y_max, t_x_max] int32 (out, zero-initialized by caller)
// values:  [b, t_y_max, t_x_max] float32 (in: neg_cent; scratch-mutated)
// t_ys, t_xs: [b] int32 per-sample lengths
void maximum_path_batch(int32_t* paths, float* values,
                        const int32_t* t_ys, const int32_t* t_xs,
                        int64_t b, int64_t t_y_max, int64_t t_x_max) {
  constexpr float kNeg = -1e9f;
#pragma omp parallel for schedule(dynamic)
  for (int64_t i = 0; i < b; ++i) {
    float* value = values + i * t_y_max * t_x_max;
    int32_t* path = paths + i * t_y_max * t_x_max;
    const int32_t t_y = t_ys[i];
    const int32_t t_x = t_xs[i];

    for (int32_t y = 0; y < t_y; ++y) {
      const int32_t x_lo = std::max<int32_t>(0, t_x + y - t_y);
      const int32_t x_hi = std::min<int32_t>(t_x, y + 1);
      float* row = value + (int64_t)y * t_x_max;
      const float* prev = value + (int64_t)(y - 1) * t_x_max;
      for (int32_t x = x_lo; x < x_hi; ++x) {
        const float v_cur = (x == y) ? kNeg : prev[x];
        const float v_prev =
            (x == 0) ? (y == 0 ? 0.f : kNeg) : prev[x - 1];
        row[x] += std::max(v_prev, v_cur);
      }
    }

    int32_t index = t_x - 1;
    for (int32_t y = t_y - 1; y >= 0; --y) {
      path[(int64_t)y * t_x_max + index] = 1;
      const float* prev = value + (int64_t)(y - 1) * t_x_max;
      if (index != 0 &&
          (index == y || prev[index] < prev[index - 1])) {
        --index;
      }
    }
  }
}

}  // extern "C"

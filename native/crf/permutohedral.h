// Permutohedral lattice for high-dimensional Gaussian filtering
// (Adams, Baek, Davis 2010) — the workhorse behind dense-CRF message
// passing.  Fresh implementation for sggan_tpu's eval-time CRF
// (replaces the reference's pydensecrf C++ dependency, metric.py:5-6).
#pragma once

#include <cstdint>
#include <vector>

class Permutohedral {
 public:
  // features: n points, d dims, row-major [n, d]
  void init(const float* features, int n, int d);
  // Filter `value_size` channels: in/out row-major [n, value_size].
  // Applies splat -> blur -> slice.  in and out may not alias.
  void compute(float* out, const float* in, int value_size) const;

 private:
  int n_ = 0, d_ = 0;
  int m_ = 0;  // number of lattice points
  std::vector<int32_t> offset_;   // [n, d+1] lattice-point index per simplex vertex
  std::vector<float> barycentric_;  // [n, d+1]
  std::vector<int32_t> blur_neighbors_;  // [d+1, m, 2]
};

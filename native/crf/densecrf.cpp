// Dense CRF mean-field inference on a 2D image grid — the TPU-framework's
// native replacement for the reference's pydensecrf dependency
// (metric.py:49-69: DenseCRF2D + Gaussian pairwise (sxy, compat) +
// bilateral pairwise (sxy, srgb, rgbim, compat), N inference iterations).
//
// Update rule (Krähenbühl & Koltun 2011, Potts compatibility, symmetric
// kernel normalization): Q <- softmax(-U + sum_k w_k * Kbar_k(Q)) where
// Kbar is the symmetrically-normalized Gaussian filter computed with a
// permutohedral lattice.

#include <cmath>
#include <cstring>
#include <vector>

#include "permutohedral.h"

namespace {

void softmax_rows(float* q, const float* energy, int n, int c) {
  for (int i = 0; i < n; ++i) {
    const float* e = energy + static_cast<size_t>(i) * c;
    float mx = e[0];
    for (int j = 1; j < c; ++j) mx = std::max(mx, e[j]);
    float sum = 0.f;
    float* qi = q + static_cast<size_t>(i) * c;
    for (int j = 0; j < c; ++j) {
      qi[j] = std::exp(e[j] - mx);
      sum += qi[j];
    }
    const float inv = 1.f / sum;
    for (int j = 0; j < c; ++j) qi[j] *= inv;
  }
}

struct NormalizedFilter {
  Permutohedral lattice;
  std::vector<float> norm;  // symmetric normalization 1/sqrt(K 1)

  void init(const float* features, int n, int d) {
    lattice.init(features, n, d);
    std::vector<float> ones(n, 1.f);
    norm.assign(n, 0.f);
    lattice.compute(norm.data(), ones.data(), 1);
    for (int i = 0; i < n; ++i)
      norm[i] = 1.f / std::sqrt(std::max(norm[i], 1e-20f));
  }

  // out += w * Kbar(q); tmp buffers provided by caller ([n, c] each).
  void apply(float* out, const float* q, float w, int n, int c,
             float* t1, float* t2) const {
    for (int i = 0; i < n; ++i)
      for (int j = 0; j < c; ++j)
        t1[static_cast<size_t>(i) * c + j] =
            q[static_cast<size_t>(i) * c + j] * norm[i];
    lattice.compute(t2, t1, c);
    for (int i = 0; i < n; ++i)
      for (int j = 0; j < c; ++j)
        out[static_cast<size_t>(i) * c + j] +=
            w * t2[static_cast<size_t>(i) * c + j] * norm[i];
  }
};

}  // namespace

extern "C" {

// unary: [n_pix, n_class] NEGATIVE log probabilities (energy).
// img:   [n_pix, 3] uint8 reference image for the bilateral kernel
//        (may be null to disable the bilateral term).
// q_out: [n_pix, n_class] final marginals.
int dense_crf_2d(const float* unary, const unsigned char* img, int w, int h,
                 int n_class, int n_iter, float pos_w, float pos_xy,
                 float bi_w, float bi_xy, float bi_rgb, float* q_out) {
  const int n = w * h;
  const int c = n_class;

  // Spatial (Gaussian) kernel features.
  NormalizedFilter gauss;
  {
    std::vector<float> feat(static_cast<size_t>(n) * 2);
    for (int y = 0; y < h; ++y)
      for (int x = 0; x < w; ++x) {
        feat[static_cast<size_t>(y * w + x) * 2 + 0] = x / pos_xy;
        feat[static_cast<size_t>(y * w + x) * 2 + 1] = y / pos_xy;
      }
    gauss.init(feat.data(), n, 2);
  }

  // Bilateral (appearance) kernel features.
  NormalizedFilter bilateral;
  const bool use_bi = img != nullptr && bi_w != 0.f;
  if (use_bi) {
    std::vector<float> feat(static_cast<size_t>(n) * 5);
    for (int y = 0; y < h; ++y)
      for (int x = 0; x < w; ++x) {
        const size_t i = static_cast<size_t>(y) * w + x;
        feat[i * 5 + 0] = x / bi_xy;
        feat[i * 5 + 1] = y / bi_xy;
        feat[i * 5 + 2] = img[i * 3 + 0] / bi_rgb;
        feat[i * 5 + 3] = img[i * 3 + 1] / bi_rgb;
        feat[i * 5 + 4] = img[i * 3 + 2] / bi_rgb;
      }
    bilateral.init(feat.data(), n, 5);
  }

  std::vector<float> energy(static_cast<size_t>(n) * c);
  std::vector<float> t1(static_cast<size_t>(n) * c),
      t2(static_cast<size_t>(n) * c);

  // Q0 = softmax(-U)
  for (size_t i = 0; i < energy.size(); ++i) energy[i] = -unary[i];
  softmax_rows(q_out, energy.data(), n, c);

  for (int it = 0; it < n_iter; ++it) {
    for (size_t i = 0; i < energy.size(); ++i) energy[i] = -unary[i];
    gauss.apply(energy.data(), q_out, pos_w, n, c, t1.data(), t2.data());
    if (use_bi)
      bilateral.apply(energy.data(), q_out, bi_w, n, c, t1.data(),
                      t2.data());
    softmax_rows(q_out, energy.data(), n, c);
  }
  return 0;
}

// Standalone high-dim Gaussian filter (for tests): filter `values`
// [n, vs] by features [n, d].
int permutohedral_filter(const float* features, int n, int d,
                         const float* values, int vs, float* out) {
  Permutohedral lat;
  lat.init(features, n, d);
  lat.compute(out, values, vs);
  return 0;
}

}  // extern "C"

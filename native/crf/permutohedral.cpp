#include "permutohedral.h"

#include <cmath>
#include <cstring>
#include <unordered_map>

namespace {

struct KeyHash {
  size_t operator()(const std::vector<short>& k) const {
    size_t h = 14695981039346656037ull;
    for (short v : k) {
      h ^= static_cast<size_t>(static_cast<unsigned short>(v));
      h *= 1099511628211ull;
    }
    return h;
  }
};

using LatticeMap = std::unordered_map<std::vector<short>, int, KeyHash>;

}  // namespace

void Permutohedral::init(const float* features, int n, int d) {
  n_ = n;
  d_ = d;
  offset_.assign(static_cast<size_t>(n) * (d + 1), 0);
  barycentric_.assign(static_cast<size_t>(n) * (d + 1), 0.f);

  LatticeMap table;
  table.reserve(static_cast<size_t>(n) * (d + 1));

  std::vector<float> scale(d);
  const float inv_std_dev = std::sqrt(2.f / 3.f) * (d + 1);
  for (int i = 0; i < d; ++i)
    scale[i] = inv_std_dev / std::sqrt(static_cast<float>((i + 1) * (i + 2)));

  std::vector<float> elevated(d + 1);
  std::vector<short> rem0(d + 1), rank(d + 1), key(d);
  std::vector<float> bary(d + 2);
  std::vector<std::vector<short>> keys;  // key per lattice point

  for (int p = 0; p < n; ++p) {
    const float* f = features + static_cast<size_t>(p) * d;

    // Embed into the hyperplane H_{d+1} (E^T f done incrementally).
    float sm = 0.f;
    for (int j = d; j > 0; --j) {
      const float cf = f[j - 1] * scale[j - 1];
      elevated[j] = sm - j * cf;
      sm += cf;
    }
    elevated[0] = sm;

    // Closest remainder-0 lattice point via rounding to multiples of d+1.
    const float down_factor = 1.f / (d + 1);
    int sum = 0;
    for (int i = 0; i <= d; ++i) {
      const float v = elevated[i] * down_factor;
      const float up = std::ceil(v) * (d + 1);
      const float down = std::floor(v) * (d + 1);
      rem0[i] = static_cast<short>(
          (up - elevated[i] < elevated[i] - down) ? up : down);
      sum += rem0[i];
    }
    sum /= d + 1;  // rem0 entries are exact multiples of d+1

    // Rank differentials to find the enclosing simplex.
    for (int i = 0; i <= d; ++i) rank[i] = 0;
    for (int i = 0; i < d; ++i) {
      const float di = elevated[i] - rem0[i];
      for (int j = i + 1; j <= d; ++j) {
        if (di < elevated[j] - rem0[j]) ++rank[i];
        else ++rank[j];
      }
    }
    // Repair points that rounded off the hyperplane (sum != 0).
    for (int i = 0; i <= d; ++i) {
      rank[i] += sum;
      if (rank[i] < 0) {
        rank[i] += d + 1;
        rem0[i] += d + 1;
      } else if (rank[i] > d) {
        rank[i] -= d + 1;
        rem0[i] -= d + 1;
      }
    }

    // Barycentric coordinates.
    std::fill(bary.begin(), bary.end(), 0.f);
    for (int i = 0; i <= d; ++i) {
      const float v = (elevated[i] - rem0[i]) * down_factor;
      bary[d - rank[i]] += v;
      bary[d + 1 - rank[i]] -= v;
    }
    bary[0] += 1.f + bary[d + 1];

    // Register the d+1 simplex vertices.
    for (int r = 0; r <= d; ++r) {
      for (int i = 0; i < d; ++i)
        key[i] = rem0[i] + (rank[i] >= d + 1 - r ? r - (d + 1) : r);
      auto it = table.find(key);
      int id;
      if (it == table.end()) {
        id = static_cast<int>(keys.size());
        table.emplace(key, id);
        keys.push_back(key);
      } else {
        id = it->second;
      }
      offset_[static_cast<size_t>(p) * (d + 1) + r] = id;
      barycentric_[static_cast<size_t>(p) * (d + 1) + r] = bary[r];
    }
  }

  m_ = static_cast<int>(keys.size());

  // Blur neighbours along each lattice direction.
  blur_neighbors_.assign(static_cast<size_t>(d + 1) * m_ * 2, -1);
  std::vector<short> nk(d);
  for (int j = 0; j <= d; ++j) {
    for (int i = 0; i < m_; ++i) {
      const std::vector<short>& k0 = keys[i];
      for (int c = 0; c < d; ++c) nk[c] = k0[c] - 1;
      if (j < d) nk[j] = k0[j] + d;
      auto it = table.find(nk);
      const int minus = (it == table.end()) ? -1 : it->second;
      for (int c = 0; c < d; ++c) nk[c] = k0[c] + 1;
      if (j < d) nk[j] = k0[j] - d;
      it = table.find(nk);
      const int plus = (it == table.end()) ? -1 : it->second;
      blur_neighbors_[(static_cast<size_t>(j) * m_ + i) * 2 + 0] = minus;
      blur_neighbors_[(static_cast<size_t>(j) * m_ + i) * 2 + 1] = plus;
    }
  }
}

void Permutohedral::compute(float* out, const float* in,
                            int value_size) const {
  const int vs = value_size;
  // +1 slot at index 0 as a zero sink for missing neighbours.
  std::vector<float> values(static_cast<size_t>(m_ + 1) * vs, 0.f);
  std::vector<float> new_values(static_cast<size_t>(m_ + 1) * vs, 0.f);

  // Splat.
  for (int p = 0; p < n_; ++p) {
    for (int r = 0; r <= d_; ++r) {
      const int o = offset_[static_cast<size_t>(p) * (d_ + 1) + r] + 1;
      const float b = barycentric_[static_cast<size_t>(p) * (d_ + 1) + r];
      for (int c = 0; c < vs; ++c)
        values[static_cast<size_t>(o) * vs + c] +=
            b * in[static_cast<size_t>(p) * vs + c];
    }
  }

  // Blur along each direction: [1/2, 1, 1/2].
  for (int j = 0; j <= d_; ++j) {
    for (int i = 0; i < m_; ++i) {
      const int nm = blur_neighbors_[(static_cast<size_t>(j) * m_ + i) * 2];
      const int np =
          blur_neighbors_[(static_cast<size_t>(j) * m_ + i) * 2 + 1];
      const float* v = &values[static_cast<size_t>(i + 1) * vs];
      const float* vm = &values[static_cast<size_t>(nm + 1) * vs];
      const float* vp = &values[static_cast<size_t>(np + 1) * vs];
      float* nv = &new_values[static_cast<size_t>(i + 1) * vs];
      for (int c = 0; c < vs; ++c)
        nv[c] = v[c] + 0.5f * (vm[c] + vp[c]);
    }
    std::swap(values, new_values);
  }

  // Slice (with the alpha normalization that cancels the blur gain).
  const float alpha = 1.f / (1.f + std::pow(2.f, -static_cast<float>(d_)));
  for (int p = 0; p < n_; ++p) {
    for (int c = 0; c < vs; ++c) out[static_cast<size_t>(p) * vs + c] = 0.f;
    for (int r = 0; r <= d_; ++r) {
      const int o = offset_[static_cast<size_t>(p) * (d_ + 1) + r] + 1;
      const float b = barycentric_[static_cast<size_t>(p) * (d_ + 1) + r];
      for (int c = 0; c < vs; ++c)
        out[static_cast<size_t>(p) * vs + c] +=
            b * values[static_cast<size_t>(o) * vs + c] * alpha;
    }
  }
}

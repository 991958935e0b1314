// Native data-pipeline kernels for proxytransformation_tpu.
//
// The host-side input pipeline is the one place the reference leans on
// native speed (SharedArray C extension, torch_cluster CUDA FPS,
// per-view depth backprojection in hot loops). These are the C++
// equivalents, exposed through a plain C ABI for ctypes
// (no pybind11 dependency). All functions are thread-safe and operate
// on caller-provided buffers.
//
// Build: native/build.sh  (g++ -O3 -shared -fPIC)
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <random>
#include <vector>

extern "C" {

// Backproject a uint16 depth map to camera-frame points.
//   depth:  (h, w) row-major uint16
//   fx, fy, cx, cy: pinhole intrinsics; depth_shift: raw → meters divisor
//   out_xyz: capacity >= h*w*3 floats
// Returns the number of valid (depth > 0) points written.
int64_t depth_to_points(const uint16_t* depth, int64_t h, int64_t w,
                        float fx, float fy, float cx, float cy,
                        float depth_shift, float* out_xyz) {
  int64_t n = 0;
  const float inv_shift = 1.0f / depth_shift;
  const float inv_fx = 1.0f / fx;
  const float inv_fy = 1.0f / fy;
  for (int64_t v = 0; v < h; ++v) {
    const uint16_t* row = depth + v * w;
    for (int64_t u = 0; u < w; ++u) {
      const uint16_t raw = row[u];
      if (raw == 0) continue;
      const float d = static_cast<float>(raw) * inv_shift;
      float* p = out_xyz + n * 3;
      p[0] = (static_cast<float>(u) - cx) * d * inv_fx;
      p[1] = (static_cast<float>(v) - cy) * d * inv_fy;
      p[2] = d;
      ++n;
    }
  }
  return n;
}

// Farthest point sampling: select k indices from (n, 3) points,
// starting at index 0 (matching the reference's naive oracle).
void fps_sample(const float* xyz, int64_t n, int64_t k, int64_t* out_idx) {
  if (n <= 0 || k <= 0) return;
  std::vector<float> closest(n, std::numeric_limits<float>::infinity());
  int64_t cur = 0;
  out_idx[0] = 0;
  for (int64_t i = 1; i < k; ++i) {
    const float cxp = xyz[cur * 3], cyp = xyz[cur * 3 + 1],
                czp = xyz[cur * 3 + 2];
    float best = -1.0f;
    int64_t best_j = 0;
    for (int64_t j = 0; j < n; ++j) {
      const float dx = xyz[j * 3] - cxp;
      const float dy = xyz[j * 3 + 1] - cyp;
      const float dz = xyz[j * 3 + 2] - czp;
      const float d = dx * dx + dy * dy + dz * dz;
      if (d < closest[j]) closest[j] = d;
      if (closest[j] > best) {
        best = closest[j];
        best_j = j;
      }
    }
    cur = best_j;
    out_idx[i] = cur;
  }
}

// Random subsample without replacement when n >= k (Fisher-Yates over an
// index array), with replacement otherwise. Deterministic per seed.
void random_sample(int64_t n, int64_t k, uint64_t seed, int64_t* out_idx) {
  std::mt19937_64 rng(seed);
  if (n >= k) {
    std::vector<int64_t> idx(n);
    for (int64_t i = 0; i < n; ++i) idx[i] = i;
    for (int64_t i = 0; i < k; ++i) {
      std::uniform_int_distribution<int64_t> dist(i, n - 1);
      std::swap(idx[i], idx[dist(rng)]);
      out_idx[i] = idx[i];
    }
  } else {
    std::uniform_int_distribution<int64_t> dist(0, n - 1);
    for (int64_t i = 0; i < k; ++i) out_idx[i] = dist(rng);
  }
}

// Apply a 4x4 homogeneous transform in-place to (n, stride) points
// (xyz in the first 3 columns). `mat` is row-major; computes
// p' = M[:3,:3] @ p + M[:3,3]  (solving the ego→global step of
// AggregateMultiViewPoints when mat = inv(extrinsic)).
void transform_points(float* pts, int64_t n, int64_t stride,
                      const float* mat) {
  for (int64_t i = 0; i < n; ++i) {
    float* p = pts + i * stride;
    const float x = p[0], y = p[1], z = p[2];
    p[0] = mat[0] * x + mat[1] * y + mat[2] * z + mat[3];
    p[1] = mat[4] * x + mat[5] * y + mat[6] * z + mat[7];
    p[2] = mat[8] * x + mat[9] * y + mat[10] * z + mat[11];
  }
}

// 4x4 inverse (general, via adjugate on the 3x3 block + translation for
// affine; falls back to Gauss-Jordan for full 4x4). Row-major.
int invert_4x4(const float* m, float* out) {
  double a[4][8];
  for (int i = 0; i < 4; ++i) {
    for (int j = 0; j < 4; ++j) a[i][j] = m[i * 4 + j];
    for (int j = 0; j < 4; ++j) a[i][4 + j] = (i == j) ? 1.0 : 0.0;
  }
  for (int col = 0; col < 4; ++col) {
    int piv = col;
    for (int r = col + 1; r < 4; ++r)
      if (std::fabs(a[r][col]) > std::fabs(a[piv][col])) piv = r;
    if (std::fabs(a[piv][col]) < 1e-12) return 1;
    if (piv != col)
      for (int j = 0; j < 8; ++j) std::swap(a[piv][j], a[col][j]);
    const double d = a[col][col];
    for (int j = 0; j < 8; ++j) a[col][j] /= d;
    for (int r = 0; r < 4; ++r) {
      if (r == col) continue;
      const double f = a[r][col];
      for (int j = 0; j < 8; ++j) a[r][j] -= f * a[col][j];
    }
  }
  for (int i = 0; i < 4; ++i)
    for (int j = 0; j < 4; ++j) out[i * 4 + j] = static_cast<float>(a[i][4 + j]);
  return 0;
}

}  // extern "C"

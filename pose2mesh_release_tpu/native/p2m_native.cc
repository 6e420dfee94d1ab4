// Native host-side batch kernels for the input pipeline.
//
// The reference feeds TPU-equivalent hardware from 16 Python worker
// processes (lib/core/base.py:30-43); this framework precomputes GT and
// runs the remaining 2-D math vectorized.  These C++/OpenMP kernels take
// the per-batch inner loops (affine transform, standardization, 3-D
// rot/flip) off the GIL entirely for production serving; the numpy path
// in data/pipeline.py is the behavioral reference and fallback.
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC p2m_native.cc -o libp2m_native.so
#include <cmath>
#include <cstdint>

extern "C" {

// joints (B, J, 2) f32; mats (B, 2, 3) f32 -> out (B, J, 2) f32
void affine_batch(const float* joints, const float* mats, float* out,
                  int64_t B, int64_t J) {
#pragma omp parallel for schedule(static)
  for (int64_t b = 0; b < B; ++b) {
    const float* M = mats + b * 6;
    const float* src = joints + b * J * 2;
    float* dst = out + b * J * 2;
    for (int64_t j = 0; j < J; ++j) {
      float x = src[j * 2], y = src[j * 2 + 1];
      dst[j * 2] = M[0] * x + M[1] * y + M[2];
      dst[j * 2 + 1] = M[3] * x + M[4] * y + M[5];
    }
  }
}

// In-place: scale to [0,1] by (1/w, 1/h), then per-sample standardize
// (Human36M/dataset.py:383-388).  joints (B, J, 2) f32.
void standardize_batch(float* joints, int64_t B, int64_t J,
                       float inv_w, float inv_h) {
#pragma omp parallel for schedule(static)
  for (int64_t b = 0; b < B; ++b) {
    float* p = joints + b * J * 2;
    double mx = 0.0, my = 0.0;
    for (int64_t j = 0; j < J; ++j) {
      p[j * 2] *= inv_w;
      p[j * 2 + 1] *= inv_h;
      mx += p[j * 2];
      my += p[j * 2 + 1];
    }
    mx /= J; my /= J;
    double vx = 0.0, vy = 0.0;
    for (int64_t j = 0; j < J; ++j) {
      double dx = p[j * 2] - mx, dy = p[j * 2 + 1] - my;
      vx += dx * dx; vy += dy * dy;
    }
    // numpy std: population (ddof=0)
    float sx = (float)std::sqrt(vx / J), sy = (float)std::sqrt(vy / J);
    sx = sx > 1e-6f ? sx : 1e-6f;
    sy = sy > 1e-6f ? sy : 1e-6f;
    for (int64_t j = 0; j < J; ++j) {
      p[j * 2] = (p[j * 2] - (float)mx) / sx;
      p[j * 2 + 1] = (p[j * 2 + 1] - (float)my) / sy;
    }
  }
}

// In-place 3-D in-plane rotation + optional mirror flip with pair swaps.
// joints (B, J, 3) f32; rot_rad (B,) f32; flip (B,) u8;
// pairs (P, 2) i32 swapped when flip.  (aug_utils.py:74-89 batched.)
void rot_flip_3d_batch(float* joints, const float* rot_rad,
                       const uint8_t* flip, const int32_t* pairs,
                       int64_t B, int64_t J, int64_t P) {
#pragma omp parallel for schedule(static)
  for (int64_t b = 0; b < B; ++b) {
    float* p = joints + b * J * 3;
    float cs = std::cos(-rot_rad[b]), sn = std::sin(-rot_rad[b]);
    for (int64_t j = 0; j < J; ++j) {
      float x = p[j * 3], y = p[j * 3 + 1];
      p[j * 3] = cs * x - sn * y;
      p[j * 3 + 1] = sn * x + cs * y;
    }
    if (flip[b]) {
      for (int64_t q = 0; q < P; ++q) {
        int32_t a = pairs[q * 2], c = pairs[q * 2 + 1];
        for (int64_t k = 0; k < 3; ++k) {
          float tmp = p[a * 3 + k];
          p[a * 3 + k] = p[c * 3 + k];
          p[c * 3 + k] = tmp;
        }
      }
      for (int64_t j = 0; j < J; ++j) p[j * 3] = -p[j * 3];
    }
  }
}

}  // extern "C"

// Native host-side data-pipeline kernels for the TPU flow framework.
//
// The reference relied on torch DataLoader workers + cv2/PIL for its
// host-side preprocessing; here the per-batch hot path (uint8 -> float
// normalize, replicate padding, sparse-flow scatter resize, bilinear image
// resize) runs as OpenMP C++ reached via ctypes — keeping the TPU fed
// without Python-loop overhead in the input pipeline.
//
// Build: auto-built on first use by native/__init__.py into a hash-keyed
// cache (portable flags, no -march=native); setup/build_native.sh warms
// that cache ahead of time.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// uint8 HWC image batch -> float32 in [0,1], with optional replicate
// padding to (out_h, out_w) (top/left offsets given).  in: (n, h, w, c),
// out: (n, out_h, out_w, c).
void batch_u8_to_float01_pad(const uint8_t* in, float* out, int64_t n,
                             int64_t h, int64_t w, int64_t c,
                             int64_t out_h, int64_t out_w, int64_t top,
                             int64_t left) {
  const float scale = 1.0f / 255.0f;
#pragma omp parallel for collapse(2)
  for (int64_t i = 0; i < n; ++i) {
    for (int64_t oy = 0; oy < out_h; ++oy) {
      int64_t sy = std::min(std::max(oy - top, int64_t(0)), h - 1);
      const uint8_t* src_row = in + ((i * h + sy) * w) * c;
      float* dst_row = out + ((i * out_h + oy) * out_w) * c;
      for (int64_t ox = 0; ox < out_w; ++ox) {
        int64_t sx = std::min(std::max(ox - left, int64_t(0)), w - 1);
        const uint8_t* px = src_row + sx * c;
        float* q = dst_row + ox * c;
        for (int64_t k = 0; k < c; ++k) q[k] = px[k] * scale;
      }
    }
  }
}

// float32 HWC -> float32 with replicate padding (for already-float frames).
void batch_f32_pad(const float* in, float* out, int64_t n, int64_t h,
                   int64_t w, int64_t c, int64_t out_h, int64_t out_w,
                   int64_t top, int64_t left, int zero_pad) {
#pragma omp parallel for collapse(2)
  for (int64_t i = 0; i < n; ++i) {
    for (int64_t oy = 0; oy < out_h; ++oy) {
      int64_t sy = std::min(std::max(oy - top, int64_t(0)), h - 1);
      bool oob_y = (oy < top) || (oy >= top + h);
      const float* src_row = in + ((i * h + sy) * w) * c;
      float* dst_row = out + ((i * out_h + oy) * out_w) * c;
      for (int64_t ox = 0; ox < out_w; ++ox) {
        int64_t sx = std::min(std::max(ox - left, int64_t(0)), w - 1);
        bool oob = zero_pad && (oob_y || ox < left || ox >= left + w);
        const float* px = src_row + sx * c;
        float* q = dst_row + ox * c;
        for (int64_t k = 0; k < c; ++k) q[k] = oob ? 0.0f : px[k];
      }
    }
  }
}

// Sparse-aware flow resize (dataset_utils/augmentor.py:294-327 semantics):
// scatter valid flow samples into the scaled grid, scaling vectors.
void resize_sparse_flow(const float* flow, const float* valid, int64_t h,
                        int64_t w, int64_t h1, int64_t w1, double fx,
                        double fy, float* flow_out, int32_t* valid_out) {
  std::memset(flow_out, 0, sizeof(float) * h1 * w1 * 2);
  std::memset(valid_out, 0, sizeof(int32_t) * h1 * w1);
  for (int64_t y = 0; y < h; ++y) {
    for (int64_t x = 0; x < w; ++x) {
      if (valid[y * w + x] < 1.0f) continue;
      // numpy semantics: f64 products, round-half-to-even
      // (augmentor.py:305-313 promotes to float64 via the python-list
      // scale factors before np.round)
      int64_t xx = (int64_t)std::nearbyint((double)x * fx);
      int64_t yy = (int64_t)std::nearbyint((double)y * fy);
      if (xx <= 0 || xx >= w1 || yy <= 0 || yy >= h1) continue;
      flow_out[(yy * w1 + xx) * 2 + 0] =
          (float)((double)flow[(y * w + x) * 2 + 0] * fx);
      flow_out[(yy * w1 + xx) * 2 + 1] =
          (float)((double)flow[(y * w + x) * 2 + 1] * fy);
      valid_out[yy * w1 + xx] = 1;
    }
  }
}

// Bilinear uint8 HWC resize (PIL-BILINEAR-style half-pixel sampling with
// edge clamping) — the Scale transform's hot path.
void resize_bilinear_u8(const uint8_t* in, uint8_t* out, int64_t h,
                        int64_t w, int64_t c, int64_t oh, int64_t ow) {
  const float sx = (float)w / ow;
  const float sy = (float)h / oh;
#pragma omp parallel for
  for (int64_t oy = 0; oy < oh; ++oy) {
    float fy = (oy + 0.5f) * sy - 0.5f;
    int64_t y0 = (int64_t)std::floor(fy);
    float wy = fy - y0;
    int64_t y0c = std::min(std::max(y0, int64_t(0)), h - 1);
    int64_t y1c = std::min(std::max(y0 + 1, int64_t(0)), h - 1);
    for (int64_t ox = 0; ox < ow; ++ox) {
      float fxp = (ox + 0.5f) * sx - 0.5f;
      int64_t x0 = (int64_t)std::floor(fxp);
      float wx = fxp - x0;
      int64_t x0c = std::min(std::max(x0, int64_t(0)), w - 1);
      int64_t x1c = std::min(std::max(x0 + 1, int64_t(0)), w - 1);
      const uint8_t* p00 = in + (y0c * w + x0c) * c;
      const uint8_t* p01 = in + (y0c * w + x1c) * c;
      const uint8_t* p10 = in + (y1c * w + x0c) * c;
      const uint8_t* p11 = in + (y1c * w + x1c) * c;
      uint8_t* q = out + (oy * ow + ox) * c;
      for (int64_t k = 0; k < c; ++k) {
        float v = (1 - wy) * ((1 - wx) * p00[k] + wx * p01[k]) +
                  wy * ((1 - wx) * p10[k] + wx * p11[k]);
        q[k] = (uint8_t)std::lround(std::min(std::max(v, 0.0f), 255.0f));
      }
    }
  }
}

// KITTI uint16 flow PNG payload decode: (u16 - 2^15)/64 with valid channel
// (dataset_utils/data_utils.py:259-264) — operates on the already-unpacked
// uint16 pixel array (PNG entropy decode stays in cv2, which is native).
void decode_kitti_flow_u16(const uint16_t* rgb16, int64_t h, int64_t w,
                           float* flow, float* valid) {
#pragma omp parallel for
  for (int64_t i = 0; i < h * w; ++i) {
    flow[i * 2 + 0] = ((float)rgb16[i * 3 + 0] - 32768.0f) / 64.0f;
    flow[i * 2 + 1] = ((float)rgb16[i * 3 + 1] - 32768.0f) / 64.0f;
    valid[i] = (float)rgb16[i * 3 + 2];
  }
}

int ufr_native_version() { return 1; }

}  // extern "C"

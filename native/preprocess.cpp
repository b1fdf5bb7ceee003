// dfvod_tpu native preprocessing — C++ host-side data-path kernels.
//
// TPU-world replacement for the hot loop of the reference's CUDA-stream
// prefetchers (datasets/data_prefetcher_single.py / _multi.py) and the
// per-frame PIL/numpy transform chain: one fused pass does bilinear
// resize -> [0,1] scale -> mean/std normalize -> zero-pad into the static
// bucket, writing the channels-last f32 tensor the device consumes and the
// bool padding mask. Also hosts the depth min-max normalization
// (torchvision_datasets/coco.py:101).
//
// Bilinear convention: half-pixel centers (align_corners=False), no
// antialiasing — cv2.INTER_LINEAR / torch F.interpolate semantics. The
// Python loader keeps the PIL path for reference-parity experiments; this
// path is the production default when the library builds.
//
// Build: g++ -O3 -march=native -shared -fPIC preprocess.cpp -o libdfvod_native.so

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <cmath>
#include <vector>

namespace {

inline void bilinear_coeffs(int out_i, float scale, int src_size,
                            int* i0, int* i1, float* w1) {
  float src = (out_i + 0.5f) * scale - 0.5f;
  float floor_src = std::floor(src);
  *w1 = src - floor_src;
  int lo = static_cast<int>(floor_src);
  *i0 = std::min(std::max(lo, 0), src_size - 1);
  *i1 = std::min(std::max(lo + 1, 0), src_size - 1);
}

}  // namespace

extern "C" {

// Bilinear resize, uint8 HWC -> uint8 HWC.
//
// Horizontal coefficients are precomputed per output column (they are
// loop-invariant over rows) and rows run under OpenMP: the naive
// per-pixel-per-channel version measured 13.5 ms for 320x256 -> 1000x800
// on one core — this is the loader's hottest host op (64% of batch prep,
// scripts/bench_loader.py), so it has to be near-memcpy.
void resize_bilinear_u8(const uint8_t* src, int sh, int sw, int c,
                        uint8_t* dst, int dh, int dw) {
  const float sy = static_cast<float>(sh) / dh;
  const float sx = static_cast<float>(sw) / dw;
  std::vector<int> xi0(dw), xi1(dw);
  std::vector<float> xf(dw);
  for (int x = 0; x < dw; ++x) {
    bilinear_coeffs(x, sx, sw, &xi0[x], &xi1[x], &xf[x]);
    xi0[x] *= c;
    xi1[x] *= c;
  }
#pragma omp parallel for schedule(static)
  for (int y = 0; y < dh; ++y) {
    int y0, y1;
    float fy;
    bilinear_coeffs(y, sy, sh, &y0, &y1, &fy);
    const uint8_t* r0 = src + static_cast<int64_t>(y0) * sw * c;
    const uint8_t* r1 = src + static_cast<int64_t>(y1) * sw * c;
    uint8_t* out_row = dst + static_cast<int64_t>(y) * dw * c;
    const float gy = 1.0f - fy;
    for (int x = 0; x < dw; ++x) {
      const int a = xi0[x], b = xi1[x];
      const float fx = xf[x];
      const float w00 = gy * (1 - fx), w01 = gy * fx;
      const float w10 = fy * (1 - fx), w11 = fy * fx;
      for (int k = 0; k < c; ++k) {
        float v = w00 * r0[a + k] + w01 * r0[b + k] +
                  w10 * r1[a + k] + w11 * r1[b + k];
        out_row[x * c + k] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

// Interleave (h, w, 3) RGB + (h, w) depth into a (>=h, >=w, 4) uint8
// canvas slice (row stride in bytes). numpy does this element-wise
// (~4-9 ms/frame at 800x1000 on one core); here it is a linear pass.
void pack_rgbd_u8(const uint8_t* rgb, const uint8_t* depth, int h, int w,
                  uint8_t* out, int64_t out_row_stride) {
  for (int y = 0; y < h; ++y) {
    const uint8_t* r = rgb + static_cast<int64_t>(y) * w * 3;
    const uint8_t* d = depth + static_cast<int64_t>(y) * w;
    uint8_t* o = out + y * out_row_stride;
    for (int x = 0; x < w; ++x) {
      o[4 * x + 0] = r[3 * x + 0];
      o[4 * x + 1] = r[3 * x + 1];
      o[4 * x + 2] = r[3 * x + 2];
      o[4 * x + 3] = d[x];
    }
  }
}

// Fused resize + normalize + pad for one RGB(-D) frame.
//   rgb   : (sh, sw, 3) uint8
//   depth : (sh, sw) uint8 or nullptr
//   out   : (oh, ow, C) f32, C = 3 or 4 — fully overwritten (pad = 0)
//   mask  : (oh, ow) uint8 — 1 where padded
//   rh, rw: resized content size (rh <= oh, rw <= ow)
//   mean/stdv: C floats ([0,1]-scale stats)
void preprocess_rgbd(const uint8_t* rgb, const uint8_t* depth,
                     int sh, int sw, float* out, uint8_t* mask,
                     int oh, int ow, int rh, int rw,
                     const float* mean, const float* stdv) {
  const int C = depth ? 4 : 3;
  const float sy = static_cast<float>(sh) / rh;
  const float sx = static_cast<float>(sw) / rw;
  float inv_std[4];
  for (int k = 0; k < C; ++k) inv_std[k] = 1.0f / stdv[k];

  std::memset(out, 0, sizeof(float) * oh * ow * C);
  std::memset(mask, 1, static_cast<size_t>(oh) * ow);

  for (int y = 0; y < rh; ++y) {
    int y0, y1;
    float fy;
    bilinear_coeffs(y, sy, sh, &y0, &y1, &fy);
    const uint8_t* r0 = rgb + static_cast<int64_t>(y0) * sw * 3;
    const uint8_t* r1 = rgb + static_cast<int64_t>(y1) * sw * 3;
    const uint8_t* d0 = depth ? depth + static_cast<int64_t>(y0) * sw : nullptr;
    const uint8_t* d1 = depth ? depth + static_cast<int64_t>(y1) * sw : nullptr;
    float* out_row = out + static_cast<int64_t>(y) * ow * C;
    uint8_t* mask_row = mask + static_cast<int64_t>(y) * ow;
    for (int x = 0; x < rw; ++x) {
      int x0, x1;
      float fx;
      bilinear_coeffs(x, sx, sw, &x0, &x1, &fx);
      const float w00 = (1 - fy) * (1 - fx), w01 = (1 - fy) * fx;
      const float w10 = fy * (1 - fx), w11 = fy * fx;
      for (int k = 0; k < 3; ++k) {
        float v = w00 * r0[x0 * 3 + k] + w01 * r0[x1 * 3 + k] +
                  w10 * r1[x0 * 3 + k] + w11 * r1[x1 * 3 + k];
        out_row[x * C + k] = (v * (1.0f / 255.0f) - mean[k]) * inv_std[k];
      }
      if (depth) {
        float v = w00 * d0[x0] + w01 * d0[x1] + w10 * d1[x0] + w11 * d1[x1];
        out_row[x * C + 3] = (v * (1.0f / 255.0f) - mean[3]) * inv_std[3];
      }
      mask_row[x] = 0;
    }
  }
}

// Per-image min-max depth normalization to uint8
// (torchvision_datasets/coco.py:75-105). src is uint16 (IMREAD_UNCHANGED
// depth PNGs); uint8 inputs can be widened by the caller.
void normalize_depth_u16(const uint16_t* src, int n, uint8_t* dst) {
  uint16_t lo = src[0], hi = src[0];
  for (int i = 1; i < n; ++i) {
    lo = std::min(lo, src[i]);
    hi = std::max(hi, src[i]);
  }
  if (hi == lo) {
    std::memset(dst, 0, n);
    return;
  }
  const float scale = 255.0f / (hi - lo);
  for (int i = 0; i < n; ++i) {
    dst[i] = static_cast<uint8_t>((src[i] - lo) * scale);
  }
}

}  // extern "C"

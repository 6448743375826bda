// Native host-side image preprocessing for stablediffusioneo_tpu.
//
// The TPU-native framework keeps device compute in XLA/Pallas; this library
// covers the HOST hot path of the annotator/data-loading layer (the role
// the reference fills with cv2 + its native CUDA plugin stack): HWC3
// normalization, area/bilinear resize, and the full Canny edge pipeline
// (Gaussian blur, Sobel gradients, non-maximum suppression, hysteresis).
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 dependency).
// Reference behavior mirrored: annotator/util.py:9-38 (HWC3/resize),
// annotator/canny/__init__.py (cv2.Canny wrapper, L1 gradient norm,
// aperture 3).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- HWC3

// gray (H,W) or rgba (H,W,4) -> rgb (H,W,3); rgb passes through.
// Alpha composites over white. Returns 0 on success.
int sdeo_hwc3(const uint8_t* src, int h, int w, int channels, uint8_t* dst) {
  if (channels == 3) {
    std::memcpy(dst, src, static_cast<size_t>(h) * w * 3);
    return 0;
  }
  if (channels == 1) {
    for (int i = 0; i < h * w; ++i) {
      dst[3 * i] = dst[3 * i + 1] = dst[3 * i + 2] = src[i];
    }
    return 0;
  }
  if (channels == 4) {
    for (int i = 0; i < h * w; ++i) {
      float a = src[4 * i + 3] / 255.0f;
      for (int c = 0; c < 3; ++c) {
        float v = src[4 * i + c] * a + 255.0f * (1.0f - a);
        dst[3 * i + c] = static_cast<uint8_t>(
            std::min(255.0f, std::max(0.0f, v + 0.5f)));
      }
    }
    return 0;
  }
  return 1;
}

// ------------------------------------------------------------- resize

// Bilinear resize, uint8 HWC any channel count.
int sdeo_resize_bilinear(const uint8_t* src, int sh, int sw, int c,
                         uint8_t* dst, int dh, int dw) {
  const float sy = static_cast<float>(sh) / dh;
  const float sx = static_cast<float>(sw) / dw;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = static_cast<int>(std::floor(fy));
    float wy = fy - y0;
    int y1 = std::min(y0 + 1, sh - 1);
    y0 = std::max(y0, 0);
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = static_cast<int>(std::floor(fx));
      float wx = fx - x0;
      int x1 = std::min(x0 + 1, sw - 1);
      x0 = std::max(x0, 0);
      for (int ch = 0; ch < c; ++ch) {
        float v00 = src[(y0 * sw + x0) * c + ch];
        float v01 = src[(y0 * sw + x1) * c + ch];
        float v10 = src[(y1 * sw + x0) * c + ch];
        float v11 = src[(y1 * sw + x1) * c + ch];
        float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                  v10 * wy * (1 - wx) + v11 * wy * wx;
        dst[(y * dw + x) * c + ch] =
            static_cast<uint8_t>(std::min(255.0f, std::max(0.0f, v + 0.5f)));
      }
    }
  }
  return 0;
}

// --------------------------------------------------------------- canny

static void gaussian5(const float* src, int h, int w, float* dst) {
  // separable 5-tap binomial (1,4,6,4,1)/16 — cv2's default 5x5 sigma~1.1
  static const float k[5] = {1.f / 16, 4.f / 16, 6.f / 16, 4.f / 16, 1.f / 16};
  std::vector<float> tmp(static_cast<size_t>(h) * w);
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      float acc = 0.f;
      for (int t = -2; t <= 2; ++t) {
        int xx = std::min(std::max(x + t, 0), w - 1);
        acc += k[t + 2] * src[y * w + xx];
      }
      tmp[y * w + x] = acc;
    }
  }
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      float acc = 0.f;
      for (int t = -2; t <= 2; ++t) {
        int yy = std::min(std::max(y + t, 0), h - 1);
        acc += k[t + 2] * tmp[yy * w + x];
      }
      dst[y * w + x] = acc;
    }
  }
}

// Canny on grayscale (uint8), L1 gradient norm, Sobel aperture 3,
// 8-connected hysteresis. dst gets 0 or 255.
int sdeo_canny(const uint8_t* gray, int h, int w, double low, double high,
               uint8_t* dst) {
  const size_t n = static_cast<size_t>(h) * w;
  std::vector<float> smooth(n), fsrc(n);
  for (size_t i = 0; i < n; ++i) fsrc[i] = gray[i];
  // NOTE: cv2.Canny does NOT blur internally; callers usually pre-blur.
  // We match cv2 by skipping the blur (kept available via sdeo_gaussian5).
  std::vector<float> gx(n, 0.f), gy(n, 0.f), mag(n, 0.f);
  auto at = [&](int y, int x) {
    y = std::min(std::max(y, 0), h - 1);
    x = std::min(std::max(x, 0), w - 1);
    return fsrc[y * w + x];
  };
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      float a = at(y - 1, x - 1), b = at(y - 1, x), c = at(y - 1, x + 1);
      float d = at(y, x - 1), f = at(y, x + 1);
      float g = at(y + 1, x - 1), hh = at(y + 1, x), i = at(y + 1, x + 1);
      gx[y * w + x] = (c + 2 * f + i) - (a + 2 * d + g);
      gy[y * w + x] = (g + 2 * hh + i) - (a + 2 * b + c);
      mag[y * w + x] = std::abs(gx[y * w + x]) + std::abs(gy[y * w + x]);
    }
  }
  // non-maximum suppression into tri-state map: 0, 1 (weak), 2 (strong)
  std::vector<uint8_t> state(n, 0);
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      float m = mag[y * w + x];
      if (m < low) continue;
      float dx = gx[y * w + x], dy = gy[y * w + x];
      float adx = std::abs(dx), ady = std::abs(dy);
      float m1, m2;
      auto magat = [&](int yy, int xx) {
        yy = std::min(std::max(yy, 0), h - 1);
        xx = std::min(std::max(xx, 0), w - 1);
        return mag[yy * w + xx];
      };
      if (adx > 2.414f * ady) {  // ~0 deg
        m1 = magat(y, x - 1), m2 = magat(y, x + 1);
      } else if (ady > 2.414f * adx) {  // ~90 deg
        m1 = magat(y - 1, x), m2 = magat(y + 1, x);
      } else if ((dx > 0) == (dy > 0)) {  // 45 deg diag
        m1 = magat(y - 1, x - 1), m2 = magat(y + 1, x + 1);
      } else {
        m1 = magat(y - 1, x + 1), m2 = magat(y + 1, x - 1);
      }
      // tie-break like cv2: strictly greater than the later neighbor,
      // >= the earlier one, keeping the first pixel of a flat peak
      if (m > m1 && m >= m2) state[y * w + x] = (m > high) ? 2 : 1;
    }
  }
  // hysteresis: BFS from strong pixels through weak neighbors
  std::vector<int> stack;
  stack.reserve(n / 8);
  for (size_t i = 0; i < n; ++i)
    if (state[i] == 2) stack.push_back(static_cast<int>(i));
  std::memset(dst, 0, n);
  while (!stack.empty()) {
    int idx = stack.back();
    stack.pop_back();
    if (dst[idx]) continue;
    dst[idx] = 255;
    int y = idx / w, x = idx % w;
    for (int ddy = -1; ddy <= 1; ++ddy) {
      for (int ddx = -1; ddx <= 1; ++ddx) {
        int yy = y + ddy, xx = x + ddx;
        if (yy < 0 || yy >= h || xx < 0 || xx >= w) continue;
        int j = yy * w + xx;
        if (state[j] >= 1 && !dst[j]) stack.push_back(j);
      }
    }
  }
  return 0;
}

int sdeo_gaussian5(const uint8_t* gray, int h, int w, uint8_t* dst) {
  const size_t n = static_cast<size_t>(h) * w;
  std::vector<float> fsrc(n), out(n);
  for (size_t i = 0; i < n; ++i) fsrc[i] = gray[i];
  gaussian5(fsrc.data(), h, w, out.data());
  for (size_t i = 0; i < n; ++i)
    dst[i] = static_cast<uint8_t>(std::min(255.0f, std::max(0.0f, out[i] + 0.5f)));
  return 0;
}

// rgb -> gray, cv2 weights (BGR order caveat handled in python wrapper)
int sdeo_rgb2gray(const uint8_t* rgb, int h, int w, uint8_t* dst) {
  for (int i = 0; i < h * w; ++i) {
    float v = 0.299f * rgb[3 * i] + 0.587f * rgb[3 * i + 1] +
              0.114f * rgb[3 * i + 2];
    dst[i] = static_cast<uint8_t>(std::min(255.0f, v + 0.5f));
  }
  return 0;
}

}  // extern "C"

// Native data-loader core: the per-item image hot loop of the dataset.
//
// Plays the role of the reference's compiled data-path dependencies
// (lib/components/custom_ops.py JIT-builds its native ops; the image loop in
// lib/data/datasets.py runs through PIL/cv2 C code).  Exposed through ctypes
// (threedhumangan_tpu/data/native.py) with a pure-numpy fallback, built on
// first use with a content-hash cache like custom_ops.get_plugin
// (custom_ops.py:46-124).
//
// All functions operate on caller-allocated buffers; images are HWC uint8 in,
// float32 out.  No Python API dependency — plain C ABI.

#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// uint8 HWC -> float32 HWC in [-1, 1]; pixels where mask == 0 become white
// (+1.0), matching SHHQDataset's background compositing (datasets.py:298).
void normalize_masked_image(
    const uint8_t* rgb, const uint8_t* mask, float* out,
    int64_t h, int64_t w, int64_t c) {
  const int64_t n = h * w;
  for (int64_t i = 0; i < n; ++i) {
    const bool bg = (mask != nullptr) && (mask[i] == 0);
    for (int64_t k = 0; k < c; ++k) {
      out[i * c + k] = bg ? 1.0f : (rgb[i * c + k] * (1.0f / 127.5f) - 1.0f);
    }
  }
}

// Nearest-neighbour resize, uint8 HWC (labels / masks; datasets.py:305).
void resize_nearest_u8(
    const uint8_t* src, uint8_t* dst,
    int64_t sh, int64_t sw, int64_t dh, int64_t dw, int64_t c) {
  for (int64_t y = 0; y < dh; ++y) {
    // PIL/cv2 nearest: sample at (y + 0.5) * scale
    int64_t sy = std::min<int64_t>(sh - 1, (int64_t)(((double)y + 0.5) * sh / dh));
    for (int64_t x = 0; x < dw; ++x) {
      int64_t sx = std::min<int64_t>(sw - 1, (int64_t)(((double)x + 0.5) * sw / dw));
      std::memcpy(dst + (y * dw + x) * c, src + (sy * sw + sx) * c, c);
    }
  }
}

// Bilinear resize, uint8 HWC -> uint8 HWC (half-pixel centers, PIL-style).
void resize_bilinear_u8(
    const uint8_t* src, uint8_t* dst,
    int64_t sh, int64_t sw, int64_t dh, int64_t dw, int64_t c) {
  const double scale_y = (double)sh / dh;
  const double scale_x = (double)sw / dw;
  for (int64_t y = 0; y < dh; ++y) {
    double fy = (y + 0.5) * scale_y - 0.5;
    int64_t y0 = (int64_t)fy;
    if (fy < 0) { fy = 0; y0 = 0; }
    int64_t y1 = std::min<int64_t>(y0 + 1, sh - 1);
    const double wy = fy - y0;
    for (int64_t x = 0; x < dw; ++x) {
      double fx = (x + 0.5) * scale_x - 0.5;
      int64_t x0 = (int64_t)fx;
      if (fx < 0) { fx = 0; x0 = 0; }
      int64_t x1 = std::min<int64_t>(x0 + 1, sw - 1);
      const double wx = fx - x0;
      for (int64_t k = 0; k < c; ++k) {
        const double v00 = src[(y0 * sw + x0) * c + k];
        const double v01 = src[(y0 * sw + x1) * c + k];
        const double v10 = src[(y1 * sw + x0) * c + k];
        const double v11 = src[(y1 * sw + x1) * c + k];
        const double top = v00 + (v01 - v00) * wx;
        const double bot = v10 + (v11 - v10) * wx;
        double v = top + (bot - top) * wy;
        v = v < 0 ? 0 : (v > 255 ? 255 : v);
        dst[(y * dw + x) * c + k] = (uint8_t)(v + 0.5);
      }
    }
  }
}

// Shift segmentation labels: 0 stays reserved for "fake", foreground labels
// shift +1, background becomes 1 (datasets.py:305-309). int64 in-place.
void shift_segment_labels(int64_t* seg, int64_t n) {
  for (int64_t i = 0; i < n; ++i) {
    seg[i] = seg[i] > 0 ? seg[i] + 1 : 1;
  }
}

// Batch collate: stack n_items HWC float32 images into one NHWC buffer.
void collate_f32(const float** items, float* out, int64_t n, int64_t item_elems) {
  for (int64_t i = 0; i < n; ++i) {
    std::memcpy(out + i * item_elems, items[i], item_elems * sizeof(float));
  }
}

}  // extern "C"

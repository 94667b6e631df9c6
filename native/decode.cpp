// Native JPEG decode + augmentation for the host input pipeline.
//
// The reference's data layer is PIL-per-worker-process (dataset.py:11-16 +
// torch DataLoader workers).  This library is the TPU framework's native
// equivalent: libjpeg decode, separable triangle-filter resize (PIL BILINEAR
// semantics: filter support scales with the downscale factor), random-crop /
// horizontal-flip — one C call per example, invoked from Python worker
// *threads* (ctypes releases the GIL, so decode overlaps the device step
// without process pools or pickling).  Output is uint8 HWC: batches cross the
// host->device boundary as uint8 (4x less transfer than float32) and the
// [-1,1] ToTensor+Normalize semantics (reference dataset.py:32-37) are applied
// on device by ops.images.to_unit_range.  This also matches the reference
// pipeline more closely than float output did: torchvision resizes *PIL uint8*
// images, so its values are uint8-quantized post-resize too.
//
// Exposed C ABI (see xmc_gan_tpu/data/native.py):
//   xmc_decode_train(jpeg, n, out_size, short_side, u_x, u_y, flip, out)
//   xmc_decode_test(jpeg, n, out_size, out)
// Both return 0 on success, negative error codes otherwise.

#include <algorithm>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#include <jpeglib.h>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Decode a JPEG buffer to 8-bit RGB. Returns false on corrupt input.
bool decode_rgb(const uint8_t* data, size_t n, std::vector<uint8_t>& rgb,
                int& w, int& h) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, n);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  w = cinfo.output_width;
  h = cinfo.output_height;
  rgb.resize(static_cast<size_t>(w) * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = rgb.data() + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// Precomputed sampling weights for one output coordinate (triangle filter,
// support widened by the downscale factor — PIL BILINEAR semantics).
struct Taps {
  int lo;
  std::vector<float> w;
};

void build_taps(int in_size, int out_size, std::vector<Taps>& taps) {
  const double scale = static_cast<double>(in_size) / out_size;
  const double support = std::max(scale, 1.0);  // triangle radius
  taps.resize(out_size);
  for (int o = 0; o < out_size; ++o) {
    const double center = (o + 0.5) * scale;
    int lo = static_cast<int>(std::floor(center - support + 0.5));
    int hi = static_cast<int>(std::floor(center + support + 0.5));
    lo = std::max(lo, 0);
    hi = std::min(hi, in_size);
    taps[o].lo = lo;
    taps[o].w.resize(hi - lo);
    double total = 0.0;
    for (int i = lo; i < hi; ++i) {
      double x = (i + 0.5 - center) / support;
      double wv = std::max(0.0, 1.0 - std::fabs(x));
      taps[o].w[i - lo] = static_cast<float>(wv);
      total += wv;
    }
    if (total > 0) {
      for (float& wv : taps[o].w) wv = static_cast<float>(wv / total);
    }
  }
}

// Separable resize of 8-bit RGB to (out_w, out_h) float RGB.
void resize_rgb(const uint8_t* src, int w, int h, int out_w, int out_h,
                std::vector<float>& dst) {
  std::vector<Taps> tx, ty;
  build_taps(w, out_w, tx);
  build_taps(h, out_h, ty);
  // horizontal pass: (h, out_w, 3)
  std::vector<float> tmp(static_cast<size_t>(h) * out_w * 3);
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = src + static_cast<size_t>(y) * w * 3;
    float* trow = tmp.data() + static_cast<size_t>(y) * out_w * 3;
    for (int x = 0; x < out_w; ++x) {
      const Taps& t = tx[x];
      float acc[3] = {0, 0, 0};
      for (size_t k = 0; k < t.w.size(); ++k) {
        const uint8_t* px = row + static_cast<size_t>(t.lo + k) * 3;
        acc[0] += t.w[k] * px[0];
        acc[1] += t.w[k] * px[1];
        acc[2] += t.w[k] * px[2];
      }
      trow[x * 3 + 0] = acc[0];
      trow[x * 3 + 1] = acc[1];
      trow[x * 3 + 2] = acc[2];
    }
  }
  // vertical pass: (out_h, out_w, 3)
  dst.resize(static_cast<size_t>(out_h) * out_w * 3);
  for (int y = 0; y < out_h; ++y) {
    const Taps& t = ty[y];
    float* drow = dst.data() + static_cast<size_t>(y) * out_w * 3;
    std::memset(drow, 0, sizeof(float) * out_w * 3);
    for (size_t k = 0; k < t.w.size(); ++k) {
      const float* trow = tmp.data() + static_cast<size_t>(t.lo + k) * out_w * 3;
      const float wv = t.w[k];
      for (int i = 0; i < out_w * 3; ++i) drow[i] += wv * trow[i];
    }
  }
}

// Round-to-nearest with clamp, matching PIL's uint8 resize output rounding.
inline uint8_t to_u8(float v) {
  return static_cast<uint8_t>(std::min(255.0f, std::max(0.0f, v + 0.5f)));
}

}  // namespace

extern "C" {

// Train-mode: resize shorter side to short_side, crop out_size^2 at the
// position given by u_x/u_y in [0,1), optional horizontal flip.
// out: uint8 [out_size, out_size, 3].
int xmc_decode_train(const uint8_t* jpeg, size_t n, int out_size,
                     int short_side, double u_x, double u_y, int flip,
                     uint8_t* out) {
  std::vector<uint8_t> rgb;
  int w, h;
  if (!decode_rgb(jpeg, n, rgb, w, h)) return -1;
  const double scale = static_cast<double>(short_side) / std::min(w, h);
  int rw = std::max(short_side, static_cast<int>(std::lround(w * scale)));
  int rh = std::max(short_side, static_cast<int>(std::lround(h * scale)));
  if (rw < out_size || rh < out_size) return -2;
  std::vector<float> resized;
  resize_rgb(rgb.data(), w, h, rw, rh, resized);
  const int max_x = rw - out_size, max_y = rh - out_size;
  const int cx = static_cast<int>(u_x * (max_x + 1));
  const int cy = static_cast<int>(u_y * (max_y + 1));
  for (int y = 0; y < out_size; ++y) {
    const float* srow = resized.data() + (static_cast<size_t>(cy + y) * rw + cx) * 3;
    uint8_t* drow = out + static_cast<size_t>(y) * out_size * 3;
    if (!flip) {
      for (int i = 0; i < out_size * 3; ++i) drow[i] = to_u8(srow[i]);
    } else {
      for (int x = 0; x < out_size; ++x) {
        const float* px = srow + static_cast<size_t>(out_size - 1 - x) * 3;
        drow[x * 3 + 0] = to_u8(px[0]);
        drow[x * 3 + 1] = to_u8(px[1]);
        drow[x * 3 + 2] = to_u8(px[2]);
      }
    }
  }
  return 0;
}

// Test-mode: exact resize to (out_size, out_size).
int xmc_decode_test(const uint8_t* jpeg, size_t n, int out_size, uint8_t* out) {
  std::vector<uint8_t> rgb;
  int w, h;
  if (!decode_rgb(jpeg, n, rgb, w, h)) return -1;
  std::vector<float> resized;
  resize_rgb(rgb.data(), w, h, out_size, out_size, resized);
  for (size_t i = 0; i < resized.size(); ++i) out[i] = to_u8(resized[i]);
  return 0;
}

}  // extern "C"

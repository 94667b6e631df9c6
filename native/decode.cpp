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
//
// dct_scale_to > 0 enables DCT-domain scaled decoding (libjpeg scale_num/
// scale_denom): the IDCT emits the image directly at 1/2, 1/4 or 1/8 size,
// skipping most of the inverse-transform and color-conversion work.  The
// denominator is capped so the decoded short side stays >= 2x the resize
// target — the downstream triangle filter then still averages >= 2 taps per
// output pixel, which keeps the result within a few uint8 LSBs of the
// full-resolution path (the same guarantee PIL's Image.draft() relies on).
bool decode_rgb(const uint8_t* data, size_t n, std::vector<uint8_t>& rgb,
                int& w, int& h, int dct_scale_to = 0) {
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
  if (dct_scale_to > 0) {
    const unsigned int short_in =
        std::min(cinfo.image_width, cinfo.image_height);
    unsigned int denom = 1;
    while (denom < 8 &&
           short_in / (denom * 2) >=
               2u * static_cast<unsigned int>(dct_scale_to)) {
      denom *= 2;
    }
    cinfo.scale_num = 1;
    cinfo.scale_denom = denom;
    if (denom > 1) {
      // the >= 2x downstream downscale hides the cheaper chroma upsampling
      // (JDCT_IFAST measured *slower* than libjpeg-turbo's SIMD ISLOW here)
      cinfo.do_fancy_upsampling = FALSE;
    }
  }
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

// Separable resize of 8-bit RGB to (out_w, out_h) float RGB, materializing
// only the crop window [x0, x0+cw) x [y0, y0+ch) of the resized image (dst is
// (ch, cw, 3)).  The taps are built for the FULL (out_w, out_h) grid, so each
// produced pixel is bitwise-identical to a full resize followed by a crop —
// this just skips the resize work outside the crop (a 64-square crop of a
// 101x76 resize computes ~40% fewer taps; the training pipeline always crops).
void resize_rgb_crop(const uint8_t* src, int w, int h, int out_w, int out_h,
                     int x0, int y0, int cw, int ch, std::vector<float>& dst) {
  std::vector<Taps> tx, ty;
  build_taps(w, out_w, tx);
  build_taps(h, out_h, ty);
  // input-row band the vertical pass needs for output rows [y0, y0+ch)
  const Taps& tfirst = ty[y0];
  const Taps& tlast = ty[y0 + ch - 1];
  const int row_lo = tfirst.lo;
  const int row_hi = tlast.lo + static_cast<int>(tlast.w.size());
  const int band = row_hi - row_lo;
  // horizontal pass over the band, crop columns only: (band, cw, 3)
  std::vector<float> tmp(static_cast<size_t>(band) * cw * 3);
  for (int y = 0; y < band; ++y) {
    const uint8_t* row = src + static_cast<size_t>(row_lo + y) * w * 3;
    float* trow = tmp.data() + static_cast<size_t>(y) * cw * 3;
    for (int x = 0; x < cw; ++x) {
      const Taps& t = tx[x0 + x];
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
  // vertical pass: (ch, cw, 3)
  dst.resize(static_cast<size_t>(ch) * cw * 3);
  for (int y = 0; y < ch; ++y) {
    const Taps& t = ty[y0 + y];
    float* drow = dst.data() + static_cast<size_t>(y) * cw * 3;
    std::memset(drow, 0, sizeof(float) * cw * 3);
    for (size_t k = 0; k < t.w.size(); ++k) {
      const float* trow =
          tmp.data() + static_cast<size_t>(t.lo + k - row_lo) * cw * 3;
      const float wv = t.w[k];
      for (int i = 0; i < cw * 3; ++i) drow[i] += wv * trow[i];
    }
  }
}

// Full-frame resize (test mode): crop window == whole image.
void resize_rgb(const uint8_t* src, int w, int h, int out_w, int out_h,
                std::vector<float>& dst) {
  resize_rgb_crop(src, w, h, out_w, out_h, 0, 0, out_w, out_h, dst);
}

// Round-to-nearest with clamp, matching PIL's uint8 resize output rounding.
inline uint8_t to_u8(float v) {
  return static_cast<uint8_t>(std::min(255.0f, std::max(0.0f, v + 0.5f)));
}

}  // namespace

extern "C" {

// Train-mode: resize shorter side to short_side, crop out_size^2 at the
// position given by u_x/u_y in [0,1), optional horizontal flip.
// fast != 0 enables DCT-scaled decode (see decode_rgb; exact-output mode
// when 0).  out: uint8 [out_size, out_size, 3].
int xmc_decode_train(const uint8_t* jpeg, size_t n, int out_size,
                     int short_side, double u_x, double u_y, int flip,
                     int fast, uint8_t* out) {
  std::vector<uint8_t> rgb;
  int w, h;
  if (!decode_rgb(jpeg, n, rgb, w, h, fast ? short_side : 0)) return -1;
  const double scale = static_cast<double>(short_side) / std::min(w, h);
  int rw = std::max(short_side, static_cast<int>(std::lround(w * scale)));
  int rh = std::max(short_side, static_cast<int>(std::lround(h * scale)));
  if (rw < out_size || rh < out_size) return -2;
  const int max_x = rw - out_size, max_y = rh - out_size;
  const int cx = static_cast<int>(u_x * (max_x + 1));
  const int cy = static_cast<int>(u_y * (max_y + 1));
  // resize only the crop window (bitwise-equal to resize-then-crop)
  std::vector<float> resized;
  resize_rgb_crop(rgb.data(), w, h, rw, rh, cx, cy, out_size, out_size,
                  resized);
  for (int y = 0; y < out_size; ++y) {
    const float* srow = resized.data() + static_cast<size_t>(y) * out_size * 3;
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
int xmc_decode_test(const uint8_t* jpeg, size_t n, int out_size, int fast,
                    uint8_t* out) {
  std::vector<uint8_t> rgb;
  int w, h;
  if (!decode_rgb(jpeg, n, rgb, w, h, fast ? out_size : 0)) return -1;
  std::vector<float> resized;
  resize_rgb(rgb.data(), w, h, out_size, out_size, resized);
  for (size_t i = 0; i < resized.size(); ++i) out[i] = to_u8(resized[i]);
  return 0;
}

}  // extern "C"

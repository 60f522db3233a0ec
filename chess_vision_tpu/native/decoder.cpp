// Fast JPEG decode + antialiased bilinear resize for the serving hot path.
//
// The reference's input pipeline decodes with PIL on dataloader worker
// processes (reference dataset.py:251-252, train.py:273-288). Here decode is
// a native routine called from Python threads via ctypes — the call releases
// the GIL, so a thread pool gets true parallelism without process fan-out.
//
// decode_resize(): libjpeg decompress -> RGB -> separable triangle-filter
// resize (PIL-style antialiasing on downscale) -> uint8 out_size x out_size.
//
// Build: make -C chess_vision_tpu/native   (g++ -O3 -shared -ljpeg)

#include <cstddef>
#include <cstdio>  // jpeglib.h needs FILE/size_t declared first

#include <jpeglib.h>

#include <algorithm>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Separable triangle-filter resample, matching PIL's BILINEAR semantics:
// support widens by the scale factor on downscale (antialiasing), plain
// bilinear on upscale.
void resample_axis(const uint8_t* src, int src_w, int src_h, int channels,
                   int out_w, std::vector<uint8_t>* dst) {
  // resizes along the horizontal axis: (src_h, src_w, C) -> (src_h, out_w, C)
  dst->assign(static_cast<size_t>(src_h) * out_w * channels, 0);
  const double scale = static_cast<double>(src_w) / out_w;
  const double filterscale = std::max(scale, 1.0);
  const double support = 1.0 * filterscale;

  std::vector<int> bounds(out_w * 2);
  std::vector<double> weights;
  std::vector<int> woffsets(out_w + 1, 0);

  for (int xx = 0; xx < out_w; ++xx) {
    const double center = (xx + 0.5) * scale;
    int xmin = static_cast<int>(std::max(center - support + 0.5, 0.0));
    int xmax = static_cast<int>(
        std::min(center + support + 0.5, static_cast<double>(src_w)));
    bounds[xx * 2] = xmin;
    bounds[xx * 2 + 1] = xmax;
    double total = 0.0;
    size_t start = weights.size();
    for (int x = xmin; x < xmax; ++x) {
      double w = 1.0 - std::abs((x - center + 0.5) / filterscale);
      if (w < 0.0) w = 0.0;
      weights.push_back(w);
      total += w;
    }
    if (total > 0.0) {
      for (size_t i = start; i < weights.size(); ++i) weights[i] /= total;
    }
    woffsets[xx + 1] = static_cast<int>(weights.size());
  }

  for (int y = 0; y < src_h; ++y) {
    const uint8_t* row = src + static_cast<size_t>(y) * src_w * channels;
    uint8_t* orow = dst->data() + static_cast<size_t>(y) * out_w * channels;
    for (int xx = 0; xx < out_w; ++xx) {
      const int xmin = bounds[xx * 2];
      const int xmax = bounds[xx * 2 + 1];
      const double* w = weights.data() + woffsets[xx];
      for (int c = 0; c < channels; ++c) {
        double acc = 0.0;
        for (int x = xmin; x < xmax; ++x) {
          acc += row[x * channels + c] * w[x - xmin];
        }
        int v = static_cast<int>(std::lround(acc));
        orow[xx * channels + c] =
            static_cast<uint8_t>(std::clamp(v, 0, 255));
      }
    }
  }
}

void transpose_hwc(const uint8_t* src, int h, int w, int channels,
                   std::vector<uint8_t>* dst) {
  dst->assign(static_cast<size_t>(h) * w * channels, 0);
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      for (int c = 0; c < channels; ++c) {
        (*dst)[(static_cast<size_t>(x) * h + y) * channels + c] =
            src[(static_cast<size_t>(y) * w + x) * channels + c];
      }
    }
  }
}

}  // namespace

extern "C" {

// Returns 0 on success, nonzero on decode error.
// out must hold out_size*out_size*3 bytes.
int decode_resize(const uint8_t* data, long len, int out_size, uint8_t* out) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  // DCT-domain pre-scaling: decode cheaply, but keep >=2x the target size so
  // the antialiased triangle resample still defines the final pixels.
  while (cinfo.scale_denom < 8 &&
         (cinfo.image_width / (cinfo.scale_denom * 2) >=
          static_cast<unsigned>(out_size) * 2)) {
    cinfo.scale_denom *= 2;
  }
  jpeg_start_decompress(&cinfo);

  const int w = cinfo.output_width;
  const int h = cinfo.output_height;
  const int ch = cinfo.output_components;
  std::vector<uint8_t> pixels(static_cast<size_t>(w) * h * ch);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* rowptr = pixels.data() +
                      static_cast<size_t>(cinfo.output_scanline) * w * ch;
    jpeg_read_scanlines(&cinfo, &rowptr, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);

  if (ch != 3) {  // grayscale -> RGB
    std::vector<uint8_t> rgb(static_cast<size_t>(w) * h * 3);
    for (size_t i = 0; i < static_cast<size_t>(w) * h; ++i) {
      rgb[i * 3] = rgb[i * 3 + 1] = rgb[i * 3 + 2] = pixels[i * ch];
    }
    pixels.swap(rgb);
  }

  if (w == out_size && h == out_size) {
    std::memcpy(out, pixels.data(), static_cast<size_t>(out_size) * out_size * 3);
    return 0;
  }

  // separable resize: horizontal, transpose, horizontal, transpose
  std::vector<uint8_t> tmp1, tmp2;
  resample_axis(pixels.data(), w, h, 3, out_size, &tmp1);       // (h, out, 3)
  transpose_hwc(tmp1.data(), h, out_size, 3, &tmp2);            // (out, h, 3)
  resample_axis(tmp2.data(), h, out_size, 3, out_size, &tmp1);  // (out, out, 3)
  transpose_hwc(tmp1.data(), out_size, out_size, 3, &tmp2);     // (out, out, 3)
  std::memcpy(out, tmp2.data(), static_cast<size_t>(out_size) * out_size * 3);
  return 0;
}

}  // extern "C"

// Native host-side input pipeline: JPEG decode + fixed-size bilinear
// resize + CHW float conversion, with an internal thread pool.
//
// Replaces the role of the reference's torch DataLoader worker processes
// (reference trainer.py:54-60 + PIL decode in publay_dataset.py:53-55,
// SURVEY.md §2.2 "torch DataLoader" row): decoding and resizing happen in
// C++ threads (no GIL), producing tensors ready for device upload.
//
// The resize uses the EXACT torch align_corners=False bilinear formula so
// host preprocessing matches the device-side ops (ops/interpolate.py):
//   src = max(0, (dst + 0.5) * in/out - 0.5)
//
// Exposed as a C ABI for ctypes (no pybind11 in this toolchain).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode JPEG bytes to RGB8 HWC. Returns false on corrupt input.
bool decode_jpeg(const uint8_t* data, size_t len, std::vector<uint8_t>* rgb,
                 int* height, int* width) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *height = cinfo.output_height;
  *width = cinfo.output_width;
  rgb->resize(static_cast<size_t>(*height) * *width * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = rgb->data() +
                   static_cast<size_t>(cinfo.output_scanline) * *width * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// 1-D interp taps with torch align_corners=False semantics.
void interp_taps(int in_size, int out_size, std::vector<int>* lo,
                 std::vector<int>* hi, std::vector<float>* frac) {
  lo->resize(out_size);
  hi->resize(out_size);
  frac->resize(out_size);
  const double scale = static_cast<double>(in_size) / out_size;
  for (int d = 0; d < out_size; ++d) {
    double src = (d + 0.5) * scale - 0.5;
    if (src < 0) src = 0;
    int l = static_cast<int>(src);
    if (l > in_size - 1) l = in_size - 1;
    int h = l + 1 < in_size ? l + 1 : in_size - 1;
    (*lo)[d] = l;
    (*hi)[d] = h;
    (*frac)[d] = static_cast<float>(src - l);
  }
}

// RGB8 HWC [h, w] -> float CHW [3, s, s] in [0, 1], bilinear.
void resize_normalize(const uint8_t* rgb, int h, int w, int s, float* out) {
  std::vector<int> ylo, yhi, xlo, xhi;
  std::vector<float> yf, xf;
  interp_taps(h, s, &ylo, &yhi, &yf);
  interp_taps(w, s, &xlo, &xhi, &xf);

  // horizontal pass into [h, s, 3]
  std::vector<float> tmp(static_cast<size_t>(h) * s * 3);
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = rgb + static_cast<size_t>(y) * w * 3;
    float* trow = tmp.data() + static_cast<size_t>(y) * s * 3;
    for (int x = 0; x < s; ++x) {
      const uint8_t* a = row + xlo[x] * 3;
      const uint8_t* b = row + xhi[x] * 3;
      const float f = xf[x];
      for (int c = 0; c < 3; ++c) {
        trow[x * 3 + c] = (1.0f - f) * a[c] + f * b[c];
      }
    }
  }
  // vertical pass + CHW + /255
  const float inv = 1.0f / 255.0f;
  for (int y = 0; y < s; ++y) {
    const float* a = tmp.data() + static_cast<size_t>(ylo[y]) * s * 3;
    const float* b = tmp.data() + static_cast<size_t>(yhi[y]) * s * 3;
    const float f = yf[y];
    for (int x = 0; x < s; ++x) {
      for (int c = 0; c < 3; ++c) {
        out[(static_cast<size_t>(c) * s + y) * s + x] =
            ((1.0f - f) * a[x * 3 + c] + f * b[x * 3 + c]) * inv;
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode+resize one image. Returns 0 on success, nonzero on decode error.
int ld_decode_resize(const uint8_t* jpeg, long len, int out_size, float* out,
                     float* orig_hw) {
  std::vector<uint8_t> rgb;
  int h = 0, w = 0;
  if (!decode_jpeg(jpeg, static_cast<size_t>(len), &rgb, &h, &w)) return 1;
  orig_hw[0] = static_cast<float>(h);
  orig_hw[1] = static_cast<float>(w);
  resize_normalize(rgb.data(), h, w, out_size, out);
  return 0;
}

// Batched, thread-pooled variant. bufs: n pointers; lens: n lengths;
// out: [n, 3, out_size, out_size]; orig_hw: [n, 2]. Returns number of
// decode failures. Failed slots are zero-filled and marked with
// orig_hw = (0, 0) (impossible for a real decode, where height/width
// are always >= 1) so callers can invalidate those slots per-example.
int ld_decode_resize_batch(const uint8_t** bufs, const long* lens, int n,
                           int out_size, float* out, float* orig_hw,
                           int n_threads) {
  std::atomic<int> next(0), failures(0);
  const size_t img_elems = 3UL * out_size * out_size;
  auto worker = [&]() {
    while (true) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      float* dst = out + i * img_elems;
      if (ld_decode_resize(bufs[i], lens[i], out_size, dst,
                           orig_hw + 2 * i) != 0) {
        std::memset(dst, 0, img_elems * sizeof(float));
        orig_hw[2 * i] = 0.0f;
        orig_hw[2 * i + 1] = 0.0f;
        failures.fetch_add(1);
      }
    }
  };
  if (n_threads <= 1) {
    worker();
  } else {
    std::vector<std::thread> threads;
    for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
  }
  return failures.load();
}

}  // extern "C"

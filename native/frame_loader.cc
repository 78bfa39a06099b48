// Native frame-loading core: threaded JPEG decode + resize + center-crop
// into preallocated uint8 batch buffers.
//
// This is the host-side hot path of the input pipeline (the work the
// reference does with PIL in DataLoader worker processes —
// /root/reference actnet/ops/dataset.py:82-87 + ops/transforms.py). The
// TPU rebuild keeps augmentation on device; what remains on host is decode
// + one resize per frame, which this library does with libjpeg's DCT-domain
// scaling (decode directly at ~target resolution) and a fixed-point
// bilinear resampler, parallelized over frames with a worker pool.
//
// C API (ctypes-friendly), all functions return 0 on success:
//   afl_decode_file(path, canvas, out)         - one frame -> canvas^2 RGB
//   afl_decode_batch(paths, n, canvas, out, n_threads, status)
//
// Exposed via adafocus_tpu/data/native.py; built with:
//   g++ -O3 -march=native -shared -fPIC frame_loader.cc -o libframeloader.so -ljpeg -lpthread

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <thread>
#include <vector>

namespace {

struct ErrMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void error_exit(j_common_ptr cinfo) {
  ErrMgr* err = reinterpret_cast<ErrMgr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Decode a JPEG file to RGB at >= min_side on the short side, using
// libjpeg's scale_num/8 DCT scaling to avoid decoding full resolution.
bool decode_jpeg(const char* path, int min_side, std::vector<uint8_t>* pixels,
                 int* width, int* height) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;

  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;

  // pick the smallest scale_num/8 with short side still >= min_side
  const int short_side = std::min<int>(cinfo.image_width, cinfo.image_height);
  int scale_num = 8;
  for (int s = 1; s <= 8; ++s) {
    if (short_side * s / 8 >= min_side) { scale_num = s; break; }
  }
  cinfo.scale_num = scale_num;
  cinfo.scale_denom = 8;
  cinfo.do_fancy_upsampling = FALSE;
  jpeg_start_decompress(&cinfo);

  *width = cinfo.output_width;
  *height = cinfo.output_height;
  const int stride = cinfo.output_width * cinfo.output_components;
  pixels->resize(static_cast<size_t>(stride) * cinfo.output_height);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = pixels->data() +
                   static_cast<size_t>(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return cinfo.output_components == 3;
}

// Fixed-point bilinear resize of an RGB image region, then center-crop to
// canvas x canvas. Matches the Python path's geometry: scale short side to
// `canvas`, center-crop the long side.
void resize_center_crop(const uint8_t* src, int sw, int sh, int canvas,
                        uint8_t* out) {
  const double scale = static_cast<double>(canvas) / std::min(sw, sh);
  const int rw = std::max(canvas, static_cast<int>(sw * scale + 0.5));
  const int rh = std::max(canvas, static_cast<int>(sh * scale + 0.5));
  const int x0 = (rw - canvas) / 2;
  const int y0 = (rh - canvas) / 2;
  // map output pixel -> source coordinate (align-corners=false convention)
  const double fx = static_cast<double>(sw) / rw;
  const double fy = static_cast<double>(sh) / rh;
  for (int y = 0; y < canvas; ++y) {
    const double syf = (y + y0 + 0.5) * fy - 0.5;
    int sy = static_cast<int>(syf < 0 ? 0 : syf);
    sy = std::min(sy, sh - 2 < 0 ? 0 : sh - 2);
    const double wy = std::max(0.0, std::min(1.0, syf - sy));
    const uint8_t* row0 = src + static_cast<size_t>(sy) * sw * 3;
    const uint8_t* row1 = src + static_cast<size_t>(std::min(sy + 1, sh - 1)) * sw * 3;
    uint8_t* orow = out + static_cast<size_t>(y) * canvas * 3;
    for (int x = 0; x < canvas; ++x) {
      const double sxf = (x + x0 + 0.5) * fx - 0.5;
      int sx = static_cast<int>(sxf < 0 ? 0 : sxf);
      sx = std::min(sx, sw - 2 < 0 ? 0 : sw - 2);
      const double wx = std::max(0.0, std::min(1.0, sxf - sx));
      const int sx1 = std::min(sx + 1, sw - 1);
      for (int c = 0; c < 3; ++c) {
        const double top = row0[sx * 3 + c] * (1 - wx) + row0[sx1 * 3 + c] * wx;
        const double bot = row1[sx * 3 + c] * (1 - wx) + row1[sx1 * 3 + c] * wx;
        orow[x * 3 + c] = static_cast<uint8_t>(top * (1 - wy) + bot * wy + 0.5);
      }
    }
  }
}

int decode_one(const char* path, int canvas, uint8_t* out) {
  std::vector<uint8_t> pixels;
  int w = 0, h = 0;
  if (!decode_jpeg(path, canvas, &pixels, &w, &h)) return 1;
  if (w < 1 || h < 1) return 1;
  resize_center_crop(pixels.data(), w, h, canvas, out);
  return 0;
}

}  // namespace

extern "C" {

int afl_decode_file(const char* path, int canvas, uint8_t* out) {
  return decode_one(path, canvas, out);
}

// paths: n C strings; out: n * canvas * canvas * 3 bytes;
// status: n ints (0 = ok). Returns the number of failures.
int afl_decode_batch(const char** paths, int n, int canvas, uint8_t* out,
                     int n_threads, int* status) {
  const size_t frame_bytes = static_cast<size_t>(canvas) * canvas * 3;
  std::atomic<int> next(0), failures(0);
  n_threads = std::max(1, std::min(n_threads, n));
  auto work = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      const int rc = decode_one(paths[i], canvas, out + frame_bytes * i);
      status[i] = rc;
      if (rc) failures.fetch_add(1);
    }
  };
  std::vector<std::thread> pool;
  for (int t = 1; t < n_threads; ++t) pool.emplace_back(work);
  work();
  for (auto& th : pool) th.join();
  return failures.load();
}

int afl_version() { return 1; }

}  // extern "C"

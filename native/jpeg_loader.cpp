// Multithreaded JPEG decode + bilinear resize batch loader.
//
// Fills the role of the reference's torch DataLoader worker processes
// (salve/train_utils.py: args.workers=15 subprocesses decoding BEV JPEGs):
// one C++ thread pool decodes a whole batch with libjpeg and resizes to the
// training resolution, writing float32 RGB in [0,255] directly into a
// caller-provided buffer — no Python objects, no per-image IPC.
//
// Build: g++ -O3 -march=native -shared -fPIC jpeg_loader.cpp -ljpeg -lpthread
//        -o libjpeg_loader.so

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdio>
#include <cstring>
#include <thread>
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

// Decode one JPEG file to an RGB8 buffer. Returns false on failure.
bool decode_jpeg(const char* path, std::vector<unsigned char>& rgb, int& w,
                 int& h) {
  FILE* infile = fopen(path, "rb");
  if (!infile) return false;

  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(infile);
    return false;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, infile);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  w = cinfo.output_width;
  h = cinfo.output_height;
  rgb.resize(static_cast<size_t>(w) * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = rgb.data() + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(infile);
  return true;
}

// Bilinear resize RGB8 (h,w) -> float32 (out_h,out_w), values in [0,255].
// Matches cv2.resize INTER_LINEAR sample positions (pixel-center aligned).
void resize_bilinear(const unsigned char* src, int w, int h, float* dst,
                     int out_w, int out_h) {
  const float sx = static_cast<float>(w) / out_w;
  const float sy = static_cast<float>(h) / out_h;
  for (int oy = 0; oy < out_h; ++oy) {
    float fy = (oy + 0.5f) * sy - 0.5f;
    int y0 = static_cast<int>(std::floor(fy));
    float wy = fy - y0;
    int y1 = y0 + 1;
    if (y0 < 0) y0 = 0;
    if (y1 < 0) y1 = 0;
    if (y0 > h - 1) y0 = h - 1;
    if (y1 > h - 1) y1 = h - 1;
    for (int ox = 0; ox < out_w; ++ox) {
      float fx = (ox + 0.5f) * sx - 0.5f;
      int x0 = static_cast<int>(std::floor(fx));
      float wx = fx - x0;
      int x1 = x0 + 1;
      if (x0 < 0) x0 = 0;
      if (x1 < 0) x1 = 0;
      if (x0 > w - 1) x0 = w - 1;
      if (x1 > w - 1) x1 = w - 1;
      for (int c = 0; c < 3; ++c) {
        float v00 = src[(static_cast<size_t>(y0) * w + x0) * 3 + c];
        float v01 = src[(static_cast<size_t>(y0) * w + x1) * 3 + c];
        float v10 = src[(static_cast<size_t>(y1) * w + x0) * 3 + c];
        float v11 = src[(static_cast<size_t>(y1) * w + x1) * 3 + c];
        float top = v00 + wx * (v01 - v00);
        float bot = v10 + wx * (v11 - v10);
        dst[(static_cast<size_t>(oy) * out_w + ox) * 3 + c] = top + wy * (bot - top);
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode `n` JPEGs and resize each to (out_h, out_w); writes float32 RGB
// into `out` of shape (n, out_h, out_w, 3). `ok[i]` is set to 1 on success.
// Returns the number of successfully decoded images.
int decode_resize_batch(const char** paths, int n, int out_h, int out_w,
                        float* out, unsigned char* ok, int num_threads) {
  if (num_threads <= 0) num_threads = std::thread::hardware_concurrency();
  std::atomic<int> next{0};
  std::atomic<int> n_ok{0};
  const size_t stride = static_cast<size_t>(out_h) * out_w * 3;

  auto worker = [&]() {
    std::vector<unsigned char> rgb;
    int w = 0, h = 0;
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      ok[i] = 0;
      if (!decode_jpeg(paths[i], rgb, w, h)) continue;
      resize_bilinear(rgb.data(), w, h, out + stride * i, out_w, out_h);
      ok[i] = 1;
      n_ok.fetch_add(1);
    }
  };

  std::vector<std::thread> threads;
  int n_threads = std::min(num_threads, n);
  threads.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return n_ok.load();
}

}  // extern "C"

// Native RGB-D frame loader: multithreaded decode + prefetch ring.
//
// Role: the reference keeps its data layer native-adjacent (C++ VO consumes
// frames through cv::Mat, and the Python preloader thread of
// src/entities/datasets.py:53-122 hides decode latency). Here the SLAM
// compute path is JAX, but frame decode (JPEG color + 16-bit PNG depth) is
// host work that fights the Python GIL on this single-core host — so it
// lives in C++: a worker pool decodes ahead of the consumer into a bounded
// cache (classic producer/consumer, SURVEY.md §2.4 P1).
//
// C ABI for ctypes (no pybind11 in this image):
//   loader_create(color_paths, depth_paths, n, depth_scale, readahead,
//                 n_threads) -> handle
//   loader_get(handle, idx, rgb_out[h*w*3] u8, depth_out[h*w] f32) -> 0/err
//   loader_dims(handle, &w, &h) (decodes frame 0 on demand)
//   loader_destroy(handle)
//
// Build: make -C native   (links libjpeg + libpng16 + zlib)

#include <csetjmp>
#include <cstdio>
#include <cstddef>

#include <jpeglib.h>
#include <png.h>

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Frame {
  std::vector<uint8_t> rgb;
  std::vector<float> depth;
  int w = 0, h = 0;
  bool ok = false;
};

bool ends_with(const std::string& s, const char* suf) {
  size_t n = strlen(suf);
  if (s.size() < n) return false;
  for (size_t i = 0; i < n; i++) {
    char a = s[s.size() - n + i], b = suf[i];
    if (tolower(a) != tolower(b)) return false;
  }
  return true;
}

// libjpeg's default error_exit() calls exit(), which would kill the whole
// Python process on one corrupt frame — install a setjmp-based handler
// (mirrors the libpng path below).
struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

void jpeg_error_longjmp(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->jb, 1);
}

bool decode_jpeg_rgb(const std::string& path, std::vector<uint8_t>& out,
                     int& w, int& h) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_longjmp;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  w = cinfo.output_width;
  h = cinfo.output_height;
  out.resize(size_t(w) * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out.data() + size_t(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// PNG decode; rgb output for color, 16-bit gray -> float for depth.
bool decode_png(const std::string& path, bool as_depth, float depth_scale,
                std::vector<uint8_t>& rgb, std::vector<float>& depth, int& w,
                int& h) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  w = png_get_image_width(png, info);
  h = png_get_image_height(png, info);
  int bit_depth = png_get_bit_depth(png, info);
  int color_type = png_get_color_type(png, info);

  if (as_depth) {
    // Expect 16-bit grayscale (TUM/Replica depth pngs).
    if (color_type != PNG_COLOR_TYPE_GRAY) {
      png_destroy_read_struct(&png, &info, nullptr);
      fclose(f);
      return false;
    }
    std::vector<uint8_t> row(size_t(w) * (bit_depth / 8));
    depth.resize(size_t(w) * h);
    for (int y = 0; y < h; y++) {
      png_read_row(png, row.data(), nullptr);
      if (bit_depth == 16) {
        for (int x = 0; x < w; x++) {
          uint16_t v = (uint16_t(row[2 * x]) << 8) | row[2 * x + 1];  // PNG BE
          depth[size_t(y) * w + x] = float(v) / depth_scale;
        }
      } else {
        for (int x = 0; x < w; x++)
          depth[size_t(y) * w + x] = float(row[x]) / depth_scale;
      }
    }
  } else {
    if (bit_depth == 16) png_set_strip_16(png);
    if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color_type == PNG_COLOR_TYPE_GRAY) png_set_gray_to_rgb(png);
    if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
    png_read_update_info(png, info);
    rgb.resize(size_t(w) * h * 3);
    for (int y = 0; y < h; y++)
      png_read_row(png, rgb.data() + size_t(y) * w * 3, nullptr);
  }
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  return true;
}

struct Loader {
  std::vector<std::string> color_paths, depth_paths;
  float depth_scale;
  int readahead;
  std::map<int, Frame> cache;
  std::mutex mu;
  std::condition_variable cv;
  std::atomic<int> next_job{0};
  std::atomic<int> consumer_at{0};
  std::atomic<bool> stop{false};
  std::atomic<int> exp_w{0}, exp_h{0};  // set by loader_dims (frame 0)
  std::vector<std::thread> workers;

  Frame decode(int idx) {
    Frame fr;
    const std::string& cp = color_paths[idx];
    int w2 = 0, h2 = 0;
    bool ok1 = false;
    if (ends_with(cp, ".jpg") || ends_with(cp, ".jpeg"))
      ok1 = decode_jpeg_rgb(cp, fr.rgb, fr.w, fr.h);
    else if (ends_with(cp, ".png")) {
      std::vector<float> dummy;
      ok1 = decode_png(cp, false, 1.0f, fr.rgb, dummy, fr.w, fr.h);
    }
    bool ok2 = decode_png(depth_paths[idx], true, depth_scale, fr.rgb,
                          fr.depth, w2, h2);
    // A frame whose color/depth dims disagree (or differ from frame 0's,
    // which sized the caller's numpy buffers) must fail loudly instead of
    // overflowing the output buffers in loader_get.
    fr.ok = ok1 && ok2 && w2 == fr.w && h2 == fr.h;
    int ew = exp_w.load(), eh = exp_h.load();
    if (ew > 0 && (fr.w != ew || fr.h != eh)) fr.ok = false;
    return fr;
  }

  void worker() {
    while (!stop.load()) {
      int idx = next_job.fetch_add(1);
      if (idx >= (int)color_paths.size()) return;
      Frame fr = decode(idx);
      std::unique_lock<std::mutex> lk(mu);
      cv.wait(lk, [&] {
        return stop.load() ||
               (int)cache.size() < 2 * readahead ||
               idx < consumer_at.load() + readahead;
      });
      if (stop.load()) return;
      cache.emplace(idx, std::move(fr));
      cv.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* loader_create(const char** color_paths, const char** depth_paths, int n,
                    float depth_scale, int readahead, int n_threads) {
  auto* L = new Loader();
  for (int i = 0; i < n; i++) {
    L->color_paths.emplace_back(color_paths[i]);
    L->depth_paths.emplace_back(depth_paths[i]);
  }
  L->depth_scale = depth_scale;
  L->readahead = readahead > 0 ? readahead : 8;
  int nt = n_threads > 0 ? n_threads : 2;
  for (int i = 0; i < nt; i++)
    L->workers.emplace_back(&Loader::worker, L);
  return L;
}

int loader_dims(void* h, int* w, int* ht) {
  auto* L = (Loader*)h;
  if (L->color_paths.empty()) return -1;
  Frame fr = L->decode(0);
  if (!fr.ok) return -2;
  *w = fr.w;
  *ht = fr.h;
  L->exp_w.store(fr.w);
  L->exp_h.store(fr.h);
  return 0;
}

// Blocks until frame idx is decoded; copies into caller buffers.
int loader_get(void* h, int idx, uint8_t* rgb_out, float* depth_out) {
  auto* L = (Loader*)h;
  if (idx < 0 || idx >= (int)L->color_paths.size()) return -1;
  L->consumer_at.store(idx);
  std::unique_lock<std::mutex> lk(L->mu);
  L->cv.notify_all();
  auto it = L->cache.find(idx);
  if (it == L->cache.end()) {
    // Not produced yet (or already evicted): check production watermark.
    if (idx < L->next_job.load()) {
      lk.unlock();
      Frame fr = L->decode(idx);  // evicted: re-decode synchronously
      if (!fr.ok) return -2;
      if (fr.w != L->exp_w.load() || fr.h != L->exp_h.load()) return -4;
      memcpy(rgb_out, fr.rgb.data(), fr.rgb.size());
      memcpy(depth_out, fr.depth.data(), fr.depth.size() * sizeof(float));
      return 0;
    }
    L->cv.wait(lk, [&] {
      return L->stop.load() || L->cache.count(idx) > 0;
    });
    if (L->stop.load()) return -3;
    it = L->cache.find(idx);
  }
  Frame fr = std::move(it->second);
  // Evict strictly older frames (consumer advances monotonically).
  L->cache.erase(L->cache.begin(), L->cache.upper_bound(idx));
  L->cv.notify_all();
  lk.unlock();
  if (!fr.ok) return -2;
  if (fr.w != L->exp_w.load() || fr.h != L->exp_h.load()) return -4;
  memcpy(rgb_out, fr.rgb.data(), fr.rgb.size());
  memcpy(depth_out, fr.depth.data(), fr.depth.size() * sizeof(float));
  return 0;
}

void loader_destroy(void* h) {
  auto* L = (Loader*)h;
  L->stop.store(true);
  L->cv.notify_all();
  for (auto& t : L->workers) t.join();
  delete L;
}

}  // extern "C"

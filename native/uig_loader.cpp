// uig native data loader — multithreaded JPEG/PNG decode + bilinear resize.
//
// The host-side half of the input pipeline (SURVEY.md §2 "Input pipeline";
// the reference repo has no native code — this is the TPU-framework-native
// equivalent of a torch DataLoader's C++ worker pool): decoding releases the
// GIL entirely (pure C ABI, called via ctypes), a persistent pthread pool
// decodes a whole batch in parallel, and output is written straight into the
// caller-provided (B, S, S, 3) uint8 buffer that the Python side device_puts.
//
// Exposed C ABI:
//   int uig_decode_resize(const char* path, int load_size, uint8_t* out);
//   int uig_decode_batch(const char** paths, int n, int load_size,
//                        uint8_t* out, int n_threads);
//   const char* uig_loader_version();
//
// Returns 0 on success; negative error codes otherwise (see codes below).

#include <cstddef>
#include <cstdint>
#include <cstdio>

#include <jpeglib.h>  // requires <cstdio>/<cstddef> first (uses FILE, size_t)
#include <png.h>

#include <atomic>
#include <condition_variable>
#include <csetjmp>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

constexpr int kErrOpen = -1;
constexpr int kErrFormat = -2;
constexpr int kErrDecode = -3;
constexpr int kErrArg = -4;

// ---------------------------------------------------------------------------
// decoding to an RGB8 buffer of (h, w)
// ---------------------------------------------------------------------------

struct Image {
  std::vector<uint8_t> rgb;  // h*w*3
  int w = 0, h = 0;
};

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->jump, 1);
}

int decode_jpeg(FILE* f, Image* img) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return kErrDecode;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  img->w = static_cast<int>(cinfo.output_width);
  img->h = static_cast<int>(cinfo.output_height);
  img->rgb.resize(static_cast<size_t>(img->w) * img->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = img->rgb.data() +
                   static_cast<size_t>(cinfo.output_scanline) * img->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

int decode_png(FILE* f, Image* img) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return kErrDecode;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return kErrDecode;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return kErrDecode;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr,
               nullptr);
  // normalize anything to 8-bit RGB
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color_type & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_read_update_info(png, info);

  img->w = static_cast<int>(w);
  img->h = static_cast<int>(h);
  img->rgb.resize(static_cast<size_t>(w) * h * 3);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = img->rgb.data() + static_cast<size_t>(y) * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return 0;
}

int decode_file(const char* path, Image* img) {
  FILE* f = fopen(path, "rb");
  if (!f) return kErrOpen;
  uint8_t magic[8] = {0};
  size_t got = fread(magic, 1, sizeof(magic), f);
  rewind(f);
  int rc;
  if (got >= 3 && magic[0] == 0xFF && magic[1] == 0xD8 && magic[2] == 0xFF) {
    rc = decode_jpeg(f, img);
  } else if (got >= 8 && !png_sig_cmp(magic, 0, 8)) {
    rc = decode_png(f, img);
  } else {
    rc = kErrFormat;
  }
  fclose(f);
  return rc;
}

// ---------------------------------------------------------------------------
// separable triangle-filter resize to (s, s) — PIL-BILINEAR semantics:
// antialiased on downscale (filter support scales with the shrink factor),
// classic bilinear on upscale. Weight tables are shared by all rows/cols.
// ---------------------------------------------------------------------------

struct ResampleAxis {
  std::vector<int> xmin;            // first source index per output coord
  std::vector<int> count;           // number of taps per output coord
  std::vector<std::vector<float>> w;  // normalized weights per output coord
};

ResampleAxis make_axis(int in, int out) {
  ResampleAxis ax;
  ax.xmin.resize(out);
  ax.count.resize(out);
  ax.w.resize(out);
  const double scale = static_cast<double>(in) / out;
  const double filterscale = scale < 1.0 ? 1.0 : scale;
  const double support = 1.0 * filterscale;  // triangle filter support = 1
  for (int i = 0; i < out; ++i) {
    double center = (i + 0.5) * scale;
    int lo = static_cast<int>(center - support + 0.5);
    if (lo < 0) lo = 0;
    int hi = static_cast<int>(center + support + 0.5);
    if (hi > in) hi = in;
    ax.xmin[i] = lo;
    ax.count[i] = hi - lo;
    auto& wi = ax.w[i];
    wi.resize(hi - lo);
    double total = 0.0;
    for (int j = lo; j < hi; ++j) {
      double d = (j + 0.5 - center) / filterscale;
      double t = d < 0 ? -d : d;
      double v = t < 1.0 ? 1.0 - t : 0.0;
      wi[j - lo] = static_cast<float>(v);
      total += v;
    }
    if (total > 0) {
      for (auto& v : wi) v = static_cast<float>(v / total);
    }
  }
  return ax;
}

void resize_bilinear(const Image& img, int s, uint8_t* out) {
  ResampleAxis ah = make_axis(img.w, s);   // horizontal
  ResampleAxis av = make_axis(img.h, s);   // vertical
  // pass 1: horizontal -> (img.h, s, 3) float
  std::vector<float> tmp(static_cast<size_t>(img.h) * s * 3);
  for (int y = 0; y < img.h; ++y) {
    const uint8_t* src = img.rgb.data() + static_cast<size_t>(y) * img.w * 3;
    float* dst = tmp.data() + static_cast<size_t>(y) * s * 3;
    for (int ox = 0; ox < s; ++ox) {
      float acc[3] = {0, 0, 0};
      const int lo = ah.xmin[ox], n = ah.count[ox];
      const float* w = ah.w[ox].data();
      for (int k = 0; k < n; ++k) {
        const uint8_t* p = src + (static_cast<size_t>(lo + k)) * 3;
        acc[0] += w[k] * p[0];
        acc[1] += w[k] * p[1];
        acc[2] += w[k] * p[2];
      }
      dst[ox * 3 + 0] = acc[0];
      dst[ox * 3 + 1] = acc[1];
      dst[ox * 3 + 2] = acc[2];
    }
  }
  // pass 2: vertical -> (s, s, 3) uint8
  for (int oy = 0; oy < s; ++oy) {
    const int lo = av.xmin[oy], n = av.count[oy];
    const float* w = av.w[oy].data();
    uint8_t* dst = out + static_cast<size_t>(oy) * s * 3;
    for (int ox = 0; ox < s; ++ox) {
      float acc[3] = {0, 0, 0};
      for (int k = 0; k < n; ++k) {
        const float* p =
            tmp.data() + (static_cast<size_t>(lo + k) * s + ox) * 3;
        acc[0] += w[k] * p[0];
        acc[1] += w[k] * p[1];
        acc[2] += w[k] * p[2];
      }
      for (int c = 0; c < 3; ++c) {
        float v = acc[c] + 0.5f;
        dst[ox * 3 + c] =
            static_cast<uint8_t>(v < 0 ? 0 : (v > 255 ? 255 : v));
      }
    }
  }
}

// ---------------------------------------------------------------------------
// persistent thread pool (created once, sized on first batch call)
// ---------------------------------------------------------------------------

class Pool {
 public:
  explicit Pool(int n) {
    for (int i = 0; i < n; ++i)
      workers_.emplace_back([this] { Run(); });
  }
  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }
  void Submit(std::function<void()> task) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      tasks_.push(std::move(task));
    }
    cv_.notify_one();
  }

 private:
  void Run() {
    for (;;) {
      std::function<void()> task;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !tasks_.empty(); });
        if (stop_ && tasks_.empty()) return;
        task = std::move(tasks_.front());
        tasks_.pop();
      }
      task();
    }
  }
  std::mutex mu_;
  std::condition_variable cv_;
  std::queue<std::function<void()>> tasks_;
  std::vector<std::thread> workers_;
  bool stop_ = false;
};

std::mutex g_pool_mu;
Pool* g_pool = nullptr;
int g_pool_size = 0;

Pool* GetPool(int n_threads) {
  std::lock_guard<std::mutex> lk(g_pool_mu);
  if (g_pool == nullptr || g_pool_size < n_threads) {
    delete g_pool;
    g_pool = new Pool(n_threads);
    g_pool_size = n_threads;
  }
  return g_pool;
}

}  // namespace

extern "C" {

const char* uig_loader_version() { return "uig_loader 1.0 (jpeg+png)"; }

int uig_decode_resize(const char* path, int load_size, uint8_t* out) {
  if (!path || !out || load_size <= 0) return kErrArg;
  Image img;
  int rc = decode_file(path, &img);
  if (rc != 0) return rc;
  resize_bilinear(img, load_size, out);
  return 0;
}

int uig_decode_batch(const char** paths, int n, int load_size, uint8_t* out,
                     int n_threads) {
  if (!paths || !out || n <= 0 || load_size <= 0) return kErrArg;
  if (n_threads <= 1 || n == 1) {
    for (int i = 0; i < n; ++i) {
      int rc = uig_decode_resize(
          paths[i], load_size,
          out + static_cast<size_t>(i) * load_size * load_size * 3);
      if (rc != 0) return rc;
    }
    return 0;
  }
  Pool* pool = GetPool(n_threads);
  std::atomic<int> remaining(n);
  std::atomic<int> err(0);
  std::mutex done_mu;
  std::condition_variable done_cv;
  for (int i = 0; i < n; ++i) {
    pool->Submit([&, i] {
      int rc = uig_decode_resize(
          paths[i], load_size,
          out + static_cast<size_t>(i) * load_size * load_size * 3);
      if (rc != 0) err.store(rc);
      if (remaining.fetch_sub(1) == 1) {
        std::lock_guard<std::mutex> lk(done_mu);
        done_cv.notify_one();
      }
    });
  }
  std::unique_lock<std::mutex> lk(done_mu);
  done_cv.wait(lk, [&] { return remaining.load() == 0; });
  return err.load();
}

}  // extern "C"

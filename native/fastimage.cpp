// fastimage: multithreaded JPEG/PNG decode + bilinear resize + normalise.
//
// The native data-path component of the TPU GAN zoo. The reference's image
// loading runs through torchvision/PIL (C decoders driven from Python, one
// image per worker-process dispatch); here the whole
// decode→resize→normalise→NHWC-pack loop for a batch runs in one C++ call
// with a thread pool, feeding the host-side input pipeline
// (lightning_gan_zoo_tpu/data). Exposed via a C ABI for ctypes — no
// pybind11 dependency (not in this image).
//
// Build: make -C native   (g++ -O3 -shared, links libjpeg/libpng/z/pthread)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <atomic>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct Image {
  std::vector<uint8_t> data;  // HWC, 8-bit
  int w = 0, h = 0, c = 0;
  bool ok = false;
};

// ---------------------------------------------------------------- JPEG
struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

Image decode_jpeg(FILE* f) {
  Image img;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return img;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  img.w = cinfo.output_width;
  img.h = cinfo.output_height;
  img.c = 3;
  img.data.resize(size_t(img.w) * img.h * img.c);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = img.data.data() + size_t(cinfo.output_scanline) * img.w * img.c;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  img.ok = true;
  return img;
}

// ---------------------------------------------------------------- PNG
Image decode_png(FILE* f) {
  Image img;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) return img;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return img;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return img;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_set_expand(png);          // palette/gray<8/tRNS → 8-bit
  png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  img.w = png_get_image_width(png, info);
  img.h = png_get_image_height(png, info);
  img.c = 3;
  img.data.resize(size_t(img.w) * img.h * img.c);
  std::vector<png_bytep> rows(img.h);
  for (int y = 0; y < img.h; ++y)
    rows[y] = img.data.data() + size_t(y) * img.w * img.c;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  img.ok = true;
  return img;
}

Image decode_file(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return {};
  uint8_t magic[8] = {0};
  size_t got = fread(magic, 1, 8, f);
  rewind(f);
  Image img;
  if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    img = decode_jpeg(f);
  } else if (got >= 8 && !png_sig_cmp(magic, 0, 8)) {
    img = decode_png(f);
  }
  fclose(f);
  return img;
}

// --------------------------------------------------- resize + normalise
// PIL-compatible BILINEAR resampling: separable triangle filter whose
// support scales with the downscale factor (antialiased, what
// torchvision.transforms.Resize does through PIL — the reference's
// transform stack, core/lightning_module.py:42-47). Then (x/255 − mean)/std
// into NHWC float32.

// one resampling pass along the horizontal axis: (h, w_in, c) → (h, w_out, c)
void resample_axis(const float* src, int h, int w_in, int c, int w_out,
                   float* dst) {
  const double scale = double(w_in) / w_out;
  const double support = scale > 1.0 ? scale : 1.0;
  const int kmax = int(2 * support + 2);
  std::vector<double> weights(kmax);
  for (int ox = 0; ox < w_out; ++ox) {
    double center = (ox + 0.5) * scale;
    int xmin = int(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = int(center + support + 0.5);
    if (xmax > w_in) xmax = w_in;
    double total = 0.0;
    for (int x = xmin; x < xmax; ++x) {
      double t = (x - center + 0.5) / (scale > 1.0 ? scale : 1.0);
      double wgt = t < 0 ? 1.0 + t : 1.0 - t;  // triangle
      if (wgt < 0) wgt = 0;
      weights[x - xmin] = wgt;
      total += wgt;
    }
    for (int y = 0; y < h; ++y) {
      const float* row = src + size_t(y) * w_in * c;
      float* o = dst + (size_t(y) * w_out + ox) * c;
      for (int ch = 0; ch < c; ++ch) {
        double acc = 0.0;
        for (int x = xmin; x < xmax; ++x)
          acc += row[size_t(x) * c + ch] * weights[x - xmin];
        o[ch] = float(acc / (total > 0 ? total : 1.0));
      }
    }
  }
}

void resize_normalise(const Image& img, int out_size, int out_c, float mean,
                      float stddev, float* out) {
  // to float
  std::vector<float> fsrc(img.data.size());
  for (size_t i = 0; i < img.data.size(); ++i) fsrc[i] = img.data[i];
  // horizontal pass: (h, w, c) → (h, out, c)
  std::vector<float> tmp(size_t(img.h) * out_size * img.c);
  resample_axis(fsrc.data(), img.h, img.w, img.c, out_size, tmp.data());
  // vertical pass: treat as transposed horizontal — reuse by swapping axes:
  // (h, out, c) viewed column-major… simpler: transpose to (out, h, c)
  std::vector<float> tmp_t(size_t(out_size) * img.h * img.c);
  for (int y = 0; y < img.h; ++y)
    for (int x = 0; x < out_size; ++x)
      for (int ch = 0; ch < img.c; ++ch)
        tmp_t[(size_t(x) * img.h + y) * img.c + ch] =
            tmp[(size_t(y) * out_size + x) * img.c + ch];
  std::vector<float> res_t(size_t(out_size) * out_size * img.c);
  resample_axis(tmp_t.data(), out_size, img.h, img.c, out_size, res_t.data());
  // res_t is (x, y, c); write transposed + normalised into (y, x, c)
  for (int x = 0; x < out_size; ++x)
    for (int y = 0; y < out_size; ++y)
      for (int ch = 0; ch < out_c; ++ch) {
        int sc = ch < img.c ? ch : img.c - 1;
        float v = res_t[(size_t(x) * out_size + y) * img.c + sc];
        out[(size_t(y) * out_size + x) * out_c + ch] =
            (v / 255.0f - mean) / stddev;
      }
}

}  // namespace

extern "C" {

// Decode n images, resize to out_size², normalise, pack NHWC float32 into
// `out` (n × out_size × out_size × out_c). Greyscale requests (out_c=1)
// average RGB. Returns the number of successfully decoded images; failed
// slots are zero-filled and their indices recorded in `failed` (may be null).
int fastimage_load_batch(const char** paths, int n, int out_size, int out_c,
                         float mean, float stddev, float* out, int n_threads,
                         int* failed) {
  std::atomic<int> next(0), ok_count(0), fail_count(0);
  const size_t stride = size_t(out_size) * out_size * out_c;
  auto worker = [&]() {
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      Image img = decode_file(paths[i]);
      float* dst = out + stride * i;
      if (!img.ok) {
        memset(dst, 0, stride * sizeof(float));
        int slot = fail_count.fetch_add(1);
        if (failed) failed[slot] = i;
        continue;
      }
      if (out_c == 1) {
        // collapse RGB → grey (luma-free mean, matching PIL convert('L')
        // closely enough for GAN training data)
        for (auto& px : img.data) (void)px;  // keep layout; handled below
        std::vector<uint8_t> grey(size_t(img.w) * img.h);
        for (size_t p = 0; p < grey.size(); ++p) {
          int s = img.data[p * 3] + img.data[p * 3 + 1] + img.data[p * 3 + 2];
          grey[p] = uint8_t(s / 3);
        }
        img.data.swap(grey);
        img.c = 1;
      }
      resize_normalise(img, out_size, out_c, mean, stddev, dst);
      ok_count.fetch_add(1);
    }
  };
  int threads = n_threads > 0 ? n_threads : 1;
  if (threads > n) threads = n > 0 ? n : 1;
  std::vector<std::thread> pool;
  pool.reserve(threads);
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return ok_count.load();
}

}  // extern "C"

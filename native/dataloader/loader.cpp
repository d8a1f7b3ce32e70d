// focalnet_tpu native data loader.
//
// TPU-native equivalent of the reference's host-side data path
// (/root/reference/ITS/data/data_load.py + torch DataLoader workers): decodes
// PNG/JPEG pairs, applies the paired random-crop-256 + horizontal-flip
// augmentation, normalizes to [0,1] float32 NHWC, and assembles device-ready
// batches — in C++ with a thread pool, exposed through a plain C ABI for
// ctypes (no pybind11 in this image).
//
// Build: g++ -O3 -shared -fPIC loader.cpp -o libfocalnet_loader.so
//        -lpng -ljpeg -lz -pthread
//
// RNG contract: each example gets a caller-supplied 64-bit seed driving a
// splitmix64 stream; crop position uses Lemire bounded sampling and the flip
// uses one uniform draw — the same decisions (crop i, j then flip p<0.5) as
// the Python pipeline, so either backend yields a valid augmentation stream.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <csetjmp>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

// ---------------------------------------------------------------- RNG

struct SplitMix64 {
  uint64_t state;
  explicit SplitMix64(uint64_t seed) : state(seed) {}
  uint64_t next() {
    uint64_t z = (state += 0x9E3779B97F4A7C15ull);
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
    return z ^ (z >> 31);
  }
  // Lemire bounded: uniform in [0, bound)
  uint64_t bounded(uint64_t bound) {
    if (bound == 0) return 0;
    __uint128_t m = (__uint128_t)next() * bound;
    return (uint64_t)(m >> 64);
  }
  double uniform() { return (next() >> 11) * (1.0 / 9007199254740992.0); }
};

// ---------------------------------------------------------------- decode

struct ImageU8 {
  int h = 0, w = 0;  // always 3-channel RGB
  std::vector<uint8_t> data;
};

bool decode_png(FILE* fp, ImageU8* out) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  // constructed BEFORE setjmp: a libpng longjmp must not skip a live
  // nontrivial object's initialization (UB) — the error branch then returns
  // normally and the destructor runs
  std::vector<png_bytep> rows;
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, fp);
  png_read_info(png, info);

  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int color = png_get_color_type(png, info);
  int depth = png_get_bit_depth(png, info);

  // normalize every variant to 8-bit RGB
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color & PNG_COLOR_MASK_ALPHA || png_get_valid(png, info, PNG_INFO_tRNS))
    png_set_strip_alpha(png);
  png_read_update_info(png, info);

  out->h = (int)h;
  out->w = (int)w;
  out->data.resize((size_t)h * w * 3);
  rows.resize(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = out->data.data() + (size_t)y * w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jmp;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jmp, 1);
}

bool decode_jpeg(FILE* fp, ImageU8* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jmp)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->h = (int)cinfo.output_height;
  out->w = (int)cinfo.output_width;
  out->data.resize((size_t)out->h * out->w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row =
        out->data.data() + (size_t)cinfo.output_scanline * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool decode_file(const char* path, ImageU8* out) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  uint8_t magic[4] = {0};
  size_t got = fread(magic, 1, 4, fp);
  rewind(fp);
  bool ok = false;
  if (got == 4 && magic[0] == 0x89 && magic[1] == 'P')
    ok = decode_png(fp, out);
  else if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8)
    ok = decode_jpeg(fp, out);
  fclose(fp);
  return ok;
}

// ---------------------------------------------------------------- augment

// true division (not reciprocal-multiply): bit-identical to numpy's
// uint8/255.0 conversion on the PIL path — parity tests compare exactly
constexpr float kU8Max = 255.0f;

// paired random crop + hflip + to-float, writing (crop, crop, 3) into out
void crop_flip_normalize(const ImageU8& img, int i0, int j0, int crop,
                         bool flip, float* out) {
  for (int y = 0; y < crop; ++y) {
    const uint8_t* src = img.data.data() + ((size_t)(i0 + y) * img.w + j0) * 3;
    float* dst = out + (size_t)y * crop * 3;
    if (!flip) {
      for (int x = 0; x < crop * 3; ++x) dst[x] = src[x] / kU8Max;
    } else {
      for (int x = 0; x < crop; ++x) {
        const uint8_t* s = src + (size_t)(crop - 1 - x) * 3;
        dst[(size_t)x * 3 + 0] = s[0] / kU8Max;
        dst[(size_t)x * 3 + 1] = s[1] / kU8Max;
        dst[(size_t)x * 3 + 2] = s[2] / kU8Max;
      }
    }
  }
}

int load_one_pair(const char* hazy_path, const char* gt_path, int crop,
                  uint64_t seed, float* out_hazy, float* out_gt) {
  ImageU8 hazy, gt;
  if (!decode_file(hazy_path, &hazy)) return -1;
  if (!decode_file(gt_path, &gt)) return -2;
  if (hazy.h != gt.h || hazy.w != gt.w) return -3;
  if (hazy.h < crop || hazy.w < crop) return -4;
  SplitMix64 rng(seed);
  int i0 = (int)rng.bounded((uint64_t)(hazy.h - crop + 1));
  int j0 = (int)rng.bounded((uint64_t)(hazy.w - crop + 1));
  bool flip = rng.uniform() < 0.5;
  crop_flip_normalize(hazy, i0, j0, crop, flip, out_hazy);
  crop_flip_normalize(gt, i0, j0, crop, flip, out_gt);
  return 0;
}

}  // namespace

extern "C" {

// Decode one image to float32 RGB [0,1].  Caller passes a buffer of
// max_h*max_w*3 floats; actual (h, w) returned through out params.
// Returns 0 on success.
int fnl_decode_image(const char* path, float* out, int max_h, int max_w,
                     int* out_h, int* out_w) {
  ImageU8 img;
  if (!decode_file(path, &img)) return -1;
  if (img.h > max_h || img.w > max_w) return -2;
  const size_t n = (size_t)img.h * img.w * 3;
  for (size_t i = 0; i < n; ++i) out[i] = img.data[i] / kU8Max;
  *out_h = img.h;
  *out_w = img.w;
  return 0;
}

// Decode one image to uint8 RGB — the serving upload path: pixels go to the
// device as uint8 (4x less host->device traffic than float32) and the
// jitted forward normalizes on-device with fp32 x/255 (XLA compiles this as
// a reciprocal multiply, so it lands within 1 ulp of the float path's true
// division — invisible after output quantization; evaluation/infer.py).
int fnl_decode_image_u8(const char* path, uint8_t* out, int max_h, int max_w,
                        int* out_h, int* out_w) {
  ImageU8 img;
  if (!decode_file(path, &img)) return -1;
  if (img.h > max_h || img.w > max_w) return -2;
  std::memcpy(out, img.data.data(), img.data.size());
  *out_h = img.h;
  *out_w = img.w;
  return 0;
}

// Encode uint8 RGB (h, w, 3) to a PNG file.  level: zlib compression 0-9
// (1 = fast, the serving default — PNG is lossless at every level, so the
// decoded pixels are identical; only file size/speed differ).
// Returns 0 on success.
int fnl_encode_png(const char* path, const uint8_t* rgb, int h, int w,
                   int level) {
  FILE* fp = fopen(path, "wb");
  if (!fp) return -1;
  png_structp png =
      png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    fclose(fp);
    return -2;
  }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_write_struct(&png, nullptr);
    fclose(fp);
    return -2;
  }
  // constructed + filled BEFORE setjmp (h/w are parameters): a libpng
  // longjmp over a nontrivial object's initialization is UB and would leak
  // the row array on every failed encode
  std::vector<png_bytep> rows((size_t)h);
  for (int y = 0; y < h; ++y)
    rows[y] = (png_bytep)(rgb + (size_t)y * w * 3);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_write_struct(&png, &info);
    fclose(fp);
    return -3;
  }
  png_init_io(png, fp);
  png_set_compression_level(png, level);
  png_set_filter(png, 0, PNG_FILTER_SUB);  // cheap filter, good for photos
  png_set_IHDR(png, info, (png_uint_32)w, (png_uint_32)h, 8,
               PNG_COLOR_TYPE_RGB, PNG_INTERLACE_NONE,
               PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
  png_write_info(png, info);
  png_write_image(png, rows.data());
  png_write_end(png, info);
  png_destroy_write_struct(&png, &info);
  fclose(fp);
  return 0;
}

// Load a batch of augmented pairs in parallel.
// hazy_paths/gt_paths: arrays of n C strings; seeds: n 64-bit seeds;
// out_hazy/out_gt: (n, crop, crop, 3) float32 buffers.
// Returns 0 on success, or the first nonzero per-example error code.
int fnl_load_pair_batch(const char** hazy_paths, const char** gt_paths, int n,
                        int crop, const uint64_t* seeds, float* out_hazy,
                        float* out_gt, int num_threads) {
  if (num_threads < 1) num_threads = 1;
  std::vector<int> errs(n, 0);
  const size_t stride = (size_t)crop * crop * 3;
  std::vector<std::thread> threads;
  std::vector<int> next(1, 0);
  auto worker = [&](int tid) {
    for (int i = tid; i < n; i += num_threads) {
      errs[i] = load_one_pair(hazy_paths[i], gt_paths[i], crop, seeds[i],
                              out_hazy + (size_t)i * stride,
                              out_gt + (size_t)i * stride);
    }
  };
  if (num_threads == 1) {
    worker(0);
  } else {
    threads.reserve(num_threads);
    for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker, t);
    for (auto& th : threads) th.join();
  }
  for (int i = 0; i < n; ++i)
    if (errs[i] != 0) return errs[i];
  return 0;
}

}  // extern "C"

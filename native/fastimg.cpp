// fastimg — native image encoder for fractal_tpu.
//
// The reference's encoder is a native component (ravif → rav1e,
// reference src/lib.rs:12-20, 326-333); this is our native half for PNG:
// a thin libpng writer tuned for huge fractal renders ("easily handles
// 100MP images", reference src/lib.rs:36-41):
//   * caller-chosen zlib level; at levels <= 3 the PNG row filter is
//     forced to NONE — fractal output rows are noisy, filtering buys
//     little compression but costs a full extra pass over the data;
//   * rows are streamed straight out of the caller's buffer — no copy.
//
// AVIF (reference src/lib.rs:326-333: ravif speed 8 / quality 100 / YCbCr /
// all-core threads) is encoded natively through the system libheif → libaom
// AV1 encoder.  This image ships no libheif headers, but the libheif C API
// is opaque-pointer based (the only by-value type is the small, stable
// `heif_error` triple), so the prototypes below are declared directly and
// the library is dlopen()ed at runtime — the .so loads and PNG keeps
// working even on hosts without libheif, and there is no fragile
// struct-layout vendoring (the libavif C API, by contrast, is
// public-struct-heavy and NOT safely declarable without headers).
//
// Exposed C ABI (consumed by fractal_tpu/io/native.py over ctypes):
//   int fastimg_write_png(const char* path, const uint8_t* rgb,
//                         int width, int height, int compression);
//   int fastimg_avif_available(void);
//   int fastimg_write_avif(const char* path, const uint8_t* rgb,
//                          int width, int height, int quality, int speed);
// Return 0 on success, negative error codes otherwise.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <dlfcn.h>
#include <png.h>

extern "C" int fastimg_write_png(const char *path, const uint8_t *rgb,
                                 int width, int height, int compression) {
  if (!path || !rgb || width <= 0 || height <= 0) return -1;
  if (compression < 0) compression = 0;
  if (compression > 9) compression = 9;

  FILE *fp = std::fopen(path, "wb");
  if (!fp) return -2;

  png_structp png =
      png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    std::fclose(fp);
    return -3;
  }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_write_struct(&png, nullptr);
    std::fclose(fp);
    return -3;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_write_struct(&png, &info);
    std::fclose(fp);
    return -4;
  }

  png_init_io(png, fp);
  png_set_compression_level(png, compression);
  if (compression <= 3) {
    png_set_filter(png, PNG_FILTER_TYPE_BASE, PNG_FILTER_NONE);
  }
  png_set_IHDR(png, info, static_cast<png_uint_32>(width),
               static_cast<png_uint_32>(height), 8, PNG_COLOR_TYPE_RGB,
               PNG_INTERLACE_NONE, PNG_COMPRESSION_TYPE_DEFAULT,
               PNG_FILTER_TYPE_DEFAULT);
  png_write_info(png, info);

  const size_t stride = static_cast<size_t>(width) * 3;
  for (int y = 0; y < height; ++y) {
    png_write_row(png, const_cast<png_bytep>(rgb + y * stride));
  }
  png_write_end(png, info);
  png_destroy_write_struct(&png, &info);
  std::fclose(fp);
  return 0;
}

// ---------------------------------------------------------------------------
// AVIF via dlopen()ed libheif (opaque-pointer C API, self-declared).

namespace {

// The one by-value type in the libheif C API: { enum, enum, const char* }.
// Layout has been stable since libheif 1.0 (two ints + pointer).
struct heif_error_t {
  int code;  // 0 == heif_error_Ok
  int subcode;
  const char *message;
};

// Opaque handles.
typedef void heif_context;
typedef void heif_encoder;
typedef void heif_image;
typedef void heif_image_handle;

// Enum values from heif.h (stable public ABI constants).
constexpr int kHeifCompressionAV1 = 4;
constexpr int kHeifColorspaceRGB = 1;
constexpr int kHeifChromaInterleavedRGB = 10;
constexpr int kHeifChannelInterleaved = 10;

struct HeifApi {
  heif_context *(*context_alloc)(void);
  void (*context_free)(heif_context *);
  heif_error_t (*get_encoder_for_format)(heif_context *, int, heif_encoder **);
  void (*encoder_release)(heif_encoder *);
  heif_error_t (*set_lossy_quality)(heif_encoder *, int);
  heif_error_t (*set_parameter_integer)(heif_encoder *, const char *, int);
  heif_error_t (*set_parameter_string)(heif_encoder *, const char *,
                                       const char *);
  heif_error_t (*image_create)(int, int, int, int, heif_image **);
  void (*image_release)(heif_image *);
  heif_error_t (*image_add_plane)(heif_image *, int, int, int, int);
  uint8_t *(*image_get_plane)(heif_image *, int, int *);
  heif_error_t (*encode_image)(heif_context *, const heif_image *,
                               heif_encoder *, const void *,
                               heif_image_handle **);
  void (*image_handle_release)(heif_image_handle *);
  heif_error_t (*write_to_file)(heif_context *, const char *);
  bool ok = false;
};

const HeifApi &heif_api() {
  static HeifApi api = [] {
    HeifApi a{};
    void *h = dlopen("libheif.so.1", RTLD_NOW | RTLD_LOCAL);
    if (!h) h = dlopen("libheif.so", RTLD_NOW | RTLD_LOCAL);
    if (!h) return a;
    auto sym = [&](const char *name) { return dlsym(h, name); };
    // ABI gate: the self-declared prototypes/enums above are the libheif 1.x
    // public C ABI.  Probe the runtime version and refuse any other major —
    // a mismatched future ABI must fail cleanly at LOAD (falling back to the
    // Python encoder path), not misbehave at encode time.
    auto get_version =
        reinterpret_cast<uint32_t (*)(void)>(sym("heif_get_version_number"));
    if (!get_version || (get_version() >> 24) != 1) return a;
#define LOAD(field, name)                                                      \
  a.field = reinterpret_cast<decltype(a.field)>(sym(name));                    \
  if (!a.field) return a;
    LOAD(context_alloc, "heif_context_alloc")
    LOAD(context_free, "heif_context_free")
    LOAD(get_encoder_for_format, "heif_context_get_encoder_for_format")
    LOAD(encoder_release, "heif_encoder_release")
    LOAD(set_lossy_quality, "heif_encoder_set_lossy_quality")
    LOAD(set_parameter_integer, "heif_encoder_set_parameter_integer")
    LOAD(set_parameter_string, "heif_encoder_set_parameter_string")
    LOAD(image_create, "heif_image_create")
    LOAD(image_release, "heif_image_release")
    LOAD(image_add_plane, "heif_image_add_plane")
    LOAD(image_get_plane, "heif_image_get_plane")
    LOAD(encode_image, "heif_context_encode_image")
    LOAD(image_handle_release, "heif_image_handle_release")
    LOAD(write_to_file, "heif_context_write_to_file")
#undef LOAD
    a.ok = true;
    return a;
  }();
  return api;
}

}  // namespace

extern "C" int fastimg_avif_available() { return heif_api().ok ? 1 : 0; }

// Encode interleaved RGB to AVIF.  quality: 0-100 (reference uses 100);
// speed: aom cpu-used 0-9 (reference uses 8).  libheif converts RGB→YCbCr
// for the AV1 encoder (the reference's ravif ColorSpace::YCbCr,
// src/lib.rs:330); chroma 4:4:4 is requested to match ravif's
// no-subsampling encode, best-effort (older aom plugins ignore it).
extern "C" int fastimg_write_avif(const char *path, const uint8_t *rgb,
                                  int width, int height, int quality,
                                  int speed) {
  const HeifApi &api = heif_api();
  if (!api.ok) return -10;
  if (!path || !rgb || width <= 0 || height <= 0) return -1;
  if (quality < 0) quality = 0;
  if (quality > 100) quality = 100;

  heif_context *ctx = api.context_alloc();
  if (!ctx) return -11;

  heif_encoder *enc = nullptr;
  heif_image *img = nullptr;
  heif_image_handle *handle = nullptr;
  int rc = 0;

  heif_error_t err = api.get_encoder_for_format(ctx, kHeifCompressionAV1, &enc);
  if (err.code != 0 || !enc) {
    api.context_free(ctx);
    return -12;  // no AV1 encoder plugin (libaom) present
  }
  err = api.set_lossy_quality(enc, quality);
  if (err.code != 0) rc = -13;
  // Best-effort tuning knobs: missing parameters are not fatal.
  api.set_parameter_integer(enc, "speed", speed);
  api.set_parameter_string(enc, "chroma", "444");

  if (rc == 0) {
    err = api.image_create(width, height, kHeifColorspaceRGB,
                           kHeifChromaInterleavedRGB, &img);
    if (err.code != 0 || !img) rc = -14;
  }
  if (rc == 0) {
    err = api.image_add_plane(img, kHeifChannelInterleaved, width, height, 8);
    if (err.code != 0) rc = -15;
  }
  if (rc == 0) {
    int stride = 0;
    uint8_t *plane = api.image_get_plane(img, kHeifChannelInterleaved, &stride);
    if (!plane || stride < width * 3) {
      rc = -16;
    } else {
      const size_t row = static_cast<size_t>(width) * 3;
      for (int y = 0; y < height; ++y) {
        std::memcpy(plane + static_cast<size_t>(y) * stride, rgb + y * row,
                    row);
      }
    }
  }
  if (rc == 0) {
    err = api.encode_image(ctx, img, enc, nullptr, &handle);
    if (err.code != 0) rc = -17;
  }
  if (rc == 0) {
    err = api.write_to_file(ctx, path);
    if (err.code != 0) rc = -18;
  }

  if (handle) api.image_handle_release(handle);
  if (img) api.image_release(img);
  if (enc) api.encoder_release(enc);
  api.context_free(ctx);
  return rc;
}

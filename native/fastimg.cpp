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
// AVIF parity is covered by Pillow's native _avif C extension over
// libavif+libaom (settings mapped in fractal_tpu/io/image_out.py); this
// image ships libavif/libaom runtime .so's but no headers, so a bespoke
// shim would need fragile ABI-struct vendoring for zero functional gain.
//
// Exposed C ABI (consumed by fractal_tpu/io/native.py over ctypes):
//   int fastimg_write_png(const char* path, const uint8_t* rgb,
//                         int width, int height, int compression);
// Returns 0 on success, negative error codes otherwise.

#include <cstdint>
#include <cstdio>
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

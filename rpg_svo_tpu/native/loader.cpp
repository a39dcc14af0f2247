// Native dataset loader for rpg_svo_tpu.
//
// C++ equivalent of the reference's host-side data path (OpenCV imread in
// benchmark_node.cpp / vo_node.cpp plus vikit's FileReader): fast PNG/PGM
// grayscale decoding with a C ABI consumed from Python via ctypes.  ctypes
// releases the GIL during calls, so Python-level prefetch threads decode
// in parallel while the device computes.
//
// Build: make -C rpg_svo_tpu/native   (g++ -O2 -shared -fPIC -lpng)

#include <png.h>

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

extern "C" {

// Decode an image file to grayscale float32 in [0, 255], row-major.
// Returns 0 on success; fills *w/*h. `out` must hold max_pixels floats.
// Supported: PNG (any color type via libpng simplified API), binary PGM (P5).
int svo_load_gray(const char* path, float* out, int* w, int* h,
                  long max_pixels) {
  // --- PGM fast path ---
  const char* dot = strrchr(path, '.');
  if (dot && (strcmp(dot, ".pgm") == 0 || strcmp(dot, ".PGM") == 0)) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    char magic[3] = {0};
    int ww = 0, hh = 0, maxv = 0;
    if (fscanf(f, "%2s %d %d %d", magic, &ww, &hh, &maxv) != 4 ||
        strcmp(magic, "P5") != 0 || maxv > 255) {
      fclose(f);
      return -2;
    }
    fgetc(f);  // single whitespace after header
    long n = (long)ww * hh;
    if (n > max_pixels) {
      fclose(f);
      return -3;
    }
    unsigned char* buf = (unsigned char*)malloc(n);
    if (fread(buf, 1, n, f) != (size_t)n) {
      free(buf);
      fclose(f);
      return -4;
    }
    fclose(f);
    for (long i = 0; i < n; ++i) out[i] = (float)buf[i];
    free(buf);
    *w = ww;
    *h = hh;
    return 0;
  }

  // --- PNG via libpng simplified API ---
  png_image image;
  memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&image, path)) return -5;
  image.format = PNG_FORMAT_GRAY;
  long n = (long)image.width * image.height;
  if (n > max_pixels) {
    png_image_free(&image);
    return -3;
  }
  unsigned char* buf = (unsigned char*)malloc(n);
  if (!png_image_finish_read(&image, nullptr, buf, 0, nullptr)) {
    free(buf);
    png_image_free(&image);
    return -6;
  }
  for (long i = 0; i < n; ++i) out[i] = (float)buf[i];
  free(buf);
  *w = (int)image.width;
  *h = (int)image.height;
  return 0;
}

// Decode straight into a caller-provided uint8 buffer (zero-copy variant
// for callers that quantize on device).
int svo_load_gray_u8(const char* path, unsigned char* out, int* w, int* h,
                     long max_pixels) {
  png_image image;
  memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&image, path)) return -5;
  image.format = PNG_FORMAT_GRAY;
  long n = (long)image.width * image.height;
  if (n > max_pixels) {
    png_image_free(&image);
    return -3;
  }
  if (!png_image_finish_read(&image, nullptr, out, 0, nullptr)) {
    png_image_free(&image);
    return -6;
  }
  *w = (int)image.width;
  *h = (int)image.height;
  return 0;
}

}  // extern "C"

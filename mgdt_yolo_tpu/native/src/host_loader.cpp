// Native host-side image ingest for the TPU training pipeline.
//
// Role: the reference feeds its GPUs through torch's native DataLoader
// (C++ worker processes) + cv2 (C++ decode/resize).  Our JAX pipeline is
// fed by this library instead: a std::thread pool decodes JPEG/PNG with
// the system libjpeg/libpng, does the reference's load_image long-side
// resize (yolo/data/base.py:146-160, bilinear as for augment=True), and
// pastes each image top-left into a 114-filled imgsz x imgsz x 3 uint8 RGB
// canvas -- exactly the `collate_raw` device-augment ingest layout
// (mgdt_yolo_tpu/data/build.py), so the Python producer does zero pixel
// work.  All geometric/color augmentation then runs in-graph on the TPU.
//
// Contract notes:
//  - Output is RGB (collate_raw's BGR->RGB flip is folded in here).
//  - JPEGs carrying an EXIF orientation != 1 return MGDT_ERR_EXIF so the
//    caller can fall back to the cv2 path (cv2.imread applies rotation).
//  - Per-image status codes; one bad file never kills the batch.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 host_loader.cpp -ljpeg -lpng
//        (see mgdt_yolo_tpu/native/__init__.py, which compiles on demand).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

extern "C" {

enum {
  MGDT_OK = 0,
  MGDT_ERR_OPEN = -1,
  MGDT_ERR_EXIF = -2,     // EXIF orientation != 1: caller must fall back
  MGDT_ERR_DECODE = -3,
  MGDT_ERR_FORMAT = -4,   // not a JPEG/PNG (caller falls back)
  MGDT_ERR_COLORSPACE = -5,
};

int mgdt_version(void) { return 3; }

}  // extern "C"

// ---------------------------------------------------------------------------
// EXIF orientation (JPEG APP1).  We only need to *detect* a non-default
// orientation; rotation itself is delegated to the Python fallback.
// ---------------------------------------------------------------------------

static int exif_orientation(const uint8_t* data, unsigned len) {
  // data: APP1 payload (after the 2-byte length), starts with "Exif\0\0".
  if (len < 14 || memcmp(data, "Exif\0\0", 6) != 0) return 1;
  const uint8_t* tiff = data + 6;
  unsigned tlen = len - 6;
  bool be;
  if (tiff[0] == 'I' && tiff[1] == 'I') be = false;
  else if (tiff[0] == 'M' && tiff[1] == 'M') be = true;
  else return 1;
  auto rd16 = [&](unsigned off) -> unsigned {
    if (off + 2 > tlen) return 0;
    return be ? (tiff[off] << 8) | tiff[off + 1]
              : (tiff[off + 1] << 8) | tiff[off];
  };
  auto rd32 = [&](unsigned off) -> unsigned {
    if (off + 4 > tlen) return 0;
    return be ? (tiff[off] << 24) | (tiff[off + 1] << 16) | (tiff[off + 2] << 8) | tiff[off + 3]
              : (tiff[off + 3] << 24) | (tiff[off + 2] << 16) | (tiff[off + 1] << 8) | tiff[off];
  };
  if (rd16(2) != 42) return 1;
  unsigned ifd = rd32(4);
  if (ifd == 0 || ifd + 2 > tlen) return 1;
  unsigned n = rd16(ifd);
  for (unsigned i = 0; i < n; i++) {
    unsigned e = ifd + 2 + i * 12;
    if (e + 12 > tlen) break;
    if (rd16(e) == 0x0112) {  // Orientation tag, SHORT
      unsigned v = rd16(e + 8);
      return (v >= 1 && v <= 8) ? (int)v : 1;
    }
  }
  return 1;
}

// ---------------------------------------------------------------------------
// JPEG decode (libjpeg) -> RGB rows
// ---------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

static void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

static int decode_jpeg(FILE* f, std::vector<uint8_t>& rgb, int& w, int& h) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return MGDT_ERR_DECODE;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_save_markers(&cinfo, JPEG_APP0 + 1, 0xFFFF);  // keep APP1 for EXIF
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return MGDT_ERR_DECODE;
  }
  for (jpeg_saved_marker_ptr m = cinfo.marker_list; m; m = m->next) {
    if (m->marker == JPEG_APP0 + 1 &&
        exif_orientation(m->data, m->data_length) != 1) {
      jpeg_destroy_decompress(&cinfo);
      return MGDT_ERR_EXIF;
    }
  }
  if (cinfo.jpeg_color_space == JCS_CMYK || cinfo.jpeg_color_space == JCS_YCCK) {
    jpeg_destroy_decompress(&cinfo);
    return MGDT_ERR_COLORSPACE;  // rare; cv2 fallback handles it
  }
  cinfo.out_color_space = JCS_RGB;  // grayscale/YCbCr -> RGB in-library
  jpeg_start_decompress(&cinfo);
  w = (int)cinfo.output_width;
  h = (int)cinfo.output_height;
  if (cinfo.output_components != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return MGDT_ERR_COLORSPACE;
  }
  rgb.resize((size_t)w * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = rgb.data() + (size_t)cinfo.output_scanline * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return MGDT_OK;
}

// ---------------------------------------------------------------------------
// PNG decode (libpng) -> RGB rows (palette expanded, 16->8, alpha stripped,
// gray->RGB: the IMREAD_COLOR-equivalent set of transforms)
// ---------------------------------------------------------------------------

static int decode_png(FILE* f, std::vector<uint8_t>& rgb, int& w, int& h) {
  uint8_t sig[8];
  if (fread(sig, 1, 8, f) != 8 || png_sig_cmp(sig, 0, 8)) return MGDT_ERR_FORMAT;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return MGDT_ERR_DECODE;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return MGDT_ERR_DECODE;
  }
  // row-pointer array is malloc'd (volatile pointer declared before setjmp)
  // instead of a std::vector: libpng errors longjmp back here, which would
  // skip a vector's destructor — UB per [csetjmp] and a per-failure leak
  png_bytep* volatile rows = nullptr;
  if (setjmp(png_jmpbuf(png))) {
    free((void*)rows);
    png_destroy_read_struct(&png, &info, nullptr);
    return MGDT_ERR_DECODE;
  }
  png_init_io(png, f);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);
  png_set_expand(png);         // palette->rgb, low-bit gray->8, tRNS->alpha
  png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  w = (int)png_get_image_width(png, info);
  h = (int)png_get_image_height(png, info);
  if (png_get_rowbytes(png, info) != (size_t)w * 3) {
    png_destroy_read_struct(&png, &info, nullptr);
    return MGDT_ERR_DECODE;
  }
  rgb.resize((size_t)w * h * 3);
  rows = (png_bytep*)malloc(sizeof(png_bytep) * (size_t)h);
  if (!rows) {
    png_destroy_read_struct(&png, &info, nullptr);
    return MGDT_ERR_DECODE;
  }
  for (int y = 0; y < h; y++) rows[y] = rgb.data() + (size_t)y * w * 3;
  png_read_image(png, rows);
  free((void*)rows);
  png_destroy_read_struct(&png, &info, nullptr);
  return MGDT_OK;
}

// ---------------------------------------------------------------------------
// Bilinear resize (half-pixel centers, matching cv2.INTER_LINEAR geometry)
// from (sh, sw) RGB rows into the top-left (dh, dw) region of the canvas.
// Canvas rows have stride canvas_w*3.
// ---------------------------------------------------------------------------

static void resize_into(const uint8_t* src, int sh, int sw,
                        uint8_t* dst, int dh, int dw, int canvas_w) {
  const float sx = (float)sw / dw, sy = (float)sh / dh;
  std::vector<int> x0v(dw), x1v(dw);
  std::vector<float> fxv(dw);
  for (int x = 0; x < dw; x++) {
    float fx = (x + 0.5f) * sx - 0.5f;
    int x0 = (int)std::floor(fx);
    fxv[x] = fx - x0;
    x0v[x] = std::clamp(x0, 0, sw - 1);
    x1v[x] = std::clamp(x0 + 1, 0, sw - 1);
  }
  for (int y = 0; y < dh; y++) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = (int)std::floor(fy);
    float wy = fy - y0;
    const uint8_t* r0 = src + (size_t)std::clamp(y0, 0, sh - 1) * sw * 3;
    const uint8_t* r1 = src + (size_t)std::clamp(y0 + 1, 0, sh - 1) * sw * 3;
    uint8_t* out = dst + (size_t)y * canvas_w * 3;
    for (int x = 0; x < dw; x++) {
      const int a = x0v[x] * 3, b = x1v[x] * 3;
      const float wx = fxv[x];
      const float w00 = (1 - wy) * (1 - wx), w01 = (1 - wy) * wx;
      const float w10 = wy * (1 - wx), w11 = wy * wx;
      for (int c = 0; c < 3; c++) {
        float v = w00 * r0[a + c] + w01 * r0[b + c] +
                  w10 * r1[a + c] + w11 * r1[b + c];
        out[x * 3 + c] = (uint8_t)std::clamp((int)std::lround(v), 0, 255);
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Public API
// ---------------------------------------------------------------------------

extern "C" {

// Decode `path`, long-side resize to imgsz (r = imgsz/max(h,w);
// w' = min(ceil(w*r), imgsz) etc. -- reference load_image rounding as
// implemented in data/augment.py resize_long_side), paste top-left into
// `out` (imgsz*imgsz*3 RGB uint8, pre-filled by the caller or by
// mgdt_load_batch).  out_hw receives the pasted (h', w') as floats.
int mgdt_load_one(const char* path, int imgsz, unsigned char* out,
                  float* out_hw) {
  FILE* f = fopen(path, "rb");
  if (!f) return MGDT_ERR_OPEN;
  uint8_t magic[2] = {0, 0};
  if (fread(magic, 1, 2, f) != 2) {
    fclose(f);
    return MGDT_ERR_DECODE;
  }
  rewind(f);
  std::vector<uint8_t> rgb;
  int w = 0, h = 0, rc;
  if (magic[0] == 0xFF && magic[1] == 0xD8) {
    rc = decode_jpeg(f, rgb, w, h);
  } else if (magic[0] == 0x89 && magic[1] == 'P') {
    rc = decode_png(f, rgb, w, h);
  } else {
    rc = MGDT_ERR_FORMAT;  // bmp/tiff/webp: cv2 fallback
  }
  fclose(f);
  if (rc != MGDT_OK) return rc;
  if (w <= 0 || h <= 0) return MGDT_ERR_DECODE;

  const float r = (float)imgsz / (float)std::max(h, w);
  const int dw = std::min((int)std::ceil(w * r), imgsz);
  const int dh = std::min((int)std::ceil(h * r), imgsz);
  if (dw == w && dh == h) {
    for (int y = 0; y < h; y++)
      memcpy(out + (size_t)y * imgsz * 3, rgb.data() + (size_t)y * w * 3,
             (size_t)w * 3);
  } else {
    resize_into(rgb.data(), h, w, out, dh, dw, imgsz);
  }
  out_hw[0] = (float)dh;
  out_hw[1] = (float)dw;
  return MGDT_OK;
}

// Threaded batch ingest.  out: n*imgsz*imgsz*3 uint8 (filled with `fill`
// first), out_hw: n*2 float32, status: n ints (MGDT_OK or an error code
// per image; callers redo failed indices through the cv2 path).
void mgdt_load_batch(const char** paths, int n, int imgsz, unsigned char fill,
                     unsigned char* out, float* out_hw, int* status,
                     int nthreads) {
  const size_t plane = (size_t)imgsz * imgsz * 3;
  memset(out, fill, (size_t)n * plane);
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      out_hw[i * 2] = out_hw[i * 2 + 1] = 0.f;
      status[i] = mgdt_load_one(paths[i], imgsz, out + (size_t)i * plane,
                                out_hw + (size_t)i * 2);
    }
  };
  int t = std::max(1, std::min(nthreads, n));
  if (t == 1) {
    worker();
    return;
  }
  std::vector<std::thread> pool;
  pool.reserve(t);
  for (int k = 0; k < t; k++) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

}  // extern "C"

// imagepipe: native image decode + resize for the feature-extraction input
// pipeline.
//
// The reference's image path is Torch7's C `image` library driven serially
// from Lua (002_train_vqa_arch1/001_prepro_img_vgg.lua:47-71 loadim; the GPU
// idles while the host decodes - SURVEY.md section 3.3). This library is the
// TPU-native equivalent: JPEG (libjpeg) / PNG (libpng) decode, optional
// center-crop-to-square, bilinear resize to NxN, uint8 RGB output, with a
// pthread worker pool for batch decode. Python binds via ctypes
// (novel_vqa_tpu/data/native_images.py); device-side normalization stays in
// JAX (data/images.py).
//
// C ABI:
//   imagepipe_decode_resize(path, size, center_crop, out[size*size*3])
//       -> 0 ok, 1 missing file, 2 decode error
//   imagepipe_decode_batch(paths, n, size, center_crop, n_threads, out, status)
//       -> number of successfully decoded images

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <csetjmp>
#include <pthread.h>

#include <jpeglib.h>
#include <png.h>

namespace {

struct Image {
  int w = 0, h = 0, channels = 0;
  uint8_t* data = nullptr;  // HWC, RGB or gray
};

// ---------------------------------------------------------------------------
// JPEG decode
// ---------------------------------------------------------------------------

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  JpegErrorMgr* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

bool decode_jpeg(FILE* f, Image* out, int scale_target) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  if (scale_target > 0) {
    // DCT-domain downscale: decode at 1/d (d in {1,2,4,8}) while keeping the
    // decoded short side >= the final size, so the subsequent bilinear never
    // upsamples.  IDCT cost drops ~d^2 (COCO 640x480 -> 224 decodes at 1/2);
    // pixels deviate from a full-res decode at the few-intensity-level scale
    // - this mode is opt-in, the default path decodes full-res.
    unsigned int short_side =
        cinfo.image_width < cinfo.image_height ? cinfo.image_width
                                               : cinfo.image_height;
    unsigned int d = 1;
    while (d < 8 && short_side / (d * 2) >= (unsigned int)scale_target)
      d *= 2;
    cinfo.scale_num = 1;
    cinfo.scale_denom = d;
    if (d > 1) {
      // Once the DCT downscale is engaged the output is approximate anyway;
      // the fast IDCT and plain (non-fancy) chroma upsampling stay within
      // the same few-intensity-level contract (measured max |delta| 4, mean
      // 0.7 vs the exact fast path on the bench corpus) for ~6% more decode
      // throughput.  At d == 1 (image already near the target) fast mode
      // remains bit-exact vs the default path — tests pin that.
      cinfo.dct_method = JDCT_IFAST;
      cinfo.do_fancy_upsampling = FALSE;
    }
  }
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->channels = 3;
  out->data = static_cast<uint8_t*>(malloc(size_t(out->w) * out->h * 3));
  if (!out->data) {  // hostile dims can make this allocation huge
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ---------------------------------------------------------------------------
// PNG decode
// ---------------------------------------------------------------------------

bool decode_png(FILE* f, Image* out) {
  png_byte header[8];
  if (fread(header, 1, 8, f) != 8 || png_sig_cmp(header, 0, 8)) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  // volatile: read after a potential longjmp from libpng's error handler
  png_bytep* volatile rows = nullptr;
  if (setjmp(png_jmpbuf(png))) {
    free(rows);
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, f);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  // normalize to 8-bit RGB
  png_byte color_type = png_get_color_type(png, info);
  png_byte bit_depth = png_get_bit_depth(png, info);
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color_type == PNG_COLOR_TYPE_GRAY || color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  // drop alpha (the reference drops RGBA's alpha channel, loadim :62-64)
  if (color_type & PNG_COLOR_MASK_ALPHA || png_get_valid(png, info, PNG_INFO_tRNS))
    png_set_strip_alpha(png);
  png_read_update_info(png, info);

  out->w = png_get_image_width(png, info);
  out->h = png_get_image_height(png, info);
  out->channels = 3;
  out->data = static_cast<uint8_t*>(malloc(size_t(out->w) * out->h * 3));
  rows = static_cast<png_bytep*>(malloc(sizeof(png_bytep) * out->h));
  if (!out->data || !rows) {  // hostile dims can make these huge
    free(rows);
    png_destroy_read_struct(&png, &info, nullptr);
    return false;  // out->data (if any) freed by the caller on failure
  }
  for (int y = 0; y < out->h; y++)
    rows[y] = out->data + size_t(y) * out->w * 3;
  png_read_image(png, rows);
  free(rows);
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

// ---------------------------------------------------------------------------
// bilinear resize (matches PIL/torch `image.scale` bilinear semantics closely
// enough for feature parity; exactness at the pixel level is not required -
// decode libraries already differ at the rounding level)
// ---------------------------------------------------------------------------

bool bilinear_resize(const uint8_t* src, int sw, int sh, int x0, int y0,
                     int cw, int ch, uint8_t* dst, int dw, int dh) {
  const float sx = float(cw) / dw;
  const float sy = float(ch) / dh;
  // Precompute the horizontal taps once (they are identical for every row).
  // The float expressions below are EXACTLY the ones evaluated per-pixel
  // before this was table-ized, so outputs stay bit-identical — tests pin
  // the decode semantics, and committed feature stores must not drift.
  int* ix_tab = static_cast<int*>(malloc(sizeof(int) * dw));
  float* wx_tab = static_cast<float*>(malloc(sizeof(float) * dw));
  if (!ix_tab || !wx_tab) {  // essentially unreachable (a few KB), but
    free(ix_tab);            // surface it as a decode failure rather than
    free(wx_tab);            // leaving the caller's np.empty buffer as-is
    return false;
  }
  for (int x = 0; x < dw; x++) {
    float fx = (x + 0.5f) * sx - 0.5f;
    // clamp to the crop so border weights stay in [0,1] (extrapolating
    // weights > 1 can leave v outside [0,255] — UB on the uint8 cast).
    // NOTE: for sources SMALLER than the target (upscales), this upper
    // clamp is a deliberate behavior change vs pre-round-4 binaries,
    // which extrapolated the right/bottom border pixels with weight > 1:
    // a feature store cached from an old .so will differ at those border
    // pixels for sub-target images — a store-vs-store mismatch there is
    // this fix, not drift (ADVICE round-4; the "bit-identical" claim
    // above covers the table-izing of these expressions, not this clamp)
    if (fx < 0) fx = 0;
    if (fx > cw - 1) fx = float(cw - 1);
    int ix = int(fx);
    if (ix >= cw - 1) ix = cw - 2 < 0 ? 0 : cw - 2;
    float wx = fx - ix;
    if (cw == 1) { ix = 0; wx = 0; }
    ix_tab[x] = ix;
    wx_tab[x] = wx;
  }
  const size_t row_stride = size_t(sw) * 3;
  for (int y = 0; y < dh; y++) {
    float fy = (y + 0.5f) * sy - 0.5f;
    if (fy < 0) fy = 0;
    if (fy > ch - 1) fy = float(ch - 1);
    int iy = int(fy);
    if (iy >= ch - 1) iy = ch - 2 < 0 ? 0 : ch - 2;
    float wy = fy - iy;
    if (ch == 1) { iy = 0; wy = 0; }
    const uint8_t* row0 = src + size_t(y0 + iy) * row_stride + size_t(x0) * 3;
    // 1-px-tall crops: the bottom taps have weight 0 but would still READ
    // past the buffer — point them back at the top row
    const uint8_t* row1 = ch == 1 ? row0 : row0 + row_stride;
    uint8_t* out_row = dst + size_t(y) * dw * 3;
    const float wy1 = 1 - wy;
    for (int x = 0; x < dw; x++) {
      const float wx = wx_tab[x];
      const float wx1 = 1 - wx;
      const uint8_t* p00 = row0 + size_t(ix_tab[x]) * 3;
      const uint8_t* p10 = row1 + size_t(ix_tab[x]) * 3;
      // 1-px-wide crops: same weight-0 guard for the right-hand taps
      const uint8_t* p01 = cw == 1 ? p00 : p00 + 3;
      const uint8_t* p11 = cw == 1 ? p10 : p10 + 3;
      for (int c = 0; c < 3; c++) {
        float v = wy1 * (wx1 * p00[c] + wx * p01[c]) +
                  wy * (wx1 * p10[c] + wx * p11[c]);
        out_row[x * 3 + c] = uint8_t(v + 0.5f);
      }
    }
  }
  free(ix_tab);
  free(wx_tab);
  return true;
}

int decode_one(const char* path, int size, int center_crop, int fast_scale,
               uint8_t* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;  // missing
  Image img;
  // sniff format by magic bytes
  uint8_t magic[8] = {0};
  size_t got = fread(magic, 1, 8, f);
  fseek(f, 0, SEEK_SET);
  bool ok = false;
  int target = fast_scale ? size : 0;
  if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = decode_jpeg(f, &img, target);
  } else if (got >= 8 && !png_sig_cmp(magic, 0, 8)) {
    ok = decode_png(f, &img);
  } else {
    ok = decode_jpeg(f, &img, target);  // try jpeg as default
  }
  fclose(f);
  if (!ok || img.data == nullptr) {
    free(img.data);
    return 2;
  }
  int x0 = 0, y0 = 0, cw = img.w, ch = img.h;
  if (center_crop) {
    int m = img.w < img.h ? img.w : img.h;
    x0 = (img.w - m) / 2;
    y0 = (img.h - m) / 2;
    cw = ch = m;
  }
  bool resized = bilinear_resize(img.data, img.w, img.h, x0, y0, cw, ch,
                                 out, size, size);
  free(img.data);
  return resized ? 0 : 2;
}

struct BatchTask {
  const char** paths;
  int n;
  int size;
  int center_crop;
  int fast_scale;
  uint8_t* out;
  int* status;
  int next;  // guarded by mutex
  pthread_mutex_t mutex;
};

void* batch_worker(void* arg) {
  BatchTask* t = static_cast<BatchTask*>(arg);
  for (;;) {
    pthread_mutex_lock(&t->mutex);
    int i = t->next++;
    pthread_mutex_unlock(&t->mutex);
    if (i >= t->n) break;
    t->status[i] = decode_one(t->paths[i], t->size, t->center_crop,
                              t->fast_scale,
                              t->out + size_t(i) * t->size * t->size * 3);
  }
  return nullptr;
}

void run_pool(BatchTask* task, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  if (n_threads > task->n) n_threads = task->n;
  if (n_threads > 64) n_threads = 64;
  pthread_t threads[64];
  int created = 0;
  for (int i = 0; i < n_threads; i++) {
    if (pthread_create(&threads[created], nullptr, batch_worker, task) != 0)
      break;  // proceed with however many workers started
    created++;
  }
  if (created == 0) batch_worker(task);  // degrade to the calling thread
  for (int i = 0; i < created; i++) pthread_join(threads[i], nullptr);
}

}  // namespace

extern "C" {

int imagepipe_decode_resize(const char* path, int size, int center_crop,
                            uint8_t* out) {
  return decode_one(path, size, center_crop, /*fast_scale=*/0, out);
}

// v2: fast_scale=1 enables DCT-domain JPEG downscaling (see decode_jpeg)
int imagepipe_decode_resize2(const char* path, int size, int center_crop,
                             int fast_scale, uint8_t* out) {
  return decode_one(path, size, center_crop, fast_scale, out);
}

int imagepipe_decode_batch2(const char** paths, int n, int size,
                            int center_crop, int fast_scale, int n_threads,
                            uint8_t* out, int* status) {
  BatchTask task{paths, n, size, center_crop, fast_scale, out, status, 0,
                 PTHREAD_MUTEX_INITIALIZER};
  run_pool(&task, n_threads);
  int ok = 0;
  for (int i = 0; i < n; i++) ok += (status[i] == 0);
  return ok;
}

int imagepipe_decode_batch(const char** paths, int n, int size,
                           int center_crop, int n_threads, uint8_t* out,
                           int* status) {
  return imagepipe_decode_batch2(paths, n, size, center_crop,
                                 /*fast_scale=*/0, n_threads, out, status);
}

}  // extern "C"

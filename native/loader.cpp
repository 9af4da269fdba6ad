// vlm_clip_tpu native data loader: threaded JPEG decode + resize + crop.
//
// The TPU-native equivalent of the reference's per-item PIL/cv2 host
// pipeline (dataset.py __getitem__, enhance.py:54-66): a C ABI batch
// loader that decodes JPEGs with libjpeg, shortest-edge bilinear-resizes,
// center-crops to a square, and writes uint8 HWC directly into a
// caller-provided (pinned) batch buffer — no Python objects, no GIL, one
// pthread per item up to a worker cap. Corrupt/missing files produce a
// black dummy image and a per-item status (the reference's fallback
// contract, enhance.py:54-61).
//
// Build: native/build.sh (g++ -O3 -shared -fPIC loader.cpp -ljpeg -lpthread)
// Python binding: vlm_clip_tpu/data/native_loader.py (ctypes).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <pthread.h>
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

// Decode a JPEG file to RGB8. Returns true on success.
bool decode_jpeg(const char* path, std::vector<uint8_t>& pixels, int& w,
                 int& h) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  w = cinfo.output_width;
  h = cinfo.output_height;
  pixels.resize(static_cast<size_t>(w) * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = pixels.data() + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return true;
}

// Bilinear sample at (fx, fy) for channel c.
inline uint8_t sample(const uint8_t* src, int w, int h, float fx, float fy,
                      int c) {
  int x0 = static_cast<int>(fx);
  int y0 = static_cast<int>(fy);
  int x1 = x0 + 1 < w ? x0 + 1 : w - 1;
  int y1 = y0 + 1 < h ? y0 + 1 : h - 1;
  float dx = fx - x0, dy = fy - y0;
  float v = (1 - dx) * (1 - dy) * src[(static_cast<size_t>(y0) * w + x0) * 3 + c] +
            dx * (1 - dy) * src[(static_cast<size_t>(y0) * w + x1) * 3 + c] +
            (1 - dx) * dy * src[(static_cast<size_t>(y1) * w + x0) * 3 + c] +
            dx * dy * src[(static_cast<size_t>(y1) * w + x1) * 3 + c];
  return static_cast<uint8_t>(v + 0.5f);
}

// Shortest-edge resize to `size`, then center crop size x size.
void resize_center_crop(const uint8_t* src, int w, int h, int size,
                        uint8_t* dst) {
  float scale = static_cast<float>(size) / (w < h ? w : h);
  int nw = static_cast<int>(w * scale + 0.5f);
  int nh = static_cast<int>(h * scale + 0.5f);
  int left = (nw - size) / 2;
  int top = (nh - size) / 2;
  for (int y = 0; y < size; ++y) {
    float fy = (y + top + 0.5f) / scale - 0.5f;
    if (fy < 0) fy = 0;
    if (fy > h - 1) fy = static_cast<float>(h - 1);
    for (int x = 0; x < size; ++x) {
      float fx = (x + left + 0.5f) / scale - 0.5f;
      if (fx < 0) fx = 0;
      if (fx > w - 1) fx = static_cast<float>(w - 1);
      for (int c = 0; c < 3; ++c) {
        dst[(static_cast<size_t>(y) * size + x) * 3 + c] =
            sample(src, w, h, fx, fy, c);
      }
    }
  }
}

struct Task {
  const char* const* paths;
  int* status;  // 1 = ok, 0 = dummy fallback
  uint8_t* out;
  int n, image_size;
  int next;  // guarded by mutex
  pthread_mutex_t mu;
};

void process_one(Task* t, int idx) {
  const size_t item = static_cast<size_t>(t->image_size) * t->image_size * 3;
  uint8_t* dst = t->out + item * idx;
  std::vector<uint8_t> pixels;
  int w = 0, h = 0;
  if (decode_jpeg(t->paths[idx], pixels, w, h) && w > 0 && h > 0) {
    resize_center_crop(pixels.data(), w, h, t->image_size, dst);
    t->status[idx] = 1;
  } else {
    std::memset(dst, 0, item);  // black dummy (enhance.py:54-61)
    t->status[idx] = 0;
  }
}

void* worker(void* arg) {
  Task* t = static_cast<Task*>(arg);
  for (;;) {
    pthread_mutex_lock(&t->mu);
    int idx = t->next++;
    pthread_mutex_unlock(&t->mu);
    if (idx >= t->n) break;
    process_one(t, idx);
  }
  return nullptr;
}

}  // namespace

extern "C" {

// Decode + resize + crop a batch of JPEGs into out[n, size, size, 3]
// (uint8, caller-allocated). status[n] gets 1/0 per item. Returns the
// number of successfully decoded images.
int vct_load_batch(const char* const* paths, int n, int image_size,
                   uint8_t* out, int* status, int n_threads) {
  Task t{paths, status, out, n, image_size, 0, PTHREAD_MUTEX_INITIALIZER};
  if (n_threads < 1) n_threads = 1;
  if (n_threads > n) n_threads = n;
  std::vector<pthread_t> threads(n_threads);
  for (int i = 0; i < n_threads; ++i)
    pthread_create(&threads[i], nullptr, worker, &t);
  for (int i = 0; i < n_threads; ++i) pthread_join(threads[i], nullptr);
  int ok = 0;
  for (int i = 0; i < n; ++i) ok += status[i];
  return ok;
}

// Single-image variant.
int vct_load_image(const char* path, int image_size, uint8_t* out) {
  int status = 0;
  const char* paths[1] = {path};
  vct_load_batch(paths, 1, image_size, out, &status, 1);
  return status;
}

}  // extern "C"

// AdaLog-TPU native data pipeline.
//
// The reference leans on torchvision ImageFolder + PIL workers for its input
// pipeline (utils/datasets.py); at TPU eval rates (~4k img/s quantized
// deit_small) a Python/PIL decode path becomes the bottleneck. This library
// implements the same eval preprocessing natively:
//   JPEG decode (libjpeg) -> antialiased bicubic resize of the shorter side
//   to round(size/crop_pct) -> center crop -> float32 HWC normalize
// with a pthread worker pool for batch loading. Exposed through a C ABI and
// consumed via ctypes (adalog_tpu/data/native_loader.py).
//
// The resize reproduces PIL's convolution resampling (cubic kernel a=-0.5,
// support scaled by the downscale factor, weights normalized per output
// pixel) in float arithmetic; agreement with PIL is within ~2/255 per pixel.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <pthread.h>
#include <vector>

#include <jpeglib.h>
#include <setjmp.h>

namespace {

struct ErrMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrMgr* err = reinterpret_cast<ErrMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// --- JPEG decode to RGB8 -------------------------------------------------

bool decode_jpeg(const uint8_t* data, long len, std::vector<uint8_t>* out,
                 int* w, int* h) {
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data),
               static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  out->resize(static_cast<size_t>(*w) * *h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data() + static_cast<size_t>(cinfo.output_scanline) *
                                     *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// --- PIL-compatible cubic resampling ------------------------------------

double cubic(double x) {
  const double a = -0.5;
  x = std::fabs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

struct Coeffs {
  std::vector<int> bounds;      // (xmin, size) pairs per output pixel
  std::vector<double> weights;  // ksize weights per output pixel
  int ksize;
};

Coeffs precompute(int in_size, int out_size) {
  const double scale = static_cast<double>(in_size) / out_size;
  const double filterscale = scale < 1.0 ? 1.0 : scale;
  const double support = 2.0 * filterscale;  // cubic support = 2
  const int ksize = static_cast<int>(std::ceil(support)) * 2 + 1;

  Coeffs c;
  c.ksize = ksize;
  c.bounds.resize(2 * out_size);
  c.weights.assign(static_cast<size_t>(out_size) * ksize, 0.0);
  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    int n = xmax - xmin;
    double* w = &c.weights[static_cast<size_t>(xx) * ksize];
    double total = 0.0;
    for (int i = 0; i < n; ++i) {
      w[i] = cubic((xmin + i - center + 0.5) / filterscale);
      total += w[i];
    }
    if (total != 0.0)
      for (int i = 0; i < n; ++i) w[i] /= total;
    c.bounds[2 * xx] = xmin;
    c.bounds[2 * xx + 1] = n;
  }
  return c;
}

// horizontal pass: (h, in_w, 3) u8 -> (h, out_w, 3) float
void resample_h(const uint8_t* in, int h, int in_w, const Coeffs& c,
                int out_w, float* out) {
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = in + static_cast<size_t>(y) * in_w * 3;
    float* orow = out + static_cast<size_t>(y) * out_w * 3;
    for (int x = 0; x < out_w; ++x) {
      int xmin = c.bounds[2 * x], n = c.bounds[2 * x + 1];
      const double* w = &c.weights[static_cast<size_t>(x) * c.ksize];
      double acc[3] = {0, 0, 0};
      for (int i = 0; i < n; ++i) {
        const uint8_t* p = row + (xmin + i) * 3;
        acc[0] += w[i] * p[0];
        acc[1] += w[i] * p[1];
        acc[2] += w[i] * p[2];
      }
      orow[x * 3 + 0] = static_cast<float>(acc[0]);
      orow[x * 3 + 1] = static_cast<float>(acc[1]);
      orow[x * 3 + 2] = static_cast<float>(acc[2]);
    }
  }
}

// vertical pass: (in_h, w, 3) float -> (out_h, w, 3) float
void resample_v(const float* in, int in_h, int w, const Coeffs& c,
                int out_h, float* out) {
  for (int y = 0; y < out_h; ++y) {
    int ymin = c.bounds[2 * y], n = c.bounds[2 * y + 1];
    const double* wt = &c.weights[static_cast<size_t>(y) * c.ksize];
    float* orow = out + static_cast<size_t>(y) * w * 3;
    for (int x = 0; x < w * 3; ++x) {
      double acc = 0.0;
      for (int i = 0; i < n; ++i)
        acc += wt[i] * in[static_cast<size_t>(ymin + i) * w * 3 + x];
      orow[x] = static_cast<float>(acc);
    }
  }
}

int preprocess_rgb(const std::vector<uint8_t>& rgb, int w, int h,
                   int out_size, double crop_pct, const float* mean,
                   const float* stdd, float* out) {
  // exact timm/torchvision integer semantics (see imagenet.py
  // load_eval_image): floor for the scale size, truncation for the aspect
  // side, half-to-even rounding for the crop offset
  const int scale_size = static_cast<int>(std::floor(out_size / crop_pct));
  int nw, nh;
  if (w <= h) {
    nw = scale_size;
    nh = static_cast<int>(static_cast<double>(h) * scale_size / w);
  } else {
    nh = scale_size;
    nw = static_cast<int>(static_cast<double>(w) * scale_size / h);
  }
  Coeffs ch = precompute(w, nw);
  Coeffs cv = precompute(h, nh);
  std::vector<float> tmp(static_cast<size_t>(h) * nw * 3);
  resample_h(rgb.data(), h, w, ch, nw, tmp.data());
  std::vector<float> resized(static_cast<size_t>(nh) * nw * 3);
  resample_v(tmp.data(), h, nw, cv, nh, resized.data());

  const int left =
      static_cast<int>(std::nearbyint((nw - out_size) / 2.0));
  const int top =
      static_cast<int>(std::nearbyint((nh - out_size) / 2.0));
  if (left < 0 || top < 0) return -2;
  for (int y = 0; y < out_size; ++y) {
    const float* row = resized.data() +
                       (static_cast<size_t>(top + y) * nw + left) * 3;
    float* orow = out + static_cast<size_t>(y) * out_size * 3;
    for (int x = 0; x < out_size; ++x) {
      for (int cch = 0; cch < 3; ++cch) {
        float v = row[x * 3 + cch];
        // PIL clamps each resample stage to u8; clamp once here
        if (v < 0.0f) v = 0.0f;
        if (v > 255.0f) v = 255.0f;
        orow[x * 3 + cch] = (v / 255.0f - mean[cch]) / stdd[cch];
      }
    }
  }
  return 0;
}

// --- batch worker pool ---------------------------------------------------

struct BatchJob {
  const char** paths;
  int n;
  int out_size;
  double crop_pct;
  const float* mean;
  const float* stdd;
  float* out;
  int next;               // next index to claim
  int failures;
  pthread_mutex_t mu;
};

bool load_file(const char* path, std::vector<uint8_t>* buf) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long len = ftell(f);
  fseek(f, 0, SEEK_SET);
  buf->resize(len);
  size_t rd = fread(buf->data(), 1, len, f);
  fclose(f);
  return rd == static_cast<size_t>(len);
}

void* batch_worker(void* arg) {
  BatchJob* job = static_cast<BatchJob*>(arg);
  for (;;) {
    pthread_mutex_lock(&job->mu);
    int idx = job->next++;
    pthread_mutex_unlock(&job->mu);
    if (idx >= job->n) break;

    std::vector<uint8_t> bytes, rgb;
    int w = 0, h = 0;
    bool ok = load_file(job->paths[idx], &bytes) &&
              decode_jpeg(bytes.data(), static_cast<long>(bytes.size()),
                          &rgb, &w, &h);
    float* dst = job->out + static_cast<size_t>(idx) * job->out_size *
                                job->out_size * 3;
    if (!ok || preprocess_rgb(rgb, w, h, job->out_size, job->crop_pct,
                              job->mean, job->stdd, dst) != 0) {
      memset(dst, 0, static_cast<size_t>(job->out_size) * job->out_size * 3 *
                         sizeof(float));
      pthread_mutex_lock(&job->mu);
      job->failures++;
      pthread_mutex_unlock(&job->mu);
    }
  }
  return nullptr;
}

}  // namespace

extern "C" {

// Decode one in-memory JPEG and preprocess into out (out_size*out_size*3 f32).
int adalog_decode_preprocess(const uint8_t* data, long len, int out_size,
                             double crop_pct, const float* mean,
                             const float* stdd, float* out) {
  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
  if (!decode_jpeg(data, len, &rgb, &w, &h)) return -1;
  return preprocess_rgb(rgb, w, h, out_size, crop_pct, mean, stdd, out);
}

// Preprocess an already-decoded RGB8 HWC image (for non-JPEG formats decoded
// by the caller).
int adalog_preprocess_rgb8(const uint8_t* rgb, int w, int h, int out_size,
                           double crop_pct, const float* mean,
                           const float* stdd, float* out) {
  std::vector<uint8_t> buf(rgb, rgb + static_cast<size_t>(w) * h * 3);
  return preprocess_rgb(buf, w, h, out_size, crop_pct, mean, stdd, out);
}

// Load+decode+preprocess a batch of JPEG files with n_threads workers.
// Returns the number of failed images (their slots are zero-filled).
int adalog_batch_load(const char** paths, int n, int out_size,
                      double crop_pct, const float* mean, const float* stdd,
                      float* out, int n_threads) {
  BatchJob job{paths, n, out_size, crop_pct, mean, stdd, out, 0, 0,
               PTHREAD_MUTEX_INITIALIZER};
  if (n_threads < 1) n_threads = 1;
  if (n_threads > n) n_threads = n;
  std::vector<pthread_t> threads(n_threads);
  for (int i = 0; i < n_threads; ++i)
    pthread_create(&threads[i], nullptr, batch_worker, &job);
  for (int i = 0; i < n_threads; ++i) pthread_join(threads[i], nullptr);
  return job.failures;
}

}  // extern "C"

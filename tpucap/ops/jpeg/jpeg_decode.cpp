// Batched multi-threaded JPEG decode + nearest resize (host side).
//
// TPU-native replacement for the reference's per-image PIL / tf.image
// decode (SURVEY.md §2.3): the input pipeline decodes batches of JPEGs into
// one contiguous uint8 NHWC buffer that is shipped to the device in a
// single transfer; normalization happens on-device (fused XLA/Pallas op in
// tpucap.ops.preprocess).
//
// Fast paths:
// - libjpeg scaled decode (scale_num/8) picks the smallest DCT scale that
//   still covers the target size, cutting IDCT work up to 64x for large
//   sources.
// - nearest resize uses the PIL convention: src = floor((i + 0.5) * scale),
//   matching keras load_img's default interpolation (the reference's
//   numerics, keras/src/utils/image_utils.py:200-204).
// - one worker thread per hardware core (capped), each with its own
//   decompress struct; no locking on the hot path.
//
// C ABI (ctypes-friendly); see tpucap/ops/jpeg/__init__.py for the binding.

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <thread>
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

// Nearest-neighbor index with the PIL center convention.
inline int nearest_index(int dst, int dst_size, int src_size) {
  double scale = static_cast<double>(src_size) / dst_size;
  int idx = static_cast<int>((dst + 0.5) * scale);
  return std::min(idx, src_size - 1);
}

// Guarded libjpeg region: every call that can longjmp through error_exit
// happens here, and this frame holds NO objects with non-trivial
// destructors (longjmp would skip them — the caller owns the scanline
// buffer and passes it in, so an error mid-decode cannot leak it).
// Returns 0 on success; fills *src and the output dims.
static int decode_guarded(const uint8_t* data, size_t size, int target_h,
                          int target_w, int fast_scale,
                          std::vector<uint8_t>* src, int* sw_out,
                          int* sh_out) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, size);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  cinfo.out_color_space = JCS_RGB;

  // Scaled decode: smallest num/8 scale whose output still covers target.
  // fast_scale=0 forces full-resolution decode for bit-exact parity with
  // PIL's decode-then-nearest-resize path.
  int num = 8;
  if (fast_scale && target_h > 0 && target_w > 0) {
    for (num = 1; num <= 8; ++num) {
      if (static_cast<long>(cinfo.image_height) * num / 8 >= target_h &&
          static_cast<long>(cinfo.image_width) * num / 8 >= target_w) {
        break;
      }
    }
    if (num > 8) num = 8;
  }
  cinfo.scale_num = num;
  cinfo.scale_denom = 8;

  jpeg_start_decompress(&cinfo);
  const int sw = cinfo.output_width;
  const int sh = cinfo.output_height;
  const int row_stride = sw * cinfo.output_components;

  src->resize(static_cast<size_t>(sh) * row_stride);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = src->data() +
                   static_cast<size_t>(cinfo.output_scanline) * row_stride;
    JSAMPROW rows[1] = {row};
    jpeg_read_scanlines(&cinfo, rows, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *sw_out = sw;
  *sh_out = sh;
  return 0;
}

// Decode one JPEG into out (target_h * target_w * 3, RGB uint8).
// Returns 0 on success, nonzero on decode error.
int decode_one(const uint8_t* data, size_t size, int target_h, int target_w,
               uint8_t* out, int fast_scale) {
  std::vector<uint8_t> src;  // owned outside the setjmp region
  int sw = 0, sh = 0;
  int rc = decode_guarded(data, size, target_h, target_w, fast_scale, &src,
                          &sw, &sh);
  if (rc != 0) return rc;
  const int row_stride = sw * 3;

  if (target_h <= 0 || target_w <= 0 || (sh == target_h && sw == target_w)) {
    // No resize: caller guaranteed buffer matches sh*sw*3 in this mode.
    std::memcpy(out, src.data(), src.size());
    return 0;
  }

  // Nearest resize (PIL convention); column index map precomputed.
  std::vector<int> col(target_w);
  for (int j = 0; j < target_w; ++j) {
    col[j] = nearest_index(j, target_w, sw) * 3;
  }
  for (int i = 0; i < target_h; ++i) {
    const uint8_t* srow =
        src.data() + static_cast<size_t>(nearest_index(i, target_h, sh)) *
                         row_stride;
    uint8_t* drow = out + static_cast<size_t>(i) * target_w * 3;
    for (int j = 0; j < target_w; ++j) {
      const uint8_t* p = srow + col[j];
      drow[j * 3 + 0] = p[0];
      drow[j * 3 + 1] = p[1];
      drow[j * 3 + 2] = p[2];
    }
  }
  return 0;
}

}  // namespace

extern "C" {

// Decode n JPEGs (concatenated in `data` at `offsets[i]`, length
// `sizes[i]`) into `out` (n * target_h * target_w * 3 uint8, NHWC RGB).
// `status[i]` receives 0 on success. Uses up to `n_threads` workers
// (0 = hardware concurrency). Returns number of failed images.
int tpucap_decode_jpeg_batch(const uint8_t* data, const int64_t* offsets,
                             const int64_t* sizes, int n, int target_h,
                             int target_w, uint8_t* out, int* status,
                             int n_threads, int fast_scale) {
  if (n_threads <= 0) {
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 4;
  }
  n_threads = std::min(n_threads, n);
  const size_t img_bytes =
      static_cast<size_t>(target_h) * target_w * 3;

  std::atomic<int> next(0);
  std::atomic<int> failures(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      int rc = decode_one(data + offsets[i], static_cast<size_t>(sizes[i]),
                          target_h, target_w, out + img_bytes * i,
                          fast_scale);
      status[i] = rc;
      if (rc != 0) failures.fetch_add(1);
    }
  };

  if (n_threads <= 1) {
    worker();
  } else {
    std::vector<std::thread> threads;
    threads.reserve(n_threads);
    for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
  }
  return failures.load();
}

// Probe a JPEG's dimensions. Returns 0 on success.
int tpucap_jpeg_dims(const uint8_t* data, int64_t size, int* h, int* w) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, static_cast<size_t>(size));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  *h = cinfo.image_height;
  *w = cinfo.image_width;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

}  // extern "C"

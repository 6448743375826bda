// Native training data loader: threaded image decode + resize + batch
// assembly with a bounded in-order prefetch buffer.
//
// Role in the framework: the reference trains through torch's C++-backed
// DataLoader (ControlNet upstream tutorial_dataset.py reads fill50k
// source/target PNG pairs); this is the TPU-native equivalent for
// training/data.py — worker threads decode PNG/JPEG pairs (libpng/libjpeg),
// bilinear-resize to the training resolution, and assemble uint8 batches
// the Python side hands to the device (normalization happens in-graph, the
// same uint8-upload discipline as the inference engines). Batches are
// delivered in a deterministic order given (seed, batch size): a bounded
// reorder buffer keeps workers busy `depth` batches ahead while the
// consumer sees the exact per-epoch shuffled sequence.
//
// Build: make -C native  (produces build/libsdeo_loader.so)
// C ABI (ctypes):
//   sdeo_loader_create(paths_src, paths_tgt, n, batch, h, w,
//                      shuffle, seed, threads, depth) -> handle
//   sdeo_loader_next(handle, src_out, tgt_out, idx_out) -> batch ticket,
//       or -1 if destroy() raced the wait (outputs untouched in that case)
//   sdeo_loader_error_count(handle) -> decode failures so far (zero-filled)
//   sdeo_loader_destroy(handle)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct Image {
  int w = 0, h = 0;
  std::vector<uint8_t> rgb;  // HWC, 3 channels
};

bool decode_png(const char* path, Image* out) {
  png_image img;
  std::memset(&img, 0, sizeof(img));
  img.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&img, path)) return false;
  img.format = PNG_FORMAT_RGB;
  out->w = img.width;
  out->h = img.height;
  out->rgb.resize(PNG_IMAGE_SIZE(img));
  if (!png_image_finish_read(&img, nullptr, out->rgb.data(), 0, nullptr)) {
    png_image_free(&img);
    return false;
  }
  return true;
}

bool decode_jpeg(const char* path, Image* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jerr.error_exit = [](j_common_ptr ci) { longjmp(*(jmp_buf*)ci->client_data, 1); };
  jmp_buf env;
  cinfo.client_data = &env;
  if (setjmp(env)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->rgb.resize(size_t(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->rgb.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return true;
}

bool decode(const char* path, Image* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  uint8_t magic[2] = {0, 0};
  size_t got = std::fread(magic, 1, 2, f);
  std::fclose(f);
  if (got != 2) return false;
  if (magic[0] == 0x89 && magic[1] == 'P') return decode_png(path, out);
  if (magic[0] == 0xFF && magic[1] == 0xD8) return decode_jpeg(path, out);
  return false;
}

// Half-pixel-center bilinear resize (cv2.INTER_LINEAR convention for
// upscaling; matches the repo's annotator resize tolerance tests).
void resize_bilinear(const Image& src, int dh, int dw, uint8_t* dst) {
  if (src.w == dw && src.h == dh) {
    std::memcpy(dst, src.rgb.data(), size_t(dh) * dw * 3);
    return;
  }
  const float sx = float(src.w) / dw, sy = float(src.h) / dh;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = (int)std::floor(fy);
    float wy = fy - y0;
    int y1 = std::min(y0 + 1, src.h - 1);
    y0 = std::max(y0, 0);
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = (int)std::floor(fx);
      float wx = fx - x0;
      int x1 = std::min(x0 + 1, src.w - 1);
      x0 = std::max(x0, 0);
      const uint8_t* p00 = &src.rgb[(size_t(y0) * src.w + x0) * 3];
      const uint8_t* p01 = &src.rgb[(size_t(y0) * src.w + x1) * 3];
      const uint8_t* p10 = &src.rgb[(size_t(y1) * src.w + x0) * 3];
      const uint8_t* p11 = &src.rgb[(size_t(y1) * src.w + x1) * 3];
      uint8_t* o = dst + (size_t(y) * dw + x) * 3;
      for (int c = 0; c < 3; ++c) {
        float v = (1 - wy) * ((1 - wx) * p00[c] + wx * p01[c]) +
                  wy * ((1 - wx) * p10[c] + wx * p11[c]);
        o[c] = (uint8_t)std::lround(std::min(std::max(v, 0.0f), 255.0f));
      }
    }
  }
}

struct Slot {
  std::vector<uint8_t> src, tgt;
  std::vector<int32_t> idx;
  int64_t ticket = -1;  // which batch currently occupies the slot
  bool ready = false;
};

struct Loader {
  std::vector<std::string> src_paths, tgt_paths;
  int batch, h, w, depth;
  bool shuffle;
  uint32_t seed;

  std::vector<Slot> slots;
  std::mutex mu;
  std::condition_variable cv_ready, cv_free;
  int64_t next_ticket = 0;      // claimed by workers
  int64_t consumed = 0;         // delivered to the consumer
  std::atomic<int64_t> errors{0};
  std::atomic<bool> stop{false};
  std::atomic<int> active_consumers{0};  // in-flight sdeo_loader_next calls
  std::vector<std::thread> workers;

  // per-epoch permutation cache
  std::mutex perm_mu;
  int64_t perm_epoch = -1;
  std::vector<int32_t> perm;

  int32_t sample_index(int64_t global_pos) {
    int64_t n = (int64_t)src_paths.size();
    int64_t epoch = global_pos / n;
    int64_t off = global_pos % n;
    if (!shuffle) return (int32_t)off;
    std::lock_guard<std::mutex> g(perm_mu);
    if (perm_epoch != epoch) {
      perm.resize(n);
      for (int64_t i = 0; i < n; ++i) perm[i] = (int32_t)i;
      std::mt19937 rng(seed + (uint32_t)epoch * 2654435761u);
      std::shuffle(perm.begin(), perm.end(), rng);
      perm_epoch = epoch;
    }
    return perm[off];
  }

  void fill_sample(int32_t si, uint8_t* src_out, uint8_t* tgt_out) {
    Image im;
    if (decode(src_paths[si].c_str(), &im)) {
      resize_bilinear(im, h, w, src_out);
    } else {
      std::memset(src_out, 0, size_t(h) * w * 3);
      errors.fetch_add(1);
    }
    if (decode(tgt_paths[si].c_str(), &im)) {
      resize_bilinear(im, h, w, tgt_out);
    } else {
      std::memset(tgt_out, 0, size_t(h) * w * 3);
      errors.fetch_add(1);
    }
  }

  void worker() {
    const size_t plane = size_t(h) * w * 3;
    while (true) {
      int64_t t;
      Slot* slot;
      {
        std::unique_lock<std::mutex> lk(mu);
        // claim the next ticket only once its slot is free (its previous
        // occupant, ticket t-depth, has been consumed); claiming before
        // the wait would let two workers grab the same ticket
        cv_free.wait(lk, [&] {
          return stop.load() || next_ticket - consumed < depth;
        });
        if (stop.load()) return;
        t = next_ticket++;
        slot = &slots[t % depth];
        slot->ticket = t;
        slot->ready = false;
      }
      for (int b = 0; b < batch; ++b) {
        int32_t si = sample_index(t * (int64_t)batch + b);
        slot->idx[b] = si;
        fill_sample(si, slot->src.data() + b * plane,
                    slot->tgt.data() + b * plane);
      }
      {
        std::lock_guard<std::mutex> lk(mu);
        slot->ready = true;
      }
      cv_ready.notify_all();
    }
  }
};

}  // namespace

extern "C" {

void* sdeo_loader_create(const char** src_paths, const char** tgt_paths,
                         int n, int batch, int h, int w, int shuffle,
                         unsigned seed, int threads, int depth) {
  if (n <= 0 || batch <= 0 || depth <= 0) return nullptr;
  auto* L = new Loader();
  L->src_paths.assign(src_paths, src_paths + n);
  L->tgt_paths.assign(tgt_paths, tgt_paths + n);
  L->batch = batch;
  L->h = h;
  L->w = w;
  L->depth = depth;
  L->shuffle = shuffle != 0;
  L->seed = seed;
  L->slots.resize(depth);
  for (auto& s : L->slots) {
    s.src.resize(size_t(batch) * h * w * 3);
    s.tgt.resize(size_t(batch) * h * w * 3);
    s.idx.resize(batch);
  }
  int nt = std::max(1, std::min(threads, depth));
  for (int i = 0; i < nt; ++i)
    L->workers.emplace_back([L] { L->worker(); });
  return L;
}

long long sdeo_loader_next(void* handle, uint8_t* src_out, uint8_t* tgt_out,
                           int32_t* idx_out) {
  auto* L = (Loader*)handle;
  // registered consumer: destroy() drains this count before deleting L,
  // so the copy-out below never reads freed slot memory. (Calling next()
  // after destroy() has RETURNED is still user error, as for any handle.)
  L->active_consumers.fetch_add(1);
  struct Guard {
    Loader* L;
    ~Guard() {  // decrement under mu: destroy()'s drain-wait predicate
      {       // must not miss the wakeup (runs after any inner lock scope)
        std::lock_guard<std::mutex> g(L->mu);
        L->active_consumers.fetch_sub(1);
      }
      L->cv_free.notify_all();
    }
  } guard{L};
  int64_t t = L->consumed;
  Slot* slot = &L->slots[t % L->depth];
  {
    std::unique_lock<std::mutex> lk(L->mu);
    // also wake on stop: a consumer blocked here during destroy() must
    // return (-1) instead of waiting on a condition variable the
    // destructor is about to delete (use-after-free otherwise)
    L->cv_ready.wait(lk, [&] {
      return (slot->ticket == t && slot->ready) || L->stop.load();
    });
    if (L->stop.load()) return -1;  // buffers untouched; destroy may proceed
  }
  const size_t bytes = size_t(L->batch) * L->h * L->w * 3;
  std::memcpy(src_out, slot->src.data(), bytes);
  std::memcpy(tgt_out, slot->tgt.data(), bytes);
  std::memcpy(idx_out, slot->idx.data(), sizeof(int32_t) * L->batch);
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->consumed = t + 1;
  }
  L->cv_free.notify_all();
  return t;
}

long long sdeo_loader_error_count(void* handle) {
  return ((Loader*)handle)->errors.load();
}

void sdeo_loader_destroy(void* handle) {
  auto* L = (Loader*)handle;
  {
    std::lock_guard<std::mutex> lk(L->mu);
    L->stop.store(true);
  }
  L->cv_free.notify_all();
  L->cv_ready.notify_all();
  for (auto& th : L->workers) th.join();
  {
    // drain in-flight consumers (woken above via stop) before freeing:
    // one may still be between its wait and its copy-out/return
    std::unique_lock<std::mutex> lk(L->mu);
    L->cv_free.wait(lk, [&] { return L->active_consumers.load() == 0; });
  }
  delete L;
}

}  // extern "C"

// Native batch-preparation kernels for the input pipeline.
//
// The reference delegates host-side batch assembly to torch DataLoader worker
// processes (ddpm_torch/datasets.py get_dataloader num_workers). Here the hot
// host-side op — gather selected uint8 images, apply per-example horizontal
// flips, normalize to float32 [-1, 1] NHWC — is one multithreaded C++ kernel
// called via ctypes, releasing the GIL and writing straight into the
// device-feed staging buffer.
//
// Build: scripts/build_native.sh  (g++ -O3 -march=native -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Normalize lookup table: u8 -> (u8 / 127.5 - 1.0f)
struct Lut {
  float v[256];
  Lut() {
    for (int i = 0; i < 256; ++i) v[i] = static_cast<float>(i) / 127.5f - 1.0f;
  }
};
const Lut kLut;

inline void prepare_one(const uint8_t* img, int h, int w, int c, bool flip,
                        float* out) {
  if (!flip) {
    const int64_t n = static_cast<int64_t>(h) * w * c;
    for (int64_t i = 0; i < n; ++i) out[i] = kLut.v[img[i]];
    return;
  }
  // horizontal flip: reverse the W axis of HWC
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = img + static_cast<int64_t>(y) * w * c;
    float* orow = out + static_cast<int64_t>(y) * w * c;
    for (int x = 0; x < w; ++x) {
      const uint8_t* px = row + static_cast<int64_t>(w - 1 - x) * c;
      float* opx = orow + static_cast<int64_t>(x) * c;
      for (int k = 0; k < c; ++k) opx[k] = kLut.v[px[k]];
    }
  }
}

}  // namespace

extern "C" {

// images:  (num_images, h, w, c) uint8 source array
// indices: (n,) int64 gather indices into images
// flips:   (n,) uint8 per-example flip flags (may be null)
// out:     (n, h, w, c) float32 destination
// num_threads: worker threads (<=0 -> hardware concurrency)
void gather_flip_normalize(const uint8_t* images, const int64_t* indices,
                           int64_t n, int64_t h, int64_t w, int64_t c,
                           const uint8_t* flips, float* out,
                           int num_threads) {
  const int64_t stride = h * w * c;
  int nt = num_threads > 0
               ? num_threads
               : static_cast<int>(std::thread::hardware_concurrency());
  if (nt < 1) nt = 1;
  if (nt > n) nt = static_cast<int>(n);

  auto work = [&](int64_t begin, int64_t end) {
    for (int64_t i = begin; i < end; ++i) {
      const uint8_t* src = images + indices[i] * stride;
      const bool flip = flips != nullptr && flips[i] != 0;
      prepare_one(src, static_cast<int>(h), static_cast<int>(w),
                  static_cast<int>(c), flip, out + i * stride);
    }
  };

  if (nt == 1) {
    work(0, n);
    return;
  }
  std::vector<std::thread> threads;
  const int64_t chunk = (n + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    const int64_t begin = t * chunk;
    const int64_t end = begin + chunk < n ? begin + chunk : n;
    if (begin >= end) break;
    threads.emplace_back(work, begin, end);
  }
  for (auto& th : threads) th.join();
}

// uint8 -> uint8 gather + per-example horizontal flip, NO normalize: the
// batch-prep kernel for the device_normalize=True path, where the [-1,1]
// normalize runs inside the jitted train step and the host ships 4x-smaller
// uint8 batches (data/loader.py device_normalize).
void gather_flip_u8(const uint8_t* images, const int64_t* indices, int64_t n,
                    int64_t h, int64_t w, int64_t c, const uint8_t* flips,
                    uint8_t* out, int num_threads) {
  const int64_t stride = h * w * c;
  int nt = num_threads > 0
               ? num_threads
               : static_cast<int>(std::thread::hardware_concurrency());
  if (nt < 1) nt = 1;
  if (nt > n) nt = static_cast<int>(n);

  auto work = [&](int64_t begin, int64_t end) {
    for (int64_t i = begin; i < end; ++i) {
      const uint8_t* src = images + indices[i] * stride;
      uint8_t* dst = out + i * stride;
      if (flips == nullptr || flips[i] == 0) {
        std::memcpy(dst, src, static_cast<size_t>(stride));
        continue;
      }
      const int64_t row_bytes = w * c;
      for (int64_t y = 0; y < h; ++y) {
        const uint8_t* row = src + y * row_bytes;
        uint8_t* orow = dst + y * row_bytes;
        for (int64_t x = 0; x < w; ++x)
          std::memcpy(orow + x * c, row + (w - 1 - x) * c,
                      static_cast<size_t>(c));
      }
    }
  };

  if (nt == 1) {
    work(0, n);
    return;
  }
  std::vector<std::thread> threads;
  const int64_t chunk = (n + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    const int64_t begin = t * chunk;
    const int64_t end = begin + chunk < n ? begin + chunk : n;
    if (begin >= end) break;
    threads.emplace_back(work, begin, end);
  }
  for (auto& th : threads) th.join();
}

// uint8 conversion of sampler output: clip(round(x * 127.5 + 127.5), 0, 255)
// (reference generate.py:129), multithreaded over the batch.
void float_to_uint8(const float* in, int64_t n_elems, uint8_t* out,
                    int num_threads) {
  int nt = num_threads > 0
               ? num_threads
               : static_cast<int>(std::thread::hardware_concurrency());
  if (nt < 1) nt = 1;
  auto work = [&](int64_t begin, int64_t end) {
    for (int64_t i = begin; i < end; ++i) {
      float v = in[i] * 127.5f + 127.5f;
      v = v < 0.f ? 0.f : (v > 255.f ? 255.f : v);
      out[i] = static_cast<uint8_t>(v + 0.5f);
    }
  };
  if (nt == 1) {
    work(0, n_elems);
    return;
  }
  std::vector<std::thread> threads;
  const int64_t chunk = (n_elems + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    const int64_t begin = t * chunk;
    const int64_t end = begin + chunk < n_elems ? begin + chunk : n_elems;
    if (begin >= end) break;
    threads.emplace_back(work, begin, end);
  }
  for (auto& th : threads) th.join();
}

}  // extern "C"

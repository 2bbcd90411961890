// Native host-side audio runtime: wav decode + contrastive batch assembly.
//
// The reference's host pipeline is Python: per-file torchaudio loads
// (main.py:30-44) and per-item Python stacking in the dataset
// (nsyth_dataset.py:46-69) on a batch-1 DataLoader with no workers
// (trainer.py:93-95). At TPU batch sizes the host becomes the bottleneck,
// so the decode + gather + stack path is native:
//
//  - taa_load_wav:  RIFF/WAVE parse (PCM16/PCM24/PCM32/float32), mono mix,
//                   linear resample to the target rate.
//  - taa_assemble_contrastive_batch: builds [B, 2+num_neg, T] anchor/
//                   positive/negative stacks straight from the packed
//                   corpus with a per-item xorshift RNG, multithreaded.
//
// Exposed with a C ABI for ctypes (no pybind11 in this environment).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- wav io

static float clamp1(float x) { return x < -1.f ? -1.f : (x > 1.f ? 1.f : x); }

// Parse a RIFF/WAVE file into mono float32 at target_sr (linear resample).
// Returns the number of samples written to out (<= max_samples), or a
// negative error code: -1 open, -2 header, -3 unsupported format.
int taa_load_wav(const char* path, float* out, int max_samples,
                 int target_sr) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  char riff[4], wave[4];
  uint32_t riff_size;
  if (fread(riff, 1, 4, f) != 4 || memcmp(riff, "RIFF", 4) ||
      fread(&riff_size, 4, 1, f) != 1 || fread(wave, 1, 4, f) != 4 ||
      memcmp(wave, "WAVE", 4)) {
    fclose(f);
    return -2;
  }
  uint16_t fmt = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  std::vector<uint8_t> data;
  // chunk walk
  for (;;) {
    char id[4];
    uint32_t size;
    if (fread(id, 1, 4, f) != 4 || fread(&size, 4, 1, f) != 1) break;
    if (!memcmp(id, "fmt ", 4)) {
      uint8_t buf[16];
      if (size < 16 || fread(buf, 1, 16, f) != 16) {
        fclose(f);
        return -2;
      }
      fmt = *(uint16_t*)buf;
      channels = *(uint16_t*)(buf + 2);
      rate = *(uint32_t*)(buf + 4);
      bits = *(uint16_t*)(buf + 14);
      if (size > 16) fseek(f, size - 16, SEEK_CUR);
    } else if (!memcmp(id, "data", 4)) {
      data.resize(size);
      if (fread(data.data(), 1, size, f) != size) {
        fclose(f);
        return -2;
      }
    } else {
      fseek(f, size + (size & 1), SEEK_CUR);
    }
    if (!data.empty() && rate) break;
  }
  fclose(f);
  if (!rate || !channels || data.empty()) return -2;

  // decode to mono float
  size_t bytes_per = bits / 8;
  size_t frames = data.size() / (bytes_per * channels);
  std::vector<float> mono(frames);
  for (size_t i = 0; i < frames; i++) {
    float acc = 0.f;
    for (int c = 0; c < channels; c++) {
      const uint8_t* p = data.data() + (i * channels + c) * bytes_per;
      float v;
      if (fmt == 3 && bits == 32) {
        v = *(const float*)p;
      } else if (fmt == 1 && bits == 16) {
        v = (float)(*(const int16_t*)p) / 32768.f;
      } else if (fmt == 1 && bits == 32) {
        v = (float)(*(const int32_t*)p) / 2147483648.f;
      } else if (fmt == 1 && bits == 24) {
        int32_t s = (p[0] << 8) | (p[1] << 16) | ((int32_t)(int8_t)p[2] << 24);
        v = (float)(s >> 8) / 8388608.f;
      } else if (fmt == 1 && bits == 8) {
        v = ((float)p[0] - 128.f) / 128.f;
      } else {
        return -3;
      }
      acc += v;
    }
    mono[i] = acc / channels;
  }

  // linear resample rate -> target_sr
  if ((int)rate == target_sr) {
    int n = (int)frames < max_samples ? (int)frames : max_samples;
    for (int i = 0; i < n; i++) out[i] = clamp1(mono[i]);
    return n;
  }
  double ratio = (double)rate / target_sr;
  int out_n = (int)(frames / ratio);
  if (out_n > max_samples) out_n = max_samples;
  for (int i = 0; i < out_n; i++) {
    double src = i * ratio;
    size_t i0 = (size_t)src;
    size_t i1 = i0 + 1 < frames ? i0 + 1 : frames - 1;
    double w = src - i0;
    out[i] = clamp1((float)(mono[i0] * (1.0 - w) + mono[i1] * w));
  }
  return out_n;
}

// ---------------------------------------------------------------- batching

static inline uint64_t xorshift64(uint64_t* s) {
  uint64_t x = *s;
  x ^= x << 13;
  x ^= x >> 7;
  x ^= x << 17;
  return *s = x;
}

// Assemble a contrastive batch from the packed corpus.
//   corpus:    [n, t] float32
//   anchors:   [b] row indices
//   neighbors: [n, n_nb] nearest->farthest orderings (int32)
//   out:       [b, 2 + num_neg, t] float32
// Positive: uniform from the first num_pos neighbors (nsyth_dataset.py:52-54).
// Negatives: the window [neg_end - num_neg, neg_end) of the ordering
// (nsyth_dataset.py:57-62) — neg_end is the curriculum offset.
void taa_assemble_contrastive_batch(const float* corpus, int n, int t,
                                    const int32_t* anchors, int b,
                                    const int32_t* neighbors, int n_nb,
                                    int num_pos, int num_neg, int neg_end,
                                    uint64_t seed, float* out,
                                    int num_threads) {
  if (neg_end > n_nb) neg_end = n_nb;
  int neg_start = neg_end - num_neg;
  if (neg_start < 0) neg_start = 0;
  const int group = 2 + num_neg;
  auto work = [&](int lo, int hi) {
    for (int i = lo; i < hi; i++) {
      const int a = anchors[i];
      uint64_t rng = seed + 0x9e3779b97f4a7c15ull * (uint64_t)(i + 1);
      xorshift64(&rng);
      float* dst = out + (size_t)i * group * t;
      // anchor
      memcpy(dst, corpus + (size_t)a * t, sizeof(float) * t);
      // positive
      int kp = num_pos < n_nb ? num_pos : n_nb;
      int pos = neighbors[(size_t)a * n_nb + (xorshift64(&rng) % kp)];
      memcpy(dst + t, corpus + (size_t)pos * t, sizeof(float) * t);
      // negatives window
      for (int k = 0; k < num_neg; k++) {
        int idx = neg_start + k;
        if (idx >= n_nb) idx = n_nb - 1;
        int neg = neighbors[(size_t)a * n_nb + idx];
        memcpy(dst + (size_t)(2 + k) * t, corpus + (size_t)neg * t,
               sizeof(float) * t);
      }
    }
  };
  if (num_threads <= 1 || b < 4) {
    work(0, b);
    return;
  }
  std::vector<std::thread> threads;
  int per = (b + num_threads - 1) / num_threads;
  for (int th = 0; th < num_threads; th++) {
    int lo = th * per, hi = lo + per < b ? lo + per : b;
    if (lo >= hi) break;
    threads.emplace_back(work, lo, hi);
  }
  for (auto& th : threads) th.join();
}

// Gather bare eval batches: out[i] = corpus[idxs[i]].
void taa_gather_batch(const float* corpus, int t, const int32_t* idxs, int b,
                      float* out) {
  for (int i = 0; i < b; i++) {
    memcpy(out + (size_t)i * t, corpus + (size_t)idxs[i] * t,
           sizeof(float) * t);
  }
}

}  // extern "C"

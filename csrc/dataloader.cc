// segdl — native data-loading runtime for segmentation_tpu.
//
// The reference leaned on TensorFlow's C++ queue-runner runtime for its input
// pipeline (reference utils/datasets.py:136-171: string_input_producer +
// WholeFileReader + shuffle_batch executing in TF's C++ threads). This is the
// framework's own native equivalent: a worker-pool that decodes JPEG/PNG
// image+mask pairs (libjpeg / libpng), applies the joint random crop + flip +
// /255 normalization (reference utils/datasets.py:176-190 semantics), and
// assembles NHWC float32 batches into caller-owned buffers — all off the
// Python GIL, overlapping with TPU compute.
//
// Ordering contract: samples are served in GLOBAL paired-shuffled order
// (epoch e uses an mt19937(seed+e) shuffle; a reorder map absorbs worker
// interleaving), so a fixed seed gives a bitwise-deterministic stream — same
// contract as the Python loader (segmentation_tpu/data/datasets.py).
//
// C API (ctypes-friendly), see segmentation_tpu/data/native.py:
//   sdl_create / sdl_next_batch / sdl_stop / sdl_destroy / sdl_version

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>
#include <png.h>

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr int kVersion = 3;

struct Image {
  int h = 0, w = 0, c = 0;
  std::vector<uint8_t> data;  // HWC, RGB or grayscale
};

// ----------------------------------------------------------------- decoding
struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void JpegErrorExit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

bool DecodeJpeg(const std::string& path, int want_channels, Image* out) {
  FILE* f = fopen(path.c_str(), "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = JpegErrorExit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = want_channels == 1 ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->h = cinfo.output_height;
  out->w = cinfo.output_width;
  out->c = cinfo.output_components;
  out->data.resize(size_t(out->h) * out->w * out->c);
  const size_t stride = size_t(out->w) * out->c;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() + cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

bool DecodePng(const std::string& path, int want_channels, Image* out) {
  png_image image;
  memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&image, path.c_str())) return false;
  image.format = want_channels == 1 ? PNG_FORMAT_GRAY : PNG_FORMAT_RGB;
  out->h = image.height;
  out->w = image.width;
  out->c = want_channels == 1 ? 1 : 3;
  out->data.resize(PNG_IMAGE_SIZE(image));
  if (!png_image_finish_read(&image, nullptr, out->data.data(), 0, nullptr)) {
    png_image_free(&image);
    return false;
  }
  return true;
}

bool HasSuffix(const std::string& s, const char* suf) {
  std::string lower(s);
  std::transform(lower.begin(), lower.end(), lower.begin(), ::tolower);
  size_t n = strlen(suf);
  return lower.size() >= n && lower.compare(lower.size() - n, n, suf) == 0;
}

bool DecodeAny(const std::string& path, int want_channels, Image* out) {
  if (HasSuffix(path, ".jpg") || HasSuffix(path, ".jpeg"))
    return DecodeJpeg(path, want_channels, out);
  if (HasSuffix(path, ".png")) return DecodePng(path, want_channels, out);
  // try both
  return DecodeJpeg(path, want_channels, out) ||
         DecodePng(path, want_channels, out);
}

// ------------------------------------------------------------------- loader
struct Sample {
  bool ok = false;
  std::vector<uint8_t> image;  // crop*crop*C raw bytes (cropped/flipped)
  std::vector<float> imagef;   // /255 floats, pre-converted in the worker
                               // when the loader is configured for f32
                               // output (keeps the conversion parallel —
                               // the consumer thread only memcpys)
  std::vector<uint8_t> mask;   // crop*crop*1 (raw pixel values)
};

struct Config {
  int batch_size = 1;
  int crop = 256;
  int threads = 4;
  uint64_t seed = 5555;
  int capacity = 64;     // decoded samples buffered ahead
  int flip = 0;          // joint horizontal flip augmentation
  int channels = 3;      // image channels
  int want_f32 = 1;      // pre-convert /255 floats in the workers
};

class Loader {
 public:
  Loader(std::vector<std::string> images, std::vector<std::string> masks,
         const Config& cfg)
      : images_(std::move(images)), masks_(std::move(masks)), cfg_(cfg) {
    for (int t = 0; t < cfg_.threads; ++t)
      workers_.emplace_back([this, t] { Work(t); });
  }

  ~Loader() { Stop(); }

  void Stop() {
    {
      std::lock_guard<std::mutex> lock(mu_);
      stop_ = true;
    }
    cv_space_.notify_all();
    cv_data_.notify_all();
    for (auto& th : workers_)
      if (th.joinable()) th.join();
    workers_.clear();
  }

  // Fill image_out [B, crop, crop, channels] (f32 normalized /255 OR raw
  // uint8 staging bytes — 4x less host→device transfer; normalize on
  // device) and mask_out [B, crop, crop, 1] u8 (may be null for image-only
  // datasets).
  int NextBatch(float* image_f32, uint8_t* image_u8, uint8_t* mask_out) {
    const size_t img_elems = size_t(cfg_.crop) * cfg_.crop * cfg_.channels;
    const size_t mask_elems = size_t(cfg_.crop) * cfg_.crop;
    constexpr float kInv255 = 1.0f / 255.0f;
    for (int b = 0; b < cfg_.batch_size;) {
      Sample s;
      {
        std::unique_lock<std::mutex> lock(mu_);
        cv_data_.wait(lock, [this] {
          return stop_ || ready_.count(next_serve_) > 0;
        });
        if (stop_) return -1;
        s = std::move(ready_[next_serve_]);
        ready_.erase(next_serve_);
        ++next_serve_;
      }
      cv_space_.notify_all();
      if (!s.ok) {  // decode-failure sentinel: skip, keep order
        // If a full epoch of consecutive samples is sentinels, every image
        // is undecodable/undersized — error out instead of spinning forever.
        if (++consecutive_failures_ >= images_.size()) return -3;
        continue;
      }
      consecutive_failures_ = 0;
      if (image_u8) {
        memcpy(image_u8 + size_t(b) * img_elems, s.image.data(), img_elems);
      } else if (image_f32) {
        float* dst = image_f32 + size_t(b) * img_elems;
        if (!s.imagef.empty()) {  // worker pre-converted (want_f32 path)
          memcpy(dst, s.imagef.data(), img_elems * sizeof(float));
        } else {  // uint8-configured loader asked for f32: convert here
          const uint8_t* srcp = s.image.data();
          for (size_t k = 0; k < img_elems; ++k) dst[k] = srcp[k] * kInv255;
        }
      }
      if (mask_out && !masks_.empty())
        memcpy(mask_out + size_t(b) * mask_elems, s.mask.data(), mask_elems);
      ++b;
    }
    return 0;
  }

 private:
  size_t PairAt(uint64_t global_idx) {
    const size_t n = images_.size();
    const uint64_t epoch = global_idx / n;
    const size_t i = global_idx % n;
    std::lock_guard<std::mutex> lock(perm_mu_);
    if (perm_epoch_ != int64_t(epoch)) {
      perm_.resize(n);
      for (size_t k = 0; k < n; ++k) perm_[k] = k;
      std::mt19937_64 rng(cfg_.seed + epoch);
      std::shuffle(perm_.begin(), perm_.end(), rng);
      perm_epoch_ = epoch;
    }
    return perm_[i];
  }

  Sample Produce(uint64_t idx) {
    Sample s;
    const size_t j = PairAt(idx);
    Image img, mask;
    if (!DecodeAny(images_[j], cfg_.channels, &img)) return s;
    const bool has_mask = !masks_.empty();
    if (has_mask && !DecodePng(masks_[j], 1, &mask) &&
        !DecodeAny(masks_[j], 1, &mask))
      return s;
    if (has_mask && (mask.h != img.h || mask.w != img.w)) return s;

    const int crop = cfg_.crop;
    if (img.h < crop || img.w < crop) return s;  // undersized: skip

    std::mt19937_64 rng(cfg_.seed * 0x9E3779B97F4A7C15ULL + idx);
    const int y = int(rng() % uint64_t(img.h - crop + 1));
    const int x = int(rng() % uint64_t(img.w - crop + 1));
    const bool flip = cfg_.flip && (rng() & 1);

    const int C = cfg_.channels;
    s.image.resize(size_t(crop) * crop * C);
    if (has_mask) s.mask.resize(size_t(crop) * crop);
    for (int r = 0; r < crop; ++r) {
      const uint8_t* src =
          img.data.data() + (size_t(y + r) * img.w + x) * C;
      uint8_t* dst = s.image.data() + size_t(r) * crop * C;
      if (!flip) {
        memcpy(dst, src, size_t(crop) * C);
      } else {
        for (int col = 0; col < crop; ++col)
          for (int ch = 0; ch < C; ++ch)
            dst[size_t(col) * C + ch] = src[size_t(crop - 1 - col) * C + ch];
      }
      if (has_mask) {
        const uint8_t* msrc = mask.data.data() + size_t(y + r) * mask.w + x;
        uint8_t* mdst = s.mask.data() + size_t(r) * crop;
        if (!flip) {
          memcpy(mdst, msrc, crop);
        } else {
          for (int col = 0; col < crop; ++col) mdst[col] = msrc[crop - 1 - col];
        }
      }
    }
    if (cfg_.want_f32) {  // parallel /255 in the worker (ADR: the consumer
      // thread is the serial bottleneck on multi-core hosts)
      constexpr float kInv = 1.0f / 255.0f;
      s.imagef.resize(s.image.size());
      for (size_t k = 0; k < s.image.size(); ++k)
        s.imagef[k] = s.image[k] * kInv;
    }
    s.ok = true;
    return s;
  }

  void Work(int worker_id) {
    (void)worker_id;
    while (true) {
      uint64_t idx;
      {
        std::unique_lock<std::mutex> lock(mu_);
        cv_space_.wait(lock, [this] {
          return stop_ ||
                 next_claim_ < next_serve_ + uint64_t(cfg_.capacity);
        });
        if (stop_) return;
        idx = next_claim_++;
      }
      Sample s = Produce(idx);
      {
        std::lock_guard<std::mutex> lock(mu_);
        if (stop_) return;
        ready_[idx] = std::move(s);
      }
      cv_data_.notify_all();
    }
  }

  std::vector<std::string> images_, masks_;
  Config cfg_;
  std::vector<std::thread> workers_;

  std::mutex mu_;
  std::condition_variable cv_data_, cv_space_;
  bool stop_ = false;
  uint64_t next_claim_ = 0;   // next sample index a worker will decode
  uint64_t next_serve_ = 0;   // next sample index the consumer will emit
  uint64_t consecutive_failures_ = 0;  // sentinel streak (consumer thread)
  std::map<uint64_t, Sample> ready_;

  std::mutex perm_mu_;
  std::vector<size_t> perm_;
  int64_t perm_epoch_ = -1;
};

}  // namespace

extern "C" {

int sdl_version() { return kVersion; }

// paths are '\n'-joined; mask_paths may be null/empty for image-only.
void* sdl_create(const char* image_paths, const char* mask_paths,
                 int batch_size, int crop, int threads, uint64_t seed,
                 int capacity, int flip, int channels, int want_f32) {
  auto split = [](const char* joined) {
    std::vector<std::string> out;
    if (!joined || !*joined) return out;
    const char* p = joined;
    while (*p) {
      const char* nl = strchr(p, '\n');
      if (!nl) {
        out.emplace_back(p);
        break;
      }
      out.emplace_back(p, nl - p);
      p = nl + 1;
    }
    return out;
  };
  auto images = split(image_paths);
  auto masks = split(mask_paths);
  if (images.empty()) return nullptr;
  if (!masks.empty() && masks.size() != images.size()) return nullptr;
  Config cfg;
  cfg.batch_size = batch_size;
  cfg.crop = crop;
  cfg.threads = threads > 0 ? threads : 1;
  cfg.seed = seed;
  cfg.capacity = capacity > 2 * batch_size ? capacity : 2 * batch_size;
  cfg.flip = flip;
  cfg.channels = channels;
  cfg.want_f32 = want_f32;
  return new Loader(std::move(images), std::move(masks), cfg);
}

int sdl_next_batch(void* handle, float* image_out, uint8_t* mask_out) {
  if (!handle) return -2;
  return static_cast<Loader*>(handle)->NextBatch(image_out, nullptr,
                                                 mask_out);
}

// uint8 staging variant: raw cropped bytes, /255 happens on device (4x less
// host→device transfer than the f32 batch).
int sdl_next_batch_u8(void* handle, uint8_t* image_out, uint8_t* mask_out) {
  if (!handle) return -2;
  return static_cast<Loader*>(handle)->NextBatch(nullptr, image_out,
                                                 mask_out);
}

void sdl_stop(void* handle) {
  if (handle) static_cast<Loader*>(handle)->Stop();
}

void sdl_destroy(void* handle) { delete static_cast<Loader*>(handle); }

}  // extern "C"

// Native WAV codec for vv_dsp_tpu.io — the data-loader role the reference
// fills with src/audio/wav.c (RIFF chunk scan, PCM 16/24/32 + float32,
// planar<->interleaved conversion, thread-local error string). Re-designed
// from the format spec, not translated: one mmap-free streaming pass,
// decode-to-float32-planar (the (channels, time) layout every op in the
// framework consumes), C ABI for ctypes.
//
// Build: g++ -O3 -shared -fPIC -o libvvdspwav.so wavio.cpp -lpthread
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

thread_local std::string g_error;

void set_error(const std::string &msg) { g_error = msg; }

struct Reader {
  FILE *f = nullptr;
  ~Reader() {
    if (f) fclose(f);
  }
  bool open(const char *path) {
    f = fopen(path, "rb");
    if (!f) set_error(std::string("cannot open: ") + path);
    return f != nullptr;
  }
  bool read(void *dst, size_t n) {
    if (fread(dst, 1, n, f) != n) {
      set_error("unexpected end of file");
      return false;
    }
    return true;
  }
  bool skip(long n) { return fseek(f, n, SEEK_CUR) == 0; }
};

uint32_t rd_u32(const uint8_t *p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}
uint16_t rd_u16(const uint8_t *p) {
  return (uint16_t)p[0] | ((uint16_t)p[1] << 8);
}

struct Fmt {
  uint16_t format = 0;  // 1 = PCM, 3 = IEEE float
  uint16_t channels = 0;
  uint32_t sample_rate = 0;
  uint16_t bits = 0;
};

// Scan RIFF chunks for fmt/data. On success positions the stream at the
// start of the data payload and sets *data_bytes.
bool parse_header(Reader &r, Fmt *fmt, uint64_t *data_bytes) {
  uint8_t hdr[12];
  if (!r.read(hdr, 12)) return false;
  if (memcmp(hdr, "RIFF", 4) != 0 || memcmp(hdr + 8, "WAVE", 4) != 0) {
    set_error("not a RIFF/WAVE file");
    return false;
  }
  bool have_fmt = false;
  for (;;) {
    uint8_t ch[8];
    if (fread(ch, 1, 8, r.f) != 8) {
      set_error("no data chunk found");
      return false;
    }
    uint32_t size = rd_u32(ch + 4);
    if (memcmp(ch, "fmt ", 4) == 0) {
      if (size < 16) {
        set_error("fmt chunk too small");
        return false;
      }
      uint8_t buf[16];
      if (!r.read(buf, 16)) return false;
      fmt->format = rd_u16(buf);
      fmt->channels = rd_u16(buf + 2);
      fmt->sample_rate = rd_u32(buf + 4);
      fmt->bits = rd_u16(buf + 14);
      if (fmt->format == 0xFFFE && size >= 40) {  // WAVE_FORMAT_EXTENSIBLE
        uint8_t ext[24];
        if (!r.read(ext, 24)) return false;
        fmt->format = rd_u16(ext + 8);  // sub-format GUID's first 2 bytes
        if (!r.skip((long)size - 40)) return false;
      } else if (!r.skip((long)size - 16)) {
        return false;
      }
      if (size & 1) r.skip(1);
      have_fmt = true;
    } else if (memcmp(ch, "data", 4) == 0) {
      if (!have_fmt) {
        set_error("data chunk before fmt chunk");
        return false;
      }
      *data_bytes = size;
      return true;
    } else {
      if (!r.skip((long)size + (size & 1))) {
        set_error("truncated chunk");
        return false;
      }
    }
  }
}

bool supported(const Fmt &f) {
  if (f.channels == 0 || f.sample_rate == 0) {
    set_error("bad fmt fields");
    return false;
  }
  if (f.channels > 1024) {  // implausible header: refuse before allocating
    set_error("unsupported channel count: " + std::to_string(f.channels));
    return false;
  }
  if (f.format == 1 && (f.bits == 16 || f.bits == 24 || f.bits == 32))
    return true;
  if (f.format == 3 && f.bits == 32) return true;
  set_error("unsupported format: tag=" + std::to_string(f.format) +
            " bits=" + std::to_string(f.bits));
  return false;
}

// Decode one file to float32 planar rows of `out` (row stride `stride`
// floats). Stores at most `cap_ch` channels (extra file channels are decoded
// and dropped) and at most `max_frames` frames. With `strict_ch`, a file
// whose channel count differs from cap_ch is an error — the single-file API
// uses this so a file that grew channels between vv_wav_info and the read
// can never write past the caller's (channels, frames) buffer. Returns
// frames decoded or -1 (g_error set).
int64_t decode_planar(const char *path, float *out, uint64_t stride,
                      uint64_t max_frames, uint32_t cap_ch, bool strict_ch,
                      uint32_t *rate_out) {
  Reader r;
  if (!r.open(path)) return -1;
  Fmt fmt;
  uint64_t data_bytes = 0;
  if (!parse_header(r, &fmt, &data_bytes)) return -1;
  if (!supported(fmt)) return -1;
  const uint32_t ch = fmt.channels;
  if (strict_ch && ch != cap_ch) {
    set_error("channel count changed: expected " + std::to_string(cap_ch) +
              ", file has " + std::to_string(ch));
    return -1;
  }
  const uint32_t store_ch = ch < cap_ch ? ch : cap_ch;
  const uint32_t bytes_per = fmt.bits / 8;
  uint64_t frames = data_bytes / (ch * bytes_per);
  if (frames > max_frames) frames = max_frames;
  if (rate_out) *rate_out = fmt.sample_rate;

  const size_t CHUNK = 65536;  // frames per read
  std::vector<uint8_t> buf(CHUNK * ch * bytes_per);
  uint64_t done = 0;
  while (done < frames) {
    size_t todo = (size_t)((frames - done < CHUNK) ? frames - done : CHUNK);
    if (!r.read(buf.data(), todo * ch * bytes_per)) return -1;
    const uint8_t *p = buf.data();
    if (fmt.format == 3) {  // float32
      for (size_t i = 0; i < todo; ++i)
        for (uint32_t c = 0; c < ch; ++c, p += 4)
          if (c < store_ch) {
            float v;
            memcpy(&v, p, 4);
            out[(uint64_t)c * stride + done + i] = v;
          }
    } else if (fmt.bits == 16) {
      const float s = 1.0f / 32768.0f;
      for (size_t i = 0; i < todo; ++i)
        for (uint32_t c = 0; c < ch; ++c, p += 2)
          if (c < store_ch) {
            int16_t v = (int16_t)rd_u16(p);
            out[(uint64_t)c * stride + done + i] = v * s;
          }
    } else if (fmt.bits == 24) {
      const float s = 1.0f / 8388608.0f;
      for (size_t i = 0; i < todo; ++i)
        for (uint32_t c = 0; c < ch; ++c, p += 3)
          if (c < store_ch) {
            int32_t v = ((int32_t)p[0] << 8 | (int32_t)p[1] << 16 |
                         (int32_t)p[2] << 24) >> 8;
            out[(uint64_t)c * stride + done + i] = v * s;
          }
    } else {  // 32-bit PCM
      const float s = 1.0f / 2147483648.0f;
      for (size_t i = 0; i < todo; ++i)
        for (uint32_t c = 0; c < ch; ++c, p += 4)
          if (c < store_ch) {
            int32_t v = (int32_t)rd_u32(p);
            out[(uint64_t)c * stride + done + i] = v * s;
          }
    }
    done += todo;
  }
  return (int64_t)done;
}

}  // namespace

extern "C" {

typedef struct {
  uint32_t sample_rate;
  uint32_t channels;
  uint32_t bits;
  uint32_t format;  // 1 = PCM int, 3 = float
  uint64_t frames;
} vv_wav_info_t;

const char *vv_wav_error_string() { return g_error.c_str(); }

int vv_wav_info(const char *path, vv_wav_info_t *out) try {
  Reader r;
  if (!r.open(path)) return -1;
  Fmt fmt;
  uint64_t data_bytes = 0;
  if (!parse_header(r, &fmt, &data_bytes)) return -1;
  if (!supported(fmt)) return -1;
  uint32_t frame_bytes = fmt.channels * (fmt.bits / 8);
  out->sample_rate = fmt.sample_rate;
  out->channels = fmt.channels;
  out->bits = fmt.bits;
  out->format = fmt.format;
  out->frames = data_bytes / frame_bytes;
  return 0;
} catch (const std::exception &e) {
  // never let an exception cross the C ABI into ctypes (it would abort)
  set_error(std::string("internal error: ") + e.what());
  return -1;
}

// Decode the whole file to float32 PLANAR (expect_channels x max_frames,
// row-major), normalizing ints to [-1, 1) by 1/2^(bits-1). `out` must hold
// expect_channels*max_frames floats; max_frames is BOTH the capacity and the
// planar stride (the caller's vv_wav_info view of the file) — decoding stops
// at max_frames even if the file grew, and a changed channel count is an
// error, so the layout can never scramble or overflow. Returns the number
// of frames decoded, or -1 on error.
int64_t vv_wav_read_f32(const char *path, float *out, uint64_t max_frames,
                        uint32_t expect_channels) try {
  return decode_planar(path, out, /*stride=*/max_frames, max_frames,
                       expect_channels, /*strict_ch=*/true, nullptr);
} catch (const std::exception &e) {
  set_error(std::string("internal error: ") + e.what());
  return -1;
}

// Batch decode: n_files WAVs into one float32 (n_files, channels,
// capacity_frames) planar tensor (row-major), fanned out over a thread pool
// — the framework's serving-ingest data loader. Per file i:
//   frames_out[i] = frames decoded (files longer than the capacity are
//   truncated, shorter ones zero-padded), or -1 on a decode error (the
//   other files still decode; the first error message is kept for
//   vv_wav_error_string). rates_out[i] = sample rate (0 on error).
// Files with fewer channels than `channels` leave the extra rows zeroed;
// extra file channels are dropped. Returns the number of failed files.
int vv_wav_read_batch_f32(const char **paths, int n_files, float *out,
                          uint64_t capacity_frames, uint32_t channels,
                          int64_t *frames_out, uint32_t *rates_out,
                          int n_threads) try {
  if (n_files <= 0 || capacity_frames == 0 || channels == 0) {
    set_error("bad batch geometry");
    return n_files > 0 ? n_files : -1;
  }
  const uint64_t slab = (uint64_t)channels * capacity_frames;
  memset(out, 0, (uint64_t)n_files * slab * sizeof(float));

  unsigned hw = std::thread::hardware_concurrency();
  if (hw == 0) hw = 4;
  int workers = n_threads > 0 ? n_threads : (int)hw;
  if (workers > n_files) workers = n_files;

  std::atomic<int> next(0), failed(0);
  std::mutex err_mu;
  std::string first_err;
  auto work = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n_files) return;
      uint32_t rate = 0;
      int64_t frames = -1;
      try {
        frames = decode_planar(paths[i], out + (uint64_t)i * slab,
                               capacity_frames, capacity_frames, channels,
                               /*strict_ch=*/false, &rate);
      } catch (const std::exception &e) {
        set_error(std::string("internal error: ") + e.what());
      }
      if (frames < 0) {
        failed.fetch_add(1);
        std::lock_guard<std::mutex> lk(err_mu);
        if (first_err.empty())
          first_err = std::string(paths[i]) + ": " + g_error;
      }
      frames_out[i] = frames;
      rates_out[i] = frames < 0 ? 0 : rate;
    }
  };
  if (workers <= 1) {
    work();
  } else {
    std::vector<std::thread> pool;
    pool.reserve(workers);
    for (int t = 0; t < workers; ++t) pool.emplace_back(work);
    for (auto &th : pool) th.join();
  }
  if (!first_err.empty()) set_error(first_err);  // surface on caller thread
  return failed.load();
} catch (const std::exception &e) {
  set_error(std::string("internal error: ") + e.what());
  return -1;
}

// Encode float32 planar (channels x frames) to a WAV file.
// format: 16/24/32 = PCM bit depth, 0 = float32. Values are clipped to the
// representable range for int formats.
int vv_wav_write(const char *path, const float *planar, uint32_t channels,
                 uint64_t frames, uint32_t sample_rate, int format) try {
  uint32_t bits = format == 0 ? 32 : (uint32_t)format;
  uint16_t tag = format == 0 ? 3 : 1;
  if (tag == 1 && bits != 16 && bits != 24 && bits != 32) {
    set_error("format must be 0 (float), 16, 24 or 32");
    return -1;
  }
  FILE *f = fopen(path, "wb");
  if (!f) {
    set_error(std::string("cannot create: ") + path);
    return -1;
  }
  uint32_t frame_bytes = channels * bits / 8;
  uint64_t data_bytes = frames * frame_bytes;
  uint32_t pad = (uint32_t)(data_bytes & 1);  // RIFF word alignment
  uint32_t riff = (uint32_t)(36 + data_bytes + pad);
  uint8_t hdr[44];
  memcpy(hdr, "RIFF", 4);
  memcpy(hdr + 8, "WAVEfmt ", 8);
  uint32_t u;
  uint16_t h;
  memcpy(hdr + 4, &riff, 4);
  u = 16;
  memcpy(hdr + 16, &u, 4);
  h = tag;
  memcpy(hdr + 20, &h, 2);
  h = (uint16_t)channels;
  memcpy(hdr + 22, &h, 2);
  memcpy(hdr + 24, &sample_rate, 4);
  u = sample_rate * frame_bytes;
  memcpy(hdr + 28, &u, 4);
  h = (uint16_t)frame_bytes;
  memcpy(hdr + 32, &h, 2);
  h = (uint16_t)bits;
  memcpy(hdr + 34, &h, 2);
  memcpy(hdr + 36, "data", 4);
  u = (uint32_t)data_bytes;
  memcpy(hdr + 40, &u, 4);
  if (fwrite(hdr, 1, 44, f) != 44) {
    set_error("write failed");
    fclose(f);
    return -1;
  }

  const size_t CHUNK = 65536;
  std::vector<uint8_t> buf(CHUNK * frame_bytes);
  uint64_t done = 0;
  while (done < frames) {
    size_t todo = (size_t)((frames - done < CHUNK) ? frames - done : CHUNK);
    uint8_t *p = buf.data();
    for (size_t i = 0; i < todo; ++i)
      for (uint32_t c = 0; c < channels; ++c) {
        float v = planar[(uint64_t)c * frames + done + i];
        if (tag == 3) {
          memcpy(p, &v, 4);
          p += 4;
        } else {
          double scaled = (double)v * (double)(1u << (bits - 1));
          double lim = (double)(1u << (bits - 1));
          if (scaled > lim - 1) scaled = lim - 1;
          if (scaled < -lim) scaled = -lim;
          int32_t q = (int32_t)llrint(scaled);
          if (bits == 16) {
            p[0] = (uint8_t)(q & 0xFF);
            p[1] = (uint8_t)((q >> 8) & 0xFF);
            p += 2;
          } else if (bits == 24) {
            p[0] = (uint8_t)(q & 0xFF);
            p[1] = (uint8_t)((q >> 8) & 0xFF);
            p[2] = (uint8_t)((q >> 16) & 0xFF);
            p += 3;
          } else {
            memcpy(p, &q, 4);
            p += 4;
          }
        }
      }
    if (fwrite(buf.data(), 1, todo * frame_bytes, f) != todo * frame_bytes) {
      set_error("write failed");
      fclose(f);
      return -1;
    }
    done += todo;
  }
  if (pad) fputc(0, f);
  fclose(f);
  return 0;
} catch (const std::exception &e) {
  set_error(std::string("internal error: ") + e.what());
  return -1;
}

}  // extern "C"

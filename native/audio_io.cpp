// Native audio I/O engine for the MUSDB data pipeline.
//
// The reference's hot disk path is soundfile's seek/partial-read used for
// loudness-aware random chunk sampling (data/mss_dataset.py:430-460).  This
// module provides the TPU-framework equivalent: a small, dependency-free
// RIFF/WAVE reader-writer with sample-accurate segment reads, released from
// the GIL via ctypes, so DataLoader threads scale on the host while the TPU
// computes.
//
// Supported: PCM 16/24/32-bit and IEEE float32/float64, mono or multi-
// channel, plus WAVE_FORMAT_EXTENSIBLE wrappers.  All reads convert to
// float32 in [-1, 1] (matching soundfile's 'float32' subtype conversion).
//
// Build: g++ -O3 -shared -fPIC -o libaudio_io.so audio_io.cpp

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>

namespace {

struct WavInfo {
  int64_t data_offset = -1;   // byte offset of sample data
  int64_t data_bytes = 0;
  int32_t sample_rate = 0;
  int32_t channels = 0;
  int32_t bits = 0;
  int32_t format = 0;         // 1 = PCM, 3 = IEEE float
};

bool read_header(FILE* f, WavInfo* info) {
  char tag[4];
  uint32_t sz;
  if (std::fread(tag, 1, 4, f) != 4 || std::memcmp(tag, "RIFF", 4) != 0) return false;
  if (std::fread(&sz, 4, 1, f) != 1) return false;
  if (std::fread(tag, 1, 4, f) != 4 || std::memcmp(tag, "WAVE", 4) != 0) return false;

  while (std::fread(tag, 1, 4, f) == 4 && std::fread(&sz, 4, 1, f) == 1) {
    if (std::memcmp(tag, "fmt ", 4) == 0) {
      unsigned char buf[40];
      uint32_t take = sz < sizeof(buf) ? sz : (uint32_t)sizeof(buf);
      if (std::fread(buf, 1, take, f) != take) return false;
      if (sz > take && std::fseek(f, sz - take, SEEK_CUR) != 0) return false;
      uint16_t fmt = buf[0] | (buf[1] << 8);
      info->channels = buf[2] | (buf[3] << 8);
      info->sample_rate = buf[4] | (buf[5] << 8) | (buf[6] << 16) | ((uint32_t)buf[7] << 24);
      info->bits = buf[14] | (buf[15] << 8);
      if (fmt == 0xFFFE && sz >= 40) {  // EXTENSIBLE: sub-format GUID's first 2 bytes
        fmt = buf[24] | (buf[25] << 8);
      }
      info->format = fmt;
    } else if (std::memcmp(tag, "data", 4) == 0) {
      info->data_offset = std::ftell(f);
      info->data_bytes = sz;
      // keep scanning is unnecessary; fmt normally precedes data
      if (info->sample_rate) break;
      if (std::fseek(f, sz + (sz & 1), SEEK_CUR) != 0) return false;
    } else {
      if (std::fseek(f, sz + (sz & 1), SEEK_CUR) != 0) return false;
    }
  }
  return info->data_offset >= 0 && info->sample_rate > 0 && info->channels > 0 &&
         (info->format == 1 || info->format == 3) &&
         (info->bits == 16 || info->bits == 24 || info->bits == 32 || info->bits == 64);
}

inline float cvt16(const unsigned char* p) {
  int16_t v = (int16_t)(p[0] | (p[1] << 8));
  return (float)v / 32768.0f;
}
inline float cvt24(const unsigned char* p) {
  int32_t v = (p[0] << 8) | (p[1] << 16) | ((int32_t)p[2] << 24);
  return (float)(v >> 8) / 8388608.0f;
}
inline float cvt32i(const unsigned char* p) {
  int32_t v;
  std::memcpy(&v, p, 4);
  return (float)((double)v / 2147483648.0);
}
inline float cvt32f(const unsigned char* p) {
  float v;
  std::memcpy(&v, p, 4);
  return v;
}
inline float cvt64f(const unsigned char* p) {
  double v;
  std::memcpy(&v, p, 8);
  return (float)v;
}

}  // namespace

extern "C" {

// Returns 0 on success.
int wav_info(const char* path, int64_t* frames, int32_t* sample_rate,
             int32_t* channels, int32_t* bits, int32_t* format) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  bool ok = read_header(f, &info);
  std::fclose(f);
  if (!ok) return -2;
  int bytes_per = info.bits / 8;
  *frames = info.data_bytes / (bytes_per * info.channels);
  *sample_rate = info.sample_rate;
  *channels = info.channels;
  *bits = info.bits;
  *format = info.format;
  return 0;
}

// Read num_frames frames starting at start_frame into out [num_frames*channels]
// (interleaved float32).  Frames beyond EOF are zero-filled.  Returns the
// number of frames actually read from disk, or negative on error.
int64_t wav_read(const char* path, int64_t start_frame, int64_t num_frames,
                 float* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  if (!read_header(f, &info)) { std::fclose(f); return -2; }
  const int bytes_per = info.bits / 8;
  const int frame_bytes = bytes_per * info.channels;
  const int64_t total_frames = info.data_bytes / frame_bytes;

  int64_t n = num_frames;
  std::memset(out, 0, sizeof(float) * num_frames * info.channels);
  if (start_frame >= total_frames) { std::fclose(f); return 0; }
  if (start_frame + n > total_frames) n = total_frames - start_frame;

  if (std::fseek(f, info.data_offset + start_frame * frame_bytes, SEEK_SET) != 0) {
    std::fclose(f);
    return -3;
  }
  const int64_t want = n * frame_bytes;
  unsigned char* buf = (unsigned char*)std::malloc(want);
  if (!buf) { std::fclose(f); return -4; }
  int64_t got = (int64_t)std::fread(buf, 1, want, f);
  std::fclose(f);
  int64_t got_frames = got / frame_bytes;

  const int64_t samples = got_frames * info.channels;
  if (info.format == 3 && info.bits == 32) {
    for (int64_t i = 0; i < samples; i++) out[i] = cvt32f(buf + i * 4);
  } else if (info.format == 3 && info.bits == 64) {
    for (int64_t i = 0; i < samples; i++) out[i] = cvt64f(buf + i * 8);
  } else if (info.bits == 16) {
    for (int64_t i = 0; i < samples; i++) out[i] = cvt16(buf + i * 2);
  } else if (info.bits == 24) {
    for (int64_t i = 0; i < samples; i++) out[i] = cvt24(buf + i * 3);
  } else if (info.bits == 32) {
    for (int64_t i = 0; i < samples; i++) out[i] = cvt32i(buf + i * 4);
  } else {
    std::free(buf);
    return -5;
  }
  std::free(buf);
  return got_frames;
}

// Write interleaved float32 data as 16-bit PCM (bits=16) or float32 (bits=32).
int wav_write(const char* path, const float* data, int64_t frames,
              int32_t channels, int32_t sample_rate, int32_t bits) {
  if (bits != 16 && bits != 32) return -5;
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  const int bytes_per = bits / 8;
  const int64_t data_bytes = frames * channels * bytes_per;
  const uint16_t fmt = (bits == 32) ? 3 : 1;
  const uint32_t byte_rate = sample_rate * channels * bytes_per;
  const uint16_t block_align = channels * bytes_per;

  unsigned char hdr[44];
  std::memcpy(hdr, "RIFF", 4);
  uint32_t riff_sz = (uint32_t)(36 + data_bytes);
  std::memcpy(hdr + 4, &riff_sz, 4);
  std::memcpy(hdr + 8, "WAVEfmt ", 8);
  uint32_t fmt_sz = 16;
  std::memcpy(hdr + 16, &fmt_sz, 4);
  std::memcpy(hdr + 20, &fmt, 2);
  uint16_t ch16 = (uint16_t)channels;
  std::memcpy(hdr + 22, &ch16, 2);
  std::memcpy(hdr + 24, &sample_rate, 4);
  std::memcpy(hdr + 28, &byte_rate, 4);
  std::memcpy(hdr + 32, &block_align, 2);
  uint16_t bits16 = (uint16_t)bits;
  std::memcpy(hdr + 34, &bits16, 2);
  std::memcpy(hdr + 36, "data", 4);
  uint32_t dsz = (uint32_t)data_bytes;
  std::memcpy(hdr + 40, &dsz, 4);
  if (std::fwrite(hdr, 1, 44, f) != 44) { std::fclose(f); return -2; }

  const int64_t samples = frames * channels;
  int rc = 0;
  if (bits == 32) {
    if ((int64_t)std::fwrite(data, 4, samples, f) != samples) rc = -3;
  } else {
    const int64_t CH = 1 << 16;
    int16_t* buf = (int16_t*)std::malloc(sizeof(int16_t) * (samples < CH ? samples : CH));
    if (!buf) { std::fclose(f); return -4; }
    for (int64_t off = 0; off < samples && rc == 0; off += CH) {
      int64_t nthis = samples - off < CH ? samples - off : CH;
      for (int64_t i = 0; i < nthis; i++) {
        float v = data[off + i];
        if (v > 1.0f) v = 1.0f;
        if (v < -1.0f) v = -1.0f;
        buf[i] = (int16_t)lrintf(v * 32767.0f);
      }
      if ((int64_t)std::fwrite(buf, 2, nthis, f) != nthis) rc = -3;
    }
    std::free(buf);
  }
  std::fclose(f);
  return rc;
}

// Streaming loudness scan for chunk-index building: one pass over the file
// computing the mean |sample| (over frames AND channels) of every chunk
// window [i*hop, i*hop + chunk).  Windows are zero-padded past EOF (the
// mean always divides by chunk*channels), matching the padded chunks the
// python loader produces for short tracks.  Replaces per-chunk re-reads of
// 50%-overlapped windows (the whole corpus read ~2x per stem) with a single
// sequential read.  Returns the number of chunks written, negative on error.
int64_t wav_scan_meanabs(const char* path, int64_t chunk_frames,
                         int64_t hop_frames, double* out,
                         int64_t max_chunks) {
  if (chunk_frames <= 0 || hop_frames <= 0 || max_chunks <= 0) return -6;
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  if (!read_header(f, &info)) { std::fclose(f); return -2; }
  const int bytes_per = info.bits / 8;
  const int frame_bytes = bytes_per * info.channels;
  const int64_t total = info.data_bytes / frame_bytes;
  if (std::fseek(f, info.data_offset, SEEK_SET) != 0) { std::fclose(f); return -3; }

  int64_t n_chunks = total <= chunk_frames
      ? 1 : 1 + (total - chunk_frames) / hop_frames;
  if (n_chunks > max_chunks) n_chunks = max_chunks;

  // prefix[i] = sum of |x| over frames [0, i) across channels
  double* prefix = (double*)std::malloc(sizeof(double) * (total + 1));
  if (!prefix) { std::fclose(f); return -4; }
  prefix[0] = 0.0;

  const int64_t BLK = 1 << 16;  // frames per read
  unsigned char* buf = (unsigned char*)std::malloc(BLK * frame_bytes);
  if (!buf) { std::free(prefix); std::fclose(f); return -4; }
  int64_t frame = 0;
  bool bad_fmt = false;
  while (frame < total) {
    int64_t nthis = total - frame < BLK ? total - frame : BLK;
    int64_t got = (int64_t)std::fread(buf, frame_bytes, nthis, f) ;
    if (got <= 0) break;
    for (int64_t i = 0; i < got; i++) {
      double s = 0.0;
      const unsigned char* p = buf + i * frame_bytes;
      for (int c = 0; c < info.channels; c++, p += bytes_per) {
        float v;
        if (info.format == 3 && info.bits == 32) v = cvt32f(p);
        else if (info.format == 3 && info.bits == 64) v = cvt64f(p);
        else if (info.bits == 16) v = cvt16(p);
        else if (info.bits == 24) v = cvt24(p);
        else if (info.bits == 32) v = cvt32i(p);
        else { bad_fmt = true; v = 0.0f; }
        s += v < 0 ? -(double)v : (double)v;
      }
      prefix[frame + i + 1] = prefix[frame + i] + s;
    }
    frame += got;
  }
  std::fclose(f);
  if (bad_fmt) { std::free(prefix); std::free(buf); return -5; }
  for (int64_t i = frame; i < total; i++) prefix[i + 1] = prefix[i];

  const double denom = (double)chunk_frames * info.channels;
  for (int64_t i = 0; i < n_chunks; i++) {
    int64_t a = i * hop_frames;
    int64_t b = a + chunk_frames;
    if (a > total) a = total;
    if (b > total) b = total;
    out[i] = (prefix[b] - prefix[a]) / denom;
  }
  std::free(prefix);
  std::free(buf);
  return n_chunks;
}

}  // extern "C"

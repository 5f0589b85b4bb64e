// Native FLAC decoder for the MUSDB data pipeline.
//
// The reference reads FLAC trees through soundfile (data/mss_dataset.py:
// 430-460; FILE_TYPES includes ".flac").  soundfile is not available here,
// so this is a dependency-free decoder of the FLAC bitstream subset that
// real encoders emit: constant / verbatim / fixed(0-4) / LPC(1-32)
// subframes, Rice residual methods 0 and 1 with escape partitions, all four
// channel assignments (independent, left-side, right-side, mid-side),
// 8/16/24/32-bit samples, fixed or variable blocksize streams.
//
// Partial reads (the loudness-sampling hot path) use a per-file frame index
// (sample offset -> byte offset) built lazily on the first read by one full
// sequential pass; afterwards any chunk read decodes only the frames that
// overlap the requested window.  The index cache is shared across the
// loader's worker threads under a mutex.
//
// Exported C ABI (mirrors the wav_* functions in audio_io.cpp):
//   flac_info(path, *frames, *sr, *channels, *bits) -> 0 | negative error
//   flac_read(path, start, frames, float* out)      -> frames read | negative
//
// Build: compiled into libaudio_io.so together with audio_io.cpp.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <mutex>
#include <string>
#include <vector>

namespace flac {

// ------------------------------------------------------------- bit reader

class BitReader {
 public:
  explicit BitReader(FILE* f) : f_(f) {}

  bool read_bits(int n, uint64_t* out) {
    uint64_t v = 0;
    while (n > 0) {
      if (nbits_ == 0) {
        int c = std::fgetc(f_);
        if (c == EOF) return false;
        cur_ = (uint8_t)c;
        nbits_ = 8;
        ++bytepos_;
      }
      int take = n < nbits_ ? n : nbits_;
      v = (v << take) | ((cur_ >> (nbits_ - take)) & ((1u << take) - 1));
      nbits_ -= take;
      n -= take;
    }
    *out = v;
    return true;
  }

  bool read_signed(int n, int64_t* out) {
    uint64_t v;
    if (!read_bits(n, &v)) return false;
    // sign-extend
    if (n > 0 && (v >> (n - 1)) & 1) v |= ~((uint64_t)0) << n;
    *out = (int64_t)v;
    return true;
  }

  // unary-coded quotient: count zero bits until a 1
  bool read_unary(uint32_t* out) {
    uint32_t q = 0;
    for (;;) {
      if (nbits_ == 0) {
        int c = std::fgetc(f_);
        if (c == EOF) return false;
        cur_ = (uint8_t)c;
        nbits_ = 8;
        ++bytepos_;
      }
      // scan remaining bits in cur_
      while (nbits_ > 0) {
        if ((cur_ >> (nbits_ - 1)) & 1) {
          --nbits_;
          *out = q;
          return true;
        }
        --nbits_;
        ++q;
      }
    }
  }

  void align() { nbits_ = 0; }
  bool aligned() const { return nbits_ == 0; }
  int64_t byte_pos() const { return bytepos_; }

 private:
  FILE* f_;
  uint8_t cur_ = 0;
  int nbits_ = 0;
  int64_t bytepos_ = 0;  // bytes consumed from f_ since construction
};

// --------------------------------------------------------------- metadata

struct StreamInfo {
  uint32_t min_block = 0, max_block = 0;
  uint32_t sample_rate = 0;
  uint32_t channels = 0;
  uint32_t bits = 0;
  uint64_t total_samples = 0;
  int64_t first_frame_offset = 0;  // absolute byte offset of the first frame
};

bool read_streaminfo(FILE* f, StreamInfo* si) {
  char magic[4];
  if (std::fread(magic, 1, 4, f) != 4 || std::memcmp(magic, "fLaC", 4) != 0)
    return false;
  bool last = false;
  bool have_si = false;
  while (!last) {
    uint8_t hdr[4];
    if (std::fread(hdr, 1, 4, f) != 4) return false;
    last = hdr[0] & 0x80;
    int type = hdr[0] & 0x7f;
    uint32_t len = ((uint32_t)hdr[1] << 16) | ((uint32_t)hdr[2] << 8) | hdr[3];
    if (type == 0) {  // STREAMINFO
      if (len < 34) return false;
      uint8_t b[34];
      if (std::fread(b, 1, 34, f) != 34) return false;
      if (len > 34 && std::fseek(f, len - 34, SEEK_CUR) != 0) return false;
      si->min_block = ((uint32_t)b[0] << 8) | b[1];
      si->max_block = ((uint32_t)b[2] << 8) | b[3];
      si->sample_rate = ((uint32_t)b[10] << 12) | ((uint32_t)b[11] << 4) | (b[12] >> 4);
      si->channels = ((b[12] >> 1) & 0x7) + 1;
      si->bits = (((b[12] & 1) << 4) | (b[13] >> 4)) + 1;
      si->total_samples = ((uint64_t)(b[13] & 0x0f) << 32) | ((uint64_t)b[14] << 24) |
                          ((uint64_t)b[15] << 16) | ((uint64_t)b[16] << 8) | b[17];
      have_si = true;
    } else {
      if (std::fseek(f, len, SEEK_CUR) != 0) return false;
    }
  }
  si->first_frame_offset = std::ftell(f);
  return have_si && si->sample_rate > 0;
}

// ------------------------------------------------------------ frame header

struct FrameHeader {
  uint32_t block_size = 0;
  uint32_t channels = 0;
  int channel_assignment = 0;  // 0..7 independent, 8 L/S, 9 R/S, 10 M/S
  uint32_t bits = 0;           // 0 = from STREAMINFO
  uint64_t sample_number = 0;  // first sample of frame
};

// UTF-8-style coded number (FLAC frame numbering)
bool read_utf8_u64(BitReader* br, uint64_t* out) {
  uint64_t b0;
  if (!br->read_bits(8, &b0)) return false;
  int extra;
  uint64_t v;
  if ((b0 & 0x80) == 0) { v = b0; extra = 0; }
  else if ((b0 & 0xE0) == 0xC0) { v = b0 & 0x1F; extra = 1; }
  else if ((b0 & 0xF0) == 0xE0) { v = b0 & 0x0F; extra = 2; }
  else if ((b0 & 0xF8) == 0xF0) { v = b0 & 0x07; extra = 3; }
  else if ((b0 & 0xFC) == 0xF8) { v = b0 & 0x03; extra = 4; }
  else if ((b0 & 0xFE) == 0xFC) { v = b0 & 0x01; extra = 5; }
  else if (b0 == 0xFE) { v = 0; extra = 6; }
  else return false;
  for (int i = 0; i < extra; ++i) {
    uint64_t b;
    if (!br->read_bits(8, &b)) return false;
    if ((b & 0xC0) != 0x80) return false;
    v = (v << 6) | (b & 0x3F);
  }
  *out = v;
  return true;
}

bool read_frame_header(BitReader* br, const StreamInfo& si, FrameHeader* fh) {
  uint64_t sync;
  if (!br->read_bits(14, &sync)) return false;
  if (sync != 0x3FFE) return false;
  uint64_t reserved, blocking;
  if (!br->read_bits(1, &reserved) || !br->read_bits(1, &blocking)) return false;
  uint64_t bs_code, sr_code, ch_code, ss_code, reserved2;
  if (!br->read_bits(4, &bs_code) || !br->read_bits(4, &sr_code) ||
      !br->read_bits(4, &ch_code) || !br->read_bits(3, &ss_code) ||
      !br->read_bits(1, &reserved2))
    return false;

  uint64_t coded;
  if (!read_utf8_u64(br, &coded)) return false;
  // variable blocksize strategy codes the sample number directly; fixed
  // codes the frame number (x fixed blocksize)
  bool variable = blocking != 0;

  uint32_t block_size = 0;
  switch (bs_code) {
    case 1: block_size = 192; break;
    case 2: case 3: case 4: case 5:
      block_size = 576u << (bs_code - 2); break;
    case 6: { uint64_t v; if (!br->read_bits(8, &v)) return false;
              block_size = (uint32_t)v + 1; break; }
    case 7: { uint64_t v; if (!br->read_bits(16, &v)) return false;
              block_size = (uint32_t)v + 1; break; }
    default:
      if (bs_code >= 8 && bs_code <= 15) block_size = 256u << (bs_code - 8);
      else return false;
  }
  // sample rate: only codes 12-14 consume extra bits; value itself unused
  if (sr_code == 12) { uint64_t v; if (!br->read_bits(8, &v)) return false; }
  else if (sr_code == 13 || sr_code == 14) {
    uint64_t v; if (!br->read_bits(16, &v)) return false;
  } else if (sr_code == 15) return false;

  if (ch_code <= 7) { fh->channels = (uint32_t)ch_code + 1; fh->channel_assignment = 0; }
  else if (ch_code <= 10) { fh->channels = 2; fh->channel_assignment = (int)ch_code; }
  else return false;

  static const uint32_t kBits[8] = {0, 8, 12, 0, 16, 20, 24, 32};
  if (ss_code == 3) return false;
  fh->bits = kBits[ss_code] ? kBits[ss_code] : si.bits;

  uint64_t crc8;
  if (!br->read_bits(8, &crc8)) return false;  // not verified (we trust sync+decode)

  fh->block_size = block_size;
  fh->sample_number = variable ? coded : coded * si.max_block;
  return true;
}

// -------------------------------------------------------------- subframes

bool read_residual(BitReader* br, uint32_t block_size, uint32_t predictor_order,
                   std::vector<int64_t>* res) {
  uint64_t method;
  if (!br->read_bits(2, &method)) return false;
  if (method > 1) return false;
  int param_bits = method == 0 ? 4 : 5;
  uint32_t escape = method == 0 ? 0xF : 0x1F;
  uint64_t porder;
  if (!br->read_bits(4, &porder)) return false;
  uint32_t partitions = 1u << porder;
  if (block_size % partitions != 0) return false;
  uint32_t psize = block_size >> porder;
  // The first partition holds psize - predictor_order residuals: psize <
  // predictor_order would underflow count below (uint32 wrap -> ~4e9 writes
  // off the end of *res on a malformed stream), so reject it for ANY
  // partition count; the single-partition == case is also degenerate.
  if (psize < predictor_order) return false;
  if (psize <= predictor_order && partitions == 1) return false;

  uint32_t idx = predictor_order;
  for (uint32_t p = 0; p < partitions; ++p) {
    uint32_t count = psize - (p == 0 ? predictor_order : 0);
    if (idx + (uint64_t)count > res->size()) return false;
    uint64_t param;
    if (!br->read_bits(param_bits, &param)) return false;
    if ((uint32_t)param == escape) {
      uint64_t rawbits;
      if (!br->read_bits(5, &rawbits)) return false;
      for (uint32_t i = 0; i < count; ++i) {
        int64_t v = 0;
        if (rawbits && !br->read_signed((int)rawbits, &v)) return false;
        (*res)[idx++] = v;
      }
    } else {
      for (uint32_t i = 0; i < count; ++i) {
        uint32_t q;
        if (!br->read_unary(&q)) return false;
        uint64_t r = 0;
        if (param && !br->read_bits((int)param, &r)) return false;
        uint64_t u = ((uint64_t)q << param) | r;
        (*res)[idx++] = (int64_t)(u >> 1) ^ -(int64_t)(u & 1);  // zigzag
      }
    }
  }
  return true;
}

bool decode_subframe(BitReader* br, uint32_t block_size, uint32_t bits,
                     std::vector<int64_t>* out) {
  uint64_t pad, type_code, wasted_flag;
  if (!br->read_bits(1, &pad) || pad != 0) return false;
  if (!br->read_bits(6, &type_code)) return false;
  if (!br->read_bits(1, &wasted_flag)) return false;
  uint32_t wasted = 0;
  if (wasted_flag) {
    uint32_t q;
    if (!br->read_unary(&q)) return false;
    wasted = q + 1;
  }
  uint32_t eff_bits = bits - wasted;
  out->assign(block_size, 0);

  if (type_code == 0) {  // CONSTANT
    int64_t v;
    if (!br->read_signed((int)eff_bits, &v)) return false;
    for (uint32_t i = 0; i < block_size; ++i) (*out)[i] = v;
  } else if (type_code == 1) {  // VERBATIM
    for (uint32_t i = 0; i < block_size; ++i)
      if (!br->read_signed((int)eff_bits, &(*out)[i])) return false;
  } else if (type_code >= 8 && type_code <= 12) {  // FIXED order 0-4
    uint32_t order = (uint32_t)type_code - 8;
    for (uint32_t i = 0; i < order; ++i)
      if (!br->read_signed((int)eff_bits, &(*out)[i])) return false;
    if (!read_residual(br, block_size, order, out)) return false;
    // fixed predictors (polynomial extrapolation)
    switch (order) {
      case 0: break;
      case 1:
        for (uint32_t i = 1; i < block_size; ++i) (*out)[i] += (*out)[i - 1];
        break;
      case 2:
        for (uint32_t i = 2; i < block_size; ++i)
          (*out)[i] += 2 * (*out)[i - 1] - (*out)[i - 2];
        break;
      case 3:
        for (uint32_t i = 3; i < block_size; ++i)
          (*out)[i] += 3 * (*out)[i - 1] - 3 * (*out)[i - 2] + (*out)[i - 3];
        break;
      case 4:
        for (uint32_t i = 4; i < block_size; ++i)
          (*out)[i] += 4 * (*out)[i - 1] - 6 * (*out)[i - 2] +
                       4 * (*out)[i - 3] - (*out)[i - 4];
        break;
    }
  } else if (type_code >= 32) {  // LPC order 1-32
    uint32_t order = (uint32_t)type_code - 31;
    for (uint32_t i = 0; i < order; ++i)
      if (!br->read_signed((int)eff_bits, &(*out)[i])) return false;
    uint64_t prec_code;
    if (!br->read_bits(4, &prec_code) || prec_code == 0xF) return false;
    int precision = (int)prec_code + 1;
    int64_t shift;
    if (!br->read_signed(5, &shift) || shift < 0) return false;
    std::vector<int64_t> coefs(order);
    for (uint32_t i = 0; i < order; ++i)
      if (!br->read_signed(precision, &coefs[i])) return false;
    if (!read_residual(br, block_size, order, out)) return false;
    for (uint32_t i = order; i < block_size; ++i) {
      int64_t pred = 0;
      for (uint32_t j = 0; j < order; ++j)
        pred += coefs[j] * (*out)[i - 1 - j];
      (*out)[i] += pred >> shift;
    }
  } else {
    return false;  // reserved type
  }

  if (wasted)
    for (uint32_t i = 0; i < block_size; ++i) (*out)[i] <<= wasted;
  return true;
}

// Decode one frame in place; channels[c][i] are raw ints at stream bit depth.
bool decode_frame(BitReader* br, const StreamInfo& si, FrameHeader* fh,
                  std::vector<std::vector<int64_t>>* channels) {
  if (!read_frame_header(br, si, fh)) return false;
  channels->assign(fh->channels, {});
  for (uint32_t c = 0; c < fh->channels; ++c) {
    uint32_t bits = fh->bits;
    // side channels carry one extra bit
    if ((fh->channel_assignment == 8 && c == 1) ||
        (fh->channel_assignment == 9 && c == 0) ||
        (fh->channel_assignment == 10 && c == 1))
      bits += 1;
    if (!decode_subframe(br, fh->block_size, bits, &(*channels)[c])) return false;
  }
  br->align();
  uint64_t crc16;
  if (!br->read_bits(16, &crc16)) return false;  // footer (not verified)

  // undo inter-channel decorrelation
  auto& ch = *channels;
  switch (fh->channel_assignment) {
    case 8:  // left/side: right = left - side
      for (uint32_t i = 0; i < fh->block_size; ++i) ch[1][i] = ch[0][i] - ch[1][i];
      break;
    case 9:  // right/side: left = right + side
      for (uint32_t i = 0; i < fh->block_size; ++i) ch[0][i] = ch[0][i] + ch[1][i];
      break;
    case 10:  // mid/side
      for (uint32_t i = 0; i < fh->block_size; ++i) {
        int64_t side = ch[1][i];
        int64_t mid = (ch[0][i] << 1) | (side & 1);
        ch[0][i] = (mid + side) >> 1;
        ch[1][i] = (mid - side) >> 1;
      }
      break;
    default: break;
  }
  return true;
}

// ------------------------------------------------------------ frame index

struct FrameIndexEntry {
  uint64_t sample;   // first sample of the frame
  int64_t offset;    // absolute byte offset of the frame start
};

struct FileIndex {
  StreamInfo si;
  std::vector<FrameIndexEntry> frames;
  uint64_t total_samples = 0;  // authoritative (counted during the scan)
};

std::mutex g_index_mutex;
std::map<std::string, FileIndex> g_index_cache;

// Full sequential pass: record (sample, byte offset) per frame.
bool build_index(const std::string& path, FileIndex* out) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return false;
  StreamInfo si;
  if (!read_streaminfo(f, &si)) { std::fclose(f); return false; }
  out->si = si;
  BitReader br(f);
  uint64_t samples = 0;
  for (;;) {
    int64_t frame_start = si.first_frame_offset + br.byte_pos();
    FrameHeader fh;
    std::vector<std::vector<int64_t>> ch;
    if (!decode_frame(&br, si, &fh, &ch)) break;  // EOF or corrupt tail
    out->frames.push_back({samples, frame_start});
    samples += fh.block_size;
  }
  std::fclose(f);
  out->total_samples = samples;
  return !out->frames.empty();
}

const FileIndex* get_index(const std::string& path) {
  std::lock_guard<std::mutex> g(g_index_mutex);
  auto it = g_index_cache.find(path);
  if (it != g_index_cache.end()) return &it->second;
  FileIndex idx;
  if (!build_index(path, &idx)) return nullptr;
  return &g_index_cache.emplace(path, std::move(idx)).first->second;
}

}  // namespace flac

// ------------------------------------------------------------------ C ABI

extern "C" int flac_info(const char* path, int64_t* frames, int32_t* sample_rate,
                         int32_t* channels, int32_t* bits) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  flac::StreamInfo si;
  bool ok = flac::read_streaminfo(f, &si);
  std::fclose(f);
  if (!ok) return -2;
  if (si.total_samples == 0) {
    // unknown in STREAMINFO: count via the index (one full pass, cached)
    const flac::FileIndex* idx = flac::get_index(path);
    if (!idx) return -3;
    *frames = (int64_t)idx->total_samples;
  } else {
    *frames = (int64_t)si.total_samples;
  }
  *sample_rate = (int32_t)si.sample_rate;
  *channels = (int32_t)si.channels;
  *bits = (int32_t)si.bits;
  return 0;
}

// Read `frames` frames starting at `start` into out[frame * channels + ch],
// float32 in [-1, 1).  Zero-pads past EOF.  Returns frames actually decoded
// (rest zero-padded), or negative on error.
extern "C" int64_t flac_read(const char* path, int64_t start, int64_t frames,
                             float* out) {
  const flac::FileIndex* idx = flac::get_index(path);
  if (!idx) return -1;
  const flac::StreamInfo& si = idx->si;
  const uint32_t nch = si.channels;
  std::memset(out, 0, sizeof(float) * (size_t)frames * nch);
  if (start < 0 || frames <= 0) return -2;
  if ((uint64_t)start >= idx->total_samples) return 0;

  // binary search: last frame with sample <= start
  size_t lo = 0, hi = idx->frames.size();
  while (hi - lo > 1) {
    size_t mid = (lo + hi) / 2;
    if (idx->frames[mid].sample <= (uint64_t)start) lo = mid;
    else hi = mid;
  }

  FILE* f = std::fopen(path, "rb");
  if (!f) return -3;
  if (std::fseek(f, (long)idx->frames[lo].offset, SEEK_SET) != 0) {
    std::fclose(f);
    return -4;
  }
  flac::BitReader br(f);
  const double scale = 1.0 / (double)(1ull << (si.bits - 1));
  uint64_t frame_sample = idx->frames[lo].sample;
  int64_t written = 0;
  while (written < frames) {
    flac::FrameHeader fh;
    std::vector<std::vector<int64_t>> ch;
    if (!flac::decode_frame(&br, si, &fh, &ch)) break;
    // intersect [frame_sample, frame_sample + bs) with [start, start+frames)
    uint64_t fs = frame_sample;
    frame_sample += fh.block_size;
    int64_t lo_s = (int64_t)fs > start ? (int64_t)fs : start;
    int64_t hi_s = (int64_t)(fs + fh.block_size) < start + frames
                       ? (int64_t)(fs + fh.block_size) : start + frames;
    for (int64_t s = lo_s; s < hi_s; ++s) {
      uint32_t i = (uint32_t)(s - (int64_t)fs);
      for (uint32_t c = 0; c < nch && c < fh.channels; ++c)
        out[(s - start) * nch + c] = (float)(ch[c][i] * scale);
    }
    if (hi_s > start) written = hi_s - start;
    if ((int64_t)frame_sample >= start + frames) break;
  }
  std::fclose(f);
  return written > 0 ? written : 0;
}

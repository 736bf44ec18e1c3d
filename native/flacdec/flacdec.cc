// From-scratch FLAC decoder (host-side audio loading).
//
// Replaces the reference's bundled GPL `flac` binaries invoked via
// subprocess (reference resources.py:97-139, 235-242; SURVEY §2.2 N4) with
// an in-process decoder. Implements the FLAC bitstream: STREAMINFO
// metadata, frame headers (all block-size/sample-rate/channel codes),
// constant / verbatim / fixed / LPC subframes, rice-coded residual
// partitions (both 4- and 5-bit parameter widths, escape codes), wasted
// bits, and stereo decorrelation (left/side, right/side, mid/side).
// CRCs are consumed but not verified (corrupt files fail structurally).
//
// C ABI consumed via ctypes from danspeech_tpu/audio/flac.py.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

class BitReader {
 public:
  BitReader(const uint8_t* data, size_t size) : data_(data), size_(size) {}

  bool ReadBit(uint32_t* out) {
    if (pos_ >= size_ * 8) return false;
    *out = (data_[pos_ >> 3] >> (7 - (pos_ & 7))) & 1;
    ++pos_;
    return true;
  }

  bool ReadBits(int n, uint64_t* out) {
    // MSB-first read of up to 57 bits
    uint64_t v = 0;
    for (int i = 0; i < n; ++i) {
      uint32_t b;
      if (!ReadBit(&b)) return false;
      v = (v << 1) | b;
    }
    *out = v;
    return true;
  }

  bool ReadSigned(int n, int64_t* out) {
    uint64_t v;
    if (!ReadBits(n, &v)) return false;
    // sign extend
    if (n > 0 && (v >> (n - 1)) & 1) {
      v |= ~uint64_t(0) << n;
    }
    *out = static_cast<int64_t>(v);
    return true;
  }

  bool ReadUnary(uint32_t* out) {
    uint32_t count = 0;
    while (true) {
      uint32_t b;
      if (!ReadBit(&b)) return false;
      if (b) break;
      ++count;
      if (count > 1u << 24) return false;  // corrupt stream guard
    }
    *out = count;
    return true;
  }

  void AlignToByte() { pos_ = (pos_ + 7) & ~size_t(7); }
  size_t BytePos() const { return pos_ >> 3; }
  bool AtEnd() const { return pos_ >= size_ * 8; }
  void SeekByte(size_t byte) { pos_ = byte * 8; }

 private:
  const uint8_t* data_;
  size_t size_;
  size_t pos_ = 0;
};

struct StreamInfo {
  uint32_t sample_rate = 0;
  uint32_t channels = 0;
  uint32_t bits_per_sample = 0;
  uint64_t total_samples = 0;
};

bool ReadUtf8Number(BitReader* br, uint64_t* out) {
  uint64_t first;
  if (!br->ReadBits(8, &first)) return false;
  int extra = 0;
  uint64_t v = 0;
  if ((first & 0x80) == 0) {
    v = first;
  } else if ((first & 0xE0) == 0xC0) {
    v = first & 0x1F;
    extra = 1;
  } else if ((first & 0xF0) == 0xE0) {
    v = first & 0x0F;
    extra = 2;
  } else if ((first & 0xF8) == 0xF0) {
    v = first & 0x07;
    extra = 3;
  } else if ((first & 0xFC) == 0xF8) {
    v = first & 0x03;
    extra = 4;
  } else if ((first & 0xFE) == 0xFC) {
    v = first & 0x01;
    extra = 5;
  } else if (first == 0xFE) {
    v = 0;
    extra = 6;
  } else {
    return false;
  }
  for (int i = 0; i < extra; ++i) {
    uint64_t b;
    if (!br->ReadBits(8, &b)) return false;
    if ((b & 0xC0) != 0x80) return false;
    v = (v << 6) | (b & 0x3F);
  }
  *out = v;
  return true;
}

bool DecodeResidual(BitReader* br, int block_size, int predictor_order,
                    std::vector<int64_t>* out) {
  uint64_t method;
  if (!br->ReadBits(2, &method)) return false;
  if (method > 1) return false;
  int param_bits = method == 0 ? 4 : 5;
  uint64_t escape = method == 0 ? 0xF : 0x1F;

  uint64_t porder;
  if (!br->ReadBits(4, &porder)) return false;
  int partitions = 1 << porder;
  int samples_per = block_size >> porder;
  if (samples_per <= 0) return false;

  out->resize(block_size - predictor_order);
  int idx = 0;
  for (int p = 0; p < partitions; ++p) {
    int count = samples_per - (p == 0 ? predictor_order : 0);
    if (count < 0) return false;
    uint64_t param;
    if (!br->ReadBits(param_bits, &param)) return false;
    if (param == escape) {
      uint64_t raw_bits;
      if (!br->ReadBits(5, &raw_bits)) return false;
      for (int i = 0; i < count; ++i) {
        int64_t v = 0;
        if (raw_bits == 0) {
          v = 0;
        } else if (!br->ReadSigned(static_cast<int>(raw_bits), &v)) {
          return false;
        }
        (*out)[idx++] = v;
      }
    } else {
      for (int i = 0; i < count; ++i) {
        uint32_t q;
        if (!br->ReadUnary(&q)) return false;
        uint64_t r = 0;
        if (param > 0 && !br->ReadBits(static_cast<int>(param), &r)) {
          return false;
        }
        uint64_t u = (static_cast<uint64_t>(q) << param) | r;
        // zigzag decode
        (*out)[idx++] =
            (u & 1) ? -static_cast<int64_t>(u >> 1) - 1
                    : static_cast<int64_t>(u >> 1);
      }
    }
  }
  return idx == block_size - predictor_order;
}

bool DecodeSubframe(BitReader* br, int block_size, int bps,
                    std::vector<int64_t>* out) {
  uint32_t zero_bit;
  if (!br->ReadBit(&zero_bit) || zero_bit != 0) return false;
  uint64_t type;
  if (!br->ReadBits(6, &type)) return false;
  uint32_t wasted_flag;
  if (!br->ReadBit(&wasted_flag)) return false;
  int wasted = 0;
  if (wasted_flag) {
    uint32_t u;
    if (!br->ReadUnary(&u)) return false;
    wasted = static_cast<int>(u) + 1;
    bps -= wasted;
  }
  if (bps <= 0) return false;

  out->assign(block_size, 0);

  if (type == 0) {  // CONSTANT
    int64_t v;
    if (!br->ReadSigned(bps, &v)) return false;
    for (int i = 0; i < block_size; ++i) (*out)[i] = v;
  } else if (type == 1) {  // VERBATIM
    for (int i = 0; i < block_size; ++i) {
      if (!br->ReadSigned(bps, &(*out)[i])) return false;
    }
  } else if (type >= 8 && type <= 12) {  // FIXED, order 0-4
    int order = static_cast<int>(type) - 8;
    if (order > block_size) return false;
    for (int i = 0; i < order; ++i) {
      if (!br->ReadSigned(bps, &(*out)[i])) return false;
    }
    std::vector<int64_t> resid;
    if (!DecodeResidual(br, block_size, order, &resid)) return false;
    for (int i = order; i < block_size; ++i) {
      int64_t e = resid[i - order];
      int64_t* s = out->data() + i;
      switch (order) {
        case 0: s[0] = e; break;
        case 1: s[0] = e + s[-1]; break;
        case 2: s[0] = e + 2 * s[-1] - s[-2]; break;
        case 3: s[0] = e + 3 * s[-1] - 3 * s[-2] + s[-3]; break;
        case 4: s[0] = e + 4 * s[-1] - 6 * s[-2] + 4 * s[-3] - s[-4]; break;
      }
    }
  } else if (type >= 32) {  // LPC, order 1-32
    int order = static_cast<int>(type) - 31;
    if (order > block_size) return false;
    for (int i = 0; i < order; ++i) {
      if (!br->ReadSigned(bps, &(*out)[i])) return false;
    }
    uint64_t prec_m1;
    if (!br->ReadBits(4, &prec_m1)) return false;
    if (prec_m1 == 0xF) return false;
    int precision = static_cast<int>(prec_m1) + 1;
    int64_t shift;
    if (!br->ReadSigned(5, &shift)) return false;
    if (shift < 0) return false;
    std::vector<int64_t> coefs(order);
    for (int i = 0; i < order; ++i) {
      if (!br->ReadSigned(precision, &coefs[i])) return false;
    }
    std::vector<int64_t> resid;
    if (!DecodeResidual(br, block_size, order, &resid)) return false;
    for (int i = order; i < block_size; ++i) {
      int64_t pred = 0;
      for (int j = 0; j < order; ++j) {
        pred += coefs[j] * (*out)[i - 1 - j];
      }
      (*out)[i] = resid[i - order] + (pred >> shift);
    }
  } else {
    return false;  // reserved subframe type
  }

  if (wasted) {
    for (int i = 0; i < block_size; ++i) (*out)[i] <<= wasted;
  }
  return true;
}

}  // namespace

extern "C" {

// Parse STREAMINFO only. Returns 0 on success.
int flacdec_info(const uint8_t* data, int64_t size, int32_t* sample_rate,
                 int32_t* channels, int32_t* bits_per_sample,
                 int64_t* total_samples) {
  if (size < 8 || std::memcmp(data, "fLaC", 4) != 0) return -1;
  size_t pos = 4;
  while (pos + 4 <= static_cast<size_t>(size)) {
    uint8_t header = data[pos];
    uint32_t block_type = header & 0x7F;
    uint32_t length = (data[pos + 1] << 16) | (data[pos + 2] << 8) | data[pos + 3];
    pos += 4;
    if (block_type == 0) {  // STREAMINFO
      if (length < 34 || pos + 34 > static_cast<size_t>(size)) return -2;
      const uint8_t* p = data + pos;
      *sample_rate = (p[10] << 12) | (p[11] << 4) | (p[12] >> 4);
      *channels = ((p[12] >> 1) & 0x7) + 1;
      *bits_per_sample = (((p[12] & 1) << 4) | (p[13] >> 4)) + 1;
      *total_samples = (static_cast<int64_t>(p[13] & 0x0F) << 32) |
                       (static_cast<int64_t>(p[14]) << 24) |
                       (static_cast<int64_t>(p[15]) << 16) |
                       (static_cast<int64_t>(p[16]) << 8) | p[17];
      return 0;
    }
    pos += length;
    if (header & 0x80) break;  // was last block and not STREAMINFO
  }
  return -3;
}

// Decode all frames into interleaved int32 samples. Returns the number of
// per-channel samples decoded, or a negative error.
int64_t flacdec_decode(const uint8_t* data, int64_t size, int32_t* out,
                       int64_t out_capacity /* in total int32 elements */) {
  int32_t sample_rate, channels, bps;
  int64_t total_samples;
  if (flacdec_info(data, size, &sample_rate, &channels, &bps,
                   &total_samples) != 0) {
    return -1;
  }

  // skip metadata blocks
  size_t pos = 4;
  while (pos + 4 <= static_cast<size_t>(size)) {
    uint8_t header = data[pos];
    uint32_t length = (data[pos + 1] << 16) | (data[pos + 2] << 8) | data[pos + 3];
    pos += 4 + length;
    if (header & 0x80) break;
  }

  BitReader br(data, static_cast<size_t>(size));
  br.SeekByte(pos);

  int64_t written = 0;  // per-channel samples
  std::vector<std::vector<int64_t>> chans(channels);

  while (!br.AtEnd()) {
    // frame sync
    uint64_t sync;
    if (!br.ReadBits(14, &sync)) break;
    if (sync != 0x3FFE) return -4;
    uint64_t reserved, blocking;
    if (!br.ReadBits(1, &reserved) || !br.ReadBits(1, &blocking)) return -5;
    uint64_t bs_code, sr_code, ch_code, ss_code, reserved2;
    if (!br.ReadBits(4, &bs_code) || !br.ReadBits(4, &sr_code) ||
        !br.ReadBits(4, &ch_code) || !br.ReadBits(3, &ss_code) ||
        !br.ReadBits(1, &reserved2)) {
      return -5;
    }
    uint64_t frame_number;
    if (!ReadUtf8Number(&br, &frame_number)) return -6;

    int block_size;
    switch (bs_code) {
      case 0: return -7;
      case 1: block_size = 192; break;
      case 6: {
        uint64_t v;
        if (!br.ReadBits(8, &v)) return -7;
        block_size = static_cast<int>(v) + 1;
        break;
      }
      case 7: {
        uint64_t v;
        if (!br.ReadBits(16, &v)) return -7;
        block_size = static_cast<int>(v) + 1;
        break;
      }
      default:
        if (bs_code >= 2 && bs_code <= 5) {
          block_size = 576 << (bs_code - 2);
        } else {
          block_size = 256 << (bs_code - 8);
        }
    }

    // sample rate field (value unused; stream info governs)
    if (sr_code == 12) {
      uint64_t v;
      if (!br.ReadBits(8, &v)) return -8;
    } else if (sr_code == 13 || sr_code == 14) {
      uint64_t v;
      if (!br.ReadBits(16, &v)) return -8;
    } else if (sr_code == 15) {
      return -8;
    }

    // header CRC-8
    uint64_t crc8;
    if (!br.ReadBits(8, &crc8)) return -9;

    int n_sub;
    int assignment = static_cast<int>(ch_code);
    if (assignment <= 7) {
      n_sub = assignment + 1;
    } else if (assignment <= 10) {
      n_sub = 2;
    } else {
      return -10;
    }
    if (n_sub != channels) return -10;

    int frame_bps = bps;
    switch (ss_code) {
      case 0: frame_bps = bps; break;
      case 1: frame_bps = 8; break;
      case 2: frame_bps = 12; break;
      case 4: frame_bps = 16; break;
      case 5: frame_bps = 20; break;
      case 6: frame_bps = 24; break;
      case 7: frame_bps = 32; break;
      default: return -11;
    }

    for (int c = 0; c < n_sub; ++c) {
      int sub_bps = frame_bps;
      // side channels carry one extra bit
      if ((assignment == 8 && c == 1) || (assignment == 9 && c == 0) ||
          (assignment == 10 && c == 1)) {
        sub_bps += 1;
      }
      if (!DecodeSubframe(&br, block_size, sub_bps, &chans[c])) return -12;
    }

    // stereo decorrelation
    if (assignment == 8) {  // left/side
      for (int i = 0; i < block_size; ++i) {
        chans[1][i] = chans[0][i] - chans[1][i];
      }
    } else if (assignment == 9) {  // right/side: ch0 = side, ch1 = right
      for (int i = 0; i < block_size; ++i) {
        chans[0][i] = chans[1][i] + chans[0][i];
      }
    } else if (assignment == 10) {  // mid/side
      for (int i = 0; i < block_size; ++i) {
        int64_t mid = chans[0][i];
        int64_t side = chans[1][i];
        mid = (mid << 1) | (side & 1);
        chans[0][i] = (mid + side) >> 1;
        chans[1][i] = (mid - side) >> 1;
      }
    }

    br.AlignToByte();
    uint64_t crc16;
    if (!br.ReadBits(16, &crc16)) return -13;

    if ((written + block_size) * channels > out_capacity) return -14;
    for (int i = 0; i < block_size; ++i) {
      for (int c = 0; c < channels; ++c) {
        out[(written + i) * channels + c] = static_cast<int32_t>(chans[c][i]);
      }
    }
    written += block_size;
    if (total_samples > 0 && written >= total_samples) break;

    // tolerate trailing padding: stop cleanly if only zero bytes remain
    size_t byte_pos = br.BytePos();
    bool rest_zero = true;
    for (size_t i = byte_pos; i < static_cast<size_t>(size); ++i) {
      if (data[i] != 0) {
        rest_zero = false;
        break;
      }
    }
    if (rest_zero) break;
  }

  if (total_samples > 0 && written > total_samples) written = total_samples;
  return written;
}

}  // extern "C"

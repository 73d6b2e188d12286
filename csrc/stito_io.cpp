// Native data-loading engine for st_ito_tpu.
//
// The reference streams FLAC members out of tar archives inside DataLoader
// worker processes (reference: st_ito/dataset/dataset_param.py:109-155,
// 313-341, decode via torchaudio/libsndfile). This environment has no
// libFLAC/libsndfile, and the Python shard reader is GIL-bound, so this
// file provides:
//
//   1. a from-scratch FLAC decoder (subset: CONSTANT/VERBATIM/FIXED/LPC
//      subframes, RICE/RICE2 residuals, all 4 channel assignments,
//      8..24-bit) — enough for libFLAC-encoded audio at any standard
//      compression level. CRCs are parsed but not verified.
//   2. a minimal FLAC encoder (verbatim + fixed-predictor/Rice + LPC test
//      mode, independent or mid/side stereo) used for round-trip tests
//      and npz->flac dataset export.
//   3. a POSIX tar member scanner (the reference's streaming-tar layout).
//   4. an .npz member reader (STORED and DEFLATE via zlib).
//   5. stito_decode_shard: the fused crop + f16->f32 widen + gain + flip
//      batch decode, multithreaded with real parallelism (called from
//      Python with the GIL released through ctypes).
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -o libstito_io.so stito_io.cpp -lz -lpthread

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

// ---------------------------------------------------------------------------
// bit reader (MSB first)
// ---------------------------------------------------------------------------

struct BitReader {
  const uint8_t* data;
  size_t size;
  size_t pos = 0;   // byte position
  int bit = 0;      // bits consumed in current byte
  bool error = false;

  uint32_t bits(int n) {
    uint32_t v = 0;
    for (int i = 0; i < n; i++) {
      if (pos >= size) { error = true; return 0; }
      v = (v << 1) | ((data[pos] >> (7 - bit)) & 1u);
      if (++bit == 8) { bit = 0; pos++; }
    }
    return v;
  }
  uint64_t bits64(int n) {
    uint64_t v = 0;
    if (n > 32) { v = bits(n - 32); return (v << 32) | bits(32); }
    return bits(n);
  }
  int32_t sbits(int n) {
    uint32_t v = bits(n);
    if (n == 0) return 0;
    if (v & (1u << (n - 1))) return (int32_t)(v | (~0u << n));
    return (int32_t)v;
  }
  uint32_t unary() {
    uint32_t q = 0;
    while (!error && bits(1) == 0) q++;
    return q;
  }
  void align() { if (bit) { bit = 0; pos++; } }
};

// ---------------------------------------------------------------------------
// FLAC decode
// ---------------------------------------------------------------------------

static const int kBlockSizes[16] = {0, 192, 576, 1152, 2304, 4608, -1, -2,
                                    256, 512, 1024, 2048, 4096, 8192, 16384,
                                    32768};

static bool decode_residual(BitReader& br, int order, int block_size,
                            int64_t* out) {
  int method = br.bits(2);
  if (method > 1) return false;
  int plen = method == 0 ? 4 : 5;
  uint32_t escape = method == 0 ? 15 : 31;
  int po = br.bits(4);
  int nparts = 1 << po;
  if (block_size % nparts) return false;
  int idx = order;
  for (int p = 0; p < nparts; p++) {
    int cnt = block_size / nparts - (p == 0 ? order : 0);
    if (cnt < 0) return false;
    uint32_t param = br.bits(plen);
    if (param == escape) {
      int raw = br.bits(5);
      for (int i = 0; i < cnt; i++) out[idx++] = raw ? br.sbits(raw) : 0;
    } else {
      for (int i = 0; i < cnt; i++) {
        uint32_t q = br.unary();
        uint32_t r = param ? br.bits(param) : 0;
        uint64_t v = (((uint64_t)q) << param) | r;
        out[idx++] = (int64_t)(v >> 1) ^ -(int64_t)(v & 1);
      }
    }
    if (br.error) return false;
  }
  return true;
}

static bool decode_subframe(BitReader& br, int block_size, int bps,
                            int64_t* out) {
  if (br.bits(1) != 0) return false;  // padding
  int type = br.bits(6);
  int wasted = 0;
  if (br.bits(1)) wasted = br.unary() + 1;
  bps -= wasted;
  if (bps <= 0 || bps > 33) return false;

  if (type == 0) {  // CONSTANT
    int64_t v = br.sbits(bps);
    for (int i = 0; i < block_size; i++) out[i] = v;
  } else if (type == 1) {  // VERBATIM
    for (int i = 0; i < block_size; i++) out[i] = br.sbits(bps);
  } else if ((type & 0x38) == 0x08 && (type & 7) <= 4) {  // FIXED
    int order = type & 7;
    for (int i = 0; i < order; i++) out[i] = br.sbits(bps);
    if (!decode_residual(br, order, block_size, out)) return false;
    for (int i = order; i < block_size; i++) {
      int64_t p = 0;
      switch (order) {
        case 0: p = 0; break;
        case 1: p = out[i - 1]; break;
        case 2: p = 2 * out[i - 1] - out[i - 2]; break;
        case 3: p = 3 * out[i - 1] - 3 * out[i - 2] + out[i - 3]; break;
        case 4: p = 4 * out[i - 1] - 6 * out[i - 2] + 4 * out[i - 3]
                    - out[i - 4]; break;
      }
      out[i] += p;
    }
  } else if (type & 0x20) {  // LPC
    int order = (type & 0x1f) + 1;
    for (int i = 0; i < order; i++) out[i] = br.sbits(bps);
    int prec = br.bits(4);
    if (prec == 15) return false;
    prec += 1;
    int shift = br.sbits(5);
    if (shift < 0) return false;
    int32_t coefs[32];
    for (int i = 0; i < order; i++) coefs[i] = br.sbits(prec);
    if (!decode_residual(br, order, block_size, out)) return false;
    for (int i = order; i < block_size; i++) {
      int64_t acc = 0;
      for (int j = 0; j < order; j++) acc += (int64_t)coefs[j] * out[i - 1 - j];
      out[i] += acc >> shift;
    }
  } else {
    return false;
  }
  if (wasted)
    for (int i = 0; i < block_size; i++) out[i] <<= wasted;
  return !br.error;
}

static bool skip_utf8(BitReader& br) {
  uint32_t b = br.bits(8);
  int extra = 0;
  if (b < 0x80) extra = 0;
  else if ((b & 0xe0) == 0xc0) extra = 1;
  else if ((b & 0xf0) == 0xe0) extra = 2;
  else if ((b & 0xf8) == 0xf0) extra = 3;
  else if ((b & 0xfc) == 0xf8) extra = 4;
  else if ((b & 0xfe) == 0xfc) extra = 5;
  else if (b == 0xfe) extra = 6;
  else return false;
  for (int i = 0; i < extra; i++)
    if ((br.bits(8) & 0xc0) != 0x80) return false;
  return !br.error;
}

extern "C" int stito_flac_info(const uint8_t* data, int64_t size,
                               int* sample_rate, int* channels, int* bps,
                               int64_t* total_samples) {
  if (size < 42 || memcmp(data, "fLaC", 4) != 0) return -1;
  size_t pos = 4;
  while (pos + 4 <= (size_t)size) {
    uint8_t hdr = data[pos];
    uint32_t len = (data[pos + 1] << 16) | (data[pos + 2] << 8) | data[pos + 3];
    pos += 4;
    if ((hdr & 0x7f) == 0) {  // STREAMINFO
      if (len < 34 || pos + 34 > (size_t)size) return -2;
      BitReader br{data + pos, 34};
      br.bits(16); br.bits(16); br.bits(24); br.bits(24);
      *sample_rate = br.bits(20);
      *channels = br.bits(3) + 1;
      *bps = br.bits(5) + 1;
      *total_samples = (int64_t)br.bits64(36);
      return 0;
    }
    pos += len;
    if (hdr & 0x80) break;
  }
  return -3;
}

// Decodes the whole stream into interleaved float32 in [-1, 1).
// Returns number of frames (samples per channel) decoded, or < 0 on error.
extern "C" int64_t stito_flac_decode(const uint8_t* data, int64_t size,
                                     float* out, int64_t max_frames,
                                     int* out_sr, int* out_channels) {
  int sr = 0, chs = 0, bps = 0;
  int64_t total = 0;
  if (stito_flac_info(data, size, &sr, &chs, &bps, &total) != 0) return -1;
  *out_sr = sr;
  *out_channels = chs;

  // skip metadata blocks
  size_t pos = 4;
  for (;;) {
    if (pos + 4 > (size_t)size) return -2;
    uint8_t hdr = data[pos];
    uint32_t len = (data[pos + 1] << 16) | (data[pos + 2] << 8) | data[pos + 3];
    pos += 4 + len;
    if (hdr & 0x80) break;
  }

  BitReader br{data, (size_t)size};
  br.pos = pos;
  std::vector<std::vector<int64_t>> ch(chs);
  int64_t done = 0;
  float scale = 1.0f / (float)(1u << (bps - 1));

  while (done < max_frames && br.pos < br.size && !br.error) {
    uint32_t sync = br.bits(14);
    if (br.error) break;
    if (sync != 0x3ffe) return -3;
    br.bits(1);              // reserved
    br.bits(1);              // blocking strategy
    int bs_code = br.bits(4);
    int sr_code = br.bits(4);
    int ca = br.bits(4);
    int ss_code = br.bits(3);
    br.bits(1);  // reserved
    if (!skip_utf8(br)) return -4;

    int block_size;
    if (bs_code == 6) block_size = br.bits(8) + 1;
    else if (bs_code == 7) block_size = br.bits(16) + 1;
    else if (bs_code == 0) return -5;
    else block_size = kBlockSizes[bs_code];
    if (sr_code == 12) br.bits(8);
    else if (sr_code == 13 || sr_code == 14) br.bits(16);
    int fbps = bps;
    static const int kBps[8] = {0, 8, 12, 0, 16, 20, 24, 32};
    if (ss_code != 0 && kBps[ss_code]) fbps = kBps[ss_code];
    br.bits(8);  // CRC-8 (not verified)

    int nch = ca < 8 ? ca + 1 : 2;
    if (nch != chs) return -6;
    for (int c = 0; c < chs; c++) {
      if ((int64_t)ch[c].size() < block_size) ch[c].resize(block_size);
      int cbps = fbps;
      if ((ca == 8 && c == 1) || (ca == 9 && c == 0) || (ca == 10 && c == 1))
        cbps += 1;  // side channel carries one extra bit
      if (!decode_subframe(br, block_size, cbps, ch[c].data())) return -7;
    }
    br.align();
    br.bits(16);  // frame CRC-16 (not verified)

    // undo inter-channel decorrelation
    if (ca == 8) {          // left/side: S = L - R
      for (int i = 0; i < block_size; i++) ch[1][i] = ch[0][i] - ch[1][i];
    } else if (ca == 9) {   // right/side: stored (S, R)
      for (int i = 0; i < block_size; i++) ch[0][i] = ch[0][i] + ch[1][i];
    } else if (ca == 10) {  // mid/side
      for (int i = 0; i < block_size; i++) {
        int64_t mid = ch[0][i], side = ch[1][i];
        mid = (mid << 1) | (side & 1);
        ch[0][i] = (mid + side) >> 1;
        ch[1][i] = (mid - side) >> 1;
      }
    }

    int64_t take = block_size;
    if (done + take > max_frames) take = max_frames - done;
    for (int64_t i = 0; i < take; i++)
      for (int c = 0; c < chs; c++)
        out[(done + i) * chs + c] = (float)ch[c][i] * scale;
    done += take;
  }
  return done;
}

// ---------------------------------------------------------------------------
// FLAC encode (subset)
// ---------------------------------------------------------------------------

struct BitWriter {
  std::vector<uint8_t>& buf;
  uint8_t cur = 0;
  int nbits = 0;
  void bits(uint64_t v, int n) {
    for (int i = n - 1; i >= 0; i--) {
      cur = (cur << 1) | ((v >> i) & 1);
      if (++nbits == 8) { buf.push_back(cur); cur = 0; nbits = 0; }
    }
  }
  void unary(uint32_t q) { for (uint32_t i = 0; i < q; i++) bits(0, 1); bits(1, 1); }
  void align() { while (nbits) bits(0, 1); }
};

static uint8_t crc8(const uint8_t* d, size_t n) {
  uint8_t crc = 0;
  for (size_t i = 0; i < n; i++) {
    crc ^= d[i];
    for (int b = 0; b < 8; b++)
      crc = (crc & 0x80) ? (uint8_t)((crc << 1) ^ 0x07) : (uint8_t)(crc << 1);
  }
  return crc;
}

static uint16_t crc16(const uint8_t* d, size_t n) {
  uint16_t crc = 0;
  for (size_t i = 0; i < n; i++) {
    crc ^= (uint16_t)d[i] << 8;
    for (int b = 0; b < 8; b++)
      crc = (crc & 0x8000) ? (uint16_t)((crc << 1) ^ 0x8005)
                           : (uint16_t)(crc << 1);
  }
  return crc;
}

static void write_utf8(BitWriter& bw, uint64_t v) {
  if (v < 0x80) { bw.bits(v, 8); return; }
  // nbytes-byte form carries 5*nbytes + 1 payload bits (7-nbytes in the
  // lead byte + 6 per continuation)
  int nbytes = 2;
  while (nbytes < 6 && v >= (1ull << (5 * nbytes + 1))) nbytes++;
  uint32_t marker = (0xffu << (8 - nbytes)) & 0xffu;
  bw.bits(marker | (uint32_t)(v >> (6 * (nbytes - 1))), 8);
  for (int i = nbytes - 2; i >= 0; i--)
    bw.bits(0x80 | ((v >> (6 * i)) & 0x3f), 8);
}

static void rice_write(BitWriter& bw, const int64_t* res, int n, int param) {
  for (int i = 0; i < n; i++) {
    uint64_t u = (res[i] << 1) ^ (res[i] >> 63);  // zigzag
    bw.unary((uint32_t)(u >> param));
    if (param) bw.bits(u & ((1ull << param) - 1), param);
  }
}

static int rice_best_param(const int64_t* res, int n) {
  uint64_t acc = 0;
  for (int i = 0; i < n; i++) {
    int64_t v = res[i];
    acc += (uint64_t)(v < 0 ? -v : v);
  }
  uint64_t mean = n ? acc / n : 0;
  int p = 0;
  while ((1ull << (p + 1)) < mean + 1 && p < 14) p++;
  return p;
}

// mode: 0 = verbatim, 1 = fixed order-2 + rice, 2 = mid/side fixed,
//       3 = LPC subframe with coeffs [2, -1] (order 2, shift 0) — decodes
//           identically to fixed order 2; exercises the LPC decode path.
extern "C" int64_t stito_flac_encode(const int32_t* pcm, int64_t nframes,
                                     int channels, int sample_rate, int bps,
                                     int mode, uint8_t* out, int64_t out_cap) {
  std::vector<uint8_t> buf;
  buf.reserve((size_t)(nframes * channels * 4 + 1024));
  const char magic[4] = {'f', 'L', 'a', 'C'};
  buf.insert(buf.end(), magic, magic + 4);
  {
    BitWriter bw{buf};
    bw.bits(1, 1); bw.bits(0, 7); bw.bits(34, 24);  // last block, STREAMINFO
    bw.bits(4096, 16); bw.bits(4096, 16);
    bw.bits(0, 24); bw.bits(0, 24);
    bw.bits(sample_rate, 20); bw.bits(channels - 1, 3); bw.bits(bps - 1, 5);
    bw.bits((uint64_t)nframes, 36);
    for (int i = 0; i < 16; i++) bw.bits(0, 8);  // MD5 unset
  }

  const int BS = 4096;
  std::vector<int64_t> sub(BS), res(BS);
  uint64_t frame_no = 0;
  for (int64_t off = 0; off < nframes; off += BS, frame_no++) {
    int n = (int)std::min<int64_t>(BS, nframes - off);
    size_t frame_start = buf.size();
    BitWriter bw{buf};
    int ca = (mode == 2 && channels == 2) ? 10 : channels - 1;
    bw.bits(0x3ffe, 14); bw.bits(0, 1); bw.bits(0, 1);
    bw.bits(7, 4);            // block size: 16-bit - 1 follows
    bw.bits(0, 4);            // sample rate: from STREAMINFO
    bw.bits(ca, 4);
    bw.bits(4, 3);            // 16-bit samples
    bw.bits(0, 1);
    write_utf8(bw, frame_no);
    bw.bits(n - 1, 16);
    bw.align();
    buf.push_back(crc8(buf.data() + frame_start, buf.size() - frame_start));

    BitWriter bw2{buf};
    for (int c = 0; c < channels; c++) {
      int cbps = bps;
      if (mode == 2 && channels == 2) {
        if (c == 0)
          for (int i = 0; i < n; i++) {
            int64_t L = pcm[(off + i) * 2], R = pcm[(off + i) * 2 + 1];
            sub[i] = (L + R) >> 1;
          }
        else {
          for (int i = 0; i < n; i++) {
            int64_t L = pcm[(off + i) * 2], R = pcm[(off + i) * 2 + 1];
            sub[i] = L - R;
          }
          cbps = bps + 1;
        }
      } else {
        for (int i = 0; i < n; i++) sub[i] = pcm[(off + i) * channels + c];
      }

      bw2.bits(0, 1);
      if (mode == 0 || n < 3) {
        bw2.bits(1, 6); bw2.bits(0, 1);  // VERBATIM
        for (int i = 0; i < n; i++) bw2.bits((uint64_t)sub[i], cbps);
        continue;
      }
      int order = 2;
      for (int i = order; i < n; i++)
        res[i - order] = sub[i] - (2 * sub[i - 1] - sub[i - 2]);
      int param = rice_best_param(res.data(), n - order);
      if (mode == 3) {
        bw2.bits(0x20 | (order - 1), 6); bw2.bits(0, 1);  // LPC order 2
        for (int i = 0; i < order; i++) bw2.bits((uint64_t)sub[i], cbps);
        bw2.bits(4, 4);   // precision 5 bits (4+1)
        bw2.bits(0, 5);   // shift 0
        bw2.bits(2 & 0x1f, 5);                  // coef 2
        bw2.bits((uint64_t)(-1) & 0x1f, 5);     // coef -1
      } else {
        bw2.bits(0x08 | order, 6); bw2.bits(0, 1);  // FIXED order 2
        for (int i = 0; i < order; i++) bw2.bits((uint64_t)sub[i], cbps);
      }
      bw2.bits(0, 2);  // rice method 0
      bw2.bits(0, 4);  // partition order 0
      bw2.bits(param, 4);
      rice_write(bw2, res.data(), n - order, param);
    }
    bw2.align();
    uint16_t c16 = crc16(buf.data() + frame_start, buf.size() - frame_start);
    buf.push_back((uint8_t)(c16 >> 8));
    buf.push_back((uint8_t)(c16 & 0xff));
  }

  if ((int64_t)buf.size() > out_cap) return -(int64_t)buf.size();
  memcpy(out, buf.data(), buf.size());
  return (int64_t)buf.size();
}

// ---------------------------------------------------------------------------
// tar scanning (POSIX ustar; the reference's streaming layout)
// ---------------------------------------------------------------------------

// Fills names (each 256 bytes, NUL-terminated), offsets and sizes for up to
// max_n regular-file members. Returns the member count, or < 0 on error.
extern "C" int64_t stito_tar_index(const char* path, char* names,
                                   int64_t* offsets, int64_t* sizes,
                                   int64_t max_n) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  uint8_t hdr[512];
  int64_t n = 0;
  int64_t pos = 0;
  while (n < max_n && fread(hdr, 1, 512, f) == 512) {
    pos += 512;
    bool empty = true;
    for (int i = 0; i < 512; i++) if (hdr[i]) { empty = false; break; }
    if (empty) break;
    char szbuf[13];
    memcpy(szbuf, hdr + 124, 12);
    szbuf[12] = 0;
    int64_t size = strtoll(szbuf, nullptr, 8);
    char type = hdr[156];
    if (type == '0' || type == 0) {
      char* name = names + n * 256;
      memset(name, 0, 256);
      size_t at = 0;
      if (hdr[345]) {  // ustar prefix field in use
        size_t plen = strnlen((char*)hdr + 345, 155);
        memcpy(name, hdr + 345, plen);
        name[plen] = '/';
        at = plen + 1;
      }
      size_t nlen = strnlen((char*)hdr, 100);
      if (at + nlen > 255) nlen = 255 - at;
      memcpy(name + at, hdr, nlen);
      offsets[n] = pos;
      sizes[n] = size;
      n++;
    }
    int64_t skip = (size + 511) / 512 * 512;
    if (fseek(f, (long)skip, SEEK_CUR) != 0) break;
    pos += skip;
  }
  fclose(f);
  return n;
}

// ---------------------------------------------------------------------------
// npz member reading (zip, STORED or DEFLATE)
// ---------------------------------------------------------------------------

struct ZipEntry {
  std::string name;
  int method;
  uint64_t comp_size, uncomp_size, offset;  // offset of local header
};

static uint16_t rd16(const uint8_t* p) { return p[0] | (p[1] << 8); }
static uint32_t rd32(const uint8_t* p) {
  return p[0] | (p[1] << 8) | (p[2] << 16) | ((uint32_t)p[3] << 24);
}
static uint64_t rd64(const uint8_t* p) {
  return (uint64_t)rd32(p) | ((uint64_t)rd32(p + 4) << 32);
}

static bool zip_scan(FILE* f, std::vector<ZipEntry>& entries) {
  // numpy writes npz members via streaming zipfile.open(): the LOCAL
  // headers carry zero sizes (data-descriptor mode), so the central
  // directory at the end of the file is the source of truth.
  if (fseek(f, 0, SEEK_END) != 0) return false;
  long fsize = ftell(f);
  long tail = fsize < 65557 ? fsize : 65557;
  std::vector<uint8_t> end(tail);
  fseek(f, fsize - tail, SEEK_SET);
  if (fread(end.data(), 1, tail, f) != (size_t)tail) return false;
  long eocd = -1;
  for (long i = tail - 22; i >= 0; i--)
    if (rd32(&end[i]) == 0x06054b50) { eocd = i; break; }
  if (eocd < 0) return false;
  uint64_t count = rd16(&end[eocd + 10]);
  uint64_t cd_off = rd32(&end[eocd + 16]);
  if (count == 0xffff || cd_off == 0xffffffffu) {  // zip64
    long loc = eocd - 20;
    if (loc < 0 || rd32(&end[loc]) != 0x07064b50) return false;
    uint64_t e64_off = rd64(&end[loc + 8]);
    uint8_t e64[56];
    fseek(f, (long)e64_off, SEEK_SET);
    if (fread(e64, 1, 56, f) != 56 || rd32(e64) != 0x06064b50) return false;
    count = rd64(e64 + 32);
    cd_off = rd64(e64 + 48);
  }
  if (fseek(f, (long)cd_off, SEEK_SET) != 0) return false;
  for (uint64_t i = 0; i < count; i++) {
    uint8_t h[46];
    if (fread(h, 1, 46, f) != 46 || rd32(h) != 0x02014b50) return false;
    ZipEntry e;
    e.method = rd16(h + 10);
    e.comp_size = rd32(h + 20);
    e.uncomp_size = rd32(h + 24);
    int nlen = rd16(h + 28), elen = rd16(h + 30), clen = rd16(h + 32);
    e.offset = rd32(h + 42);  // local header offset
    std::vector<char> name(nlen);
    if (nlen && fread(name.data(), 1, nlen, f) != (size_t)nlen) return false;
    e.name.assign(name.data(), nlen);
    std::vector<uint8_t> extra(elen);
    if (elen && fread(extra.data(), 1, elen, f) != (size_t)elen) return false;
    // zip64 extra overrides the 0xffffffff fields, in fixed order:
    // uncomp, comp, local offset — only those that were saturated
    for (int j = 0; j + 4 <= elen;) {
      int id = rd16(&extra[j]), sz = rd16(&extra[j + 2]);
      if (id == 0x0001) {
        int k = j + 4;
        if (e.uncomp_size == 0xffffffffu && k + 8 <= j + 4 + sz) {
          e.uncomp_size = rd64(&extra[k]); k += 8;
        }
        if (e.comp_size == 0xffffffffu && k + 8 <= j + 4 + sz) {
          e.comp_size = rd64(&extra[k]); k += 8;
        }
        if (e.offset == 0xffffffffu && k + 8 <= j + 4 + sz) {
          e.offset = rd64(&extra[k]); k += 8;
        }
      }
      j += 4 + sz;
    }
    if (clen) fseek(f, clen, SEEK_CUR);
    entries.push_back(e);
  }
  return true;
}

// Reads member `name` (with or without the .npy suffix) raw .npy bytes.
// Returns byte count (or negative required size if cap too small; -1 error).
extern "C" int64_t stito_npz_member(const char* path, const char* name,
                                    uint8_t* out, int64_t cap) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  std::vector<ZipEntry> entries;
  if (!zip_scan(f, entries)) { fclose(f); return -1; }
  std::string want1 = name;
  std::string want2 = want1 + ".npy";
  for (auto& e : entries) {
    if (e.name != want1 && e.name != want2) continue;
    if ((int64_t)e.uncomp_size > cap) { fclose(f); return -(int64_t)e.uncomp_size; }
    // resolve the data offset through the local header (its name/extra
    // lengths can differ from the central directory's)
    uint8_t lh[30];
    fseek(f, (long)e.offset, SEEK_SET);
    if (fread(lh, 1, 30, f) != 30 || rd32(lh) != 0x04034b50) {
      fclose(f);
      return -1;
    }
    fseek(f, rd16(lh + 26) + rd16(lh + 28), SEEK_CUR);
    if (e.method == 0) {
      if (fread(out, 1, e.uncomp_size, f) != e.uncomp_size) { fclose(f); return -1; }
    } else if (e.method == 8) {
      std::vector<uint8_t> comp(e.comp_size);
      if (fread(comp.data(), 1, e.comp_size, f) != e.comp_size) { fclose(f); return -1; }
      z_stream zs{};
      inflateInit2(&zs, -15);
      zs.next_in = comp.data();
      zs.avail_in = (uInt)e.comp_size;
      zs.next_out = out;
      zs.avail_out = (uInt)e.uncomp_size;
      int rc = inflate(&zs, Z_FINISH);
      inflateEnd(&zs);
      if (rc != Z_STREAM_END) { fclose(f); return -1; }
    } else {
      fclose(f); return -1;
    }
    fclose(f);
    return (int64_t)e.uncomp_size;
  }
  fclose(f);
  return -1;
}

// ---------------------------------------------------------------------------
// fused shard decode: crop + f16->f32 + gain + flip (multithreaded)
// ---------------------------------------------------------------------------

static inline float half_to_float(uint16_t h) {
  uint32_t sign = (uint32_t)(h >> 15) << 31;
  uint32_t exp = (h >> 10) & 0x1f;
  uint32_t man = h & 0x3ff;
  uint32_t bits;
  if (exp == 0) {
    if (man == 0) bits = sign;
    else {
      exp = 127 - 15 + 1;
      while (!(man & 0x400)) { man <<= 1; exp--; }
      man &= 0x3ff;
      bits = sign | (exp << 23) | (man << 13);
    }
  } else if (exp == 0x1f) {
    bits = sign | 0x7f800000 | (man << 13);
  } else {
    bits = sign | ((exp - 15 + 127) << 23) | (man << 13);
  }
  float out;
  memcpy(&out, &bits, 4);
  return out;
}

// in: (n, chs, T) float16. out: (n, chs, crop_len) float32 with
// out[i, c] = gain[i] * in[order[i], maybe-swapped c, start[i] : +crop_len]
// (order == nullptr -> identity; fuses the shuffle into the decode so the
// host never materializes a permuted copy of the shard).
extern "C" int stito_decode_shard(const uint16_t* in, int64_t n, int64_t chs,
                                  int64_t T, const int64_t* order,
                                  const int64_t* starts,
                                  const float* gains, const uint8_t* flips,
                                  int64_t crop_len, float* out,
                                  int nthreads) {
  if (crop_len > T) return -1;
  if (nthreads < 1) nthreads = 1;
  auto work = [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; i++) {
      int64_t src_i = order ? order[i] : i;
      float g = gains ? gains[i] : 1.0f;
      int flip = (flips && chs == 2) ? flips[i] : 0;
      for (int64_t c = 0; c < chs; c++) {
        int64_t src_c = flip ? (chs - 1 - c) : c;
        const uint16_t* src = in + (src_i * chs + src_c) * T + starts[i];
        float* dst = out + (i * chs + c) * crop_len;
        for (int64_t t = 0; t < crop_len; t++)
          dst[t] = half_to_float(src[t]) * g;
      }
    }
  };
  if (nthreads == 1 || n < 2) {
    work(0, n);
    return 0;
  }
  std::vector<std::thread> threads;
  int64_t per = (n + nthreads - 1) / nthreads;
  for (int t = 0; t < nthreads; t++) {
    int64_t lo = t * per, hi = std::min<int64_t>(n, lo + per);
    if (lo >= hi) break;
    threads.emplace_back(work, lo, hi);
  }
  for (auto& th : threads) th.join();
  return 0;
}

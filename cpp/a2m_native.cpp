/* Native host data plane — see a2m_native.h.
 *
 * Each section cites the reference file:lines whose behaviour it mirrors
 * (rust-plugins/src/python.rs, common.rs); the implementation is original
 * C++ written against the documented semantics.
 */

#include "a2m_native.h"

#include <algorithm>
#include <array>
#include <cctype>
#include <cerrno>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <filesystem>
#include <fstream>
#include <numeric>
#include <optional>
#include <random>
#include <string>
#include <vector>

namespace fs = std::filesystem;

extern "C" void a2m_free(void *ptr) { std::free(ptr); }

/* ====================================================================== */
/* f16 <-> f32                                                            */
/* ====================================================================== */

static uint16_t f32_to_f16(float f) {
  uint32_t x;
  std::memcpy(&x, &f, 4);
  uint32_t sign = (x >> 16) & 0x8000u;
  int32_t exp = (int32_t)((x >> 23) & 0xFF) - 127 + 15;
  uint32_t mant = x & 0x7FFFFFu;
  if (((x >> 23) & 0xFF) == 0xFF) return (uint16_t)(sign | 0x7C00u | (mant ? 0x200u : 0));
  if (exp >= 0x1F) return (uint16_t)(sign | 0x7C00u); /* overflow -> inf */
  if (exp <= 0) {
    if (exp < -10) return (uint16_t)sign;
    mant |= 0x800000u;
    uint32_t shift = (uint32_t)(14 - exp);
    uint32_t half = mant >> shift;
    uint32_t rem = mant & ((1u << shift) - 1);
    uint32_t mid = 1u << (shift - 1);
    if (rem > mid || (rem == mid && (half & 1))) half++;
    return (uint16_t)(sign | half);
  }
  uint32_t half = (uint32_t)(exp << 10) | (mant >> 13);
  uint32_t rem = mant & 0x1FFFu;
  if (rem > 0x1000u || (rem == 0x1000u && (half & 1))) half++;
  return (uint16_t)(sign | half);
}

#if defined(__F16C__)
#include <immintrin.h>
#endif

static float f16_to_f32(uint16_t h);

/* Bulk converters: F16C (vcvtps2ph/vcvtph2ps, round-to-nearest-even — the
 * same rounding as the scalar bit-twiddling converters; exhaustively
 * cross-checked in tests/test_native.py) with a scalar fallback. */
static void f32_to_f16_bulk(const float *src, uint16_t *dst, int64_t n) {
  int64_t i = 0;
#if defined(__F16C__)
  for (; i + 8 <= n; i += 8)
    _mm_storeu_si128(
        (__m128i *)(dst + i),
        _mm256_cvtps_ph(_mm256_loadu_ps(src + i), _MM_FROUND_TO_NEAREST_INT));
#endif
  for (; i < n; ++i) dst[i] = f32_to_f16(src[i]);
}

static void f16_to_f32_bulk(const uint16_t *src, float *dst, int64_t n) {
  int64_t i = 0;
#if defined(__F16C__)
  for (; i + 8 <= n; i += 8)
    _mm256_storeu_ps(dst + i,
                     _mm256_cvtph_ps(_mm_loadu_si128((const __m128i *)(src + i))));
#endif
  for (; i < n; ++i) dst[i] = f16_to_f32(src[i]);
}

static float f16_to_f32(uint16_t h) {
  uint32_t sign = (uint32_t)(h & 0x8000u) << 16;
  uint32_t exp = (h >> 10) & 0x1F;
  uint32_t mant = h & 0x3FFu;
  uint32_t x;
  if (exp == 0) {
    if (mant == 0) {
      x = sign;
    } else {
      exp = 127 - 15 + 1;
      while (!(mant & 0x400u)) {
        mant <<= 1;
        exp--;
      }
      mant &= 0x3FFu;
      x = sign | (exp << 23) | (mant << 13);
    }
  } else if (exp == 0x1F) {
    x = sign | 0x7F800000u | (mant << 13);
  } else {
    x = sign | ((exp - 15 + 127) << 23) | (mant << 13);
  }
  float f;
  std::memcpy(&f, &x, 4);
  return f;
}

/* ====================================================================== */
/* SHA-256 (cache keying, python.rs:282-294)                              */
/* ====================================================================== */

namespace sha256 {
static const uint32_t K[64] = {
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
    0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
    0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
    0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2};

static inline uint32_t rotr(uint32_t x, int n) { return (x >> n) | (x << (32 - n)); }

static std::string hex(const std::string &data) {
  uint32_t h[8] = {0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
                   0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19};
  std::vector<uint8_t> msg(data.begin(), data.end());
  uint64_t bitlen = (uint64_t)msg.size() * 8;
  msg.push_back(0x80);
  while (msg.size() % 64 != 56) msg.push_back(0);
  for (int i = 7; i >= 0; --i) msg.push_back((uint8_t)(bitlen >> (i * 8)));

  for (size_t off = 0; off < msg.size(); off += 64) {
    uint32_t w[64];
    for (int i = 0; i < 16; ++i)
      w[i] = (uint32_t)msg[off + 4 * i] << 24 | (uint32_t)msg[off + 4 * i + 1] << 16 |
             (uint32_t)msg[off + 4 * i + 2] << 8 | msg[off + 4 * i + 3];
    for (int i = 16; i < 64; ++i) {
      uint32_t s0 = rotr(w[i - 15], 7) ^ rotr(w[i - 15], 18) ^ (w[i - 15] >> 3);
      uint32_t s1 = rotr(w[i - 2], 17) ^ rotr(w[i - 2], 19) ^ (w[i - 2] >> 10);
      w[i] = w[i - 16] + s0 + w[i - 7] + s1;
    }
    uint32_t a = h[0], b = h[1], c = h[2], d = h[3], e = h[4], f = h[5],
             g = h[6], hh = h[7];
    for (int i = 0; i < 64; ++i) {
      uint32_t S1 = rotr(e, 6) ^ rotr(e, 11) ^ rotr(e, 25);
      uint32_t ch = (e & f) ^ (~e & g);
      uint32_t t1 = hh + S1 + ch + K[i] + w[i];
      uint32_t S0 = rotr(a, 2) ^ rotr(a, 13) ^ rotr(a, 22);
      uint32_t maj = (a & b) ^ (a & c) ^ (b & c);
      uint32_t t2 = S0 + maj;
      hh = g; g = f; f = e; e = d + t1; d = c; c = b; b = a; a = t1 + t2;
    }
    h[0] += a; h[1] += b; h[2] += c; h[3] += d;
    h[4] += e; h[5] += f; h[6] += g; h[7] += hh;
  }
  char out[65];
  for (int i = 0; i < 8; ++i) std::snprintf(out + i * 8, 9, "%08x", h[i]);
  return std::string(out, 64);
}
}  // namespace sha256

/* ====================================================================== */
/* Audio decode: WAV + AIFF (PCM), matching data/audio_io.py               */
/* ====================================================================== */

struct Decoded {
  std::vector<float> left, right;
  int rate = 0;
};

static bool read_file(const char *path, std::vector<uint8_t> &out) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  f.seekg(0, std::ios::end);
  out.resize((size_t)f.tellg());
  f.seekg(0);
  f.read((char *)out.data(), (std::streamsize)out.size());
  return (bool)f;
}

static uint32_t rd_u32le(const uint8_t *p) {
  return (uint32_t)p[0] | (uint32_t)p[1] << 8 | (uint32_t)p[2] << 16 | (uint32_t)p[3] << 24;
}
static uint32_t rd_u32be(const uint8_t *p) {
  return (uint32_t)p[3] | (uint32_t)p[2] << 8 | (uint32_t)p[1] << 16 | (uint32_t)p[0] << 24;
}
static uint16_t rd_u16le(const uint8_t *p) { return (uint16_t)(p[0] | p[1] << 8); }
static uint16_t rd_u16be(const uint8_t *p) { return (uint16_t)(p[1] | p[0] << 8); }

static int decode_pcm(const uint8_t *p, size_t n, int bits, bool little,
                      bool is_float, int channels, Decoded &d) {
  auto push = [&](float v, size_t frame_idx, int ch) {
    (ch == 0 ? d.left : d.right)[frame_idx] = v;
  };
  /* Validate the sample format BEFORE any arithmetic on it: bits == 0 would
   * divide by zero below, and unsupported depths must reject cleanly
   * (malformed files reach this parser straight from user input). */
  if (is_float ? bits != 32
               : (bits != 8 && bits != 16 && bits != 24 && bits != 32))
    return -2;
  size_t bytes_per = (size_t)bits / 8;
  size_t frames = n / (bytes_per * (size_t)channels);
  d.left.assign(frames, 0.0f);
  d.right.assign(frames, 0.0f);
  if (bits == 16 && little && !is_float && (channels == 1 || channels == 2)
#if defined(__BYTE_ORDER__) && defined(__ORDER_LITTLE_ENDIAN__)
      && __BYTE_ORDER__ == __ORDER_LITTLE_ENDIAN__
#else
      && false /* unknown host endianness: take the endian-safe generic loop */
#endif
  ) {
    /* The dominant cases (s16le WAV), written as tight branch-free loops the
     * compiler auto-vectorizes; same arithmetic as the generic loop below
     * (x/32768.0f is exact — power-of-two divisor).  The memcpy reinterprets
     * host-order bytes, so this path is gated to little-endian hosts; others
     * fall through to the rd_u16le generic loop. */
    if (channels == 2) {
      for (size_t i = 0; i < frames; ++i) {
        int16_t l, r;
        std::memcpy(&l, p + 4 * i, 2);
        std::memcpy(&r, p + 4 * i + 2, 2);
        d.left[i] = (float)l / 32768.0f;
        d.right[i] = (float)r / 32768.0f;
      }
    } else {
      for (size_t i = 0; i < frames; ++i) {
        int16_t x;
        std::memcpy(&x, p + 2 * i, 2);
        float v = (float)x / 32768.0f;
        d.left[i] = v;
        d.right[i] = v;
      }
    }
    return 0;
  }
  for (size_t i = 0; i < frames; ++i) {
    for (int c = 0; c < channels; ++c) {
      const uint8_t *s = p + (i * (size_t)channels + (size_t)c) * bytes_per;
      float v = 0.0f;
      if (is_float && bits == 32) {
        uint32_t u = little ? rd_u32le(s) : rd_u32be(s);
        std::memcpy(&v, &u, 4);
      } else if (bits == 16) {
        int16_t x = (int16_t)(little ? rd_u16le(s) : rd_u16be(s));
        v = (float)x / 32768.0f;
      } else if (bits == 24) {
        int32_t x = little ? (s[0] | s[1] << 8 | s[2] << 16)
                           : (s[2] | s[1] << 8 | s[0] << 16);
        if (x & 0x800000) x -= 0x1000000;
        v = (float)x / 8388608.0f;
      } else if (bits == 32) {
        int32_t x = (int32_t)(little ? rd_u32le(s) : rd_u32be(s));
        v = (float)((double)x / 2147483648.0);
      } else if (bits == 8) {
        v = little ? ((float)s[0] - 128.0f) / 128.0f   /* WAV: unsigned */
                   : (float)(int8_t)s[0] / 128.0f;     /* AIFF: signed */
      } else {
        return -2;
      }
      int ch = channels == 1 ? 0 : (c < 2 ? c : -1);
      if (ch >= 0) push(v, i, ch);
    }
    if (channels == 1) d.right[i] = d.left[i];
  }
  return 0;
}

static int decode_wav(const std::vector<uint8_t> &b, Decoded &d) {
  if (b.size() < 12 || std::memcmp(b.data(), "RIFF", 4) ||
      std::memcmp(b.data() + 8, "WAVE", 4))
    return -2;
  size_t pos = 12;
  int fmt = -1, channels = 0, bits = 0;
  const uint8_t *data = nullptr;
  size_t data_len = 0;
  while (pos + 8 <= b.size()) {
    uint32_t size = rd_u32le(b.data() + pos + 4);
    const uint8_t *body = b.data() + pos + 8;
    size_t avail = std::min((size_t)size, b.size() - pos - 8);
    if (!std::memcmp(b.data() + pos, "fmt ", 4) && avail >= 16) {
      fmt = rd_u16le(body);
      channels = rd_u16le(body + 2);
      d.rate = (int)rd_u32le(body + 4);
      bits = rd_u16le(body + 14);
      if (fmt == 0xFFFE && avail >= 26) fmt = rd_u16le(body + 24);
    } else if (!std::memcmp(b.data() + pos, "data", 4)) {
      data = body;
      data_len = avail;
    }
    pos += 8 + size + (size & 1);
  }
  if (fmt < 0 || !data || channels <= 0) return -2;
  bool is_float = fmt == 3;
  if (fmt != 1 && fmt != 3) return -2;
  return decode_pcm(data, data_len, bits, true, is_float, channels, d);
}

static double read_extended80(const uint8_t *p) {
  uint16_t exp_raw = rd_u16be(p);
  uint64_t mant = 0;
  for (int i = 0; i < 8; ++i) mant = (mant << 8) | p[2 + i];
  double sign = (exp_raw & 0x8000) ? -1.0 : 1.0;
  int exp = exp_raw & 0x7FFF;
  if (exp == 0 && mant == 0) return 0.0;
  return sign * (double)mant * std::pow(2.0, exp - 16383 - 63);
}

static int decode_aiff(const std::vector<uint8_t> &b, Decoded &d) {
  if (b.size() < 12 || std::memcmp(b.data(), "FORM", 4)) return -2;
  bool aifc = !std::memcmp(b.data() + 8, "AIFC", 4);
  if (!aifc && std::memcmp(b.data() + 8, "AIFF", 4)) return -2;
  size_t pos = 12;
  int channels = 0, bits = 0;
  bool little = false;
  const uint8_t *frames = nullptr;
  size_t frames_len = 0;
  while (pos + 8 <= b.size()) {
    uint32_t size = rd_u32be(b.data() + pos + 4);
    const uint8_t *body = b.data() + pos + 8;
    size_t avail = std::min((size_t)size, b.size() - pos - 8);
    if (!std::memcmp(b.data() + pos, "COMM", 4) && avail >= 18) {
      channels = rd_u16be(body);
      bits = rd_u16be(body + 6);
      /* extended-80 can encode NaN/inf/out-of-int garbage in a malformed
       * file; lround on those is undefined — range-check as double first. */
      double rate80 = read_extended80(body + 8);
      if (!(rate80 >= 1.0 && rate80 <= 5e7)) return -2;
      d.rate = (int)std::lround(rate80);
      if (aifc && avail >= 22) {
        if (!std::memcmp(body + 18, "sowt", 4)) little = true;
        else if (std::memcmp(body + 18, "NONE", 4)) return -2;
      }
    } else if (!std::memcmp(b.data() + pos, "SSND", 4) && avail >= 8) {
      uint32_t offset = rd_u32be(body);
      if ((size_t)offset > avail - 8) return -2; /* offset past chunk end */
      frames = body + 8 + offset;
      frames_len = avail - 8 - offset;
    }
    pos += 8 + size + (size & 1);
  }
  if (!frames || channels <= 0) return -2;
  return decode_pcm(frames, frames_len, bits, little, false, channels, d);
}

/* -------------------------------------------------- polyphase resample */

static double bessel_i0(double x) {
  /* series expansion; converges fast for the kaiser betas we use */
  double sum = 1.0, term = 1.0;
  double x2 = x * x / 4.0;
  for (int k = 1; k < 64; ++k) {
    term *= x2 / ((double)k * k);
    sum += term;
    if (term < 1e-16 * sum) break;
  }
  return sum;
}

static std::vector<float> resample_channel(const std::vector<float> &x,
                                           int src_rate, int dst_rate) {
  if (src_rate == dst_rate) return x;
  int g = (int)std::gcd(src_rate, dst_rate);
  int up = dst_rate / g, down = src_rate / g;
  const int taps_per_phase = 16;
  int num_taps = taps_per_phase * up;
  if (num_taps % 2 == 0) num_taps += 1; /* symmetric filter */
  double cutoff = 0.5 / std::max(up, down);
  double beta = 8.0;
  std::vector<double> h((size_t)num_taps);
  double center = (num_taps - 1) / 2.0;
  double denom = bessel_i0(beta);
  double sum = 0.0;
  for (int i = 0; i < num_taps; ++i) {
    double t = i - center;
    double sinc = t == 0.0 ? 2 * cutoff : std::sin(2 * M_PI * cutoff * t) / (M_PI * t);
    double r = 2.0 * i / (num_taps - 1) - 1.0;
    double w = bessel_i0(beta * std::sqrt(std::max(0.0, 1.0 - r * r))) / denom;
    h[(size_t)i] = sinc * w;
    sum += sinc * w;
  }
  for (auto &v : h) v = v / sum * up;

  int64_t n = (int64_t)x.size();
  int64_t out_len = (n * up + down - 1) / down;
  std::vector<float> y((size_t)out_len, 0.0f);
  int64_t pad = num_taps / 2;
  for (int64_t m = 0; m < out_len; ++m) {
    /* upsampled index of output sample m */
    int64_t uidx = m * down;
    double acc = 0.0;
    /* x_up[j] nonzero only at j % up == 0 -> input index j/up */
    int64_t jlo = uidx - pad;
    /* first k with (jlo + k) % up == 0 */
    int64_t rem = ((jlo % up) + up) % up;
    int64_t k0 = rem == 0 ? 0 : up - rem;
    for (int64_t k = k0; k < num_taps; k += up) {
      int64_t j = (jlo + k) / up;
      if (j >= 0 && j < n) acc += h[(size_t)k] * x[(size_t)j];
    }
    y[(size_t)m] = (float)acc;
  }
  return y;
}

extern "C" int a2m_decode_audio(const char *path, int sample_rate, float **out,
                                int64_t *out_len) {
  std::vector<uint8_t> bytes;
  if (!read_file(path, bytes)) return -1;
  Decoded d;
  std::string p(path);
  auto ends_with = [&](const char *s) {
    size_t l = std::strlen(s);
    return p.size() >= l &&
           std::equal(p.end() - (long)l, p.end(), s, [](char a, char b) {
             return std::tolower(a) == b;
           });
  };
  int rc;
  if (ends_with(".wav") || ends_with(".wave")) rc = decode_wav(bytes, d);
  else if (ends_with(".aif") || ends_with(".aiff") || ends_with(".aifc"))
    rc = decode_aiff(bytes, d);
  else return -3; /* unsupported container: caller falls back to ffmpeg */
  if (rc != 0) return rc;
  /* A malformed header can declare rate 0 (divide-by-zero in the polyphase
   * ratio), negative (u32 read as int), or absurd (tap-count blowup). */
  if (d.rate <= 0 || d.rate > 50000000) return -2;

  if (d.rate != sample_rate) {
    d.left = resample_channel(d.left, d.rate, sample_rate);
    d.right = resample_channel(d.right, d.rate, sample_rate);
  }
  int64_t n = (int64_t)d.left.size();
  float *buf = (float *)std::malloc(sizeof(float) * 2 * (size_t)n);
  if (!buf) return -4;
  std::memcpy(buf, d.left.data(), sizeof(float) * (size_t)n);
  std::memcpy(buf + n, d.right.data(), sizeof(float) * (size_t)n);
  *out = buf;
  *out_len = n;
  return 0;
}

extern "C" void a2m_normalize_loudness(float *samples, int64_t len) {
  /* python.rs:236-264: silence guard at peak <= 0.05, joint unit variance.
   * The mean-square accumulates in f64 with the division hoisted out of the
   * loop and 4-way partial sums (auto-vectorizable); vs the original
   * per-element `acc += s*s/total` sequential chain this only perturbs the
   * adjustment by ~1e-16 relative — invisible at f32, let alone after the
   * f16 rounding every load path applies (cross-tested vs the numpy twin,
   * whose pairwise summation differs by the same order). */
  int64_t total = 2 * len;
  float peak = 0.0f;
  for (int64_t i = 0; i < total; ++i) peak = std::max(peak, std::fabs(samples[i]));
  if (peak <= 0.05f) return;
  double acc0 = 0.0, acc1 = 0.0, acc2 = 0.0, acc3 = 0.0;
  int64_t i = 0;
  for (; i + 4 <= total; i += 4) {
    acc0 += (double)samples[i] * samples[i];
    acc1 += (double)samples[i + 1] * samples[i + 1];
    acc2 += (double)samples[i + 2] * samples[i + 2];
    acc3 += (double)samples[i + 3] * samples[i + 3];
  }
  for (; i < total; ++i) acc0 += (double)samples[i] * samples[i];
  double acc = (acc0 + acc1 + acc2 + acc3) / (double)total;
  double adjustment = std::sqrt(1.0 / acc);
  for (int64_t j = 0; j < total; ++j)
    samples[j] = (float)((double)samples[j] * adjustment);
}

/* -------------------------------------------------------------- cache */

static std::optional<fs::path> cache_file(const char *path, int sample_rate) {
  const char *dir = std::getenv("SAMPLE_CACHE_DIR");
  if (!dir || !*dir) return std::nullopt;
  std::string hash = sha256::hex(path).substr(0, 30);
  std::string name = hash + "_" + std::to_string(sample_rate);
  return fs::path(dir) / name.substr(0, 4) / (name + ".a2mc");
}

extern "C" int a2m_load_audio_sample_f16(const char *path, int sample_rate,
                                         int skip_cache, uint16_t **out,
                                         int64_t *out_len) {
  /* The f16 core of a2m_load_audio_sample: decode + normalize + cache, with
   * the result left IN the reference's decode dtype (python.rs:236-264).
   * Serving ships raw f16 over the host->device link, so this skips the
   * f16->f32 expansion (and a cache hit is a plain memcpy).
   * skip_cache is a bitmask: bit0 = skip the cache read (python.rs
   * skip_cache semantics — decode fresh, still write), bit1 = skip the
   * write too (load_full_audio never touches the cache, python.rs:373-394).
   * Legacy 0/1 callers keep their old behaviour. */
  auto cpath = cache_file(path, sample_rate);
  if (skip_cache & 2) cpath.reset();
  if (cpath && !(skip_cache & 1) && fs::exists(*cpath)) {
    std::vector<uint8_t> raw;
    if (read_file(cpath->c_str(), raw) && raw.size() >= 12 &&
        !std::memcmp(raw.data(), "A2MC", 4)) {
      int64_t n;
      std::memcpy(&n, raw.data() + 4, 8);
      if ((int64_t)raw.size() == 12 + 2 * n * 2 && n >= 0) {
        uint16_t *buf = (uint16_t *)std::malloc(sizeof(uint16_t) * 2 * (size_t)n);
        if (!buf) return -4;
        std::memcpy(buf, raw.data() + 12, (size_t)(2 * n) * 2);
        *out = buf;
        *out_len = n;
        return 0;
      }
    }
    std::error_code ec;
    fs::remove(*cpath, ec); /* corrupt: self-heal (python.rs:339-343) */
  }

  float *f = nullptr;
  int64_t n = 0;
  int rc = a2m_decode_audio(path, sample_rate, &f, &n);
  if (rc != 0) return rc;
  a2m_normalize_loudness(f, n);
  uint16_t *h = (uint16_t *)std::malloc(sizeof(uint16_t) * 2 * (size_t)n);
  if (!h) {
    std::free(f);
    return -4;
  }
  f32_to_f16_bulk(f, h, 2 * n);
  std::free(f);

  if (cpath) {
    std::error_code ec;
    fs::create_directories(cpath->parent_path(), ec);
    fs::path tmp = *cpath;
    tmp += ".tmp";
    {
      std::ofstream of(tmp, std::ios::binary);
      of.write("A2MC", 4);
      of.write((const char *)&n, 8);
      of.write((const char *)h, (std::streamsize)(2 * n * 2));
    }
    fs::rename(tmp, *cpath, ec);
  }
  *out = h;
  *out_len = n;
  return 0;
}

extern "C" void a2m_f16_to_f32_buf(const uint16_t *src, float *dst,
                                   int64_t n) {
  f16_to_f32_bulk(src, dst, n);
}

extern "C" void a2m_f32_to_f16_buf(const float *src, uint16_t *dst,
                                   int64_t n) {
  f32_to_f16_bulk(src, dst, n);
}

extern "C" int a2m_load_audio_sample(const char *path, int sample_rate,
                                     int skip_cache, float **out,
                                     int64_t *out_len) {
  uint16_t *h = nullptr;
  int64_t n = 0;
  int rc = a2m_load_audio_sample_f16(path, sample_rate, skip_cache, &h, &n);
  if (rc != 0) return rc;
  float *buf = (float *)std::malloc(sizeof(float) * 2 * (size_t)n);
  if (!buf) {
    std::free(h);
    return -4;
  }
  f16_to_f32_bulk(h, buf, 2 * n);
  std::free(h);
  *out = buf;
  *out_len = n;
  return 0;
}

/* ------------------------------------------------------------- labels */

static int64_t round_half_away(double x) {
  return x >= 0 ? (int64_t)std::floor(x + 0.5) : -(int64_t)std::floor(-x + 0.5);
}

/* CSV field parsing with the reference's Rust semantics (python.rs:39-55,
 * 71-84), bit-matched by the numpy twin (data/labels.py):
 *  - time/duration/velocity deserialize as f32 (strict full-token parse;
 *    overflow is NOT an error in Rust — `1e40` parses to inf) and the
 *    quantization arithmetic runs in f32 (`frame_position` takes f32);
 *  - key deserializes as u32 (strict: optional '+', ASCII digits,
 *    <= u32::MAX) — anything else is a serde error that skips the row;
 *  - `x.round() as u32` saturates: NaN -> 0, negative -> 0, overflow caps.
 *    We cap at INT32_MAX instead of UINT32_MAX so events stay int32 across
 *    the C ABI; all consumers ignore frames beyond the raster, so the caps
 *    are behaviorally identical.  `key - 21` is stored signed instead of
 *    u32-wrapped: both are out of the 0..88 vocab for key < 21. */
static int32_t round_u32_sat(float x) {
  if (std::isnan(x)) return 0;
  double xd = (double)x; /* exact; keeps the half-away add exact too */
  double r = xd >= 0 ? std::floor(xd + 0.5) : -std::floor(-xd + 0.5);
  if (r <= 0.0) return 0;
  if (r >= 2147483647.0) return INT32_MAX;
  return (int32_t)r;
}

/* Strict full-token f32 parse; returns false on serde-style errors
 * (empty/partial tokens), true otherwise with +/-inf on overflow. */
static bool parse_f32_strict(const std::string &tok, float *out) {
  if (tok.empty() || tok.find('_') != std::string::npos) return false;
  /* strtof extensions Rust/Python reject: hex floats, nan(payload). */
  if (tok.find_first_of("(xX") != std::string::npos) return false;
  errno = 0;
  const char *s = tok.c_str();
  /* strtof skips leading whitespace Rust would reject; tokens are already
   * trimmed, but reject any residual space to stay strict. */
  if (std::isspace((unsigned char)s[0])) return false;
  char *end = nullptr;
  float v = std::strtof(s, &end);
  if (end != s + tok.size()) return false; /* trailing garbage */
  /* ERANGE covers overflow (-> +/-HUGE_VALF == inf, keep) and underflow
   * (-> denormal/0, keep) — Rust float parsing never errors on range. */
  *out = v;
  return true;
}

/* Rust str::parse::<u32>: optional '+', ASCII digits only, <= u32::MAX. */
static bool parse_u32_strict(const std::string &tok, uint32_t *out) {
  size_t i = tok.size() > 0 && tok[0] == '+' ? 1 : 0;
  if (i >= tok.size()) return false;
  uint64_t v = 0;
  for (; i < tok.size(); ++i) {
    char c = tok[i];
    if (c < '0' || c > '9') return false;
    v = v * 10 + (uint64_t)(c - '0');
    if (v > 0xFFFFFFFFull) return false;
  }
  *out = (uint32_t)v;
  return true;
}

extern "C" int a2m_parse_events_csv(const char *path, double dpf,
                                    int32_t **events_out, int64_t *n_out) {
  std::ifstream f(path);
  if (!f) return -1;
  std::vector<std::array<int32_t, 4>> events;
  std::string line;
  bool first_record = true;
  const float dpf_f = (float)dpf;
  while (std::getline(f, line)) {
    size_t b = line.find_first_not_of(" \t\r\n");
    if (b == std::string::npos) continue;
    size_t e = line.find_last_not_of(" \t\r\n");
    std::string t = line.substr(b, e - b + 1);
    if (t.empty() || t[0] == '%') continue;
    if (first_record) { first_record = false; continue; } /* python.rs:72 */
    std::string toks[4];
    int idx = 0;
    size_t pos = 0;
    bool ok = true;
    while (true) {
      size_t comma = t.find(',', pos);
      std::string tok = t.substr(pos, comma == std::string::npos ? std::string::npos : comma - pos);
      size_t tb = tok.find_first_not_of(" \t");
      if (tb == std::string::npos) tok.clear();
      else {
        size_t te = tok.find_last_not_of(" \t");
        tok = tok.substr(tb, te - tb + 1);
      }
      if (idx >= 4) { ok = false; break; } /* >4 fields: UnequalLengths */
      toks[idx++] = tok;
      if (comma == std::string::npos) break;
      pos = comma + 1;
    }
    if (!ok || idx != 4) continue; /* field-count != 4: row skipped */
    float time_f, dur_f, vel_f;
    uint32_t key_u;
    if (!parse_f32_strict(toks[0], &time_f) ||
        !parse_f32_strict(toks[1], &dur_f) ||
        !parse_u32_strict(toks[2], &key_u) ||
        !parse_f32_strict(toks[3], &vel_f))
      continue; /* serde deserialize error: row skipped */
    int32_t attack = round_u32_sat(time_f / dpf_f);
    int64_t key64 = (int64_t)key_u - 21;
    int32_t key = key64 > INT32_MAX ? INT32_MAX : (int32_t)key64;
    int32_t dur = std::max(round_u32_sat(dur_f / dpf_f), 1);
    int32_t vel = round_u32_sat(vel_f * 10.0f);
    events.push_back({attack, key, dur, vel});
  }
  std::sort(events.begin(), events.end());
  int32_t *buf = (int32_t *)std::malloc(sizeof(int32_t) * 4 * events.size() + 1);
  if (!buf) return -4;
  for (size_t i = 0; i < events.size(); ++i)
    std::memcpy(buf + 4 * i, events[i].data(), 4 * sizeof(int32_t));
  *events_out = buf;
  *n_out = (int64_t)events.size();
  return 0;
}

extern "C" int a2m_rasterize(const int32_t *events, int64_t n_events,
                             int32_t num_frames, int32_t start_frame,
                             int32_t backing_frames, int32_t num_keys,
                             float *out) {
  /* python.rs:423-447 */
  std::memset(out, 0, sizeof(float) * (size_t)num_frames * (size_t)num_keys);
  for (int64_t i = 0; i < n_events; ++i) {
    int32_t key = events[4 * i + 1];
    if (key < 0 || key >= num_keys) continue;
    /* 64-bit frame arithmetic: saturated attack/duration values from a
     * malformed CSV would overflow i32 sums (UB); clamps below bound all
     * indexing to [0, num_frames) either way. */
    int64_t fs = (int64_t)events[4 * i] - start_frame;
    int64_t fe = fs + events[4 * i + 2];
    if (fs > 0 && fs < num_frames) out[(size_t)(fs - 1) * num_keys + key] = 0.0f;
    int64_t lo = std::max<int64_t>(fs, 0);
    int64_t hi = std::min<int64_t>({fe, num_frames, backing_frames});
    for (int64_t fr = lo; fr < hi; ++fr) {
      float t = (float)(fr - fs);
      out[(size_t)fr * num_keys + key] = std::max(std::exp(-0.05f * t), 0.6f);
    }
  }
  return 0;
}

/* ------------------------------------------------------- augmentations */

extern "C" int a2m_transform_for_training(float *audio, float *labels,
                                          int64_t batch, int64_t n_samples,
                                          int64_t n_frames, int64_t n_keys,
                                          const double *s, int pan_parity,
                                          uint64_t seed) {
  /* python.rs:566-932; settings order: pan, channel_switch, cut, rotate,
   * random_erasing, mixup, gain, noise, label_smoothing_alpha */
  if (batch <= 0) return 0;
  std::mt19937_64 rng(seed);
  auto uidx = [&](int64_t n) {
    return (int64_t)(rng() % (uint64_t)n);
  };
  auto uniform = [&](double lo, double hi) {
    return std::uniform_real_distribution<double>(lo, hi)(rng);
  };
  auto L = [&](int64_t b) { return audio + (size_t)b * 2 * n_samples; };
  auto R = [&](int64_t b) { return audio + (size_t)b * 2 * n_samples + n_samples; };
  auto lab = [&](int64_t b) { return labels + (size_t)b * n_frames * n_keys; };
  int64_t apps;

  /* pan (python.rs:721-750) */
  double pan_prob = pan_parity ? s[1] : s[0];
  apps = (int64_t)(pan_prob * (double)batch);
  for (int64_t i = 0; i < apps; ++i) {
    int64_t b = uidx(batch);
    float eps = 0.01f;
    bool lempty = true, rempty = true;
    for (int64_t j = 0; j < n_samples && (lempty || rempty); ++j) {
      if (std::fabs(L(b)[j]) >= eps) lempty = false;
      if (std::fabs(R(b)[j]) >= eps) rempty = false;
    }
    if (lempty || rempty) continue;
    float pf = (float)uniform(0.0, 1.0);
    float lg = std::min(2.0f * (1.0f - pf), 1.0f), rg = std::min(2.0f * pf, 1.0f);
    for (int64_t j = 0; j < n_samples; ++j) {
      L(b)[j] *= lg;
      R(b)[j] *= rg;
    }
  }

  /* channel switch (python.rs:707-719) */
  apps = (int64_t)(s[1] * (double)batch);
  for (int64_t i = 0; i < apps; ++i) {
    int64_t b = uidx(batch);
    std::swap_ranges(L(b), L(b) + n_samples, R(b));
  }

  /* cut mix (python.rs:566-623) */
  apps = (int64_t)(s[2] * (double)batch);
  for (int64_t i = 0; i < apps; ++i) {
    int64_t a = uidx(batch), b = uidx(batch);
    double min_cut = 0.01;
    double cs = uniform(0.0, 1.0 - min_cut);
    double cl = uniform(min_cut, 1.0 - cs);
    int64_t alo = (int64_t)(cs * (double)n_samples),
            ahi = (int64_t)((cs + cl) * (double)n_samples);
    std::vector<float> bl(R(b) - n_samples + alo, R(b) - n_samples + ahi);
    std::vector<float> br(R(b) + alo, R(b) + ahi);
    std::copy(bl.begin(), bl.end(), L(a) + alo);
    std::copy(br.begin(), br.end(), R(a) + alo);
    int64_t flo = (int64_t)(cs * (double)n_frames),
            fhi = (int64_t)((cs + cl) * (double)n_frames);
    std::vector<float> fv(lab(b) + flo * n_keys, lab(b) + fhi * n_keys);
    std::copy(fv.begin(), fv.end(), lab(a) + flo * n_keys);
  }

  /* rotate (python.rs:683-705) */
  apps = (int64_t)(s[3] * (double)batch);
  for (int64_t i = 0; i < apps; ++i) {
    int64_t b = uidx(batch);
    double roll = uniform(0.0, 1.0);
    int64_t ar = (int64_t)(roll * (double)n_samples);
    int64_t fr = (int64_t)(roll * (double)n_frames);
    std::rotate(L(b), L(b) + (n_samples - ar) % n_samples, L(b) + n_samples);
    std::rotate(R(b), R(b) + (n_samples - ar) % n_samples, R(b) + n_samples);
    std::rotate(lab(b), lab(b) + ((n_frames - fr) % n_frames) * n_keys,
                lab(b) + n_frames * n_keys);
  }

  /* random erasing (python.rs:752-777) */
  apps = (int64_t)(s[4] * (double)batch);
  for (int64_t i = 0; i < apps; ++i) {
    int64_t b = uidx(batch);
    double min_e = 0.01, max_e = 0.10;
    double es = uniform(0.0, 1.0 - min_e);
    double el = uniform(min_e, std::min(max_e, 1.0 - es));
    int64_t lo = (int64_t)(es * (double)n_samples),
            hi = (int64_t)((es + el) * (double)n_samples);
    std::fill(L(b) + lo, L(b) + hi, 0.0f);
    std::fill(R(b) + lo, R(b) + hi, 0.0f);
  }

  /* mixup (python.rs:625-681): lambda ~ Beta(2,2); labels elementwise max */
  apps = (int64_t)(s[5] * (double)batch);
  for (int64_t i = 0; i < apps; ++i) {
    int64_t a = uidx(batch), b = uidx(batch);
    std::gamma_distribution<double> gamma2(2.0, 1.0);
    double g1 = gamma2(rng), g2 = gamma2(rng);
    float lam = (float)(g1 / (g1 + g2));
    for (int64_t j = 0; j < n_samples; ++j) {
      L(a)[j] = lam * L(a)[j] + (1.0f - lam) * L(b)[j];
      R(a)[j] = lam * R(a)[j] + (1.0f - lam) * R(b)[j];
    }
    for (int64_t j = 0; j < n_frames * n_keys; ++j)
      lab(a)[j] = std::max(lab(a)[j], lab(b)[j]);
  }

  /* gain (python.rs:779-798) */
  apps = (int64_t)(s[6] * (double)batch);
  for (int64_t i = 0; i < apps; ++i) {
    int64_t b = uidx(batch);
    std::normal_distribution<double> nd(1.0, 0.25);
    float g = (float)std::clamp(nd(rng), 0.5, 1.5);
    for (int64_t j = 0; j < 2 * n_samples; ++j) L(b)[j] *= g;
  }

  /* noise (python.rs:800-820) */
  apps = (int64_t)(s[7] * (double)batch);
  for (int64_t i = 0; i < apps; ++i) {
    int64_t b = uidx(batch);
    double sigma = uniform(0.0, 0.25);
    std::normal_distribution<double> nd(0.0, sigma);
    for (int64_t j = 0; j < n_samples; ++j) {
      L(b)[j] += (float)nd(rng);
      R(b)[j] += (float)nd(rng);
    }
  }

  /* label smoothing (python.rs:822-836) */
  float alpha = (float)s[8];
  if (alpha > 0.0f) {
    for (int64_t b = 0; b < batch; ++b)
      for (int64_t j = 0; j < n_frames * n_keys; ++j)
        lab(b)[j] = std::clamp(lab(b)[j], alpha, 1.0f - alpha);
  }
  return 0;
}

/* ------------------------------------------------------------ stitcher */

extern "C" int a2m_stitch_probs(const float *probs, int64_t windows,
                                int64_t fpw, int64_t keys, double overlap,
                                double dpf, float **out, int64_t *out_frames) {
  /* common.rs:13-45 */
  double ov = overlap / dpf;
  int64_t total = windows * fpw - (int64_t)ov * (windows - 1);
  float *st = (float *)std::calloc((size_t)(total * keys), sizeof(float));
  if (!st) return -4;
  double base = 0.0;
  int64_t blend_limit = (int64_t)std::ceil(ov);
  for (int64_t w = 0; w < windows; ++w) {
    for (int64_t f = 0; f < fpw; ++f) {
      int64_t idx = (int64_t)base + f;
      const float *src = probs + (w * fpw + f) * keys;
      float *dst = st + idx * keys;
      if (w > 0 && f <= blend_limit && ov > 0.0) {
        double blend = (double)f / ov;
        for (int64_t k = 0; k < keys; ++k)
          dst[k] = (float)((1.0 - blend) * (double)dst[k] + blend * (double)src[k]);
      } else {
        std::memcpy(dst, src, sizeof(float) * (size_t)keys);
      }
    }
    base += (double)fpw - ov;
  }
  *out = st;
  *out_frames = total;
  return 0;
}

/* ----------------------------------------------------------- eventizer */

static std::vector<std::array<uint32_t, 4>> extract_events_impl(
    const float *probs, int64_t frames, int64_t keys) {
  /* common.rs:47-144 */
  const float reactivation_gap = 0.1f, reactivation_threshold = 0.4f,
              activation_threshold = 0.5f, deactivation_threshold = 0.1f;
  auto P = [&](int64_t f, int64_t k) { return probs[f * keys + k]; };
  auto duration = [](int64_t end, int64_t start) {
    return (uint32_t)std::max<int64_t>(end - start, 1);
  };
  std::vector<std::array<uint32_t, 4>> events;
  std::vector<int64_t> started(keys, -1);
  for (int64_t f = 0; f < frames; ++f) {
    for (int64_t k = 0; k < keys; ++k) {
      if (started[k] >= 0) {
        int64_t s = started[k];
        if (P(f, k) < deactivation_threshold) {
          events.push_back({(uint32_t)s, (uint32_t)k, duration(f, s), 7});
          started[k] = -1;
        } else {
          float time_since = (float)(f - s);
          bool should_reactivate = false;
          if (time_since > 5.0f) {
            const int64_t samples = 6;
            float prev = 0.0f;
            for (int64_t i = f - samples; i < f; ++i) prev += P(i, k);
            prev /= (float)samples;
            float next = 0.0f;
            for (int64_t i = f; i < std::min(f + samples, frames); ++i)
              next += P(i, k);
            next /= (float)samples;
            should_reactivate = next - prev > reactivation_gap;
          }
          if (f < frames - 1 && P(f, k) < P(f + 1, k)) continue;
          if (P(f, k) > reactivation_threshold && should_reactivate) {
            events.push_back({(uint32_t)s, (uint32_t)k, duration(f - 1, s), 7});
            started[k] = f;
          }
        }
      } else if (P(f, k) > activation_threshold) {
        started[k] = f;
      }
    }
  }
  for (int64_t k = 0; k < keys; ++k)
    if (started[k] >= 0)
      events.push_back(
          {(uint32_t)started[k], (uint32_t)k, duration(frames, started[k]), 7});
  std::sort(events.begin(), events.end());
  return events;
}

extern "C" int a2m_extract_events(const float *probs, int64_t frames,
                                  int64_t keys, uint32_t **events_out,
                                  int64_t *n_out) {
  auto events = extract_events_impl(probs, frames, keys);
  uint32_t *buf = (uint32_t *)std::malloc(sizeof(uint32_t) * 4 * events.size() + 1);
  if (!buf) return -4;
  for (size_t i = 0; i < events.size(); ++i)
    std::memcpy(buf + 4 * i, events[i].data(), 4 * sizeof(uint32_t));
  *events_out = buf;
  *n_out = (int64_t)events.size();
  return 0;
}

/* ----------------------------------------------- mobile C ABI (cbinds.rs) */

extern "C" A2mMidiEventList *extract_midi_events(A2mMultiArray3 data,
                                                 double overlap, double dpf) {
  int64_t windows = (int64_t)data.dims[0], fpw = (int64_t)data.dims[1],
          keys = (int64_t)data.dims[2];
  const uint16_t *h = (const uint16_t *)data.data;
  std::vector<float> dense((size_t)(windows * fpw * keys));
  for (int64_t w = 0; w < windows; ++w)
    for (int64_t f = 0; f < fpw; ++f)
      for (int64_t k = 0; k < keys; ++k)
        dense[(size_t)((w * fpw + f) * keys + k)] = f16_to_f32(
            h[w * (int64_t)data.strides[0] + f * (int64_t)data.strides[1] +
              k * (int64_t)data.strides[2]]);

  float *stitched = nullptr;
  int64_t frames = 0;
  if (a2m_stitch_probs(dense.data(), windows, fpw, keys, overlap, dpf,
                       &stitched, &frames) != 0)
    return nullptr;
  auto events = extract_events_impl(stitched, frames, keys);
  std::free(stitched);

  auto *list = (A2mMidiEventList *)std::malloc(sizeof(A2mMidiEventList));
  list->length = events.size();
  list->capacity = events.size();
  list->ptr = (A2mMidiEvent *)std::malloc(sizeof(A2mMidiEvent) *
                                          std::max<size_t>(events.size(), 1));
  for (size_t i = 0; i < events.size(); ++i) {
    list->ptr[i].attack_time = events[i][0];
    list->ptr[i].note = (uint8_t)events[i][1];
    list->ptr[i].duration = events[i][2];
    list->ptr[i].velocity = (uint8_t)events[i][3];
  }
  return list;
}

extern "C" void free_midi_events(A2mMidiEventList *list) {
  if (list) {
    std::free(list->ptr);
    std::free(list);
  }
}

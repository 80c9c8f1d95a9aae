// Native audio front-end for csm_mlx_tpu: WAV I/O, mono mixdown, and a
// polyphase windowed-sinc resampler.
//
// The reference delegates this to the audiofile/audresample C libraries
// (/root/reference/csm_mlx/utils.py:9-27); neither ships in this
// environment, so the framework carries its own native implementation,
// exposed through a C ABI consumed via ctypes (csm_mlx_tpu/utils/audio.py).
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// WAV I/O (RIFF PCM16/24/32 + IEEE float32)
// ---------------------------------------------------------------------------

struct WavInfo {
  int32_t sample_rate;
  int32_t channels;
  int64_t frames;  // samples per channel
};

static uint32_t rd_u32(const uint8_t* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}
static uint16_t rd_u16(const uint8_t* p) {
  return (uint16_t)p[0] | ((uint16_t)p[1] << 8);
}

// Returns 0 on success. Allocates *out with malloc (interleaved float32).
int wav_read(const char* path, float** out, WavInfo* info) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (size < 44) {
    fclose(f);
    return -2;
  }
  std::vector<uint8_t> buf((size_t)size);
  if (fread(buf.data(), 1, (size_t)size, f) != (size_t)size) {
    fclose(f);
    return -3;
  }
  fclose(f);

  if (memcmp(buf.data(), "RIFF", 4) != 0 || memcmp(buf.data() + 8, "WAVE", 4) != 0)
    return -4;

  uint16_t fmt = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  const uint8_t* data = nullptr;
  uint32_t data_len = 0;

  size_t pos = 12;
  while (pos + 8 <= (size_t)size) {
    const uint8_t* chunk = buf.data() + pos;
    uint32_t chunk_len = rd_u32(chunk + 4);
    // A declared chunk_len larger than the remaining bytes must not let the
    // fmt-field reads below run past the buffer.
    if (memcmp(chunk, "fmt ", 4) == 0 && chunk_len >= 16 &&
        pos + 8 + chunk_len <= (size_t)size) {
      fmt = rd_u16(chunk + 8);
      channels = rd_u16(chunk + 10);
      rate = rd_u32(chunk + 12);
      bits = rd_u16(chunk + 22);
      if (fmt == 0xFFFE && chunk_len >= 40) {  // WAVE_FORMAT_EXTENSIBLE
        fmt = rd_u16(chunk + 32);              // subformat GUID leading u16
      }
    } else if (memcmp(chunk, "data", 4) == 0) {
      data = chunk + 8;
      data_len = chunk_len;
      if (pos + 8 + data_len > (size_t)size) data_len = (uint32_t)(size - pos - 8);
    }
    // 64-bit advance: with uint32 arithmetic a declared chunk_len near
    // UINT32_MAX wraps `8 + chunk_len + pad` to 0 and the walk never
    // terminates (a malformed file would wedge the process inside native
    // code, holding the GIL).
    pos += 8 + (size_t)chunk_len + (chunk_len & 1);
  }
  if (!data || channels == 0 || rate == 0) return -5;

  int64_t total = 0;
  if (fmt == 1 && bits == 16)
    total = data_len / 2;
  else if (fmt == 1 && bits == 24)
    total = data_len / 3;
  else if (fmt == 1 && bits == 32)
    total = data_len / 4;
  else if (fmt == 3 && bits == 32)
    total = data_len / 4;
  else
    return -6;

  float* samples = (float*)malloc(sizeof(float) * (size_t)total);
  if (!samples) return -7;

  if (fmt == 1 && bits == 16) {
    for (int64_t i = 0; i < total; i++) {
      int16_t v = (int16_t)rd_u16(data + i * 2);
      samples[i] = (float)v / 32768.0f;
    }
  } else if (fmt == 1 && bits == 24) {
    for (int64_t i = 0; i < total; i++) {
      const uint8_t* p = data + i * 3;
      int32_t v = (int32_t)((uint32_t)p[0] << 8 | (uint32_t)p[1] << 16 |
                            (uint32_t)p[2] << 24) >> 8;
      samples[i] = (float)v / 8388608.0f;
    }
  } else if (fmt == 1 && bits == 32) {
    for (int64_t i = 0; i < total; i++) {
      int32_t v = (int32_t)rd_u32(data + i * 4);
      samples[i] = (float)((double)v / 2147483648.0);
    }
  } else {  // float32
    memcpy(samples, data, (size_t)total * 4);
  }

  *out = samples;
  info->sample_rate = (int32_t)rate;
  info->channels = (int32_t)channels;
  info->frames = total / channels;
  return 0;
}

int wav_write(const char* path, const float* data, int64_t frames, int32_t channels,
              int32_t rate, int32_t bits) {
  if (bits != 16 && bits != 32) return -1;
  FILE* f = fopen(path, "wb");
  if (!f) return -2;

  int64_t total = frames * channels;
  uint32_t bytes_per = (uint32_t)(bits / 8);
  uint32_t data_len = (uint32_t)(total * bytes_per);
  uint16_t fmt = bits == 16 ? 1 : 3;

  uint8_t hdr[44];
  memcpy(hdr, "RIFF", 4);
  uint32_t riff_len = 36 + data_len;
  memcpy(hdr + 4, &riff_len, 4);
  memcpy(hdr + 8, "WAVEfmt ", 8);
  uint32_t fmt_len = 16;
  memcpy(hdr + 16, &fmt_len, 4);
  memcpy(hdr + 20, &fmt, 2);
  uint16_t ch16 = (uint16_t)channels;
  memcpy(hdr + 22, &ch16, 2);
  memcpy(hdr + 24, &rate, 4);
  uint32_t byte_rate = (uint32_t)rate * channels * bytes_per;
  memcpy(hdr + 28, &byte_rate, 4);
  uint16_t block = (uint16_t)(channels * bytes_per);
  memcpy(hdr + 32, &block, 2);
  uint16_t b16 = (uint16_t)bits;
  memcpy(hdr + 34, &b16, 2);
  memcpy(hdr + 36, "data", 4);
  memcpy(hdr + 40, &data_len, 4);
  // Check every write: a full disk must fail (Python then falls back /
  // raises), not return success on a truncated file.
  size_t ok = fwrite(hdr, 1, 44, f) == 44;

  if (bits == 16) {
    std::vector<int16_t> pcm((size_t)total);
    for (int64_t i = 0; i < total; i++) {
      float v = data[i];
      if (v > 1.0f) v = 1.0f;
      if (v < -1.0f) v = -1.0f;
      pcm[(size_t)i] = (int16_t)lrintf(v * 32767.0f);
    }
    ok = ok && fwrite(pcm.data(), 2, (size_t)total, f) == (size_t)total;
  } else {
    ok = ok && fwrite(data, 4, (size_t)total, f) == (size_t)total;
  }
  ok = (fclose(f) == 0) && ok;
  return ok ? 0 : -2;
}

// ---------------------------------------------------------------------------
// Mono mixdown
// ---------------------------------------------------------------------------

void mixdown(const float* interleaved, int64_t frames, int32_t channels, float* out) {
  if (channels == 1) {
    memcpy(out, interleaved, sizeof(float) * (size_t)frames);
    return;
  }
  for (int64_t i = 0; i < frames; i++) {
    double acc = 0.0;
    for (int32_t c = 0; c < channels; c++) acc += interleaved[i * channels + c];
    out[i] = (float)(acc / channels);
  }
}

// ---------------------------------------------------------------------------
// Polyphase windowed-sinc resampler
// ---------------------------------------------------------------------------

static int64_t gcd64(int64_t a, int64_t b) {
  while (b) {
    int64_t t = a % b;
    a = b;
    b = t;
  }
  return a;
}

static double bessel_i0(double x) {
  // Series expansion; converges fast for the beta values used here.
  double sum = 1.0, term = 1.0;
  for (int k = 1; k < 64; k++) {
    term *= (x / (2.0 * k)) * (x / (2.0 * k));
    sum += term;
    if (term < 1e-12 * sum) break;
  }
  return sum;
}

// Output length for resample(n_in, sr_in, sr_out).
int64_t resample_out_len(int64_t n_in, int32_t sr_in, int32_t sr_out) {
  int64_t g = gcd64(sr_in, sr_out);
  int64_t up = sr_out / g, down = sr_in / g;
  return (n_in * up + down - 1) / down;
}

// Kaiser-windowed sinc polyphase resampler, zero-phase, scipy
// resample_poly-compatible shape (half-taps each side).
int resample(const float* in, int64_t n_in, int32_t sr_in, int32_t sr_out,
             float* out /* size resample_out_len */) {
  if (sr_in == sr_out) {
    memcpy(out, in, sizeof(float) * (size_t)n_in);
    return 0;
  }
  int64_t g = gcd64(sr_in, sr_out);
  int64_t up = sr_out / g, down = sr_in / g;

  // Filter design: cutoff at min(1/up, 1/down) of Nyquist, 10 taps/zero-x.
  int64_t max_rate = up > down ? up : down;
  double f_c = 1.0 / (double)(2 * max_rate);  // normalized (fs=1)
  int64_t half_len = 10 * max_rate;           // scipy resample_poly default
  double beta = 5.0;

  int64_t n_taps = 2 * half_len + 1;
  std::vector<double> h((size_t)n_taps);
  double i0b = bessel_i0(beta);
  for (int64_t i = 0; i < n_taps; i++) {
    double m = (double)(i - half_len);
    double sinc = (m == 0.0) ? 2.0 * f_c
                             : sin(2.0 * M_PI * f_c * m) / (M_PI * m);
    double frac = m / (double)half_len;
    double w = bessel_i0(beta * sqrt(1.0 - frac * frac > 0 ? 1.0 - frac * frac : 0.0)) / i0b;
    h[(size_t)i] = sinc * w * (double)up;
  }

  // Polyphase evaluation: out[j] = sum_k h[j'*...], zero-phase alignment like
  // scipy.signal.resample_poly (group delay half_len compensated).
  const int64_t n_out = resample_out_len(n_in, sr_in, sr_out);  // loop-invariant
  for (int64_t j = 0; j < n_out; j++) {
    // Output j corresponds to input time t = j * down / up.
    int64_t num = j * down;           // position in upsampled grid
    // Filter centered at num + half_len in upsampled coordinates.
    double acc = 0.0;
    // Input sample i contributes via tap h[num + half_len - i*up].
    int64_t tap_hi = num + half_len;
    int64_t i_lo = (tap_hi - (n_taps - 1) + up - 1) / up;  // ceil
    int64_t i_hi = tap_hi / up;                            // floor
    if (i_lo < 0) i_lo = 0;
    if (i_hi >= n_in) i_hi = n_in - 1;
    for (int64_t i = i_lo; i <= i_hi; i++) {
      int64_t tap = tap_hi - i * up;
      acc += (double)in[i] * h[(size_t)tap];
    }
    out[j] = (float)acc;
  }
  return 0;
}

void free_buffer(float* p) { free(p); }

}  // extern "C"

// stito_dsp — native CPU effect-chain engine.
//
// Role in the framework: the reference ran its chain through pedalboard
// (C++/JUCE, including VST3 hosting). The TPU build's hot path is XLA, but a
// native CPU executor is still needed for (a) exact time-domain golden
// references validating the frequency-sampled JAX kernels, (b) CPU serving
// without an accelerator, (c) fast host-side datagen. This file implements
// the Basic effect set with the same parameter semantics as
// st_ito_tpu.chain.effects (raw [0,1] parameter vectors, same denorm
// ranges), exposed through a minimal C ABI for ctypes.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libstito_dsp.so stito_dsp.cpp

#include <cmath>
#include <cstring>
#include <vector>
#include <algorithm>

namespace {

constexpr float kPi = 3.14159265358979323846f;

inline float denorm(float w, float lo, float hi) { return w * (hi - lo) + lo; }

// ---------------------------------------------------------------- biquads

struct Biquad {
  float b0 = 1, b1 = 0, b2 = 0, a1 = 0, a2 = 0;
  float s1 = 0, s2 = 0;

  inline float tick(float x) {
    float y = b0 * x + s1;
    s1 = b1 * x - a1 * y + s2;
    s2 = b2 * x - a2 * y;
    return y;
  }
};

enum class FilterType { LowShelf, HighShelf, Peaking, LowPass, HighPass };

Biquad design_biquad(FilterType type, float gain_db, float fc, float q,
                     float sr) {
  float A = std::pow(10.0f, gain_db / 40.0f);
  float w0 = 2.0f * kPi * fc / sr;
  float alpha = std::sin(w0) / (2.0f * q);
  float c = std::cos(w0);
  float sA = std::sqrt(A);
  float b0, b1, b2, a0, a1, a2;
  switch (type) {
    case FilterType::LowShelf:
      b0 = A * ((A + 1) - (A - 1) * c + 2 * sA * alpha);
      b1 = 2 * A * ((A - 1) - (A + 1) * c);
      b2 = A * ((A + 1) - (A - 1) * c - 2 * sA * alpha);
      a0 = (A + 1) + (A - 1) * c + 2 * sA * alpha;
      a1 = -2 * ((A - 1) + (A + 1) * c);
      a2 = (A + 1) + (A - 1) * c - 2 * sA * alpha;
      break;
    case FilterType::HighShelf:
      b0 = A * ((A + 1) + (A - 1) * c + 2 * sA * alpha);
      b1 = -2 * A * ((A - 1) + (A + 1) * c);
      b2 = A * ((A + 1) + (A - 1) * c - 2 * sA * alpha);
      a0 = (A + 1) - (A - 1) * c + 2 * sA * alpha;
      a1 = 2 * ((A - 1) - (A + 1) * c);
      a2 = (A + 1) - (A - 1) * c - 2 * sA * alpha;
      break;
    case FilterType::Peaking:
      b0 = 1 + alpha * A;
      b1 = -2 * c;
      b2 = 1 - alpha * A;
      a0 = 1 + alpha / A;
      a1 = -2 * c;
      a2 = 1 - alpha / A;
      break;
    case FilterType::LowPass:
      b0 = (1 - c) / 2; b1 = 1 - c; b2 = (1 - c) / 2;
      a0 = 1 + alpha; a1 = -2 * c; a2 = 1 - alpha;
      break;
    case FilterType::HighPass:
      b0 = (1 + c) / 2; b1 = -(1 + c); b2 = (1 + c) / 2;
      a0 = 1 + alpha; a1 = -2 * c; a2 = 1 - alpha;
      break;
  }
  Biquad f;
  f.b0 = b0 / a0; f.b1 = b1 / a0; f.b2 = b2 / a0;
  f.a1 = a1 / a0; f.a2 = a2 / a0;
  return f;
}

// ------------------------------------------------------------ parametric EQ
// 18 params: 6 sections x (gain, cutoff, q); ranges match
// st_ito_tpu.chain.effects.basic_parametric_eq.

void process_eq(float* audio, int C, int T, float sr, const float* w) {
  for (int ch = 0; ch < C; ++ch) {
    Biquad sections[6];
    sections[0] = design_biquad(FilterType::LowShelf,
                                denorm(w[0], -24, 24),
                                denorm(w[1], 20, 4000),
                                denorm(w[2], 0.1f, 4), sr);
    for (int b = 0; b < 4; ++b) {
      sections[1 + b] = design_biquad(FilterType::Peaking,
                                      denorm(w[3 + 3 * b], -24, 24),
                                      denorm(w[4 + 3 * b], 20, 10000),
                                      denorm(w[5 + 3 * b], 0.1f, 4), sr);
    }
    sections[5] = design_biquad(FilterType::HighShelf,
                                denorm(w[15], -24, 24),
                                denorm(w[16], 200, 18000),
                                denorm(w[17], 0.1f, 4), sr);
    float* x = audio + (size_t)ch * T;
    for (int n = 0; n < T; ++n) {
      float v = x[n];
      for (auto& s : sections) v = s.tick(v);
      x[n] = v;
    }
  }
}

// ------------------------------------------------------------- compressor
// 4 params (threshold, ratio, attack, release), hard-ish knee (0.5 dB),
// per-channel detection, decoupled attack/release detector — the same
// algorithm as st_ito_tpu.ops.dynamics (Giannoulis et al. 2012).

void process_compressor(float* audio, int C, int T, float sr, const float* w) {
  float threshold = denorm(w[0], -80, 0);
  float ratio = denorm(w[1], 1, 20);
  float attack_ms = std::max(denorm(w[2], 0.1f, 100), 1e-3f);
  float release_ms = std::max(denorm(w[3], 10, 1000), 1e-3f);
  float knee = 0.5f;
  float aa = std::exp(-1.0f / (attack_ms * 0.001f * sr));
  float ar = std::exp(-1.0f / (release_ms * 0.001f * sr));
  float slope = 1.0f / ratio - 1.0f;

  for (int ch = 0; ch < C; ++ch) {
    float* x = audio + (size_t)ch * T;
    float y1 = 0.0f, g = 0.0f;
    for (int n = 0; n < T; ++n) {
      float env_db = 20.0f * std::log10(std::max(std::fabs(x[n]), 1e-8f));
      float over = env_db - threshold;
      float gr;
      if (2 * over < -knee) gr = 0.0f;
      else if (2 * over > knee) gr = slope * over;
      else gr = slope * (over + knee / 2) * (over + knee / 2) / (2 * knee);
      // decoupled detector: release stage then attack one-pole
      y1 = std::min(gr, ar * y1 + (1 - ar) * gr);
      g = aa * g + (1 - aa) * y1;
      x[n] *= std::pow(10.0f, g / 20.0f);
    }
  }
}

// -------------------------------------------------------------- distortion

void process_distortion(float* audio, int C, int T, float sr, const float* w) {
  float drive = std::pow(10.0f, denorm(w[0], -48, 48) / 20.0f);
  float out_gain = std::pow(10.0f, denorm(w[1], -24, 24) / 20.0f);
  size_t n = (size_t)C * T;
  for (size_t i = 0; i < n; ++i)
    audio[i] = std::tanh(audio[i] * drive) * out_gain;
}

// ------------------------------------------------------------------ delay
// wet[n] = x[n-D] + fb*wet[n-D]; fractional D via linear interpolation.

void process_delay(float* audio, int C, int T, float sr, const float* w) {
  float D = denorm(w[0], 0.01f, 1.0f) * sr;
  float fb = denorm(w[1], 0.05f, 1.0f) * 0.999f;
  float mix = denorm(w[2], 0.0f, 1.0f);
  int buf_len = (int)std::ceil(D) + 2;

  for (int ch = 0; ch < C; ++ch) {
    float* x = audio + (size_t)ch * T;
    std::vector<float> wet(T, 0.0f);
    auto read_at = [&](const float* sig, float pos) -> float {
      if (pos < 0.0f) return 0.0f;
      int i0 = (int)pos;
      float frac = pos - i0;
      float a = sig[i0];
      float b = (i0 + 1 < T) ? sig[i0 + 1] : 0.0f;
      return (1 - frac) * a + frac * b;
    };
    for (int n = 0; n < T; ++n) {
      float xd = read_at(x, n - D);
      float wd = read_at(wet.data(), n - D);
      wet[n] = xd + fb * wd;
    }
    for (int n = 0; n < T; ++n) x[n] = (1 - mix) * x[n] + mix * wet[n];
  }
  (void)buf_len;
}

// --------------------------------------------------------------- freeverb
// JUCE-style Schroeder reverb; tunings at 44.1k scaled to sr, right channel
// offset by 23 samples; wet1/wet2 stereo width mixing.

constexpr int kCombTunings[8] = {1116, 1188, 1277, 1356, 1422, 1491, 1557, 1617};
constexpr int kAllpassTunings[4] = {556, 441, 341, 225};
constexpr int kStereoSpread = 23;

struct Comb {
  std::vector<float> buf;
  int idx = 0;
  float filterstore = 0;
  float feedback = 0.5f, damp = 0.2f;

  void init(int size) { buf.assign(std::max(size, 1), 0.0f); }
  inline float tick(float input) {
    float out = buf[idx];
    filterstore = out * (1 - damp) + filterstore * damp;
    buf[idx] = input + filterstore * feedback;
    if (++idx >= (int)buf.size()) idx = 0;
    return out;
  }
};

struct Allpass {
  std::vector<float> buf;
  int idx = 0;
  void init(int size) { buf.assign(std::max(size, 1), 0.0f); }
  inline float tick(float input) {
    float bufout = buf[idx];
    buf[idx] = input + bufout * 0.5f;
    if (++idx >= (int)buf.size()) idx = 0;
    return bufout - input;
  }
};

void process_reverb(float* audio, int C, int T, float sr, const float* w) {
  float room = denorm(w[0], 0, 1);
  float damping = denorm(w[1], 0, 1);
  float wet_dry = denorm(w[2], 0, 1);
  float width = denorm(w[3], 0, 1);

  float feedback = room * 0.28f + 0.7f;
  float damp = damping * 0.4f;
  float gain_in = 0.015f;
  float wet = wet_dry;
  float dry = (1.0f - wet_dry) * 2.0f;
  float wet1 = 0.5f * wet * 3.0f * (1.0f + width);
  float wet2 = 0.5f * wet * 3.0f * (1.0f - width);

  int n_ch = (C >= 2) ? 2 : 1;
  std::vector<std::vector<Comb>> combs(n_ch, std::vector<Comb>(8));
  std::vector<std::vector<Allpass>> aps(n_ch, std::vector<Allpass>(4));
  for (int ch = 0; ch < n_ch; ++ch) {
    int spread = (ch == 1) ? kStereoSpread : 0;
    for (int i = 0; i < 8; ++i) {
      combs[ch][i].init((int)(sr * (kCombTunings[i] + spread) / 44100.0f));
      combs[ch][i].feedback = feedback;
      combs[ch][i].damp = damp;
    }
    for (int i = 0; i < 4; ++i)
      aps[ch][i].init((int)(sr * (kAllpassTunings[i] + spread) / 44100.0f));
  }

  if (C == 1) {
    float* x = audio;
    for (int n = 0; n < T; ++n) {
      float input = x[n] * gain_in;
      float out = 0;
      for (auto& cb : combs[0]) out += cb.tick(input);
      for (auto& ap : aps[0]) out = ap.tick(out);
      x[n] = dry * x[n] + 3.0f * wet * out;
    }
  } else {
    float* xl = audio;
    float* xr = audio + T;
    for (int n = 0; n < T; ++n) {
      float input = (xl[n] + xr[n]) * gain_in;
      float outl = 0, outr = 0;
      for (auto& cb : combs[0]) outl += cb.tick(input);
      for (auto& cb : combs[1]) outr += cb.tick(input);
      for (auto& ap : aps[0]) outl = ap.tick(outl);
      for (auto& ap : aps[1]) outr = ap.tick(outr);
      float yl = wet1 * outl + wet2 * outr + dry * xl[n];
      float yr = wet1 * outr + wet2 * outl + dry * xr[n];
      xl[n] = yl;
      xr[n] = yr;
    }
  }
}

// ------------------------------------------------------------- gain et al.

void process_gain(float* audio, int C, int T, float sr, const float* w) {
  float g = std::pow(10.0f, denorm(w[0], -24, 24) / 20.0f);
  size_t n = (size_t)C * T;
  for (size_t i = 0; i < n; ++i) audio[i] *= g;
}

void process_limiter(float* audio, int C, int T, float sr, const float* w) {
  float threshold = denorm(w[0], -40, 0);
  float release_ms = denorm(w[1], 10, 1000);
  // limiter = linked compressor, ratio 1000, 0.05 ms attack, 0.1 dB knee
  float aa = std::exp(-1.0f / (0.05f * 0.001f * sr));
  float ar = std::exp(-1.0f / (release_ms * 0.001f * sr));
  float slope = 1.0f / 1000.0f - 1.0f;
  float knee = 0.1f;
  float y1 = 0, g = 0;
  for (int n = 0; n < T; ++n) {
    float peak = 0;
    for (int ch = 0; ch < C; ++ch)
      peak = std::max(peak, std::fabs(audio[(size_t)ch * T + n]));
    float env_db = 20.0f * std::log10(std::max(peak, 1e-8f));
    float over = env_db - threshold;
    float gr;
    if (2 * over < -knee) gr = 0.0f;
    else if (2 * over > knee) gr = slope * over;
    else gr = slope * (over + knee / 2) * (over + knee / 2) / (2 * knee);
    y1 = std::min(gr, ar * y1 + (1 - ar) * gr);
    g = aa * g + (1 - aa) * y1;
    float lin = std::pow(10.0f, g / 20.0f);
    for (int ch = 0; ch < C; ++ch) audio[(size_t)ch * T + n] *= lin;
  }
}

struct EffectDef {
  int num_params;
  void (*fn)(float*, int, int, float, const float*);
};

// ids must match st_ito_tpu.native.EFFECT_IDS
const EffectDef kEffects[] = {
    {18, process_eq},          // 0
    {4, process_compressor},   // 1
    {2, process_distortion},   // 2
    {3, process_delay},        // 3
    {4, process_reverb},       // 4
    {1, process_gain},         // 5
    {2, process_limiter},      // 6
};
constexpr int kNumEffects = sizeof(kEffects) / sizeof(kEffects[0]);

}  // namespace

extern "C" {

int stito_num_params(int effect_id) {
  if (effect_id < 0 || effect_id >= kNumEffects) return -1;
  return kEffects[effect_id].num_params;
}

// Process a serial chain in place. audio: C*T floats (channel-major).
// w layout matches the JAX chain executor: per stage, optional leading
// bypass slot (w > 0.5 skips the stage) then the stage's raw params.
// Returns 0 on success.
int stito_process_chain(float* audio, int C, int T, float sr,
                        const int* effect_ids, int n_effects, const float* w,
                        int n_params, int with_bypass, int normalize_output) {
  int widx = 0;
  for (int e = 0; e < n_effects; ++e) {
    int id = effect_ids[e];
    if (id < 0 || id >= kNumEffects) return -2;
    const EffectDef& def = kEffects[id];
    bool bypass = false;
    if (with_bypass) {
      if (widx >= n_params) return -3;
      bypass = w[widx] > 0.5f;
      widx += 1;
    }
    if (widx + def.num_params > n_params) return -3;
    if (!bypass) def.fn(audio, C, T, sr, w + widx);
    widx += def.num_params;
  }
  if (normalize_output) {
    float peak = 1e-8f;
    size_t n = (size_t)C * T;
    for (size_t i = 0; i < n; ++i) peak = std::max(peak, std::fabs(audio[i]));
    for (size_t i = 0; i < n; ++i) audio[i] /= peak;
  }
  return 0;
}

}  // extern "C"

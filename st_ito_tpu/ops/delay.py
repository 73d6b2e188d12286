"""Delay-line effects: feedback delay, chorus, phaser.

TPU design:
- Feedback delay is LTI for fixed delay/feedback: wet response
  H(w) = e^{-jwD} / (1 - fb e^{-jwD}) applied by FFT with a full
  signal-length guard band; fractional D is exact in the phase term.
  (pedalboard.Delay semantics, reference: st_ito/effects.py:919-934.)
- Chorus is a time-varying fractional delay: a parallel gather with linear
  interpolation; feedback is unrolled as K geometric passes (the loop gain
  decays as fb^k, truncated when < -60 dBFS worst case K=8).
- Phaser is a cascade of time-varying first-order allpasses; each is a linear
  time-varying recurrence evaluated with a parallel prefix scan.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from st_ito_tpu.ops.iir import linear_recurrence, next_pow2


def feedback_delay(
    x: jnp.ndarray,
    sample_rate: float,
    delay_seconds,
    feedback,
    mix,
) -> jnp.ndarray:
    """y = (1-mix)*x + mix*wet, wet[n] = x[n-D] + fb*wet[n-D]."""
    T = x.shape[-1]
    n = next_pow2(2 * T)
    D = jnp.asarray(delay_seconds, jnp.float32) * sample_rate
    fb = jnp.asarray(feedback, jnp.float32)
    mix = jnp.asarray(mix, jnp.float32)

    w = jnp.linspace(0.0, math.pi, n // 2 + 1, dtype=jnp.float32)
    # exact integer phase reduction: direct f32 w*D loses ~1e-2 rad at
    # (k ~ 2^18)*(D ~ 5e4); must match chain/responses.reduced_phase so the
    # batched and per-candidate renderers agree bit-near-exactly
    Di = jnp.floor(D)
    Df = D - Di
    m = (jnp.arange(n // 2 + 1, dtype=jnp.int32) * Di.astype(jnp.int32)
         ) & (n - 1)
    theta = (2.0 * math.pi / n) * m.astype(jnp.float32) + w * Df
    zD = jax.lax.complex(jnp.cos(theta), -jnp.sin(theta))
    H = zD / (1.0 - fb * 0.999 * zD)  # 0.999 bounds the tail at fb=1

    X = jnp.fft.rfft(x, n=n, axis=-1)
    wet = jnp.fft.irfft(X * H, n=n, axis=-1)[..., :T].astype(x.dtype)
    return (1.0 - mix) * x + mix * wet


def chorus(
    x: jnp.ndarray,
    sample_rate: float,
    rate_hz,
    centre_delay_ms,
    depth,
    feedback,
    mix,
    num_feedback_passes: int = 4,
) -> jnp.ndarray:
    """LFO-modulated fractional delay (pedalboard.Chorus-style,
    reference: st_ito/effects.py:962-985)."""
    T = x.shape[-1]
    t = jnp.arange(T, dtype=jnp.float32)
    centre = jnp.asarray(centre_delay_ms, jnp.float32) * 1e-3 * sample_rate
    depth_samp = jnp.asarray(depth, jnp.float32) * 0.5 * centre
    lfo = jnp.sin(2.0 * math.pi * jnp.asarray(rate_hz, jnp.float32) * t / sample_rate)
    d = jnp.maximum(centre + depth_samp * lfo, 1.0)  # (T,) delay in samples

    def frac_delay(sig):
        pos = t - d
        pos = jnp.clip(pos, 0.0, T - 1.0)
        i0 = jnp.floor(pos).astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, T - 1)
        frac = pos - i0
        mask = (t >= d).astype(sig.dtype)
        return ((1.0 - frac) * jnp.take(sig, i0, axis=-1)
                + frac * jnp.take(sig, i1, axis=-1)) * mask

    fb = jnp.asarray(feedback, jnp.float32) * 0.95
    wet = frac_delay(x)
    acc = wet
    for _ in range(num_feedback_passes):
        wet = frac_delay(wet) * fb
        acc = acc + wet
    mix = jnp.asarray(mix, jnp.float32)
    return (1.0 - mix) * x + mix * acc


def phaser(
    x: jnp.ndarray,
    sample_rate: float,
    rate_hz,
    depth,
    centre_frequency_hz,
    feedback,
    mix,
    num_stages: int = 6,
) -> jnp.ndarray:
    """Cascade of LFO-swept first-order allpasses (pedalboard.Phaser-style).

    Each stage: y[n] = -a[n] x[n] + x[n-1] + a[n] y[n-1], a linear
    time-varying recurrence solved in parallel.
    """
    T = x.shape[-1]
    t = jnp.arange(T, dtype=jnp.float32)
    lfo = 0.5 * (1.0 + jnp.sin(
        2.0 * math.pi * jnp.asarray(rate_hz, jnp.float32) * t / sample_rate
    ))
    centre = jnp.asarray(centre_frequency_hz, jnp.float32)
    depth = jnp.asarray(depth, jnp.float32)
    # sweep one octave either side of centre, scaled by depth
    f = centre * 2.0 ** (depth * (2.0 * lfo - 1.0))
    f = jnp.clip(f, 20.0, 0.49 * sample_rate)
    tan_half = jnp.tan(math.pi * f / sample_rate)
    a = (tan_half - 1.0) / (tan_half + 1.0)  # (T,)

    def allpass(sig):
        # y[n] = a[n]*(sig[n] - y[n-1]... ) standard 1st-order TDF:
        # y[n] = a[n]*sig[n] + d[n-1];  d[n] = sig[n] - a[n]*y[n]
        # expand: y[n] = a[n] sig[n] + sig[n-1] - a[n-1] y[n-1]
        sig_prev = jnp.concatenate([jnp.zeros_like(sig[..., :1]), sig[..., :-1]], axis=-1)
        a_prev = jnp.concatenate([jnp.zeros_like(a[:1]), a[:-1]], axis=-1)
        coeff = jnp.broadcast_to(-a_prev, sig.shape).astype(sig.dtype)
        drive = a * sig + sig_prev
        return linear_recurrence(coeff, drive)

    wet = x
    for _ in range(num_stages):
        wet = allpass(wet)
    fb = jnp.asarray(feedback, jnp.float32)
    wet = wet + fb * x  # simple feed-forward approximation of loop feedback
    mix = jnp.asarray(mix, jnp.float32)
    return (1.0 - mix) * x + mix * 0.5 * (x + wet)

"""Reverberation kernels.

Two families, matching the reference's two reverb paths:

1. ``noise_shaped_reverb`` — differentiable 12-band noise-shaped reverb with
   per-band gain + decay and a wet/dry mix (25 params), the dasp-pytorch
   parameterization used by the reference's autodiff chain
   (reference: st_ito/effects.py:558-620). The IR is filtered-noise with
   per-band exponential decay, applied by FFT convolution — embarrassingly
   parallel, exactly what the MXU-era TPU wants.

2. ``freeverb`` — the Schroeder/Freeverb topology behind pedalboard.Reverb
   (JUCE) used by BasicReverb (reference: st_ito/effects.py:937-959). For
   fixed room/damping the whole network is LTI, so instead of running 8 comb
   + 4 allpass recurrences serially we evaluate the exact rational response
   of the network on the rFFT grid and apply it with one FFT — an exact
   (not approximate) TPU-native formulation.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from st_ito_tpu.ops.iir import next_pow2

# --------------------------------------------------------------------------
# Noise-shaped reverberation (dasp-style, 12 bands)
# --------------------------------------------------------------------------

_NSR_KEY = jax.random.PRNGKey(4242)  # fixed: the IR noise is part of the effect


def _band_noise(ir_length: int, sample_rate: float, num_bands: int, channels: int):
    """Static per-band unit-RMS noise, shape (num_bands, channels, ir_length)."""
    noise = jax.random.normal(_NSR_KEY, (channels, ir_length), jnp.float32)
    N = jnp.fft.rfft(noise, axis=-1)
    freqs = jnp.fft.rfftfreq(ir_length, 1.0 / sample_rate)
    edges = jnp.geomspace(20.0, 0.95 * sample_rate / 2.0, num_bands + 1)
    lo = edges[:-1][:, None]
    hi = edges[1:][:, None]
    mask = ((freqs[None, :] >= lo) & (freqs[None, :] < hi)).astype(jnp.float32)
    bands = jnp.fft.irfft(N[None, :, :] * mask[:, None, :], n=ir_length, axis=-1)
    rms = jnp.sqrt(jnp.mean(bands**2, axis=-1, keepdims=True))
    return bands / jnp.maximum(rms, 1e-8)


def noise_shaped_ir(
    band_gains: jnp.ndarray,
    band_decays: jnp.ndarray,
    sample_rate: float,
    ir_length: int = 65536,
    channels: int = 2,
) -> jnp.ndarray:
    """Build the impulse response. band_gains/band_decays: (num_bands,) in [0,1].

    decay in [0,1] maps to T60 in [0.1, 4.1] s; per-band envelope
    10^(-3 t / T60) (i.e. -60 dB at t = T60).
    """
    num_bands = band_gains.shape[-1]
    bands = _band_noise(ir_length, sample_rate, num_bands, channels)
    t = jnp.arange(ir_length, dtype=jnp.float32) / sample_rate
    t60 = 0.1 + 4.0 * jnp.clip(band_decays, 0.0, 1.0)
    env = 10.0 ** (-3.0 * t[None, :] / t60[:, None])  # (bands, L)
    ir = jnp.einsum("b,bct,bt->ct", band_gains, bands, env)
    energy = jnp.sqrt(jnp.sum(ir**2, axis=-1, keepdims=True))
    return ir / jnp.maximum(energy, 1e-8)


def noise_shaped_reverb(
    x: jnp.ndarray,
    sample_rate: float,
    band_gains: jnp.ndarray,
    band_decays: jnp.ndarray,
    mix,
    ir_length: int = 65536,
) -> jnp.ndarray:
    """x: (..., C, T) with C in {1, 2}. Returns same shape."""
    C, T = x.shape[-2], x.shape[-1]
    ir = noise_shaped_ir(band_gains, band_decays, sample_rate, ir_length, channels=C)
    n = next_pow2(T + ir_length)
    X = jnp.fft.rfft(x, n=n, axis=-1)
    H = jnp.fft.rfft(ir, n=n, axis=-1)
    wet = jnp.fft.irfft(X * H, n=n, axis=-1)[..., :T].astype(x.dtype)
    mix = jnp.asarray(mix, jnp.float32)
    return (1.0 - mix) * x + mix * wet


# --------------------------------------------------------------------------
# Freeverb (JUCE/pedalboard.Reverb), exact frequency-domain formulation
# --------------------------------------------------------------------------

_COMB_TUNINGS = (1116, 1188, 1277, 1356, 1422, 1491, 1557, 1617)  # @44.1 kHz
_ALLPASS_TUNINGS = (556, 441, 341, 225)
_STEREO_SPREAD = 23


def _freeverb_wet_response(
    n_freqs: int,
    fft_size: int,
    sample_rate: float,
    room_size,
    damping,
    spread: int,
):
    """Exact response of (sum of 8 damped combs) -> (4 allpasses) for one
    channel whose tunings are offset by ``spread`` samples."""
    w = jnp.linspace(0.0, math.pi, n_freqs, dtype=jnp.float32)
    z1 = jnp.exp(-1j * w)  # z^-1

    def lag_z(D: int):
        # exact integer phase reduction: f32 w*D drifts ~3e-4 rad at 2^19
        # grids, detuning the comb resonances (see chain/responses.py)
        m = (jnp.arange(n_freqs, dtype=jnp.int32) * D) & (fft_size - 1)
        th = (2.0 * math.pi / fft_size) * m.astype(jnp.float32)
        return jax.lax.complex(jnp.cos(th), -jnp.sin(th))

    feedback = jnp.asarray(room_size, jnp.float32) * 0.28 + 0.7
    damp = jnp.asarray(damping, jnp.float32) * 0.4

    comb_sum = jnp.zeros(n_freqs, jnp.complex64)
    for tune in _COMB_TUNINGS:
        D = int(sample_rate * (tune + spread) / 44100.0)
        zD = lag_z(D)
        # comb with one-pole damping in the feedback path:
        #   out = z^-D (1 - d z^-1) / (1 - d z^-1 - fb (1-d) z^-D)
        one_pole = 1.0 - damp * z1
        comb = zD * one_pole / (one_pole - feedback * (1.0 - damp) * zD)
        comb_sum = comb_sum + comb

    ap = jnp.ones(n_freqs, jnp.complex64)
    for tune in _ALLPASS_TUNINGS:
        D = int(sample_rate * (tune + spread) / 44100.0)
        zD = lag_z(D)
        # JUCE freeverb allpass: y[n] = b[n] - x[n], b[n] = x[n-D] + 0.5 b[n-D]
        ap = ap * ((1.5 * zD - 1.0) / (1.0 - 0.5 * zD))

    return comb_sum * ap


def freeverb(
    x: jnp.ndarray,
    sample_rate: float,
    room_size=0.5,
    damping=0.5,
    wet_level=0.33,
    dry_level=0.4,
    width=1.0,
) -> jnp.ndarray:
    """pedalboard.Reverb / juce::Reverb semantics on (..., C, T), C in {1,2}.

    JUCE scale factors: wetScale=3, dryScale=2, input gain 0.015,
    feedback = room*0.28+0.7, damp = damping*0.4, right channel tunings
    offset by 23 samples; wet1/wet2 implement stereo width.
    """
    C, T = x.shape[-2], x.shape[-1]
    n = next_pow2(2 * T)
    nf = n // 2 + 1

    H_L = _freeverb_wet_response(nf, n, sample_rate, room_size, damping, 0)
    gain_in = 0.015
    wet_level = jnp.asarray(wet_level, jnp.float32)
    dry_level = jnp.asarray(dry_level, jnp.float32)
    width = jnp.asarray(width, jnp.float32)
    dry_gain = dry_level * 2.0

    if C == 1:
        X = jnp.fft.rfft(x, n=n, axis=-1)
        wet = jnp.fft.irfft(X * (gain_in * H_L), n=n, axis=-1)[..., :T]
        # mono: wet1 + wet2 collapse to wet*3 (width irrelevant)
        return (dry_gain * x + 3.0 * wet_level * wet).astype(x.dtype)

    H_R = _freeverb_wet_response(nf, n, sample_rate, room_size, damping, _STEREO_SPREAD)
    wet1 = 0.5 * wet_level * 3.0 * (1.0 + width)
    wet2 = 0.5 * wet_level * 3.0 * (1.0 - width)

    mono_in = (x[..., 0, :] + x[..., 1, :]) * gain_in
    M = jnp.fft.rfft(mono_in, n=n, axis=-1)
    wet_L = jnp.fft.irfft(M * H_L, n=n, axis=-1)[..., :T]
    wet_R = jnp.fft.irfft(M * H_R, n=n, axis=-1)[..., :T]

    out_L = wet1 * wet_L + wet2 * wet_R + dry_gain * x[..., 0, :]
    out_R = wet1 * wet_R + wet2 * wet_L + dry_gain * x[..., 1, :]
    return jnp.stack([out_L, out_R], axis=-2).astype(x.dtype)

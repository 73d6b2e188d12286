"""Differentiable processors on normalized [0,1] parameters, batched.

API mirror of the reference's dasp-based processors
(reference: st_ito/effects.py:515-780): every function takes
``audio (bs, chs, T)`` and ``params (bs, P)`` with params in [0,1], and the
same parameter counts/ranges, so training configs and the autodiff ITO path
line up 1:1. The implementations run on the TPU-native kernels in
``st_ito_tpu.ops`` (frequency-sampled IIR, parallel-scan compressor, FFT
reverb) instead of dasp-pytorch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from st_ito_tpu.ops import dynamics as _dyn
from st_ito_tpu.ops import eq as _eq
from st_ito_tpu.ops import reverb as _rev

NUM_GAIN_PARAMS = 1
NUM_DISTORTION_PARAMS = 1
NUM_REVERB_PARAMS = 25
NUM_COMPRESSOR_PARAMS = 6
NUM_PARAMETRIC_EQ_PARAMS = 18
NUM_PARAMETRIC_EQ_15_PARAMS = 15
NUM_SIMPLE_PARAMS = NUM_PARAMETRIC_EQ_15_PARAMS + NUM_COMPRESSOR_PARAMS  # 21
NUM_COMPLEX_PARAMS = (
    NUM_PARAMETRIC_EQ_PARAMS
    + NUM_COMPRESSOR_PARAMS
    + NUM_DISTORTION_PARAMS
    + NUM_REVERB_PARAMS
    + NUM_GAIN_PARAMS
)  # 51


def denormalize(p: jnp.ndarray, min_val: float, max_val: float) -> jnp.ndarray:
    """[0,1] -> [min_val, max_val] (reference: st_ito/effects.py:518-529)."""
    return p * (max_val - min_val) + min_val


def apply_gain(audio: jnp.ndarray, params: jnp.ndarray, sample_rate: int):
    """params (bs, 1): gain_db in [-48, 48]."""
    gain_db = denormalize(params[:, 0], -48.0, 48.0)
    return audio * 10.0 ** (gain_db / 20.0)[..., None, None]


def apply_distortion(audio: jnp.ndarray, params: jnp.ndarray, sample_rate: int):
    """params (bs, 1): drive_db in [0, 48]."""
    drive_db = denormalize(params[:, 0], 0.0, 48.0)
    return jnp.tanh(audio * 10.0 ** (drive_db / 20.0)[..., None, None])


def apply_compressor(audio: jnp.ndarray, params: jnp.ndarray, sample_rate: int):
    """params (bs, 6): threshold[-60,0], ratio[1,20], attack[0.1,250] ms,
    release[10,2000] ms, knee[1,24] dB, makeup[0,24] dB; lookahead 512."""
    th = denormalize(params[:, 0], -60.0, 0.0)
    ratio = denormalize(params[:, 1], 1.0, 20.0)
    atk = denormalize(params[:, 2], 0.1, 250.0)
    rel = denormalize(params[:, 3], 10.0, 2000.0)
    knee = denormalize(params[:, 4], 1.0, 24.0)
    makeup = denormalize(params[:, 5], 0.0, 24.0)

    def one(x, t, r, a, rl, k, m):
        return _dyn.compressor(
            x, sample_rate, threshold_db=t, ratio=r, attack_ms=a, release_ms=rl,
            knee_db=k, makeup_gain_db=m, lookahead_samples=512,
        )

    return jax.vmap(one)(audio, th, ratio, atk, rel, knee, makeup)


def apply_reverb(audio: jnp.ndarray, params: jnp.ndarray, sample_rate: int):
    """params (bs, 25): 12 band gains, 12 band decays, mix — all [0,1]
    (reference: st_ito/effects.py:558-620)."""
    gains = params[:, 0:12]
    decays = params[:, 12:24]
    mix = params[:, 24]

    def one(x, g, d, m):
        return _rev.noise_shaped_reverb(x, sample_rate, g, d, m)

    return jax.vmap(one)(audio, gains, decays, mix)


def _eq_section_params(params: jnp.ndarray, idx: int):
    g = denormalize(params[:, 3 * idx + 0], -18.0, 18.0)
    f = denormalize(params[:, 3 * idx + 1], 20.0, 20000.0)
    q = denormalize(params[:, 3 * idx + 2], 0.1, 10.0)
    return g, f, q


def _apply_eq_sections(audio, params, sample_rate, num_bands):
    ls_g, ls_f, ls_q = _eq_section_params(params, 0)
    band = [_eq_section_params(params, 1 + i) for i in range(num_bands)]
    hs_g, hs_f, hs_q = _eq_section_params(params, 1 + num_bands)
    b, a = _eq.parametric_eq_sos(
        sample_rate,
        ls_g, ls_f, ls_q,
        jnp.stack([g for g, _, _ in band], axis=-1),
        jnp.stack([f for _, f, _ in band], axis=-1),
        jnp.stack([q for _, _, q in band], axis=-1),
        hs_g, hs_f, hs_q,
    )
    # b, a: (bs, sections, 3); audio: (bs, chs, T) — add channel broadcast dim
    from st_ito_tpu.ops.iir import apply_iir_fsm

    return apply_iir_fsm(audio, b[:, None], a[:, None])


def apply_parametric_eq(audio: jnp.ndarray, params: jnp.ndarray, sample_rate: int):
    """params (bs, 18): 6 sections x (gain, freq, q) — low shelf, 4 bands,
    high shelf (reference: st_ito/effects.py:651-706)."""
    return _apply_eq_sections(audio, params, sample_rate, num_bands=4)


def apply_parametric_eq_15(audio: jnp.ndarray, params: jnp.ndarray, sample_rate: int):
    """15-param variant used by the simple processor. SIX sections, like the
    reference: low shelf, 4 peaking bands, high shelf, where params[12:15]
    drive BOTH band3 and the high shelf
    (reference: st_ito/methods/style.py:155-204 passes params[:, 12:15] twice)."""
    params18 = jnp.concatenate([params, params[:, 12:15]], axis=-1)
    return _apply_eq_sections(audio, params18, sample_rate, num_bands=4)


def apply_simple_autodiff_processor(
    audio: jnp.ndarray, params: jnp.ndarray, sample_rate: int, *args
):
    """15-param EQ -> 6-param compressor (21 params total)
    (reference: st_ito/effects.py:709-726)."""
    eq_p = params[:, :NUM_PARAMETRIC_EQ_15_PARAMS]
    comp_p = params[:, NUM_PARAMETRIC_EQ_15_PARAMS:]
    audio = apply_parametric_eq_15(audio, eq_p, sample_rate)
    audio = apply_compressor(audio, comp_p, sample_rate)
    return audio


def apply_complex_autodiff_processor(
    audio: jnp.ndarray, params: jnp.ndarray, sample_rate: int, *args
):
    """EQ(18) -> compressor(6) -> distortion(1) -> reverb(25) -> gain(1),
    51 params (reference: st_ito/effects.py:729-780)."""
    i0 = NUM_PARAMETRIC_EQ_PARAMS
    i1 = i0 + NUM_COMPRESSOR_PARAMS
    i2 = i1 + NUM_DISTORTION_PARAMS
    i3 = i2 + NUM_REVERB_PARAMS
    audio = apply_parametric_eq(audio, params[:, :i0], sample_rate)
    audio = apply_compressor(audio, params[:, i0:i1], sample_rate)
    audio = apply_distortion(audio, params[:, i1:i2], sample_rate)
    audio = apply_reverb(audio, params[:, i2:i3], sample_rate)
    audio = apply_gain(audio, params[:, i3:], sample_rate)
    return audio

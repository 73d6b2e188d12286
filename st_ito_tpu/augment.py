"""Paired random audio-effect transforms for contrastive training.

The reference applies the SAME random effect to two signals by resetting the
global python RNG seed between calls (reference: st_ito/effects.py:334-362 —
a documented hazard). Here every transform is a pure function
``transform(key, x) -> y`` and pairing is simply reusing the key:

    key = jax.random.fold_in(base_key, step)
    x_aug = t(key, x)
    y_aug = t(key, y)   # same random draw, no global state

All transforms take/return (C, T) and are jit/vmap-safe. The set mirrors the
reference's transform inventory (reference: st_ito/effects.py:368-1533).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from st_ito_tpu.ops import delay as _delay
from st_ito_tpu.ops import dynamics as _dyn
from st_ito_tpu.ops import eq as _eq
from st_ito_tpu.ops import reverb as _rev
from st_ito_tpu.ops import stereo as _st
from st_ito_tpu.ops import waveshape as _ws
from st_ito_tpu.ops.loudness import loudness_normalize


def _uniform(key, lo, hi, shape=()):
    return jax.random.uniform(key, shape, jnp.float32, lo, hi)


def _maybe(key, p, x, y):
    """Apply-with-probability: reference BaseTransform p semantics."""
    return jnp.where(jax.random.uniform(key) < p, y, x)


# ---------------------------------------------------------------- simple


def random_swap_lr(key, x, p=0.5):
    return _maybe(key, p, x, _st.swap_channels(x))


def random_gain(key, x, low=0.25, high=1.25, p=0.5):
    k1, k2 = jax.random.split(key)
    return _maybe(k1, p, x, x * _uniform(k2, low, high))


def random_flip_phase(key, x, p=0.5):
    return _maybe(key, p, x, -x)


def random_pan(key, x, p=0.5):
    k1, k2 = jax.random.split(key)
    return _maybe(k1, p, x, _st.pan(x, _uniform(k2, 0.0, 1.0)))


def random_stereo_widener(key, x, p=0.5):
    k1, k2 = jax.random.split(key)
    return _maybe(k1, p, x, _st.stereo_widener(x, _uniform(k2, 0.0, 1.0)))


def random_volume_automation(key, x, p=0.5, num_nodes: int = 16,
                             max_swing_db: float = 12.0):
    """Piecewise-linear gain curve (reference: effects.py:1095-1153)."""
    k1, k2 = jax.random.split(key)
    T = x.shape[-1]
    nodes_db = _uniform(k2, -max_swing_db, 0.0, (num_nodes,))
    t = jnp.linspace(0.0, num_nodes - 1.0, T)
    curve_db = jnp.interp(t, jnp.arange(num_nodes, dtype=jnp.float32), nodes_db)
    return _maybe(k1, p, x, x * 10.0 ** (curve_db / 20.0))


# ---------------------------------------------------------------- effects


def random_parametric_eq(key, x, sample_rate=48000.0, num_bands=3,
                         min_gain_db=-6.0, max_gain_db=6.0, p=0.5):
    """(reference: effects.py:991-1054)"""
    ks = jax.random.split(key, 4)
    gains = _uniform(ks[1], min_gain_db, max_gain_db, (num_bands,))
    freqs = jnp.exp(_uniform(ks[2], jnp.log(100.0), jnp.log(10000.0),
                             (num_bands,)))
    qs = _uniform(ks[3], 0.5, 4.0, (num_bands,))
    y = _eq.parametric_eq(x, sample_rate, band_gains_db=gains,
                          band_cutoff_freqs=freqs, band_q_factors=qs)
    return _maybe(ks[0], p, x, y)


def random_compressor(key, x, sample_rate=48000.0, p=0.5):
    """(reference: effects.py:1154-1196)"""
    ks = jax.random.split(key, 5)
    y = _dyn.compressor(
        x, sample_rate,
        threshold_db=_uniform(ks[1], -42.0, -6.0),
        ratio=_uniform(ks[2], 1.5, 10.0),
        attack_ms=_uniform(ks[3], 1.0, 50.0),
        release_ms=_uniform(ks[4], 10.0, 250.0),
    )
    return _maybe(ks[0], p, x, y)


def random_delay(key, x, sample_rate=48000.0, p=0.5):
    """(reference: effects.py:1199-1228)"""
    ks = jax.random.split(key, 4)
    y = _delay.feedback_delay(
        x, sample_rate,
        delay_seconds=_uniform(ks[1], 0.05, 0.7),
        feedback=_uniform(ks[2], 0.05, 0.6),
        mix=_uniform(ks[3], 0.0, 0.7),
    )
    return _maybe(ks[0], p, x, y)


def random_chorus(key, x, sample_rate=48000.0, p=0.5):
    """(reference: effects.py:1229-1277)"""
    ks = jax.random.split(key, 6)
    y = _delay.chorus(
        x, sample_rate,
        rate_hz=_uniform(ks[1], 0.25, 4.0),
        centre_delay_ms=_uniform(ks[2], 3.0, 10.0),
        depth=_uniform(ks[3], 0.1, 0.6),
        feedback=_uniform(ks[4], 0.0, 0.4),
        mix=_uniform(ks[5], 0.1, 0.7),
    )
    return _maybe(ks[0], p, x, y)


def random_phaser(key, x, sample_rate=48000.0, p=0.5):
    """(reference: effects.py:1278-1328)"""
    ks = jax.random.split(key, 6)
    y = _delay.phaser(
        x, sample_rate,
        rate_hz=_uniform(ks[1], 0.2, 2.0),
        depth=_uniform(ks[2], 0.2, 0.8),
        centre_frequency_hz=_uniform(ks[3], 300.0, 3000.0),
        feedback=_uniform(ks[4], 0.0, 0.5),
        mix=_uniform(ks[5], 0.1, 0.7),
    )
    return _maybe(ks[0], p, x, y)


def random_limiter(key, x, sample_rate=48000.0, p=0.5):
    """(reference: effects.py:1329-1358)"""
    ks = jax.random.split(key, 3)
    y = _dyn.limiter(x, sample_rate,
                     threshold_db=_uniform(ks[1], -18.0, -2.0),
                     release_ms=_uniform(ks[2], 20.0, 300.0))
    return _maybe(ks[0], p, x, y)


def random_distortion(key, x, p=0.5):
    """(reference: effects.py:1359-1378)"""
    ks = jax.random.split(key, 2)
    y = _ws.distortion(x, _uniform(ks[1], 0.0, 24.0))
    return _maybe(ks[0], p, x, y)


def random_sox_reverb(key, x, sample_rate=48000.0, p=0.5):
    """Room-style reverb with the sox parameterization (reference:
    effects.py:1379-1438 RandomSoxReverb): reverberance, HF damping, room
    scale, stereo depth, pre-delay, wet-only render + manual wet/dry mix.
    Rendered with the noise-shaped-IR engine: reverberance*room_scale ->
    per-band T60, HF damping -> high-band gain rolloff, stereo depth ->
    L/R IR decorrelation, pre-delay -> exact wet-path phase delay."""
    ks = jax.random.split(key, 7)
    reverberance = _uniform(ks[1], 10.0, 100.0) / 100.0
    hf_damp = _uniform(ks[2], 0.0, 100.0) / 100.0
    room_scale = _uniform(ks[3], 5.0, 100.0) / 100.0
    stereo_depth = _uniform(ks[4], 20.0, 100.0) / 100.0
    wet_dry = _uniform(ks[5], 0.0, 1.0)
    pre_delay_ms = _uniform(ks[6], 0.0, 100.0)

    num_bands = 8
    # longer rooms + higher reverberance decay slower; HF bands are both
    # quieter and faster-decaying under damping (physical room behavior)
    frac = jnp.linspace(0.0, 1.0, num_bands)
    decay = jnp.clip(reverberance * (0.3 + 0.7 * room_scale), 0.02, 1.0)
    band_decays = decay * (1.0 - 0.6 * hf_damp * frac)
    band_gains = 1.0 - hf_damp * frac

    C, T = x.shape[-2], x.shape[-1]
    ir_length = 32768
    ir = _rev.noise_shaped_ir(band_gains, band_decays, sample_rate,
                              ir_length, channels=C)
    if C == 2:  # stereo depth: blend decorrelated IR toward its mono mean
        mono = jnp.mean(ir, axis=0, keepdims=True)
        ir = stereo_depth * ir + (1.0 - stereo_depth) * mono
    n = 1 << int(T + ir_length - 1).bit_length()
    X = jnp.fft.rfft(x, n=n, axis=-1)
    H = jnp.fft.rfft(ir, n=n, axis=-1)
    # exact fractional pre-delay applied in the spectrum (wet path only)
    w = 2.0 * jnp.pi * jnp.fft.rfftfreq(n) * pre_delay_ms * 1e-3 * sample_rate
    H = H * jax.lax.complex(jnp.cos(w), -jnp.sin(w))
    wet = jnp.fft.irfft(X * H, n=n, axis=-1)[..., :T].astype(x.dtype)
    y = (1.0 - wet_dry) * x + wet_dry * wet
    return _maybe(ks[0], p, x, y)


def random_reverb(key, x, sample_rate=48000.0, p=0.5):
    """Freeverb with random params (reference: effects.py:1439-1483,
    RandomPedalboardReverb — the sox flavor is random_sox_reverb)."""
    ks = jax.random.split(key, 5)
    y = _rev.freeverb(
        x, sample_rate,
        room_size=_uniform(ks[1], 0.1, 0.9),
        damping=_uniform(ks[2], 0.1, 0.9),
        wet_level=_uniform(ks[3], 0.1, 0.5),
        dry_level=0.7,
        width=_uniform(ks[4], 0.3, 1.0),
    )
    return _maybe(ks[0], p, x, y)


def mono_to_stereo(key, x):
    """(reference: effects.py:1503-1511)"""
    if x.shape[0] == 1:
        return _st.mono_to_stereo(x)
    return x


def loudness_normalize_transform(key, x, sample_rate=48000.0,
                                 target_lufs=-24.0):
    """(reference: effects.py:1484-1502)"""
    return loudness_normalize(x, sample_rate, target_lufs)


ALL_TRANSFORMS: dict[str, Callable] = {
    "swap_lr": random_swap_lr,
    "gain": random_gain,
    "flip_phase": random_flip_phase,
    "pan": random_pan,
    "stereo_widener": random_stereo_widener,
    "volume_automation": random_volume_automation,
    "parametric_eq": random_parametric_eq,
    "compressor": random_compressor,
    "delay": random_delay,
    "chorus": random_chorus,
    "phaser": random_phaser,
    "limiter": random_limiter,
    "distortion": random_distortion,
    "reverb": random_reverb,
    "sox_reverb": random_sox_reverb,
}


def apply_paired(
    key,
    x: jnp.ndarray,
    y: jnp.ndarray,
    transforms: Sequence[str] | None = None,
):
    """Apply the same random transform chain to both signals — the
    reference's seed-reset pairing, done with explicit keys."""
    names = list(transforms or ALL_TRANSFORMS.keys())
    for i, name in enumerate(names):
        k = jax.random.fold_in(key, i)
        t = ALL_TRANSFORMS[name]
        x = t(k, x)
        y = t(k, y)
    return x, y

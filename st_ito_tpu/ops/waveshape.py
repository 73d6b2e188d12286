"""Memoryless waveshaping: gain, distortion, phase, fades.

Reference semantics:
- distortion: tanh drive, y = tanh(x * 10^(drive_db/20)) — pedalboard.Distortion
  and dasp distortion (reference: st_ito/effects.py:545-556).
- gain: scalar dB gain (reference: st_ito/effects.py:532-542).
"""

from __future__ import annotations

import jax.numpy as jnp


def gain(x: jnp.ndarray, gain_db) -> jnp.ndarray:
    g = 10.0 ** (jnp.asarray(gain_db, jnp.float32) / 20.0)
    return x * g


def distortion(x: jnp.ndarray, drive_db) -> jnp.ndarray:
    g = 10.0 ** (jnp.asarray(drive_db, jnp.float32) / 20.0)
    return jnp.tanh(x * g)


def flip_phase(x: jnp.ndarray) -> jnp.ndarray:
    return -x


def fade_in(x: jnp.ndarray, num_samples: int = 16384) -> jnp.ndarray:
    """Linear fade-in over the first num_samples (reference: st_ito/utils.py:31-43)."""
    n = min(num_samples, x.shape[-1])
    ramp = jnp.linspace(0.0, 1.0, n, dtype=x.dtype)
    head = x[..., :n] * ramp
    return jnp.concatenate([head, x[..., n:]], axis=-1)


def peak_normalize(x: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Peak-normalize over all axes except leading batch dims are preserved:
    normalizes each (..., C, T) item by its global peak, matching
    process_audio's final normalize (reference: st_ito/style_transfer.py:113).
    """
    peak = jnp.max(jnp.abs(x), axis=(-2, -1), keepdims=True)
    return x / jnp.maximum(peak, eps)

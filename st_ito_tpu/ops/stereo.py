"""Stereo field operations (reference: st_ito/effects.py:1056-1533 transforms)."""

from __future__ import annotations

import math

import jax.numpy as jnp


def to_mid_side(x: jnp.ndarray) -> jnp.ndarray:
    """(..., 2, T) -> (..., 2, T) with [mid, side] = [(L+R)/2, (L-R)/2]."""
    mid = (x[..., 0, :] + x[..., 1, :]) / 2.0
    side = (x[..., 0, :] - x[..., 1, :]) / 2.0
    return jnp.stack([mid, side], axis=-2)


def from_mid_side(ms: jnp.ndarray) -> jnp.ndarray:
    left = ms[..., 0, :] + ms[..., 1, :]
    right = ms[..., 0, :] - ms[..., 1, :]
    return jnp.stack([left, right], axis=-2)


def stereo_widener(x: jnp.ndarray, width) -> jnp.ndarray:
    """width in [0, 1]: 0 = mono, 0.5 = unchanged, 1 = maximally wide.

    Energy-preserving mid/side scaling (reference: st_ito/effects.py:1056-1075).
    """
    width = jnp.asarray(width, jnp.float32)
    sqrt2 = math.sqrt(2.0)
    mid_gain = jnp.sqrt(jnp.clip(1.0 - width, 0.0, 1.0)) * sqrt2
    side_gain = jnp.sqrt(jnp.clip(width, 0.0, 1.0)) * sqrt2
    ms = to_mid_side(x)
    ms = jnp.stack([ms[..., 0, :] * mid_gain, ms[..., 1, :] * side_gain], axis=-2)
    return from_mid_side(ms)


def pan(x: jnp.ndarray, pan_position) -> jnp.ndarray:
    """Constant-power pan. pan_position in [0, 1], 0.5 = centre.
    Input (..., 2, T); the two channels are summed to mono then repanned."""
    theta = jnp.asarray(pan_position, jnp.float32) * (math.pi / 2.0)
    mono = jnp.mean(x, axis=-2)
    left = jnp.cos(theta) * mono
    right = jnp.sin(theta) * mono
    return jnp.stack([left, right], axis=-2) * math.sqrt(2.0)


def mono_to_stereo(x: jnp.ndarray) -> jnp.ndarray:
    """(..., 1, T) -> (..., 2, T) by duplication
    (reference: st_ito/style_transfer.py:94-95)."""
    return jnp.concatenate([x, x], axis=-2)


def swap_channels(x: jnp.ndarray) -> jnp.ndarray:
    return x[..., ::-1, :]

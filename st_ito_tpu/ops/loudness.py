"""ITU-R BS.1770-4 loudness (LUFS), batched and jit-safe.

Replaces pyloudnorm (reference: st_ito/features.py:267-299,
st_ito/utils.py:52-60): K-weighting prefilter (shelf + highpass, designed at
the working sample rate like pyloudnorm's DeMan filters) followed by 400 ms
gated mean-square blocks with absolute (-70 LUFS) and relative (-10 LU)
gates. All gating is done with masks so the whole computation stays inside
one XLA program and vmaps over a batch.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from st_ito_tpu.ops.iir import apply_iir_fsm


def _k_weighting_sos(sample_rate: float):
    """BS.1770 prefilter: stage-1 spherical-head high shelf + stage-2 RLB
    highpass, bilinear-designed from the analog prototypes at any fs
    (same approach as pyloudnorm's filter design)."""
    # stage 1: high shelf, +4 dB, f0=1681.97 Hz, Q=0.7072, G=3.99984 dB
    f0 = 1681.9744509555319
    G = 3.99984385397
    Q = 0.7071752369554193
    K = math.tan(math.pi * f0 / sample_rate)
    Vh = 10.0 ** (G / 20.0)
    Vb = Vh**0.4996667741545416
    a0_ = 1.0 + K / Q + K * K
    b0 = (Vh + Vb * K / Q + K * K) / a0_
    b1 = 2.0 * (K * K - Vh) / a0_
    b2 = (Vh - Vb * K / Q + K * K) / a0_
    a1 = 2.0 * (K * K - 1.0) / a0_
    a2 = (1.0 - K / Q + K * K) / a0_
    shelf_b = jnp.array([b0, b1, b2], jnp.float32)
    shelf_a = jnp.array([1.0, a1, a2], jnp.float32)

    # stage 2: highpass, f0=38.135 Hz, Q=0.5003
    f0 = 38.13547087613982
    Q = 0.5003270373253953
    K = math.tan(math.pi * f0 / sample_rate)
    a0_ = 1.0 + K / Q + K * K
    hp_b = jnp.array([1.0, -2.0, 1.0], jnp.float32) / a0_
    hp_a = jnp.array(
        [1.0, 2.0 * (K * K - 1.0) / a0_, (1.0 - K / Q + K * K) / a0_], jnp.float32
    )
    b = jnp.stack([shelf_b, hp_b])
    a = jnp.stack([shelf_a, hp_a])
    return b, a


def k_weight(x: jnp.ndarray, sample_rate: float) -> jnp.ndarray:
    b, a = _k_weighting_sos(sample_rate)
    return apply_iir_fsm(x, b, a, pad=4096)


def integrated_loudness(x: jnp.ndarray, sample_rate: float) -> jnp.ndarray:
    """Integrated LUFS of x (..., C, T). Returns (...,).

    Channel weights are 1.0 (L/R/M). Signals shorter than one 400 ms block
    return -inf-clamped (-200) loudness like a silent input would.
    """
    y = k_weight(x, sample_rate)

    block = int(round(0.400 * sample_rate))
    hop = int(round(0.100 * sample_rate))
    T = y.shape[-1]
    n_blocks = max((T - block) // hop + 1, 1)

    # per-block mean square, per channel: frame then mean
    idx = jnp.arange(n_blocks)[:, None] * hop + jnp.arange(block)[None, :]
    idx = jnp.minimum(idx, T - 1)
    frames = jnp.take(y, idx, axis=-1)  # (..., C, n_blocks, block)
    z = jnp.mean(frames**2, axis=-1)  # (..., C, n_blocks)
    z_sum = jnp.sum(z, axis=-2)  # (..., n_blocks) sum over channels

    eps = 1e-12
    block_loudness = -0.691 + 10.0 * jnp.log10(jnp.maximum(z_sum, eps))

    # absolute gate at -70 LUFS
    abs_mask = block_loudness > -70.0
    denom = jnp.maximum(jnp.sum(abs_mask, axis=-1), 1)
    z_abs = jnp.sum(jnp.where(abs_mask, z_sum, 0.0), axis=-1) / denom
    rel_threshold = -0.691 + 10.0 * jnp.log10(jnp.maximum(z_abs, eps)) - 10.0

    # relative gate
    rel_mask = abs_mask & (block_loudness > rel_threshold[..., None])
    denom = jnp.maximum(jnp.sum(rel_mask, axis=-1), 1)
    z_gated = jnp.sum(jnp.where(rel_mask, z_sum, 0.0), axis=-1) / denom
    lufs = -0.691 + 10.0 * jnp.log10(jnp.maximum(z_gated, eps))
    return jnp.maximum(lufs, -200.0)


def loudness_normalize(
    x: jnp.ndarray, sample_rate: float, target_lufs: float = -22.0
) -> jnp.ndarray:
    """Gain x to the target integrated loudness
    (reference: st_ito/utils.py:52-60, eval_pst.py:835-842)."""
    lufs = integrated_loudness(x, sample_rate)
    gain_db = target_lufs - lufs
    g = 10.0 ** (gain_db / 20.0)
    return x * g[..., None, None]

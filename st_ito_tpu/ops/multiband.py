"""Multiband compressor (the reference's ZaMultiCompX2/ZaMaximX2 role in the
style chain, reference: vst-chains/eq+multiband-comp+limiter.json,
scripts/data/vst_datagen_style.py).

Linkwitz-Riley 4th-order crossovers (two cascaded Butterworth biquads per
edge — flat magnitude reconstruction) split the signal into 3 bands; each
band gets an independent feed-forward compressor (the decoupled-detector
kernel) and per-band makeup gain, then the bands sum.
"""

from __future__ import annotations

import jax.numpy as jnp

from st_ito_tpu.ops.dynamics import compressor
from st_ito_tpu.ops.iir import apply_iir_fsm, biquad_coeffs


def _lr4(x, freq, sample_rate, kind: str):
    """4th-order Linkwitz-Riley low/high pass = squared Butterworth."""
    b, a = biquad_coeffs(0.0, freq, 0.7071, sample_rate, kind)
    b2 = jnp.stack([b, b], axis=-2)
    a2 = jnp.stack([a, a], axis=-2)
    return apply_iir_fsm(x, b2, a2, pad=8192)


def split_bands(x, sample_rate, f_low, f_high):
    """(..., T) -> (low, mid, high) with LR4 crossovers."""
    low = _lr4(x, f_low, sample_rate, "lowpass")
    rest = _lr4(x, f_low, sample_rate, "highpass")
    mid = _lr4(rest, f_high, sample_rate, "lowpass")
    high = _lr4(rest, f_high, sample_rate, "highpass")
    return low, mid, high


def multiband_compressor(
    x: jnp.ndarray,
    sample_rate: float,
    xover_low=250.0,
    xover_high=4000.0,
    thresholds_db=(-24.0, -24.0, -24.0),
    ratios=(4.0, 4.0, 4.0),
    makeup_db=(0.0, 0.0, 0.0),
    attack_ms=10.0,
    release_ms=150.0,
    fast: bool = False,
) -> jnp.ndarray:
    """x (..., C, T). thresholds/ratios/makeup per band (low, mid, high)."""
    bands = split_bands(x, sample_rate, xover_low, xover_high)
    out = None
    for band, th, ratio, mk in zip(bands, thresholds_db, ratios, makeup_db):
        y = compressor(band, sample_rate, threshold_db=th, ratio=ratio,
                       attack_ms=attack_ms, release_ms=release_ms,
                       knee_db=3.0, makeup_gain_db=mk, fast=fast)
        out = y if out is None else out + y
    return out

"""Multiband parametric EQ.

Low-shelf -> N peaking bands -> high-shelf, same topology as the reference's
numpy EQ (reference: st_ito/effects.py:453-512) and its differentiable
18-param dasp EQ (reference: st_ito/effects.py:651-706).

TPU execution: the cascade's rational response is built analytically on the
rFFT grid (biquad responses multiply) and applied with one batched FFT —
no serial per-sample IIR. Exact time-domain parity is available through
``parametric_eq_scan`` for golden tests.
"""

from __future__ import annotations

import jax.numpy as jnp

from st_ito_tpu.ops.iir import (
    apply_iir_fsm,
    biquad_coeffs,
    biquad_scan,
)


def parametric_eq_sos(
    sample_rate: float,
    low_shelf_gain_db,
    low_shelf_cutoff_freq,
    low_shelf_q_factor,
    band_gains_db,
    band_cutoff_freqs,
    band_q_factors,
    high_shelf_gain_db,
    high_shelf_cutoff_freq,
    high_shelf_q_factor,
):
    """Design the full cascade. Band args have shape (..., n_bands); shelf args
    shape (...,). Returns (b, a) of shape (..., n_bands + 2, 3).
    """
    b_ls, a_ls = biquad_coeffs(
        low_shelf_gain_db, low_shelf_cutoff_freq, low_shelf_q_factor,
        sample_rate, "low_shelf",
    )
    b_bd, a_bd = biquad_coeffs(
        band_gains_db, band_cutoff_freqs, band_q_factors, sample_rate, "peaking"
    )
    b_hs, a_hs = biquad_coeffs(
        high_shelf_gain_db, high_shelf_cutoff_freq, high_shelf_q_factor,
        sample_rate, "high_shelf",
    )
    b = jnp.concatenate([b_ls[..., None, :], b_bd, b_hs[..., None, :]], axis=-2)
    a = jnp.concatenate([a_ls[..., None, :], a_bd, a_hs[..., None, :]], axis=-2)
    return b, a


def parametric_eq(
    x: jnp.ndarray,
    sample_rate: float,
    low_shelf_gain_db=0.0,
    low_shelf_cutoff_freq=80.0,
    low_shelf_q_factor=0.707,
    band_gains_db=None,
    band_cutoff_freqs=None,
    band_q_factors=None,
    high_shelf_gain_db=0.0,
    high_shelf_cutoff_freq=1000.0,
    high_shelf_q_factor=0.707,
    pad: int = 8192,
) -> jnp.ndarray:
    """Apply the EQ cascade to x (..., T) by frequency sampling."""
    if band_gains_db is None:
        band_gains_db = jnp.zeros(1)
        band_cutoff_freqs = jnp.full((1,), 300.0)
        band_q_factors = jnp.full((1,), 0.707)
    b, a = parametric_eq_sos(
        sample_rate,
        low_shelf_gain_db, low_shelf_cutoff_freq, low_shelf_q_factor,
        jnp.asarray(band_gains_db), jnp.asarray(band_cutoff_freqs),
        jnp.asarray(band_q_factors),
        high_shelf_gain_db, high_shelf_cutoff_freq, high_shelf_q_factor,
    )
    return apply_iir_fsm(x, b, a, pad=pad)


def parametric_eq_scan(x: jnp.ndarray, sample_rate: float, **kwargs) -> jnp.ndarray:
    """Exact serial cascade (per-sample TDF-II). Golden-test path only."""
    b, a = parametric_eq_sos(
        sample_rate,
        kwargs.get("low_shelf_gain_db", 0.0),
        kwargs.get("low_shelf_cutoff_freq", 80.0),
        kwargs.get("low_shelf_q_factor", 0.707),
        jnp.asarray(kwargs.get("band_gains_db", [0.0])),
        jnp.asarray(kwargs.get("band_cutoff_freqs", [300.0])),
        jnp.asarray(kwargs.get("band_q_factors", [0.707])),
        kwargs.get("high_shelf_gain_db", 0.0),
        kwargs.get("high_shelf_cutoff_freq", 1000.0),
        kwargs.get("high_shelf_q_factor", 0.707),
    )
    for i in range(b.shape[-2]):
        x = biquad_scan(x, b[..., i, :], a[..., i, :])
    return x

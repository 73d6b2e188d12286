"""Biquad design and IIR application primitives.

Design math follows the RBJ Audio-EQ cookbook, matching the reference's
coefficient generation (reference: st_ito/effects.py:395-450) so that golden
tests against scipy.signal.lfilter validate both design and application.

Two application strategies:

* ``apply_iir_fsm``  — frequency-sampling: exact rational response on an rFFT
  grid, applied by FFT multiply with zero padding. O(T log T), fully parallel,
  differentiable. The default on TPU.
* ``biquad_scan`` / ``lfilter_scan`` — exact per-sample transposed direct-form
  II via lax.scan. Bit-faithful to scipy; used for parity tests and when exact
  time-domain semantics are required.
* ``linear_recurrence`` — parallel first-order linear recurrence via
  associative_scan, the building block for envelope followers.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

# --------------------------------------------------------------------------
# Biquad design (RBJ cookbook)
# --------------------------------------------------------------------------

_FILTER_TYPES = (
    "low_shelf",
    "high_shelf",
    "peaking",
    "lowpass",
    "highpass",
    "bandpass",
    "notch",
    "allpass",
)


def biquad_coeffs(
    gain_db: jnp.ndarray,
    cutoff_freq: jnp.ndarray,
    q_factor: jnp.ndarray,
    sample_rate: float,
    filter_type: str,
):
    """RBJ cookbook biquad. Returns (b, a), each shape (..., 3), a0-normalized.

    All inputs broadcast; fully vectorized over leading dims (bands, batch).
    """
    if filter_type not in _FILTER_TYPES:
        raise ValueError(f"Invalid filter_type: {filter_type}")

    gain_db, cutoff_freq, q_factor = jnp.broadcast_arrays(
        jnp.asarray(gain_db, jnp.float32),
        jnp.asarray(cutoff_freq, jnp.float32),
        jnp.asarray(q_factor, jnp.float32),
    )

    A = 10.0 ** (gain_db / 40.0)
    w0 = 2.0 * math.pi * (cutoff_freq / sample_rate)
    alpha = jnp.sin(w0) / (2.0 * q_factor)
    cos_w0 = jnp.cos(w0)
    sqrt_A = jnp.sqrt(A)

    if filter_type == "high_shelf":
        b0 = A * ((A + 1) + (A - 1) * cos_w0 + 2 * sqrt_A * alpha)
        b1 = -2 * A * ((A - 1) + (A + 1) * cos_w0)
        b2 = A * ((A + 1) + (A - 1) * cos_w0 - 2 * sqrt_A * alpha)
        a0 = (A + 1) - (A - 1) * cos_w0 + 2 * sqrt_A * alpha
        a1 = 2 * ((A - 1) - (A + 1) * cos_w0)
        a2 = (A + 1) - (A - 1) * cos_w0 - 2 * sqrt_A * alpha
    elif filter_type == "low_shelf":
        b0 = A * ((A + 1) - (A - 1) * cos_w0 + 2 * sqrt_A * alpha)
        b1 = 2 * A * ((A - 1) - (A + 1) * cos_w0)
        b2 = A * ((A + 1) - (A - 1) * cos_w0 - 2 * sqrt_A * alpha)
        a0 = (A + 1) + (A - 1) * cos_w0 + 2 * sqrt_A * alpha
        a1 = -2 * ((A - 1) + (A + 1) * cos_w0)
        a2 = (A + 1) + (A - 1) * cos_w0 - 2 * sqrt_A * alpha
    elif filter_type == "peaking":
        b0 = 1 + alpha * A
        b1 = -2 * cos_w0
        b2 = 1 - alpha * A
        a0 = 1 + alpha / A
        a1 = -2 * cos_w0
        a2 = 1 - alpha / A
    elif filter_type == "lowpass":
        b0 = (1 - cos_w0) / 2
        b1 = 1 - cos_w0
        b2 = (1 - cos_w0) / 2
        a0 = 1 + alpha
        a1 = -2 * cos_w0
        a2 = 1 - alpha
    elif filter_type == "highpass":
        b0 = (1 + cos_w0) / 2
        b1 = -(1 + cos_w0)
        b2 = (1 + cos_w0) / 2
        a0 = 1 + alpha
        a1 = -2 * cos_w0
        a2 = 1 - alpha
    elif filter_type == "bandpass":
        b0 = alpha
        b1 = jnp.zeros_like(alpha)
        b2 = -alpha
        a0 = 1 + alpha
        a1 = -2 * cos_w0
        a2 = 1 - alpha
    elif filter_type == "notch":
        b0 = jnp.ones_like(alpha)
        b1 = -2 * cos_w0
        b2 = jnp.ones_like(alpha)
        a0 = 1 + alpha
        a1 = -2 * cos_w0
        a2 = 1 - alpha
    else:  # allpass
        b0 = 1 - alpha
        b1 = -2 * cos_w0
        b2 = 1 + alpha
        a0 = 1 + alpha
        a1 = -2 * cos_w0
        a2 = 1 - alpha

    b = jnp.stack([b0, b1, b2], axis=-1) / a0[..., None]
    a = jnp.stack([a0, a1, a2], axis=-1) / a0[..., None]
    return b, a


# --------------------------------------------------------------------------
# Frequency-sampling application (the TPU-fast path)
# --------------------------------------------------------------------------


def _eval_biquad_poly(c: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
                      floor_sum: bool) -> jnp.ndarray:
    """Numerically stable evaluation of c0 + c1 z^-1 + c2 z^-2 on the unit
    circle, written as  S - c1*(1 - z^-1) - c2*(1 - z^-2)  with
    S = c0+c1+c2.

    Rationale: near w = 0 the direct polynomial sum cancels catastrophically
    in float32 for low-frequency high-Q biquads (S ~ w0^2 while the terms
    are O(1)); on TPU the denominator can round to EXACTLY zero, turning the
    DC bin into NaN and poisoning the whole FFT-filtered signal. The
    reformulated evaluation keeps all cancellation inside the single sum S,
    and (for denominators) S is floored away from exact zero.
    """
    S = c[..., 0] + c[..., 1] + c[..., 2]
    if floor_sum:
        eps = 1e-7 * (jnp.abs(c[..., 0]) + jnp.abs(c[..., 1])
                      + jnp.abs(c[..., 2]))
        S = jnp.where(jnp.abs(S) < eps, eps, S)
    return (S[..., None].astype(jnp.complex64)
            - c[..., 1:2].astype(jnp.complex64) * u
            - c[..., 2:3].astype(jnp.complex64) * v)


def _unit_circle_uv(w: jnp.ndarray):
    """u = 1 - e^{-jw}, v = 1 - e^{-j2w}, computed in their stable
    half-angle forms (no 1-cos cancellation)."""
    sh, ch = jnp.sin(w / 2.0), jnp.cos(w / 2.0)
    u = 2.0 * sh * (sh + 1j * ch)
    sw, cw = jnp.sin(w), jnp.cos(w)
    v = 2.0 * sw * (sw + 1j * cw)
    return u.astype(jnp.complex64), v.astype(jnp.complex64)


def freqz(b: jnp.ndarray, a: jnp.ndarray, n_freqs: int) -> jnp.ndarray:
    """Complex frequency response of IIR sections on the rFFT grid of size
    ``2*(n_freqs-1)``.

    b, a: (..., K) polynomial coefficients. Second-order sections (K=3) use
    the cancellation-stable evaluation (see _eval_biquad_poly); higher
    orders fall back to the direct polynomial sum.
    Returns H with shape (..., n_freqs), complex64.
    """
    w = jnp.linspace(0.0, math.pi, n_freqs, dtype=jnp.float32)
    if b.shape[-1] == 3 and a.shape[-1] == 3:
        u, v = _unit_circle_uv(w)
        num = _eval_biquad_poly(b, u, v, floor_sum=False)
        den = _eval_biquad_poly(a, u, v, floor_sum=True)
        return num / den
    k = jnp.arange(b.shape[-1], dtype=jnp.float32)
    zk = jnp.exp(-1j * w[:, None] * k[None, :])  # (n_freqs, K)
    num = jnp.einsum("...k,fk->...f", b.astype(jnp.complex64), zk)
    den = jnp.einsum("...k,fk->...f", a.astype(jnp.complex64), zk)
    return num / den


def next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def fft_filt(x: jnp.ndarray, H: jnp.ndarray, fft_size: int) -> jnp.ndarray:
    """Apply a frequency response H (on the size-``fft_size`` rFFT grid) to x
    along the last axis. x is zero-padded to fft_size; output cropped to
    x.shape[-1]. Linear as long as fft_size leaves headroom past the effective
    impulse-response length.
    """
    T = x.shape[-1]
    X = jnp.fft.rfft(x, n=fft_size, axis=-1)
    y = jnp.fft.irfft(X * H, n=fft_size, axis=-1)
    return y[..., :T].astype(x.dtype)


def apply_iir_fsm(
    x: jnp.ndarray,
    b: jnp.ndarray,
    a: jnp.ndarray,
    pad: int = 8192,
) -> jnp.ndarray:
    """Apply a cascade of IIR sections by frequency sampling.

    x: (..., T); b, a: (..., S, 3) — S sections are multiplied into a single
    response. Leading dims of (b, a) must broadcast against x's.
    ``pad`` is the headroom reserved for the impulse-response tail (circular
    wrap guard).
    """
    T = x.shape[-1]
    n = next_pow2(T + pad)
    H = freqz(b, a, n // 2 + 1)  # (..., S, F)
    H = jnp.prod(H, axis=-2)  # (..., F)
    return fft_filt(x, H, n)


# --------------------------------------------------------------------------
# Exact per-sample scans (golden path)
# --------------------------------------------------------------------------


def biquad_scan(x: jnp.ndarray, b: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """Exact TDF-II biquad over the last axis. b, a: shape (3,) (a0=1).

    Matches scipy.signal.lfilter(b, a, x) for second-order sections.
    Leading dims of x are vectorized (the scan carries them as state lanes).
    """
    b0, b1, b2 = b[0], b[1], b[2]
    a1, a2 = a[1], a[2]

    def step(carry, xt):
        s1, s2 = carry
        yt = b0 * xt + s1
        s1n = b1 * xt - a1 * yt + s2
        s2n = b2 * xt - a2 * yt
        return (s1n, s2n), yt

    lead = x.shape[:-1]
    init = (jnp.zeros(lead, x.dtype), jnp.zeros(lead, x.dtype))
    xt = jnp.moveaxis(x, -1, 0)
    _, y = jax.lax.scan(step, init, xt)
    return jnp.moveaxis(y, 0, -1)


def lfilter_scan(x: jnp.ndarray, b: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """Exact direct-form-II-transposed filter of arbitrary order via lax.scan.

    b, a: (K,) with a[0] == 1. Mirrors scipy.signal.lfilter semantics.
    """
    K = b.shape[0]
    if K == 3:
        return biquad_scan(x, b, a)

    lead = x.shape[:-1]

    def step(carry, xt):
        # carry: (K-1, *lead) delay states
        yt = b[0] * xt + carry[0]
        new = []
        for i in range(1, K):
            nxt = carry[i] if i < K - 1 else jnp.zeros(lead, x.dtype)
            new.append(b[i] * xt - a[i] * yt + nxt)
        return jnp.stack(new), yt

    init = jnp.zeros((K - 1,) + lead, x.dtype)
    xt = jnp.moveaxis(x, -1, 0)
    _, y = jax.lax.scan(step, init, xt)
    return jnp.moveaxis(y, 0, -1)


# --------------------------------------------------------------------------
# First-order linear recurrences (parallel prefix)
# --------------------------------------------------------------------------


def linear_recurrence(
    coeff: jnp.ndarray, drive: jnp.ndarray, axis: int = -1
) -> jnp.ndarray:
    """Solve y[n] = coeff[n] * y[n-1] + drive[n] (y[-1] = 0) in parallel.

    First-order linear time-varying recurrence via associative_scan:
    elements (a, b) compose as (a2*a1, a2*b1 + b2). O(T log T) work but fully
    parallel on the VPU — this is how envelope followers and phaser allpasses
    run fast on TPU instead of a serial per-sample loop.
    """

    def combine(e1, e2):
        a1, b1 = e1
        a2, b2 = e2
        return a1 * a2, a2 * b1 + b2

    _, y = jax.lax.associative_scan(combine, (coeff, drive), axis=axis)
    return y


def one_pole_smooth(
    x: jnp.ndarray, alpha: jnp.ndarray, axis: int = -1
) -> jnp.ndarray:
    """One-pole lowpass y[n] = alpha*y[n-1] + (1-alpha)*x[n], zero initial state.

    alpha may be a scalar or elementwise (time-varying ballistics).
    """
    alpha = jnp.broadcast_to(jnp.asarray(alpha, x.dtype), x.shape)
    return linear_recurrence(alpha, (1.0 - alpha) * x, axis=axis)

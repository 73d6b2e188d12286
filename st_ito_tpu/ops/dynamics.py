"""Dynamic range processors: compressor, limiter, noise gate.

Matches the parameterization of the reference's differentiable compressor
(threshold/ratio/attack/release/knee/makeup + 512-sample lookahead,
reference: st_ito/effects.py:623-648) and the hard-knee pedalboard-style
BasicCompressor (reference: st_ito/effects.py:876-897).

TPU design: attack/release ballistics use the *decoupled* peak detector
(Giannoulis, Massberg & Reiss 2012). Its release stage is a min-affine
recurrence — closed under composition — so it evaluates EXACTLY as a
parallel prefix (associative_scan) on the VPU; the attack stage is an LTI
one-pole. No serial per-sample loop anywhere, and the parallel form is
bit-equivalent to the serial reference (tests/test_dynamics.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from st_ito_tpu.ops.iir import linear_recurrence


def _time_constant_alpha(time_ms, sample_rate: float):
    """One-pole smoothing coefficient for a given time constant."""
    time_ms = jnp.maximum(jnp.asarray(time_ms, jnp.float32), 1e-3)
    return jnp.exp(-1.0 / (time_ms * 0.001 * sample_rate))


def gain_computer(
    env_db: jnp.ndarray,
    threshold_db,
    ratio,
    knee_db,
) -> jnp.ndarray:
    """Static soft-knee gain computer. Returns gain reduction in dB (<= 0)."""
    threshold_db = jnp.asarray(threshold_db, jnp.float32)
    ratio = jnp.asarray(ratio, jnp.float32)
    knee_db = jnp.maximum(jnp.asarray(knee_db, jnp.float32), 1e-3)

    over = env_db - threshold_db
    slope = 1.0 / ratio - 1.0
    below = jnp.zeros_like(env_db)
    knee_region = slope * (over + knee_db / 2.0) ** 2 / (2.0 * knee_db)
    above = slope * over
    gr_db = jnp.where(
        2.0 * over < -knee_db,
        below,
        jnp.where(2.0 * over > knee_db, above, knee_region),
    )
    return gr_db


def ballistics_parallel(
    c: jnp.ndarray,
    alpha_attack,
    alpha_release,
    axis: int = -1,
) -> jnp.ndarray:
    """Decoupled attack/release detector (Giannoulis et al. 2012), exact
    parallel form.

    Stage 1 (release, instant downward tracking):
        y1[n] = min(c[n], ar*y1[n-1] + (1-ar)*c[n])
    Each step is the min-affine map f_n(y) = min(c_n, ar*y + b_n); such maps
    are closed under composition — (k, b, m) with f(y) = min(m, k*y + b)
    composes as (k2*k1, k2*b1 + b2, min(m2, k2*m1 + b2)) — so the whole
    recurrence runs as one associative_scan: exact, branchless, parallel.

    Stage 2 (attack): LTI one-pole smoothing with the attack coefficient.

    c is the gain-computer output in dB (<= 0).
    """
    ar = jnp.asarray(alpha_release, c.dtype)
    if ar.ndim == c.ndim - 1:
        ar = ar[..., None]
    b = (1.0 - ar) * c
    k = jnp.broadcast_to(ar, c.shape).astype(c.dtype)

    def combine(e1, e2):
        k1, b1, m1 = e1
        k2, b2, m2 = e2
        return k1 * k2, k2 * b1 + b2, jnp.minimum(m2, k2 * m1 + b2)

    _, B, M = jax.lax.associative_scan(combine, (k, b, c), axis=axis)
    y1 = jnp.minimum(M, B)  # initial state y1[-1] = 0

    aa = jnp.asarray(alpha_attack, c.dtype)
    if aa.ndim == c.ndim - 1:
        aa = aa[..., None]
    aa = jnp.broadcast_to(aa, c.shape).astype(c.dtype)
    return linear_recurrence(aa, (1.0 - aa) * y1, axis=axis)


# --- dispatching ballistics: Pallas kernel on TPU for wide non-autodiff
# paths (the natively batched population renderer calls this with the whole
# population flattened into the lead axis), associative scan elsewhere.
# The associative-scan form stays the default inside vmap/grad contexts —
# it is differentiable and batchable; the Pallas path is a fast-inference
# fast path, not an AD surface.


def ballistics(c: jnp.ndarray, alpha_attack, alpha_release,
               fast: bool = False) -> jnp.ndarray:
    """Decoupled detector over the last axis; c (..., T)."""
    if fast and jax.default_backend() == "tpu":
        from st_ito_tpu.ops.pallas.scan import (
            ballistics_pallas, pallas_scan_profitable)

        if pallas_scan_profitable(
                int(np.prod(c.shape[:-1])), c.shape[-1]):
            return ballistics_pallas(c, alpha_attack, alpha_release)
    return ballistics_parallel(c, alpha_attack, alpha_release)


def ballistics_scan(
    c: jnp.ndarray,
    alpha_attack,
    alpha_release,
) -> jnp.ndarray:
    """Serial per-sample reference of the same decoupled detector
    (golden path; must match ballistics_parallel exactly)."""
    aa = jnp.asarray(alpha_attack, c.dtype)
    ar = jnp.asarray(alpha_release, c.dtype)

    def step(carry, ct):
        y1_prev, g_prev = carry
        y1 = jnp.minimum(ct, ar * y1_prev + (1.0 - ar) * ct)
        g = aa * g_prev + (1.0 - aa) * y1
        return (y1, g), g

    lead = c.shape[:-1]
    init = (jnp.zeros(lead, c.dtype), jnp.zeros(lead, c.dtype))
    _, g = jax.lax.scan(step, init, jnp.moveaxis(c, -1, 0))
    return jnp.moveaxis(g, 0, -1)


def compressor(
    x: jnp.ndarray,
    sample_rate: float,
    threshold_db=-20.0,
    ratio=4.0,
    attack_ms=10.0,
    release_ms=100.0,
    knee_db=6.0,
    makeup_gain_db=0.0,
    lookahead_samples: int = 0,
    link_channels: bool = True,
    exact_ballistics: bool = False,
    fast: bool = False,
    active=None,
) -> jnp.ndarray:
    """Feed-forward compressor on x of shape (..., C, T).

    Detection: peak of |x| linked over channels (stereo-linked, like the
    reference chain executor's per-plugin stereo processing).
    ``fast=True`` routes the ballistics through the Pallas kernel on TPU
    (inference paths; not differentiable).
    ``active``: optional per-item float bypass mask broadcastable to the
    leading dims (1.0 = effect on); blended in-kernel on the fast path
    (saving the executor-level select's extra HBM pass), arithmetically
    otherwise.
    """
    eps = 1e-8
    x_in = x  # pre-lookahead dry signal for the bypass blend
    alpha_a_ = _time_constant_alpha(attack_ms, sample_rate)
    alpha_r_ = _time_constant_alpha(release_ms, sample_rate)
    from st_ito_tpu.ops.pallas.scan import pallas_scan_profitable

    if (fast and not link_channels and lookahead_samples == 0
            and not exact_ballistics and jax.default_backend() == "tpu"
            and pallas_scan_profitable(
                int(np.prod(x.shape[:-1])), x.shape[-1])):
        # entire compressor fused into one Pallas pass (unlinked channels:
        # the detector is purely per-lane) — saves ~5 HBM round trips of
        # the population signal vs the op-by-op form below
        from st_ito_tpu.ops.pallas.scan import compressor_fused_pallas

        lead = x.shape[:-1]

        def to_lead(v):
            v = jnp.asarray(v, jnp.float32)
            while v.ndim > len(lead):  # drop broadcast T axes like (B,1,1)
                v = v[..., 0]
            return jnp.broadcast_to(v, lead)

        return compressor_fused_pallas(
            x, to_lead(threshold_db), to_lead(ratio), to_lead(knee_db),
            to_lead(alpha_a_), to_lead(alpha_r_), to_lead(makeup_gain_db),
            active=None if active is None else to_lead(active),
        )
    if link_channels:
        env = jnp.max(jnp.abs(x), axis=-2, keepdims=True)  # (..., 1, T)
    else:
        env = jnp.abs(x)
    env_db = 20.0 * jnp.log10(jnp.maximum(env, eps))

    gr_db = gain_computer(env_db, threshold_db, ratio, knee_db)

    alpha_a, alpha_r = alpha_a_, alpha_r_
    if exact_ballistics:
        gr_smooth = ballistics_scan(gr_db, alpha_a, alpha_r)
    else:
        aa = jnp.broadcast_to(alpha_a, gr_db.shape)[..., 0]
        ar = jnp.broadcast_to(alpha_r, gr_db.shape)[..., 0]
        gr_smooth = ballistics(gr_db, aa, ar, fast=fast)

    gain = 10.0 ** (gr_smooth / 20.0)

    if lookahead_samples > 0:
        # delay the audio so the gain anticipates transients
        pad = [(0, 0)] * (x.ndim - 1) + [(lookahead_samples, 0)]
        x = jnp.pad(x, pad)[..., : x.shape[-1]]

    y = x * gain
    makeup = 10.0 ** (jnp.asarray(makeup_gain_db, jnp.float32) / 20.0)
    y = y * makeup
    if active is not None:
        act = jnp.asarray(active, jnp.float32)
        while act.ndim < y.ndim:
            act = act[..., None]
        y = act * y + (1.0 - act) * x_in
    return y


def limiter(
    x: jnp.ndarray,
    sample_rate: float,
    threshold_db=-1.0,
    release_ms=100.0,
) -> jnp.ndarray:
    """Brickwall-style limiter: high-ratio fast-attack compressor
    (pedalboard.Limiter semantics: threshold + release only)."""
    return compressor(
        x,
        sample_rate,
        threshold_db=threshold_db,
        ratio=1000.0,
        attack_ms=0.05,
        release_ms=release_ms,
        knee_db=0.1,
        makeup_gain_db=0.0,
    )


def noise_gate(
    x: jnp.ndarray,
    sample_rate: float,
    threshold_db=-60.0,
    ratio=10.0,
    attack_ms=1.0,
    release_ms=100.0,
) -> jnp.ndarray:
    """Downward expander (pedalboard.NoiseGate-style)."""
    eps = 1e-8
    env = jnp.max(jnp.abs(x), axis=-2, keepdims=True)
    env_db = 20.0 * jnp.log10(jnp.maximum(env, eps))
    under = jnp.minimum(env_db - threshold_db, 0.0)
    gr_db = under * (ratio - 1.0)  # expand below threshold
    gr_db = jnp.maximum(gr_db, -100.0)
    alpha_a = _time_constant_alpha(attack_ms, sample_rate)
    alpha_r = _time_constant_alpha(release_ms, sample_rate)
    # gate: attack = opening (gain rising), release = closing
    gr_smooth = ballistics_parallel(gr_db, alpha_r, alpha_a)
    return x * 10.0 ** (gr_smooth / 20.0)

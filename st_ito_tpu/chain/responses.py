"""Batched frequency responses and nonlinear batched process fns for the
population renderer.

LTI stages expose exact rational responses H(e^{jw}) batched over the
population; the executor fuses consecutive LTI stages into one FFT
application. Nonlinear stages expose natively batched fns (params as (B,)
arrays) so the whole population renders without an outer vmap — which is
what lets the compressor hit the Pallas ballistics kernel with the full
population flattened into the kernel's parallel axis.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from st_ito_tpu.ops import delay as _delay
from st_ito_tpu.ops import dynamics as _dyn
from st_ito_tpu.ops.iir import biquad_coeffs
from st_ito_tpu.ops.reverb import _ALLPASS_TUNINGS, _COMB_TUNINGS, _STEREO_SPREAD

# A response is one of
#   ("scalar", H)            H broadcastable to (B, F), identical per channel
#   ("monomix", (D, GL, GR)) structured stereo mix  y_L = D x_L + GL (x_L+x_R),
#                            y_R = D x_R + GR (x_L+x_R)  — i.e. D·I + g·1^T.
#                            Closed under composition; covers the widener
#                            (symmetric mix) and freeverb (mono-summed wet
#                            path) without materializing a (B, 2, 2, F)
#                            matrix (~2 GB at pop 256 / n 2^19).
#   ("matrix", H)            generic H (B, 2, 2, F) mixing stereo channels.


def _freqz_omega(b, a, omega):
    """b, a: (..., 3); omega: (F,). Returns (..., F) complex64.
    Uses the cancellation-stable evaluation (see ops.iir._eval_biquad_poly)."""
    from st_ito_tpu.ops.iir import _eval_biquad_poly, _unit_circle_uv

    u, v = _unit_circle_uv(omega)
    num = _eval_biquad_poly(b, u, v, floor_sum=False)
    den = _eval_biquad_poly(a, u, v, floor_sum=True)
    return num / den


# ----------------------------------------------------------------- EQ


def eq_response(p: dict, omega: jnp.ndarray, sr: float, channels: int):
    sections = []
    sections.append(biquad_coeffs(p["low_shelf_gain_db"], p["low_shelf_cutoff_freq"],
                                  p["low_shelf_q_factor"], sr, "low_shelf"))
    for i in range(4):
        sections.append(biquad_coeffs(p[f"band{i}_gain_db"], p[f"band{i}_cutoff_freq"],
                                      p[f"band{i}_q_factor"], sr, "peaking"))
    sections.append(biquad_coeffs(p["high_shelf_gain_db"],
                                  p["high_shelf_cutoff_freq"],
                                  p["high_shelf_q_factor"], sr, "high_shelf"))
    H = None
    for b, a in sections:
        Hs = _freqz_omega(b, a, omega)
        H = Hs if H is None else H * Hs
    return ("scalar", H)


def eq_fast_batched(x, p, sr, fast: bool, active=None):
    """Exact time-domain EQ via the Pallas biquad-cascade kernel — replaces
    the 2^19-point FFT pair on the ES hot path (~180 ms -> ~10 ms for a
    256-candidate population) and is bit-faithful to scipy lfilter.
    ``active``: optional (B,) float bypass mask blended in-kernel."""
    from st_ito_tpu.ops.pallas.scan import biquad_cascade_pallas

    b, a = _eq_section_stack(p, sr)  # (B, 6, 3) each
    act = None if active is None else jnp.asarray(active, jnp.float32)[:, None]
    return biquad_cascade_pallas(x, b[:, None], a[:, None], active=act)


eq_fast_batched.supports_active = True


def _eq_section_stack(p, sr):
    """(B, 6, 3) biquad coefficient stacks for the basic parametric EQ."""
    sections = []
    sections.append(biquad_coeffs(p["low_shelf_gain_db"],
                                  p["low_shelf_cutoff_freq"],
                                  p["low_shelf_q_factor"], sr, "low_shelf"))
    for i in range(4):
        sections.append(biquad_coeffs(p[f"band{i}_gain_db"],
                                      p[f"band{i}_cutoff_freq"],
                                      p[f"band{i}_q_factor"], sr, "peaking"))
    sections.append(biquad_coeffs(p["high_shelf_gain_db"],
                                  p["high_shelf_cutoff_freq"],
                                  p["high_shelf_q_factor"], sr, "high_shelf"))
    b = jnp.stack([s[0] for s in sections], axis=-2)
    a = jnp.stack([s[1] for s in sections], axis=-2)
    return b, a


def eq_comp_fast_batched(x, p_eq, p_comp, sr, active_eq=None,
                         active_comp=None, p_dist=None, active_dist=None,
                         shared_B: int | None = None):
    """Adjacent EQ -> compressor (-> distortion) stages as ONE Pallas pass
    (the basic chain's first stages, reference: scripts/run_optim.py:375-407).
    Semantically identical to eq_fast_batched followed by
    compressor_batched(fast=True) (followed by distortion_batched) — the
    fusion saves dispatches, (lead, T) <-> (T, G, 8, 128) relayout pairs,
    and full HBM round trips of the (pop, ch, T) intermediates
    (~2 GB/gen each at pop 512, T 262144).
    ``active_*``: optional (B,) float bypass masks blended in-kernel at
    each stage boundary.
    ``shared_B``: x is the population-shared (C, T) input for shared_B
    candidates; the (B, C, T) broadcast never reaches HBM."""
    from st_ito_tpu.ops.pallas.scan import eq_compressor_fused_pallas
    from st_ito_tpu.ops.dynamics import _time_constant_alpha

    b, a = _eq_section_stack(p_eq, sr)

    def col(v):  # (B,) -> (B, 1) broadcast over channels
        return jnp.asarray(v, jnp.float32)[:, None]

    shared_lead_shape = (None if shared_B is None
                         else (shared_B, x.shape[0]))
    return eq_compressor_fused_pallas(
        x, b[:, None], a[:, None],
        shared_lead_shape=shared_lead_shape,
        threshold_db=col(p_comp["threshold_db"]),
        ratio=col(p_comp["ratio"]),
        knee_db=0.5,
        alpha_attack=col(_time_constant_alpha(p_comp["attack_ms"], sr)),
        alpha_release=col(_time_constant_alpha(p_comp["release_ms"], sr)),
        makeup_gain_db=0.0,
        eq_active=None if active_eq is None else col(active_eq),
        comp_active=None if active_comp is None else col(active_comp),
        drive_db=None if p_dist is None else col(p_dist["drive_db"]),
        dist_gain_db=(0.0 if p_dist is None
                      else col(p_dist["output_gain_db"])),
        dist_active=None if active_dist is None else col(active_dist),
    )


# ----------------------------------------------------------------- delay


def reduced_phase(omega: jnp.ndarray, D, n: int):
    """theta = omega*D range-reduced EXACTLY for the grid omega_k = 2pi k/n.

    Direct f32 omega*D loses ~1e-2 rad at (k ~ 2^18) * (D ~ 5e4); instead
    split D into integer + fractional parts and reduce the integer part
    with wraparound int32 products: n is a power of two, so the low
    log2(n) bits of k*Di survive int32 overflow exactly."""
    F = omega.shape[-1]
    n_grid = 2 * (F - 1)
    assert n is None or n_grid == n
    k = jnp.arange(F, dtype=jnp.int32)
    D = jnp.asarray(D, jnp.float32)
    Di = jnp.floor(D)
    Df = D - Di
    m = (k * Di.astype(jnp.int32)) & (n_grid - 1)
    return (2.0 * math.pi / n_grid) * m.astype(jnp.float32) + omega * Df


def delay_response(p: dict, omega: jnp.ndarray, sr: float, channels: int):
    D = jnp.asarray(p["delay_seconds"])[..., None] * sr
    fb = jnp.asarray(p["feedback"])[..., None] * 0.999
    mix = jnp.asarray(p["mix"])[..., None]
    theta = reduced_phase(omega, D, None)
    zD = jax.lax.complex(jnp.cos(theta), -jnp.sin(theta))
    H_wet = zD / (1.0 - fb * zD)
    return ("scalar", (1.0 - mix) + mix * H_wet)


# ----------------------------------------------------------------- gain


def gain_response(p: dict, omega: jnp.ndarray, sr: float, channels: int):
    g = 10.0 ** (jnp.asarray(p["gain_db"]) / 20.0)
    return ("scalar", g[..., None].astype(jnp.complex64)
            * jnp.ones_like(omega, jnp.complex64))


# ----------------------------------------------------------------- widener


def widener_response(p: dict, omega: jnp.ndarray, sr: float, channels: int):
    width = jnp.asarray(p["width"])
    sqrt2 = math.sqrt(2.0)
    mg = jnp.sqrt(jnp.clip(1.0 - width, 0.0, 1.0)) * sqrt2
    sg = jnp.sqrt(jnp.clip(width, 0.0, 1.0)) * sqrt2
    a = (mg + sg) / 2.0
    b = (mg - sg) / 2.0
    # [[a, b], [b, a]] = (a - b) I + b 1 1^T  -> structured monomix form
    D = (a - b)[..., None].astype(jnp.complex64)
    G = b[..., None].astype(jnp.complex64)
    return ("monomix", (D, G, G))


# ----------------------------------------------------------------- freeverb


def _static_lag_z(omega, D: int):
    """z^-D on the rfft grid with exact integer phase reduction (the
    direct f32 omega*D product drifts ~3e-4 rad at 2^19-point grids,
    which detunes the comb resonances)."""
    F = omega.shape[-1]
    n = 2 * (F - 1)
    m = (jnp.arange(F, dtype=jnp.int32) * D) & (n - 1)
    theta = (2.0 * math.pi / n) * m.astype(jnp.float32)
    return jax.lax.complex(jnp.cos(theta), -jnp.sin(theta))


def _freeverb_channel_response(omega, sr, feedback, damp, spread: int):
    """(B, F) wet response of 8 damped combs -> 4 allpasses.
    feedback/damp: (B, 1)."""
    z1 = jnp.exp(-1j * omega)
    comb_sum = None
    for tune in _COMB_TUNINGS:
        D = int(sr * (tune + spread) / 44100.0)
        zD = _static_lag_z(omega, D)
        one_pole = 1.0 - damp * z1
        comb = zD * one_pole / (one_pole - feedback * (1.0 - damp) * zD)
        comb_sum = comb if comb_sum is None else comb_sum + comb
    ap = None
    for tune in _ALLPASS_TUNINGS:
        D = int(sr * (tune + spread) / 44100.0)
        zD = _static_lag_z(omega, D)
        a = (1.5 * zD - 1.0) / (1.0 - 0.5 * zD)
        ap = a if ap is None else ap * a
    return comb_sum * ap


def freeverb_response(p: dict, omega: jnp.ndarray, sr: float, channels: int):
    room = jnp.asarray(p["room_size"])[..., None]
    damping = jnp.asarray(p["damping"])[..., None]
    wet_dry = jnp.asarray(p["wet_dry"])[..., None]
    width = jnp.asarray(p["width"])[..., None]

    feedback = room * 0.28 + 0.7
    damp = damping * 0.4
    gain_in = 0.015
    dry = (1.0 - wet_dry) * 2.0

    H_L = _freeverb_channel_response(omega, sr, feedback, damp, 0)
    if channels == 1:
        H = dry + 3.0 * wet_dry * gain_in * H_L
        return ("scalar", H)

    H_R = _freeverb_channel_response(omega, sr, feedback, damp, _STEREO_SPREAD)
    wet1 = 0.5 * wet_dry * 3.0 * (1.0 + width)
    wet2 = 0.5 * wet_dry * 3.0 * (1.0 - width)
    M_L = (wet1 * H_L + wet2 * H_R) * gain_in  # applied to (xl + xr)
    M_R = (wet1 * H_R + wet2 * H_L) * gain_in
    # y_L = dry x_L + M_L (x_L + x_R): dry-diagonal + mono-summed wet path
    dry_c = (dry * jnp.ones((), jnp.complex64)).astype(jnp.complex64)
    return ("monomix", (dry_c, M_L, M_R))


# ------------------------------------------------ response algebra helpers


def _mono_to_matrix(D, GL, GR, F):
    ones = jnp.ones((F,), jnp.complex64)
    return jnp.stack([
        jnp.stack([(D + GL) * ones, GL * ones], axis=-2),
        jnp.stack([GR * ones, (D + GR) * ones], axis=-2),
    ], axis=-3)  # (B, 2, 2, F)


def _to_matrix(kind, H, F):
    if kind == "matrix":
        return H
    if kind == "monomix":
        return _mono_to_matrix(*H, F)
    eye = jnp.eye(2, dtype=jnp.complex64)[None, :, :, None]
    return (H * jnp.ones((F,), jnp.complex64))[:, None, None, :] * eye


def bypass_blend(kind, H, active):
    """Blend toward the identity response where ``active`` (B,) is False."""
    if kind == "scalar":
        return jnp.where(active[:, None], H, jnp.ones((), H.dtype))
    if kind == "monomix":
        D, GL, GR = H
        return (
            jnp.where(active[:, None], D, jnp.ones((), D.dtype)),
            jnp.where(active[:, None], GL, jnp.zeros((), GL.dtype)),
            jnp.where(active[:, None], GR, jnp.zeros((), GR.dtype)),
        )
    eye = jnp.eye(2, dtype=H.dtype)[None, :, :, None]
    return jnp.where(active[:, None, None, None], H, eye)


def compose_responses(kind_old, H_old, kind_new, H_new, F):
    """Total response H_new · H_old (the new stage is applied after)."""
    if H_old is None:
        return kind_new, H_new
    if kind_old == "scalar" and kind_new == "scalar":
        return "scalar", H_old * H_new
    if "matrix" not in (kind_old, kind_new):
        if kind_old == "scalar":  # scalar commutes: scale the monomix parts
            D2, GL2, GR2 = H_new
            return "monomix", (H_old * D2, H_old * GL2, H_old * GR2)
        if kind_new == "scalar":
            D1, GL1, GR1 = H_old
            return "monomix", (D1 * H_new, GL1 * H_new, GR1 * H_new)
        # (D2 I + g2 1^T)(D1 I + g1 1^T)
        #   = D1 D2 I + (D2 g1 + (D1 + 1^T g1) g2) 1^T
        D1, GL1, GR1 = H_old
        D2, GL2, GR2 = H_new
        s1 = D1 + GL1 + GR1
        return "monomix", (
            D1 * D2, D2 * GL1 + s1 * GL2, D2 * GR1 + s1 * GR2)
    M = jnp.einsum("bijf,bjkf->bikf", _to_matrix(kind_new, H_new, F),
                   _to_matrix(kind_old, H_old, F))
    return "matrix", M


def apply_response(kind, H, X):
    """Apply a composed response to the spectrum X (B, C, F)."""
    if kind == "scalar":
        return X * H[:, None, :]
    if kind == "monomix":
        D, GL, GR = H
        Xs = X[:, 0, :] + X[:, 1, :]  # mono sum (B, F)
        G = jnp.stack([GL * jnp.ones_like(Xs), GR * jnp.ones_like(Xs)],
                      axis=1)
        return D[:, None, :] * X + G * Xs[:, None, :]
    return jnp.einsum("bijf,bjf->bif", H, X)


# --------------------------------------------------------- nonlinear stages


def _col(v):
    return jnp.asarray(v)[..., None, None]  # (B,) -> (B, 1, 1)


def compressor_batched(x, p, sr, fast: bool, active=None):
    act = None if active is None else jnp.asarray(active, jnp.float32)[:, None]
    return _dyn.compressor(
        x, sr,
        threshold_db=_col(p["threshold_db"]), ratio=_col(p["ratio"]),
        attack_ms=_col(p["attack_ms"]), release_ms=_col(p["release_ms"]),
        knee_db=0.5, makeup_gain_db=0.0, link_channels=False, fast=fast,
        active=act,
    )


compressor_batched.supports_active = True


def distortion_batched(x, p, sr, fast: bool, active=None):
    drive = 10.0 ** (_col(p["drive_db"]) / 20.0)
    out = 10.0 ** (_col(p["output_gain_db"]) / 20.0)
    y = jnp.tanh(x * drive) * out
    if active is not None:
        # arithmetic blend fuses into this elementwise pass; the
        # executor-level select materialized a separate full HBM pass
        act = jnp.asarray(active, jnp.float32)[:, None, None]
        y = act * y + (1.0 - act) * x
    return y


distortion_batched.supports_active = True


def limiter_batched(x, p, sr, fast: bool):
    return _dyn.compressor(
        x, sr,
        threshold_db=_col(p["threshold_db"]), ratio=1000.0,
        attack_ms=0.05, release_ms=_col(p["release_ms"]),
        knee_db=0.1, makeup_gain_db=0.0, link_channels=True, fast=fast,
    )


def noise_gate_batched(x, p, sr, fast: bool):
    def one(xi, th, ratio, atk, rel):
        return _dyn.noise_gate(xi, sr, th, ratio, atk, rel)

    return jax.vmap(one)(x, p["threshold_db"], p["ratio"], p["attack_ms"],
                         p["release_ms"])


def chorus_batched(x, p, sr, fast: bool):
    def one(xi, rate, centre, depth, fb, mix):
        return _delay.chorus(xi, sr, rate, centre, depth, fb, mix)

    return jax.vmap(one)(x, p["rate_hz"], p["centre_delay_ms"], p["depth"],
                         p["feedback"], p["mix"])


def phaser_batched(x, p, sr, fast: bool):
    def one(xi, rate, depth, centre, fb, mix):
        return _delay.phaser(xi, sr, rate, depth, centre, fb, mix)

    return jax.vmap(one)(x, p["rate_hz"], p["depth"], p["centre_frequency_hz"],
                         p["feedback"], p["mix"])

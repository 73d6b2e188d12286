"""Batched population renderer: equivalence with the per-candidate renderer,
fusion semantics, bypass, multitrack ES, and the Pallas scan kernels
(interpret mode)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from st_ito_tpu.chain import (
    ChainSpec,
    basic_chain,
    basic_compressor,
    basic_delay,
    basic_distortion,
    basic_gain,
    basic_limiter,
    basic_parametric_eq,
    basic_reverb,
    basic_stereo_widener,
    build_render_fn,
)
from st_ito_tpu.chain.executor import build_batched_render_fn

SR = 48000
RNG = np.random.default_rng(14)


def _x(C=1, T=16384):
    return jnp.asarray((RNG.standard_normal((C, T)) * 0.4).astype(np.float32))


@pytest.mark.parametrize("builder", [
    basic_parametric_eq, basic_compressor, basic_distortion, basic_delay,
    basic_reverb, basic_gain, basic_limiter, basic_stereo_widener,
])
def test_batched_matches_percandidate_single_stage(builder):
    chain = ChainSpec(stages=(builder(),), with_bypass=False)
    x = _x(2)
    W = jnp.asarray(RNG.uniform(0.2, 0.8, (4, chain.num_params)).astype(np.float32))
    Yr = jax.vmap(build_render_fn(chain, SR, 2, peak_normalize_output=False),
                  in_axes=(0, None))(W, x)
    Yb = build_batched_render_fn(chain, SR, 2, fast=False,
                                 peak_normalize_output=False)(W, x)
    np.testing.assert_allclose(np.asarray(Yb), np.asarray(Yr), atol=2e-4)


def test_batched_full_chain_unfused_matches():
    chain = basic_chain()
    x = _x(1)
    W = jnp.asarray(RNG.uniform(0, 1, (4, chain.num_params)).astype(np.float32))
    Yr = jax.vmap(build_render_fn(chain, SR, 1), in_axes=(0, None))(W, x)
    Yb = build_batched_render_fn(chain, SR, 1, fast=False, fuse_lti=False)(W, x)
    np.testing.assert_allclose(np.asarray(Yb), np.asarray(Yr), atol=1e-3)


def test_batched_fused_close_to_unfused():
    """Fusion keeps the delay tail alive into the reverb — results correlate
    strongly but are not identical (documented semantics)."""
    chain = basic_chain()
    x = _x(1)
    W = jnp.asarray(RNG.uniform(0, 1, (4, chain.num_params)).astype(np.float32))
    Yf = build_batched_render_fn(chain, SR, 1, fast=False, fuse_lti=True)(W, x)
    Yu = build_batched_render_fn(chain, SR, 1, fast=False, fuse_lti=False)(W, x)
    c = np.corrcoef(np.asarray(Yf).ravel(), np.asarray(Yu).ravel())[0, 1]
    assert c > 0.99


def test_batched_bypass_identity():
    chain = basic_chain(with_bypass=True)
    x = _x(2)
    W = jnp.tile(np.asarray(chain.init_params()), (3, 1))
    for _, start, _ in chain.stage_slices():
        W = W.at[:, start].set(1.0)
    Y = build_batched_render_fn(chain, SR, 2, fast=False,
                                peak_normalize_output=False)(W, x)
    ref = np.broadcast_to(np.asarray(x)[None], Y.shape)
    np.testing.assert_allclose(np.asarray(Y), ref, atol=1e-5)


def test_batched_per_candidate_audio():
    """x (B, C, T): each candidate gets its own input (multitrack mode)."""
    chain = ChainSpec(stages=(basic_distortion(),), with_bypass=False)
    xs = jnp.asarray((RNG.standard_normal((3, 1, 8192)) * 0.4).astype(np.float32))
    W = jnp.asarray(RNG.uniform(0.3, 0.7, (3, 2)).astype(np.float32))
    Y = build_batched_render_fn(chain, SR, 1, fast=False,
                                peak_normalize_output=False)(W, xs)
    for b in range(3):
        drive = 10 ** ((float(W[b, 0]) * 96 - 48) / 20)
        og = 10 ** ((float(W[b, 1]) * 48 - 24) / 20)
        np.testing.assert_allclose(
            np.asarray(Y[b]), np.tanh(np.asarray(xs[b]) * drive) * og, atol=1e-4)


def test_batched_gradients():
    chain = ChainSpec(stages=(basic_parametric_eq(), basic_compressor()),
                      with_bypass=False)
    x = _x(1, 8192)
    render = build_batched_render_fn(chain, SR, 1, fast=False,
                                     peak_normalize_output=False)

    def loss(W):
        return jnp.mean(render(W, x) ** 2)

    W = jnp.full((2, chain.num_params), 0.5)
    g = jax.grad(loss)(W)
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).max()) > 0


def test_pallas_scan_interpret_matches():
    from st_ito_tpu.ops.pallas.scan import ballistics_pallas, linear_recurrence_pallas
    from st_ito_tpu.ops.dynamics import ballistics_scan
    from st_ito_tpu.ops.iir import linear_recurrence

    c = jnp.asarray(-np.abs(RNG.standard_normal((2, 2, 3000))).astype(np.float32) * 8)
    g_ref = ballistics_scan(c, 0.98, 0.999)
    g_pal = ballistics_pallas(c, 0.98, 0.999, t_block=256, interpret=True)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref), atol=1e-4)

    a = jnp.asarray(RNG.uniform(0.9, 0.99, (5, 1000)).astype(np.float32))
    b = jnp.asarray(RNG.standard_normal((5, 1000)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(linear_recurrence_pallas(a, b, t_block=256, interpret=True)),
        np.asarray(linear_recurrence(a, b)), atol=1e-4)


def test_eq_compressor_fused_kernel_matches_unfused():
    """The single-pass EQ->compressor kernel must equal running the biquad
    cascade then the fused compressor separately (interpret mode), including
    in-kernel per-stage bypass blending."""
    from st_ito_tpu.chain.responses import _eq_section_stack
    from st_ito_tpu.ops.dynamics import _time_constant_alpha
    from st_ito_tpu.ops.pallas import scan as ps

    B, C, T = 3, 2, 3000
    x = jnp.asarray((RNG.standard_normal((B, C, T)) * 0.4).astype(np.float32))
    eq_stage = basic_parametric_eq()
    p_eq = {
        p.name: p.denormalize(
            jnp.asarray(RNG.uniform(0.2, 0.8, B).astype(np.float32)))
        for p in eq_stage.params
    }
    b, a = _eq_section_stack(p_eq, SR)
    th = jnp.asarray(RNG.uniform(-40, -10, B).astype(np.float32))
    ratio = jnp.asarray(RNG.uniform(2, 8, B).astype(np.float32))
    aa = _time_constant_alpha(
        jnp.asarray(RNG.uniform(1, 20, B).astype(np.float32)), SR)
    ar = _time_constant_alpha(
        jnp.asarray(RNG.uniform(20, 200, B).astype(np.float32)), SR)
    eq_act = jnp.asarray([1.0, 0.0, 1.0], jnp.float32)
    c_act = jnp.asarray([1.0, 1.0, 0.0], jnp.float32)

    def col(v):
        return v[:, None]

    drive_db = jnp.asarray(RNG.uniform(-6, 24, B).astype(np.float32))
    outg_db = jnp.asarray(RNG.uniform(-6, 6, B).astype(np.float32))
    d_act = jnp.asarray([0.0, 1.0, 1.0], jnp.float32)

    y_fused = ps.eq_compressor_fused_pallas(
        x, b[:, None], a[:, None], threshold_db=col(th), ratio=col(ratio),
        knee_db=0.5, alpha_attack=col(aa), alpha_release=col(ar),
        makeup_gain_db=0.0, eq_active=col(eq_act), comp_active=col(c_act),
        drive_db=col(drive_db), dist_gain_db=col(outg_db),
        dist_active=col(d_act), t_block=256, interpret=True)
    y_eq = ps.biquad_cascade_pallas(x, b[:, None], a[:, None], t_block=256,
                                    interpret=True, active=col(eq_act))
    y_c = ps.compressor_fused_pallas(
        y_eq, col(th), col(ratio), 0.5, col(aa), col(ar), 0.0,
        t_block=256, interpret=True, active=col(c_act))
    y_d = (jnp.tanh(y_c * 10 ** (drive_db[:, None, None] / 20.0))
           * 10 ** (outg_db[:, None, None] / 20.0))
    act3 = d_act[:, None, None]
    y_ref = act3 * y_d + (1.0 - act3) * y_c
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               atol=1e-5)

    # two-stage form (no distortion) still matches
    y2 = ps.eq_compressor_fused_pallas(
        x, b[:, None], a[:, None], threshold_db=col(th), ratio=col(ratio),
        knee_db=0.5, alpha_attack=col(aa), alpha_release=col(ar),
        makeup_gain_db=0.0, eq_active=col(eq_act), comp_active=col(c_act),
        t_block=256, interpret=True)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y_c), atol=1e-5)

    # the population-shared (C, T) input path (no materialized broadcast)
    # is numerically identical to feeding the explicit (B, C, T) broadcast
    xs = x[0]  # (C, T) shared across the B candidates
    y_shared = ps.eq_compressor_fused_pallas(
        xs, b[:, None], a[:, None], threshold_db=col(th), ratio=col(ratio),
        knee_db=0.5, alpha_attack=col(aa), alpha_release=col(ar),
        makeup_gain_db=0.0, eq_active=col(eq_act), comp_active=col(c_act),
        drive_db=col(drive_db), dist_gain_db=col(outg_db),
        dist_active=col(d_act), t_block=256, interpret=True,
        shared_lead_shape=(B, C))
    y_bcast = ps.eq_compressor_fused_pallas(
        jnp.broadcast_to(xs[None], (B, C, xs.shape[-1])),
        b[:, None], a[:, None], threshold_db=col(th), ratio=col(ratio),
        knee_db=0.5, alpha_attack=col(aa), alpha_release=col(ar),
        makeup_gain_db=0.0, eq_active=col(eq_act), comp_active=col(c_act),
        drive_db=col(drive_db), dist_gain_db=col(outg_db),
        dist_active=col(d_act), t_block=256, interpret=True)
    assert y_shared.shape == (B, C, xs.shape[-1])
    np.testing.assert_allclose(np.asarray(y_shared), np.asarray(y_bcast),
                               atol=1e-6)


def test_executor_eqcomp_merge_matches_unfused(monkeypatch):
    """The executor's ("eqcomp", ...) plan merge (TPU fast path) must render
    identically to the two stages run as separate chains. Forces the TPU
    plan on CPU and runs every Pallas scan kernel in interpret mode."""
    import functools

    from st_ito_tpu.ops.pallas import scan as ps

    for name in ("biquad_cascade_pallas", "compressor_fused_pallas",
                 "eq_compressor_fused_pallas"):
        monkeypatch.setattr(ps, name,
                            functools.partial(getattr(ps, name),
                                              interpret=True))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    chain = ChainSpec(stages=(basic_parametric_eq(), basic_compressor(),
                              basic_distortion()),
                      with_bypass=True)
    x = _x(1, 4096)
    W = np.asarray(RNG.uniform(0.2, 0.8,
                               (4, chain.num_params)).astype(np.float32))
    ((_, eq_start, eq_end), (_, c_start, c_end),
     (_, d_start, _)) = chain.stage_slices()
    W[0, eq_start] = 0.9   # candidate 0: EQ bypassed
    W[1, c_start] = 0.9    # candidate 1: compressor bypassed
    W[2, d_start] = 0.9    # candidate 2: distortion bypassed
    W = jnp.asarray(W)

    y_fused = build_batched_render_fn(chain, SR, 1, fast=True)(W, x)

    eq_chain = ChainSpec(stages=(basic_parametric_eq(),), with_bypass=True)
    c_chain = ChainSpec(stages=(basic_compressor(),), with_bypass=True)
    d_chain = ChainSpec(stages=(basic_distortion(),), with_bypass=True)
    r_eq = build_batched_render_fn(eq_chain, SR, 1, fast=True,
                                   peak_normalize_output=False)
    r_c = build_batched_render_fn(c_chain, SR, 1, fast=True,
                                  peak_normalize_output=False)
    r_d = build_batched_render_fn(d_chain, SR, 1, fast=True)
    y_ref = r_d(W[:, c_end:], r_c(W[:, eq_end:c_end], r_eq(W[:, :eq_end], x)))
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               atol=1e-5)


def test_run_es_multitrack():
    from st_ito_tpu.ito import run_es_multitrack
    from st_ito_tpu.models.registry import (
        get_mfcc_feature_embeds,
        load_mfcc_feature_extractor,
    )

    model = load_mfcc_feature_extractor()
    chain = ChainSpec(stages=(basic_distortion(), basic_gain()),
                      with_bypass=False)
    tracks = 2
    T = 32768
    x = jnp.asarray((RNG.standard_normal((tracks, 2, T)) * 0.4).astype(np.float32))
    render = build_batched_render_fn(chain, SR, 2)
    w_t = jnp.asarray(RNG.uniform(0.3, 0.7, (tracks, chain.num_params)).astype(np.float32))
    y = render(w_t, x)

    def embed_func(z, m, sr, params=None, dropout=0.0, rng=None, **kw):
        e = get_mfcc_feature_embeds(z, m, sr)
        return {"mid": e["mono"], "side": e["mono"]}

    res = run_es_multitrack(x, y, SR, chain, model, embed_func=embed_func,
                            max_iters=6, popsize=8, sigma0=0.3, seed=0)
    assert res["output_audio"].shape == (tracks, 2, T)
    assert len(res["fopt"]) == tracks
    assert res["evals_per_sec"] > 0
    # fvals should have improved over the run for both tracks
    for t in range(tracks):
        assert res["fval_history"][t][-1] <= res["fval_history"][t][0]

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

"""Population-sharding equivalence: the mesh-sharded fitness program and
the device-ES blocks must produce numerically the SAME results as the
unsharded run — not merely finite ones (the dryrun asserts finiteness).

This is the TPU replacement for the reference's mp.Pool render parallelism
(reference: st_ito/style_transfer.py:499-502): candidates are independent,
so sharding the population axis must not change any value beyond float
reassociation noise.

Runs on the 8-device virtual CPU mesh from conftest.py.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from st_ito_tpu.chain import (
    ChainSpec,
    basic_compressor,
    basic_distortion,
    basic_parametric_eq,
    build_render_fn,
)
from st_ito_tpu.ito import run_es
from st_ito_tpu.ito.engine import make_fitness_fn
from st_ito_tpu.models.registry import (
    get_mfcc_feature_embeds,
    load_mfcc_feature_extractor,
)
from st_ito_tpu.parallel import make_mesh

SR = 48000
RNG = np.random.default_rng(21)


def _chain():
    return ChainSpec(
        stages=(basic_parametric_eq(), basic_compressor(), basic_distortion()),
        with_bypass=False,
    )


def _signal(T=32768):
    t = np.arange(T) / SR
    x = sum(np.sin(2 * np.pi * f * t) * a
            for f, a in [(110, 1.0), (440, 0.5), (1760, 0.25)])
    x = x + RNG.standard_normal(T) * 0.01
    return jnp.asarray((x / np.abs(x).max() * 0.8).astype(np.float32))[None, None, :]


@pytest.fixture(scope="module")
def setup():
    mesh = make_mesh(8, "pop")
    model = load_mfcc_feature_extractor()
    return mesh, model, get_mfcc_feature_embeds


def test_fitness_pop_sharded_equals_unsharded(setup):
    """make_fitness_fn(mesh=...) fvals == the unsharded fvals (tol 1e-6)."""
    mesh, model, embed_func = setup
    chain = _chain()
    x = _signal()[0]
    W = jnp.asarray(RNG.uniform(0.1, 0.9, (16, chain.num_params))
                    .astype(np.float32))
    target = embed_func(_signal(), model, SR)

    f_plain = make_fitness_fn(chain, model, SR, 1, embed_func=embed_func)
    f_mesh = make_fitness_fn(chain, model, SR, 1, embed_func=embed_func,
                             mesh=mesh)
    rng = jax.random.PRNGKey(0)
    fv_plain = np.asarray(f_plain(W, x, target, None, rng))
    fv_mesh = np.asarray(f_mesh(W, x, target, None, rng))
    assert fv_plain.shape == fv_mesh.shape == (16,)
    np.testing.assert_allclose(fv_mesh, fv_plain, rtol=1e-6, atol=1e-7)


def test_fitness_pop_sharded_equals_unsharded_cnn14(setup):
    """Same equivalence through the real encoder path (tiny Cnn14): the
    sharded render + conv tower + pooling must not change the fvals."""
    mesh, _, _ = setup
    from st_ito_tpu.models.cnn14 import Cnn14Config, init_cnn14_params
    from st_ito_tpu.models.registry import ParamModel, get_param_embeds

    cfg = Cnn14Config(embed_dim=16, base_channels=4)
    model = ParamModel(
        params=init_cnn14_params(jax.random.PRNGKey(5), cfg),
        config=cfg, embed_dim=16,
    )
    chain = _chain()
    T = 33792  # smallest length through the 5 pooling stages
    x = _signal(T)[0]
    W = jnp.asarray(RNG.uniform(0.2, 0.8, (16, chain.num_params))
                    .astype(np.float32))
    target = get_param_embeds(_signal(T), model, SR)

    f_plain = make_fitness_fn(chain, model, SR, 1,
                              compute_dtype="float32")
    f_mesh = make_fitness_fn(chain, model, SR, 1, mesh=mesh,
                             compute_dtype="float32")
    rng = jax.random.PRNGKey(0)
    fv_plain = np.asarray(f_plain(W, x, target, None, rng))
    fv_mesh = np.asarray(f_mesh(W, x, target, None, rng))
    np.testing.assert_allclose(fv_mesh, fv_plain, rtol=1e-6, atol=1e-7)


def test_run_es_device_blocks_mesh_equivalence(setup):
    """A >=2-generation device-ES block on the pop mesh (the
    with_sharding_constraint inside lax.scan, ito/device_es.py) produces
    the same per-generation history and optimum as the unsharded run."""
    mesh, model, embed_func = setup
    chain = _chain()
    x = _signal()
    render = build_render_fn(chain, SR, 1)
    w_target = jnp.asarray(
        RNG.uniform(0.25, 0.75, chain.num_params).astype(np.float32))
    y_target = render(w_target, x[0])[None]

    common = dict(max_iters=4, popsize=16, sigma0=0.3, crop_len=32768,
                  find_w0=False, seed=7, verbose=False, gens_per_dispatch=2)
    r_plain = run_es(x, y_target, SR, chain, model, embed_func=embed_func,
                     **common)
    r_mesh = run_es(x, y_target, SR, chain, model, embed_func=embed_func,
                    mesh=mesh, **common)
    np.testing.assert_allclose(r_mesh["fval_history"],
                               r_plain["fval_history"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(r_mesh["fopt"], r_plain["fopt"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(r_mesh["wopt"]),
                               np.asarray(r_plain["wopt"]),
                               rtol=1e-4, atol=1e-5)

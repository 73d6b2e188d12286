"""Auxiliary capabilities: ES-state resume, chunked embeds, learned
inference method, encoder export interop."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from st_ito_tpu.chain import ChainSpec, basic_distortion, basic_gain, build_render_fn
from st_ito_tpu.ito import run_es
from st_ito_tpu.ito.engine import run_learned_inference
from st_ito_tpu.models.cnn14 import Cnn14Config
from st_ito_tpu.models.registry import (
    ParamModel,
    export_encoder_npz,
    get_mfcc_feature_embeds,
    get_param_embeds,
    get_param_embeds_chunked,
    load_mfcc_feature_extractor,
    load_param_model,
)

RNG = np.random.default_rng(17)
SR = 48000


def _x(T=32768):
    t = np.arange(T) / SR
    x = np.sin(2 * np.pi * 220 * t) * np.exp(-((t % 0.25) / 0.1))
    return jnp.asarray(np.stack([x, x * 0.9]).astype(np.float32) * 0.6)[None]


def test_es_state_resume(tmp_path):
    model = load_mfcc_feature_extractor()
    chain = ChainSpec(stages=(basic_distortion(), basic_gain()),
                      with_bypass=False)
    x = _x()
    render = build_render_fn(chain, SR, 2)
    y = render(jnp.asarray(RNG.uniform(0.3, 0.7, chain.num_params).astype(np.float32)),
               x[0])[None]
    path = str(tmp_path / "es_state.npz")
    r1 = run_es(x, y, SR, chain, model, embed_func=get_mfcc_feature_embeds,
                max_iters=3, popsize=8, find_w0=False, crop_len=32768,
                es_state_path=path, verbose=False, seed=0)
    assert os.path.isfile(path)
    # resume continues from the stored generation
    r2 = run_es(x, y, SR, chain, model, embed_func=get_mfcc_feature_embeds,
                max_iters=2, popsize=8, find_w0=False, crop_len=32768,
                es_state_path=path, verbose=False, seed=0)
    assert r2["fopt"] <= r1["fopt"] + 1e-6


def test_chunked_embeds_long_audio():
    model = load_param_model(allow_random=True)
    x = jnp.asarray(RNG.standard_normal((1, 2, 200000)).astype(np.float32))
    e = get_param_embeds_chunked(x, model, SR, chunk_len=65536, hop=49152)
    assert e["mid"].shape == (1, 512)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(e["mid"]), axis=-1), 1.0, atol=1e-5)
    # short input falls through to the plain path
    xs = jnp.asarray(RNG.standard_normal((1, 2, 48000)).astype(np.float32))
    e1 = get_param_embeds_chunked(xs, model, SR)
    e2 = get_param_embeds(xs, model, SR)
    np.testing.assert_allclose(np.asarray(e1["mid"]), np.asarray(e2["mid"]),
                               atol=1e-6)


def test_learned_inference_method():
    from st_ito_tpu.train.style import StyleTransferConfig, StyleTransferSystem

    T = 33792
    chain = ChainSpec(stages=(basic_distortion(), basic_gain()),
                      with_bypass=False)
    cfg = StyleTransferConfig(encoder=Cnn14Config(embed_dim=8, base_channels=4),
                              analysis_length=T)
    system = StyleTransferSystem(cfg, chain=chain)
    state = system.init(jax.random.PRNGKey(0))
    x = jnp.asarray(RNG.standard_normal((1, 2, T)).astype(np.float32) * 0.4)
    y = jnp.asarray(RNG.standard_normal((1, 2, T)).astype(np.float32) * 0.4)
    out = run_learned_inference(x, y, SR, system, state)
    assert out["output_audio"].shape == (1, 2, T)
    assert out["time_elapsed"] > 0
    assert len(out["params"]) == chain.num_params


def test_encoder_export_interop(tmp_path):
    cfg = Cnn14Config(embed_dim=16, base_channels=4)
    from st_ito_tpu.models.cnn14 import init_cnn14_params

    params = init_cnn14_params(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "encoder.npz")
    export_encoder_npz(params, path, config=cfg)
    model = load_param_model(path)
    assert model.config.embed_dim == 16
    x = jnp.asarray(RNG.standard_normal((1, 2, 48000)).astype(np.float32))
    e = get_param_embeds(x, model, SR)
    assert e["mid"].shape == (1, 16)

def test_loaded_model_params_are_device_arrays(tmp_path):
    """npz-loaded model pytrees must hold jax Arrays, not numpy: numpy
    leaves re-upload the whole encoder through the jit boundary on every
    fitness call (measured ~12 s/generation through the tunneled relay)."""
    cfg = Cnn14Config(embed_dim=16, base_channels=4)
    from st_ito_tpu.models.cnn14 import init_cnn14_params

    params = init_cnn14_params(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "enc.npz")
    export_encoder_npz(params, path, config=cfg)
    model = load_param_model(path)
    leaves = jax.tree_util.tree_leaves(model.params)
    assert all(isinstance(leaf, jax.Array) for leaf in leaves)

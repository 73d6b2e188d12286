"""Alternative encoders: dsTCN + FXencoder shapes, training integration."""

import numpy as np
import jax
import jax.numpy as jnp

from st_ito_tpu.models.encoders import (
    DsTCNConfig,
    FXEncoderConfig,
    dstcn_apply,
    fx_encoder_apply,
    get_fx_encoder_embeds,
    init_dstcn_params,
    init_fx_encoder_params,
    load_fx_encoder_model,
)

RNG = np.random.default_rng(19)


def test_dstcn_shapes_and_downsampling():
    cfg = DsTCNConfig(embed_dim=32, nblocks=4, channel_width=8)
    params = init_dstcn_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(RNG.standard_normal((2, 1, 65536)).astype(np.float32))
    mid, side = dstcn_apply(params, x, cfg)
    assert mid.shape == (2, 32)
    np.testing.assert_allclose(np.asarray(mid), np.asarray(side))
    assert bool(jnp.isfinite(mid).all())


def test_dstcn_stereo_input_conformed():
    cfg = DsTCNConfig(embed_dim=16, nblocks=3, channel_width=8, ninputs=1)
    params = init_dstcn_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(RNG.standard_normal((1, 2, 32768)).astype(np.float32))
    mid, _ = dstcn_apply(params, x, cfg)
    assert mid.shape == (1, 16)


def test_fx_encoder_shapes():
    params = init_fx_encoder_params(jax.random.PRNGKey(0))
    x = jnp.asarray(RNG.standard_normal((1, 2, 131072)).astype(np.float32) * 0.3)
    e = fx_encoder_apply(params, x)
    assert e.shape == (1, 2048)
    assert bool(jnp.isfinite(e).all())


def test_fx_encoder_registry_embeds():
    model = load_fx_encoder_model(allow_random=True)
    x = jnp.asarray(RNG.standard_normal((2, 2, 88200)).astype(np.float32) * 0.3)
    e = get_fx_encoder_embeds(x, model, 44100)
    assert set(e) == {"stereo"}
    assert e["stereo"].shape == (2, 2048)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(e["stereo"]), axis=-1), 1.0, atol=1e-4)


def test_pretext_training_with_dstcn():
    from st_ito_tpu.train import (
        ParamEstimatorConfig,
        init_param_estimator,
        make_param_train_step,
    )

    cfg = ParamEstimatorConfig(
        encoder=DsTCNConfig(embed_dim=16, nblocks=3, channel_width=8,
                            ninputs=2),
        encoder_type="dstcn",
        num_instances=3, num_presets=2, lr=1e-3,
    )
    state = init_param_estimator(jax.random.PRNGKey(0), cfg)
    step = make_param_train_step(cfg)
    bs, T = 4, 32768
    batch = {
        "inputs": jnp.asarray(RNG.standard_normal((bs, 2, T)).astype(np.float32) * 0.3),
        "outputs": jnp.asarray(RNG.standard_normal((bs, 2, T)).astype(np.float32) * 0.3),
        "instance_index": jnp.asarray(RNG.integers(0, 3, bs), jnp.int32),
        "preset_index": jnp.asarray(RNG.integers(0, 2, bs), jnp.int32),
        "tar_index": jnp.zeros(bs, jnp.int32),
    }
    losses = []
    for i in range(4):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_gcn_encoder_forward_and_train_step():
    from st_ito_tpu.models.gcn import DeepGCNConfig
    from st_ito_tpu.train import (
        ParamEstimatorConfig,
        init_param_estimator,
        make_param_train_step,
    )

    cfg = ParamEstimatorConfig(
        encoder=DeepGCNConfig(embed_dim=16, model_size="t", num_frames=64),
        encoder_type="gcn", num_instances=3, num_presets=0, lr=1e-3,
    )
    state = init_param_estimator(jax.random.PRNGKey(0), cfg)
    step = make_param_train_step(cfg)
    bs, T = 2, 33792
    batch = {
        "inputs": jnp.asarray(RNG.standard_normal((bs, 2, T)).astype(np.float32) * 0.3),
        "outputs": jnp.asarray(RNG.standard_normal((bs, 2, T)).astype(np.float32) * 0.3),
        "instance_index": jnp.asarray(RNG.integers(0, 3, bs), jnp.int32),
        "preset_index": jnp.zeros(bs, jnp.int32),
        "tar_index": jnp.zeros(bs, jnp.int32),
    }
    rm0 = np.asarray(state.params["encoder"]["stem"][0]["bn"]["running_mean"])
    rm0_back = np.asarray(
        state.params["encoder"]["backbone"][0]["fc1"]["bn"]["running_mean"])
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    # BatchNorm running statistics must update during training (the torch
    # reference does this in place on every forward; VERDICT r1 weak #7)
    rm1 = np.asarray(state.params["encoder"]["stem"][0]["bn"]["running_mean"])
    rm1_back = np.asarray(
        state.params["encoder"]["backbone"][0]["fc1"]["bn"]["running_mean"])
    assert not np.allclose(rm0, rm1)
    assert not np.allclose(rm0_back, rm1_back)
    rv1 = np.asarray(state.params["encoder"]["stem"][0]["bn"]["running_var"])
    assert np.isfinite(rv1).all() and (rv1 > 0).all()


def test_htsat_encoder_forward_and_train_step():
    from st_ito_tpu.models.htsat import HTSATConfig
    from st_ito_tpu.train import (
        ParamEstimatorConfig,
        init_param_estimator,
        make_param_train_step,
    )

    cfg = ParamEstimatorConfig(
        encoder=HTSATConfig(embed_dim=16, dim=16, depths=(1, 1, 1, 1),
                            heads=(2, 2, 4, 4), num_frames=64),
        encoder_type="htsat", num_instances=3, num_presets=0, lr=1e-3,
    )
    state = init_param_estimator(jax.random.PRNGKey(0), cfg)
    step = make_param_train_step(cfg)
    bs, T = 2, 65536
    batch = {
        "inputs": jnp.asarray(RNG.standard_normal((bs, 2, T)).astype(np.float32) * 0.3),
        "outputs": jnp.asarray(RNG.standard_normal((bs, 2, T)).astype(np.float32) * 0.3),
        "instance_index": jnp.asarray(RNG.integers(0, 3, bs), jnp.int32),
        "preset_index": jnp.zeros(bs, jnp.int32),
        "tar_index": jnp.zeros(bs, jnp.int32),
    }
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_beats_encoder():
    from st_ito_tpu.models.beats import (
        BEATsConfig,
        BEATsModel,
        get_beats_embeds,
        init_beats_params,
        load_beats_model,
    )
    import pytest

    # embed_dim = patch-embed width, encoder_embed_dim = output width
    # (faithful iter3+ layout: 512 -> proj -> 768)
    cfg = BEATsConfig(embed_dim=16, encoder_embed_dim=32, depth=2, heads=4,
                      ffn_dim=64, num_buckets=16, max_distance=64)
    m = BEATsModel(params=init_beats_params(jax.random.PRNGKey(0), cfg),
                   config=cfg, embed_dim=32)
    x = jnp.asarray(RNG.standard_normal((2, 2, 48000)).astype(np.float32) * 0.3)
    e = get_beats_embeds(x, m, 48000)
    assert e["mono"].shape == (2, 32)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(e["mono"]), axis=-1), 1.0, atol=1e-4)
    with pytest.raises(FileNotFoundError):
        load_beats_model()


def test_clap_encoder_forward_and_train_step():
    """CLAP-style pretext encoder: mid/side through the HTS-AT tower +
    projection (reference: st_ito/models/clap.py:6-42,
    cfg/model/pretext/param-clap-ft-concat-l2.yaml)."""
    from st_ito_tpu.models.clap import CLAPAudioConfig
    from st_ito_tpu.models.htsat import HTSATConfig
    from st_ito_tpu.train import (
        ParamEstimatorConfig,
        init_param_estimator,
        make_param_train_step,
    )

    tower = HTSATConfig(embed_dim=24, dim=16, depths=(1, 1, 1, 1),
                        heads=(2, 2, 4, 4), num_frames=64)
    cfg = ParamEstimatorConfig(
        encoder=CLAPAudioConfig(embed_dim=16, tower=tower),
        encoder_type="clap", num_instances=3, num_presets=0, lr=1e-3,
    )
    state = init_param_estimator(jax.random.PRNGKey(0), cfg)

    # mid/side produce distinct embeddings for stereo input
    from st_ito_tpu.models.clap import clap_audio_apply

    x = jnp.asarray(RNG.standard_normal((2, 2, 65536)).astype(np.float32) * 0.3)
    mid, side = clap_audio_apply(state.params["encoder"], x, cfg.encoder)
    assert mid.shape == (2, 16) and side.shape == (2, 16)
    assert not np.allclose(np.asarray(mid), np.asarray(side))

    step = make_param_train_step(cfg)
    batch = {
        "inputs": x,
        "outputs": jnp.asarray(
            RNG.standard_normal((2, 2, 65536)).astype(np.float32) * 0.3),
        "instance_index": jnp.asarray(RNG.integers(0, 3, 2), jnp.int32),
        "preset_index": jnp.zeros(2, jnp.int32),
        "tar_index": jnp.zeros(2, jnp.int32),
    }
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))

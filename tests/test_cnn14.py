"""Cnn14 forward parity vs the torch twin + embedding API behavior."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from st_ito_tpu.models.cnn14 import Cnn14Config, cnn14_apply, init_cnn14_params
from st_ito_tpu.models.convert import (
    load_params_npz,
    save_params_npz,
    torch_state_dict_to_params,
)
from st_ito_tpu.models.registry import (
    ParamModel,
    get_mfcc_feature_embeds,
    get_param_embeds,
    load_mfcc_feature_extractor,
    load_param_model,
)
from st_ito_tpu.ops.stft import mel_filterbank

from tests.torch_cnn14_twin import TorchCnn14Twin

RNG = np.random.default_rng(5)

CFG = Cnn14Config(embed_dim=64, sample_rate=48000, window_size=2048,
                  hop_size=1024, mel_bins=128, fmin=20, fmax=20000,
                  use_batchnorm=True, input_norm="minmax")


def _make_pair():
    mel = np.asarray(mel_filterbank(CFG.sample_rate, CFG.window_size,
                                    CFG.mel_bins, CFG.fmin, CFG.fmax))
    twin = TorchCnn14Twin(CFG.embed_dim, CFG.sample_rate, CFG.window_size,
                          CFG.hop_size, CFG.mel_bins, CFG.fmin, CFG.fmax,
                          use_batchnorm=CFG.use_batchnorm,
                          input_norm=CFG.input_norm, mel_matrix=mel)
    twin.eval()
    # randomize BN running stats so eval-mode BN is non-trivial
    with torch.no_grad():
        for m in twin.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.5, 0.5)
    params = torch_state_dict_to_params(twin.state_dict())
    return twin, params


def test_torch_conversion_parity_stereo():
    twin, params = _make_pair()
    x = RNG.standard_normal((2, 2, 48000)).astype(np.float32) * 0.5
    with torch.no_grad():
        mid_t, side_t = twin(torch.from_numpy(x))
    mid_j, side_j = cnn14_apply(params, jnp.asarray(x), CFG)
    for a, b in [(mid_j, mid_t), (side_j, side_t)]:
        a = np.asarray(a)
        b = b.numpy()
        cos = np.sum(a * b, -1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
        assert np.all(cos > 1 - 1e-3), cos
        np.testing.assert_allclose(a, b, atol=5e-2, rtol=1e-2)


def test_torch_conversion_parity_mono():
    twin, params = _make_pair()
    x = RNG.standard_normal((1, 1, 48000)).astype(np.float32) * 0.5
    with torch.no_grad():
        mid_t, side_t = twin(torch.from_numpy(x))
    mid_j, side_j = cnn14_apply(params, jnp.asarray(x), CFG)
    np.testing.assert_allclose(np.asarray(mid_j), mid_t.numpy(), atol=5e-2, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(mid_j), np.asarray(side_j))  # mono: side == mid


def test_npz_roundtrip(tmp_path):
    _, params = _make_pair()
    path = str(tmp_path / "p.npz")
    save_params_npz(params, path)
    params2 = load_params_npz(path)
    x = jnp.asarray(RNG.standard_normal((1, 2, 48000)).astype(np.float32))
    m1, s1 = cnn14_apply(params, x, CFG)
    m2, s2 = cnn14_apply(params2, x, CFG)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-6)


def test_get_param_embeds_api():
    model = load_param_model(allow_random=True)
    x = jnp.asarray(RNG.standard_normal((3, 2, 48000)).astype(np.float32))
    embeds = get_param_embeds(x, model, 48000)
    assert set(embeds) == {"mid", "side"}
    assert embeds["mid"].shape == (3, 512)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(embeds["mid"]), axis=-1), 1.0, atol=1e-5
    )
    # resampling path
    x44 = jnp.asarray(RNG.standard_normal((1, 2, 44100)).astype(np.float32))
    e44 = get_param_embeds(x44, model, 44100)
    assert e44["mid"].shape == (1, 512)


def test_param_embeds_scale_invariance():
    """Per-item peak normalize makes embeddings gain-invariant."""
    model = load_param_model(allow_random=True)
    x = jnp.asarray(RNG.standard_normal((1, 2, 48000)).astype(np.float32))
    e1 = get_param_embeds(x, model, 48000)
    e2 = get_param_embeds(x * 0.1, model, 48000)
    np.testing.assert_allclose(
        np.asarray(e1["mid"]), np.asarray(e2["mid"]), atol=1e-4
    )


def test_mfcc_feature_embeds():
    model = load_mfcc_feature_extractor()
    x = jnp.asarray(RNG.standard_normal((2, 2, 48000)).astype(np.float32))
    e = get_mfcc_feature_embeds(x, model, 48000)
    assert e["mono"].shape == (2, 75)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(e["mono"]), axis=-1), 1.0, atol=1e-5
    )


def test_training_mode_runs():
    cfg = Cnn14Config(embed_dim=32, base_channels=8)
    params = init_cnn14_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(RNG.standard_normal((2, 2, 48000)).astype(np.float32))
    mid, side = cnn14_apply(params, x, cfg, training=True,
                            rng=jax.random.PRNGKey(1))
    assert mid.shape == (2, 32)
    assert bool(jnp.isfinite(mid).all())


def test_too_short_input_raises_clear_error():
    """Inputs whose logmel frames pool to zero through the 5 halving
    blocks must fail at trace time with an actionable message, not a
    zero-size-reduction XLA error (regression: bench --quick at
    T=16384 crashed deep inside jnp.max)."""
    cfg = Cnn14Config(embed_dim=32, base_channels=8)
    params = init_cnn14_params(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((1, 2, 16384), jnp.float32)
    with pytest.raises(ValueError, match="logmel frames"):
        cnn14_apply(params, x, cfg)
    # shortest legal length still works
    mid, _ = cnn14_apply(params, jnp.zeros((1, 2, 31 * 1024), jnp.float32), cfg)
    assert mid.shape == (1, 32)


def test_rows_input_matches_flat_input():
    """cnn14_apply / get_param_embeds accept the renderer's hop-blocked
    rows form (bs, chs, R, hop) and must produce exactly the flat-input
    embeddings (frame_signal_rows is a bit-exact reframing)."""
    import jax

    from st_ito_tpu.models.cnn14 import Cnn14Config
    from st_ito_tpu.models.registry import get_param_embeds, load_param_model

    model = load_param_model(allow_random=True)
    # shrink: a tiny twin config keeps the CPU test fast
    cfg = Cnn14Config(embed_dim=32, base_channels=8)
    from st_ito_tpu.models.cnn14 import init_cnn14_params

    params = init_cnn14_params(jax.random.PRNGKey(0), cfg)
    model = type(model)(params=params, config=cfg)
    hop = cfg.hop_size
    R = 40
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 2, R * hop)).astype(np.float32) * 0.4
    e_flat = get_param_embeds(jnp.asarray(x), model, cfg.sample_rate)
    e_rows = get_param_embeds(jnp.asarray(x.reshape(2, 2, R, hop)), model,
                              cfg.sample_rate)
    # half-hop rows (the mega inverse's n2 = hop/2 case, m = 2)
    e_rows2 = get_param_embeds(
        jnp.asarray(x.reshape(2, 2, 2 * R, hop // 2)), model,
        cfg.sample_rate)
    for k in e_flat:
        np.testing.assert_allclose(np.asarray(e_flat[k]),
                                   np.asarray(e_rows[k]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(e_flat[k]),
                                   np.asarray(e_rows2[k]), atol=1e-6)

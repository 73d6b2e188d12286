"""Wav2CLIP / VGGish native towers: frontend golden values and embed API
(reference: st_ito/utils.py:316-383)."""

import numpy as np
import jax
import jax.numpy as jnp

from st_ito_tpu.models.vggish import (
    VGGishConfig,
    VGGishModel,
    get_vggish_embeds,
    init_vggish_params,
    vggish_log_mel_examples,
    vggish_mel_matrix,
)
from st_ito_tpu.models.wav2clip import (
    Wav2ClipModel,
    get_wav2clip_embeds,
    init_wav2clip_params,
)

RNG = np.random.default_rng(11)


def _numpy_vggish_frontend(x, cfg):
    """Straight transcription of the upstream mel_features pipeline
    (periodic Hann, no centering, magnitude rfft, HTK mel, log+0.01)."""
    n_frames = 1 + (len(x) - cfg.stft_win) // cfg.stft_hop
    idx = (np.arange(n_frames)[:, None] * cfg.stft_hop
           + np.arange(cfg.stft_win)[None, :])
    frames = x[idx]
    window = 0.5 - 0.5 * np.cos(
        2.0 * np.pi * np.arange(cfg.stft_win) / cfg.stft_win)
    spec = np.abs(np.fft.rfft(frames * window, cfg.n_fft))
    mel = spec @ np.asarray(vggish_mel_matrix(cfg), np.float64)
    log_mel = np.log(mel + cfg.log_offset)
    E = n_frames // cfg.example_frames
    return log_mel[: E * cfg.example_frames].reshape(
        E, cfg.example_frames, cfg.n_mels)


def test_vggish_frontend_matches_numpy_reference():
    cfg = VGGishConfig()
    T = 16000 * 2  # 2 s -> 2 examples
    x = RNG.standard_normal(T).astype(np.float32) * 0.3
    got = np.asarray(jax.jit(
        lambda xx: vggish_log_mel_examples(
            xx, cfg, jnp.asarray(vggish_mel_matrix(cfg))),
    )(jnp.asarray(x)[None]))[0]
    want = _numpy_vggish_frontend(x.astype(np.float64), cfg)
    assert got.shape == (2, 96, 64)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_vggish_mel_matrix_properties():
    W = vggish_mel_matrix()
    assert W.shape == (257, 64)
    assert np.all(W >= 0) and np.all(W[0] == 0)  # DC row zeroed upstream
    # triangles tile the 125-7500 Hz band: interior bins have weight
    freqs = np.linspace(0, 8000, 257)
    inside = (freqs > 400) & (freqs < 7000)
    assert np.all(W[inside].sum(axis=1) > 0)


def test_get_vggish_embeds_shapes_and_batching():
    model = VGGishModel(params=init_vggish_params(jax.random.PRNGKey(0)))
    x = jnp.asarray(RNG.standard_normal((2, 2, 48000 * 2)).astype(np.float32))
    out = get_vggish_embeds(x, model, 48000)
    assert set(out) == {"mono"}
    e = np.asarray(out["mono"])
    assert e.shape == (2, 128) and np.isfinite(e).all()
    # batch independence: item 0 alone == item 0 in the batch
    solo = np.asarray(get_vggish_embeds(x[:1], model, 48000)["mono"])
    np.testing.assert_allclose(solo[0], e[0], atol=1e-4)


def test_get_wav2clip_embeds_shapes():
    model = Wav2ClipModel(params=init_wav2clip_params(jax.random.PRNGKey(0)))
    x = jnp.asarray(RNG.standard_normal((2, 2, 48000)).astype(np.float32))
    out = get_wav2clip_embeds(x, model, 48000)
    e = np.asarray(out["mono"])
    assert e.shape == (2, 512) and np.isfinite(e).all()
    # mono input embeds identically to its stereo duplicate (mono mix)
    xm = x.mean(axis=1, keepdims=True)
    em = np.asarray(get_wav2clip_embeds(xm, model, 48000)["mono"])
    np.testing.assert_allclose(em, e, atol=1e-4)


def test_registry_rows_wired():
    from st_ito_tpu.eval.metrics import METRICS

    assert "wav2clip" in METRICS and "vggish" in METRICS
    # loaders are checkpoint-gated: missing ckpt raises FileNotFoundError
    import pytest

    with pytest.raises(FileNotFoundError):
        METRICS["wav2clip"][0]()
    with pytest.raises(FileNotFoundError):
        METRICS["vggish"][0]()


# ------------------------- LAION-CLAP native tower ------------------------


def _small_clap():
    from st_ito_tpu.models.clap_laion import (
        ClapLaionConfig,
        ClapLaionModel,
        init_clap_laion_params,
    )

    cfg = ClapLaionConfig(spec_size=64, n_mels=16, patch=4, window=4,
                          depths=(1, 2, 1), heads=(2, 4, 2), patch_dim=16,
                          hidden=64, proj_dim=32, max_samples=48000)
    params = init_clap_laion_params(jax.random.PRNGKey(0), cfg)
    return ClapLaionModel(params=params, config=cfg, embed_dim=32)


def test_clap_laion_embeds_mono_and_midside():
    from st_ito_tpu.models.clap_laion import get_clap_laion_embeds

    model = _small_clap()
    x = jnp.asarray(RNG.standard_normal((2, 2, 48000)).astype(np.float32))
    out = get_clap_laion_embeds(x, model, 48000)
    e = np.asarray(out["mono"])
    assert e.shape == (2, 32) and np.isfinite(e).all()
    np.testing.assert_allclose(np.linalg.norm(e, axis=-1), 1.0, atol=1e-5)
    ms = get_clap_laion_embeds(x, model, 48000, midside=True)
    assert set(ms) == {"mid", "side"}
    assert np.asarray(ms["mid"]).shape == (2, 32)
    # shorter audio exercises repeatpad; different rate exercises resample
    short = get_clap_laion_embeds(x[..., :20000], model, 44100)
    assert np.isfinite(np.asarray(short["mono"])).all()


def test_clap_laion_pretext_apply_interface():
    from st_ito_tpu.models.clap_laion import clap_laion_pretext_apply

    model = _small_clap()
    x = jnp.asarray(RNG.standard_normal((3, 2, 24000)).astype(np.float32))
    mid, side = jax.jit(
        lambda p, xx: clap_laion_pretext_apply(p, xx, model.config)
    )(model.params, x)
    assert mid.shape == (3, 32) and side.shape == (3, 32)
    assert np.isfinite(np.asarray(mid)).all()
    # mono input duplicates mid as side
    m2, s2 = clap_laion_pretext_apply(model.params, x[:, :1], model.config)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(s2))


def test_clap_metric_registry_dispatch():
    from st_ito_tpu.models.registry import get_clap_embeds

    model = _small_clap()
    x = jnp.asarray(RNG.standard_normal((1, 2, 48000)).astype(np.float32))
    out = get_clap_embeds(x, model, 48000, midside=True)
    assert set(out) == {"mid", "side"}

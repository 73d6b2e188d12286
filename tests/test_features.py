"""Hand-crafted style features."""

import numpy as np
import jax.numpy as jnp

from st_ito_tpu.features import (
    barkscale_fbanks,
    compute_barkspectrum,
    compute_crest_factor,
    compute_lufs,
    compute_rms_energy,
    compute_spectral_centroid,
    get_mir_feature_embeds,
    load_mir_feature_extractor,
)

RNG = np.random.default_rng(12)
SR = 48000


def test_bark_fbanks_shape_and_coverage():
    fb = np.asarray(barkscale_fbanks(16385, 20.0, 20000.0, 24, 44100))
    assert fb.shape == (16385, 24)
    assert (fb >= 0).all()
    assert (fb.max(axis=0) > 0).all()  # every band non-empty


def test_barkspectrum_modes():
    x = jnp.asarray(RNG.standard_normal((2, 2, 65536)).astype(np.float32) * 0.3)
    for mode, dim in [("mono", 24), ("stereo", 48), ("mid-side", 48)]:
        B = compute_barkspectrum(x, sample_rate=SR, mode=mode)
        assert B.shape == (2, dim)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(B), axis=-1), 1.0, atol=1e-5)


def test_rms_and_crest():
    t = np.arange(SR) / SR
    sine = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    x = jnp.asarray(sine[None, None, :])
    rms = float(compute_rms_energy(x)[0, 0])
    np.testing.assert_allclose(rms, 1 / np.sqrt(2), atol=1e-3)
    cf = float(compute_crest_factor(x)[0, 0])
    np.testing.assert_allclose(cf, 3.01, atol=0.1)  # sine crest = 3 dB


def test_lufs_feature():
    x = jnp.asarray(RNG.standard_normal((2, 2, 3 * SR)).astype(np.float32) * 0.1)
    lufs = compute_lufs(x, SR)
    assert lufs.shape == (2, 1)
    assert np.isfinite(np.asarray(lufs)).all()


def test_spectral_centroid_bright_vs_dark():
    t = np.arange(SR) / SR
    dark = np.sin(2 * np.pi * 200 * t).astype(np.float32)
    bright = np.sin(2 * np.pi * 8000 * t).astype(np.float32)
    x = jnp.asarray(np.stack([dark, bright])[:, None, :])
    sc = np.asarray(compute_spectral_centroid(x, SR))
    assert sc.shape == (2, 10)
    assert sc[1].mean() > sc[0].mean() * 5


def test_mir_embeds_dict():
    model = load_mir_feature_extractor()
    x = jnp.asarray(RNG.standard_normal((1, 2, 2 * SR)).astype(np.float32) * 0.2)
    feats = get_mir_feature_embeds(x, model, SR)
    assert set(feats) == {"lufs", "rms", "crest", "barkspectrum",
                          "spectral_centroid"}

"""STFT/mel parity (vs torch.stft and an independent numpy mel) and BS.1770."""

import numpy as np
import torch
import jax.numpy as jnp

from st_ito_tpu.ops.loudness import integrated_loudness, loudness_normalize
from st_ito_tpu.ops.stft import (
    hann_window,
    logmel,
    mel_filterbank,
    mfcc,
    power_to_db,
    spectrogram,
    stft,
)

SR = 48000
RNG = np.random.default_rng(3)


def test_stft_matches_torch():
    x = RNG.standard_normal(16384).astype(np.float32)
    n_fft, hop = 2048, 1024
    S = np.asarray(stft(jnp.asarray(x), n_fft, hop))
    S_t = torch.stft(
        torch.from_numpy(x),
        n_fft,
        hop_length=hop,
        window=torch.hann_window(n_fft, periodic=True),
        center=True,
        pad_mode="reflect",
        return_complex=True,
    ).numpy().T  # torch: (freq, frames) -> (frames, freq)
    assert S.shape == S_t.shape
    np.testing.assert_allclose(np.abs(S), np.abs(S_t), atol=2e-2)


def test_frame_count_torchlibrosa_convention():
    T = 262144
    S = spectrogram(jnp.zeros(T), 2048, 1024)
    assert S.shape == (T // 1024 + 1, 1025)


def _librosa_mel_ref(sr, n_fft, n_mels, fmin, fmax):
    """Independent transcription of librosa.filters.mel (Slaney, norm=slaney)."""
    def hz_to_mel(f):
        f = np.atleast_1d(np.asarray(f, np.float64))
        mel = f * 3.0 / 200.0
        log_region = f >= 1000.0
        mel[log_region] = 15.0 + np.log(f[log_region] / 1000.0) / (np.log(6.4) / 27.0)
        return mel

    def mel_to_hz(m):
        m = np.asarray(m, np.float64)
        f = m * 200.0 / 3.0
        log_region = m >= 15.0
        f[log_region] = 1000.0 * np.exp((np.log(6.4) / 27.0) * (m[log_region] - 15.0))
        return f

    fftfreqs = np.linspace(0, sr / 2, 1 + n_fft // 2)
    mels = np.linspace(hz_to_mel(fmin)[0], hz_to_mel(fmax)[0], n_mels + 2)
    freqs = mel_to_hz(mels)
    weights = np.zeros((n_mels, len(fftfreqs)))
    fdiff = np.diff(freqs)
    ramps = freqs[:, None] - fftfreqs[None, :]
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (freqs[2 : n_mels + 2] - freqs[:n_mels])
    weights *= enorm[:, None]
    return weights.T  # (n_freqs, n_mels)


def test_mel_filterbank_matches_librosa_formula():
    W = np.asarray(mel_filterbank(SR, 2048, 128, 20.0, 20000.0))
    W_ref = _librosa_mel_ref(SR, 2048, 128, 20.0, 20000.0)
    np.testing.assert_allclose(W, W_ref, atol=1e-5)


def test_logmel_pipeline():
    x = jnp.asarray(RNG.standard_normal(48000).astype(np.float32) * 0.1)
    L = logmel(x, SR)
    assert L.shape == (48000 // 1024 + 1, 128)
    assert bool(jnp.isfinite(L).all())
    # silence floors at amin
    L0 = logmel(jnp.zeros(48000), SR)
    np.testing.assert_allclose(np.asarray(L0), -100.0, atol=1e-3)


def test_power_to_db():
    np.testing.assert_allclose(float(power_to_db(jnp.asarray(100.0))), 20.0)
    np.testing.assert_allclose(float(power_to_db(jnp.asarray(0.0))), -100.0)


def test_mfcc_shapes():
    x = jnp.asarray(RNG.standard_normal((2, 48000)).astype(np.float32))
    M = mfcc(x, SR, n_mfcc=25)
    n_frames = (48000 - 2048) // 1024 + 1
    assert M.shape == (2, n_frames, 25)


def test_lufs_sine_calibration():
    """BS.1770: a 997 Hz 0 dBFS sine in one channel reads -3.01 LKFS."""
    T = 5 * SR
    t = np.arange(T) / SR
    x = np.stack([np.sin(2 * np.pi * 997 * t), np.zeros(T)]).astype(np.float32)
    lufs = float(integrated_loudness(jnp.asarray(x), SR))
    np.testing.assert_allclose(lufs, -3.01, atol=0.1)


def test_lufs_gain_linearity():
    x = RNG.standard_normal((1, 2, 3 * SR)).astype(np.float32) * 0.1
    l0 = float(integrated_loudness(jnp.asarray(x), SR)[0])
    l6 = float(integrated_loudness(jnp.asarray(x * 2), SR)[0])
    np.testing.assert_allclose(l6 - l0, 6.02, atol=0.15)


def test_loudness_normalize():
    x = RNG.standard_normal((2, 3 * SR)).astype(np.float32) * 0.05
    y = loudness_normalize(jnp.asarray(x), SR, target_lufs=-22.0)
    lufs = float(integrated_loudness(y, SR))
    np.testing.assert_allclose(lufs, -22.0, atol=0.2)

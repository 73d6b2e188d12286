"""Hand-crafted style features (reference: st_ito/features.py).

Bark-band spectrum, RMS energy, crest factor, LUFS, and spectral centroid —
the MIR feature metric backend and the classic style descriptors used across
the eval harness. All batched jnp, jit/vmap safe.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from st_ito_tpu.ops.loudness import integrated_loudness
from st_ito_tpu.ops.stft import stft as _stft


# ------------------------- bark filterbank ---------------------------------


def _hz_to_bark_np(f, bark_scale: str = "traunmuller"):
    f = np.asarray(f, np.float64)
    if bark_scale == "wang":
        return 6.0 * np.arcsinh(f / 600.0)
    if bark_scale == "schroeder":
        return 7.0 * np.arcsinh(f / 650.0)
    barks = (26.81 * f) / (1960.0 + f) - 0.53
    barks = np.where(barks < 2.0, barks + 0.15 * (2.0 - barks), barks)
    barks = np.where(barks > 20.1, barks + 0.22 * (barks - 20.1), barks)
    return barks


def _bark_to_hz_np(barks, bark_scale: str = "traunmuller"):
    barks = np.asarray(barks, np.float64).copy()
    if bark_scale == "wang":
        return 600.0 * np.sinh(barks / 6.0)
    if bark_scale == "schroeder":
        return 650.0 * np.sinh(barks / 7.0)
    barks = np.where(barks < 2.0, (barks - 0.3) / 0.85, barks)
    barks = np.where(barks > 20.1, (barks + 4.422) / 1.22, barks)
    return 1960.0 * ((barks + 0.53) / (26.28 - barks))


def barkscale_fbanks(
    n_freqs: int,
    f_min: float,
    f_max: float,
    n_barks: int,
    sample_rate: int,
    bark_scale: str = "traunmuller",
) -> jnp.ndarray:
    """(n_freqs, n_barks) triangular bark filterbank
    (reference: features.py:109-163, torchaudio prototype port)."""
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_min = _hz_to_bark_np(f_min, bark_scale)
    m_max = _hz_to_bark_np(f_max, bark_scale)
    m_pts = np.linspace(m_min, m_max, n_barks + 2)
    f_pts = _bark_to_hz_np(m_pts, bark_scale)

    f_diff = np.diff(f_pts)
    slopes = f_pts[None, :] - all_freqs[:, None]
    down = -slopes[:, :-2] / f_diff[None, :-1]
    up = slopes[:, 2:] / f_diff[None, 1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return jnp.asarray(fb, jnp.float32)


def compute_barkspectrum(
    x: jnp.ndarray,
    fft_size: int = 32768,
    n_bands: int = 24,
    sample_rate: int = 44100,
    f_min: float = 20.0,
    f_max: float = 20000.0,
    mode: str = "mid-side",
    **kwargs,
) -> jnp.ndarray:
    """x (bs, 2, T) -> L2-normalized (bs, n_bands * num_signals)
    (reference: features.py:166-232)."""
    fb = barkscale_fbanks(fft_size // 2 + 1, f_min, f_max, n_bands, sample_rate)

    if mode == "mono":
        signals = [jnp.mean(x, axis=1)]
    elif mode == "stereo":
        signals = [x[:, 0, :], x[:, 1, :]]
    elif mode == "mid-side":
        signals = [x[:, 0, :] + x[:, 1, :], x[:, 0, :] - x[:, 1, :]]
    else:
        raise ValueError(f"Invalid mode {mode}")

    outs = []
    rect = jnp.ones(fft_size)  # reference torch.stft call passes no window
    for sig in signals:
        X = jnp.abs(_stft(sig, fft_size, fft_size // 4, window=rect))
        X = jnp.mean(X, axis=-2)  # mean over time -> (bs, freqs)
        B = X @ fb  # (bs, n_bands)
        outs.append(jnp.log(B + 1e-8))
    X = jnp.concatenate(outs, axis=-1)
    return X / jnp.maximum(jnp.linalg.norm(X, axis=-1, keepdims=True), 1e-12)


def compute_rms_energy(x: jnp.ndarray, **kwargs) -> jnp.ndarray:
    """(bs, chs, T) -> (bs, chs) (reference: features.py:235-245)."""
    return jnp.sqrt(jnp.maximum(jnp.mean(x**2, axis=-1), 1e-8))


def compute_crest_factor(x: jnp.ndarray, **kwargs) -> jnp.ndarray:
    """Peak/RMS ratio in dB per channel (reference: features.py:248-264).

    Deviation from the reference: features.py:259 normalizes by the
    per-sample max over the CHANNEL dim (`dim=1`), which collapses mono
    crest factor to ~0 dB — an apparent bug. Crest factor is scale-invariant
    so we skip that normalization entirely.
    """
    num = jnp.max(jnp.abs(x), axis=-1)
    den = compute_rms_energy(x)
    return 20.0 * jnp.log10(jnp.maximum(num / jnp.maximum(den, 1e-8), 1e-8))


def compute_lufs(x: jnp.ndarray, sample_rate: float, **kwargs) -> jnp.ndarray:
    """(bs, chs, T) -> (bs, 1) integrated LUFS, peak-normalized per item
    (reference: features.py:267-299; pyloudnorm replaced by the native
    BS.1770 kernel)."""
    peak = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    x = x / jnp.maximum(peak, 1e-8)
    if x.shape[1] < 2:
        x = jnp.repeat(x, 2, axis=1)
    return integrated_loudness(x, sample_rate)[:, None]


def compute_spectral_centroid(
    x: jnp.ndarray, sample_rate: float, n_fft: int = 2048, hop: int = 1024,
    num_pooled: int = 10, **kwargs,
) -> jnp.ndarray:
    """(bs, chs, T) -> (bs, chs * 10), adaptive-pooled, nyquist-normalized
    (reference: features.py:302-332)."""
    S = jnp.abs(_stft(x, n_fft, hop))  # (bs, chs, frames, freqs)
    freqs = jnp.linspace(0.0, sample_rate / 2.0, n_fft // 2 + 1)
    sc = jnp.sum(S * freqs, axis=-1) / jnp.maximum(jnp.sum(S, axis=-1), 1e-8)
    sc = jnp.nan_to_num(sc)
    # adaptive average pool to num_pooled
    bs, chs, F = sc.shape
    # torch adaptive_avg_pool1d: bin i covers [floor(i*F/n), ceil((i+1)*F/n))
    pooled = []
    for i in range(num_pooled):
        s = (i * F) // num_pooled
        e = max(-(-((i + 1) * F) // num_pooled), s + 1)
        pooled.append(jnp.mean(sc[..., s:e], axis=-1))
    sc = jnp.stack(pooled, axis=-1)
    sc = sc.reshape(bs, -1)
    return sc / (sample_rate / 2.0)


def _mir_embeds_core(x, sample_rate: int):
    return {
        "lufs": compute_lufs(x, sample_rate),
        "rms": compute_rms_energy(x),
        "crest": compute_crest_factor(x),
        "barkspectrum": compute_barkspectrum(x, sample_rate=sample_rate,
                                             mode="mono"),
        "spectral_centroid": compute_spectral_centroid(x, sample_rate),
    }


_mir_embeds_jit = jax.jit(_mir_embeds_core, static_argnames=("sample_rate",))


def get_mir_feature_embeds(x, model, sample_rate, **kwargs):
    """MIR feature dict (reference: st_ito/utils.py:76-94). Jitted."""
    return _mir_embeds_jit(x, int(sample_rate))


class _MIRModel:
    embed_dim = 49


def load_mir_feature_extractor(use_gpu: bool = False):
    return _MIRModel()

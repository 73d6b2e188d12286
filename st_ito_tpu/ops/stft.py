"""STFT / mel / log-mel / MFCC with torchlibrosa+librosa numerical parity.

The AFx-Rep encoder's pretrained weights were trained on torchlibrosa
Spectrogram (hann, center=True, reflect pad, power=2) + LogmelFilterBank
(librosa Slaney mel, ref=1, amin=1e-10, top_db=None)
(reference: st_ito/models/panns.py:147-168). Any numerical drift here breaks
checkpoint compatibility, so the mel construction follows librosa's Slaney
formulas exactly and is validated in tests against an independent numpy
implementation.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp


# --------------------------------------------------------------------------
# window + framing
# --------------------------------------------------------------------------


def hann_window(n: int) -> jnp.ndarray:
    """Periodic (fftbins=True) Hann window, matching
    librosa.filters.get_window('hann', n, fftbins=True)."""
    k = jnp.arange(n, dtype=jnp.float32)
    return 0.5 - 0.5 * jnp.cos(2.0 * math.pi * k / n)


def frame_signal(x: jnp.ndarray, n_fft: int, hop: int, center: bool = True) -> jnp.ndarray:
    """(..., T) -> (..., n_frames, n_fft) frames.

    center=True reflect-pads by n_fft//2 on both sides (librosa/torchlibrosa
    convention); n_frames = T // hop + 1.

    Fast path for 50%-overlap framing (n_fft == 2*hop, the AFx-Rep config):
    a reshape into hop-size blocks + concat of consecutive block pairs —
    no gather of n_frames*n_fft indices.
    """
    if center:
        pad = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
        x = jnp.pad(x, pad, mode="reflect")
    T = x.shape[-1]
    n_frames = (T - n_fft) // hop + 1

    if n_fft == 2 * hop:
        usable = (n_frames + 1) * hop  # blocks needed: n_frames + 1
        b = x[..., :usable].reshape(*x.shape[:-1], n_frames + 1, hop)
        return jnp.concatenate([b[..., :-1, :], b[..., 1:, :]], axis=-1)

    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    return jnp.take(x, idx, axis=-1)


def frame_signal_rows(xr: jnp.ndarray, n_fft: int, hop: int,
                      center: bool = True) -> jnp.ndarray:
    """(..., R, L) row-blocked signal -> (..., n_frames, n_fft) frames,
    identical to frame_signal(xr.reshape(..., R*L), ...) for the
    50%-overlap config (n_fft == 2*hop, hop % L == 0) WITHOUT ever
    flattening the signal.

    Why: the fused-LTI inverse FFT kernel emits audio as (B, C, Tr, n2)
    row blocks; flattening to (B, C, T) is a pure XLA retile pass
    (~10 ms/gen on the ES hot path) that exists only so this function can
    reshape the signal straight back into hop blocks. The rows form keeps
    the kernel's layout end-to-end: with m = hop // L rows per hop, each
    frame is a lane-concat of 2m row slices strided by m, and the center
    reflect-pad is m constructed rows on each side (built flat at hop
    length — a few KB — then split into rows).
    """
    L = xr.shape[-1]
    if n_fft != 2 * hop or hop % L or xr.shape[-2] * L < n_fft:
        raise ValueError(f"frame_signal_rows needs n_fft == 2*hop, row "
                         f"length dividing hop={hop} and >= n_fft samples; "
                         f"got rows ({xr.shape[-2]}, {L}), n_fft={n_fft}")
    m = hop // L
    if center:
        # reflect pad of the flat signal, expressed in rows: front =
        # reverse(x[1 : hop+1]), back = reverse(x[T-1-hop : T-1]); each is
        # built as a flat hop-length vector (crossing row boundaries with
        # a 1-element offset) and split into m rows
        lead = xr.shape[:-2]
        fparts = [xr[..., 0, 1:]]
        if m > 1:
            fparts.append(xr[..., 1:m, :].reshape(*lead, (m - 1) * L))
        fparts.append(xr[..., m, :1])
        front = jnp.flip(jnp.concatenate(fparts, axis=-1),
                         axis=-1).reshape(*lead, m, L)
        bparts = [xr[..., -m - 1, -1:]]
        if m > 1:
            bparts.append(xr[..., -m:-1, :].reshape(*lead, (m - 1) * L))
        bparts.append(xr[..., -1, :-1])
        back = jnp.flip(jnp.concatenate(bparts, axis=-1),
                        axis=-1).reshape(*lead, m, L)
        xr = jnp.concatenate([front, xr, back], axis=-2)
    R = xr.shape[-2]
    n_frames = (R * L - n_fft) // hop + 1
    last = (n_frames - 1) * m  # row index of the last frame's j-th slice
    parts = [xr[..., j:j + last + 1:m, :] for j in range(2 * m)]
    return jnp.concatenate(parts, axis=-1)


def dft_power_matmul(frames: jnp.ndarray,
                     compute_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Power spectrum ``|rfft(frames)|**2`` via two MXU matrix products.

    XLA's TPU FFT runs far below HBM peak for batched small transforms
    (~6x off speed-of-light for the 2048-point STFT at population scale);
    an explicit cos/sin DFT matrix product maps onto the MXU instead. With
    bfloat16 inputs and float32 accumulation the power-spectrum error is
    ~0.5% relative (<0.05 dB after log), negligible for fitness ranking.
    Used by the bfloat16 fitness path; the f32/parity path keeps the exact
    FFT.

    frames: (..., n) real -> (..., n//2 + 1) power.
    """
    n = frames.shape[-1]
    k = np.arange(n, dtype=np.float64)[:, None]
    f = np.arange(n // 2 + 1, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * k * f / n
    cos_m = jnp.asarray(np.cos(ang), compute_dtype)
    sin_m = jnp.asarray(np.sin(ang), compute_dtype)
    fb = frames.astype(compute_dtype)
    re = jnp.matmul(fb, cos_m, preferred_element_type=jnp.float32)
    im = jnp.matmul(fb, sin_m, preferred_element_type=jnp.float32)
    return re * re + im * im


def stft(
    x: jnp.ndarray, n_fft: int, hop: int, center: bool = True, window=None
) -> jnp.ndarray:
    """Complex STFT: (..., T) -> (..., n_frames, n_fft//2 + 1)."""
    if window is None:
        window = hann_window(n_fft)
    frames = frame_signal(x, n_fft, hop, center=center)
    return jnp.fft.rfft(frames * window, axis=-1)


def spectrogram(
    x: jnp.ndarray, n_fft: int, hop: int, power: float = 2.0, center: bool = True
) -> jnp.ndarray:
    """Magnitude-power spectrogram (torchlibrosa Spectrogram parity)."""
    S = jnp.abs(stft(x, n_fft, hop, center=center))
    if power != 1.0:
        S = S**power
    return S


# --------------------------------------------------------------------------
# mel scales and filterbanks
# --------------------------------------------------------------------------


def _hz_to_mel_np(f, htk: bool):
    f = np.asarray(f, np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    f_sp = 200.0 / 3.0
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    with np.errstate(divide="ignore"):  # f=0 takes the linear branch
        return np.where(
            f >= min_log_hz, min_log_mel + np.log(f / min_log_hz) / logstep,
            mels)


def _mel_to_hz_np(m, htk: bool):
    m = np.asarray(m, np.float64)
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_sp = 200.0 / 3.0
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs
    )


def mel_filterbank(
    sample_rate: float,
    n_fft: int,
    n_mels: int,
    fmin: float,
    fmax: float,
    htk: bool = False,
    norm: str | None = "slaney",
) -> jnp.ndarray:
    """(n_fft//2+1, n_mels) mel matrix. Defaults = librosa.filters.mel
    (Slaney scale + Slaney area norm), which is what torchlibrosa bakes into
    LogmelFilterBank. htk=True + norm=None reproduces torchaudio defaults
    (used by the MFCC feature extractor, reference: st_ito/utils.py:100-115).
    Computed in float64 numpy at trace time (static), cast to float32.
    """
    fftfreqs = np.linspace(0.0, sample_rate / 2.0, 1 + n_fft // 2)
    mel_pts = np.linspace(
        _hz_to_mel_np(fmin, htk), _hz_to_mel_np(fmax, htk), n_mels + 2
    )
    f_pts = _mel_to_hz_np(mel_pts, htk)

    fdiff = np.diff(f_pts)
    slopes = f_pts[None, :] - fftfreqs[:, None]  # (n_freqs, n_mels+2)
    down = -slopes[:, :-2] / fdiff[None, :-1]
    up = slopes[:, 2:] / fdiff[None, 1:]
    weights = np.maximum(0.0, np.minimum(down, up))  # (n_freqs, n_mels)

    if norm == "slaney":
        enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
        weights = weights * enorm[None, :]
    return jnp.asarray(weights, jnp.float32)


def power_to_db(
    S: jnp.ndarray, ref: float = 1.0, amin: float = 1e-10, top_db: float | None = None
) -> jnp.ndarray:
    log_spec = 10.0 * jnp.log10(jnp.maximum(S, amin))
    log_spec = log_spec - 10.0 * jnp.log10(max(amin, ref))
    if top_db is not None:
        log_spec = jnp.maximum(log_spec, jnp.max(log_spec) - top_db)
    return log_spec


def logmel(
    x: jnp.ndarray,
    sample_rate: float,
    n_fft: int = 2048,
    hop: int = 1024,
    n_mels: int = 128,
    fmin: float = 20.0,
    fmax: float = 20000.0,
    mel_matrix: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """torchlibrosa-parity log-mel: (..., T) -> (..., n_frames, n_mels)."""
    S = spectrogram(x, n_fft, hop, power=2.0, center=True)
    if mel_matrix is None:
        mel_matrix = mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax)
    mel = S @ mel_matrix
    return power_to_db(mel, ref=1.0, amin=1e-10, top_db=None)


# --------------------------------------------------------------------------
# MFCC (torchaudio-parity defaults) and spectral features
# --------------------------------------------------------------------------


def _dct_matrix(n_mfcc: int, n_mels: int) -> jnp.ndarray:
    """DCT-II with ortho norm, (n_mels, n_mfcc)."""
    n = np.arange(n_mels)
    k = np.arange(n_mfcc)
    dct = np.cos(np.pi / n_mels * (n[:, None] + 0.5) * k[None, :]) * np.sqrt(
        2.0 / n_mels
    )
    dct[:, 0] *= 1.0 / np.sqrt(2.0)
    return jnp.asarray(dct, jnp.float32)


def mfcc(
    x: jnp.ndarray,
    sample_rate: float = 48000,
    n_mfcc: int = 25,
    n_fft: int = 2048,
    hop: int = 1024,
    n_mels: int = 128,
    center: bool = False,
) -> jnp.ndarray:
    """(..., T) -> (..., n_frames, n_mfcc). torchaudio.transforms.MFCC
    semantics: htk mel without norm, power->dB (top_db=80), ortho DCT-II."""
    S = spectrogram(x, n_fft, hop, power=2.0, center=center)
    W = mel_filterbank(sample_rate, n_fft, n_mels, 0.0, sample_rate / 2.0,
                       htk=True, norm=None)
    mel = S @ W
    mel_db = power_to_db(mel, ref=1.0, amin=1e-10, top_db=80.0)
    return mel_db @ _dct_matrix(n_mfcc, n_mels)


def spectral_centroid(
    x: jnp.ndarray, sample_rate: float, n_fft: int = 2048, hop: int = 1024
) -> jnp.ndarray:
    """Per-frame spectral centroid in Hz: (..., T) -> (..., n_frames)."""
    S = jnp.abs(stft(x, n_fft, hop))
    freqs = jnp.linspace(0.0, sample_rate / 2.0, n_fft // 2 + 1)
    return jnp.sum(S * freqs, axis=-1) / jnp.maximum(jnp.sum(S, axis=-1), 1e-8)

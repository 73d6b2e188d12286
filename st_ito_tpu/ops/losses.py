"""Audio losses: multi-resolution STFT (auraloss parity).

Replaces auraloss.freq.MultiResolutionSTFTLoss used by the style system
(reference: st_ito/methods/style.py:611, 817-827). Defaults mirror auraloss:
fft sizes (1024, 2048, 512), hops (120, 240, 50), window lengths
(600, 1200, 240); per-resolution loss = spectral convergence + log-magnitude
L1, averaged over resolutions.
"""

from __future__ import annotations

import jax.numpy as jnp

from st_ito_tpu.ops.stft import frame_signal, hann_window


def _stft_mag(x: jnp.ndarray, fft_size: int, hop: int, win_length: int):
    """Magnitude STFT with a centered win_length hann zero-padded to fft_size
    (torch.stft(win_length=...) semantics used by auraloss)."""
    window = hann_window(win_length)
    pad = (fft_size - win_length) // 2
    window = jnp.pad(window, (pad, fft_size - win_length - pad))
    frames = frame_signal(x, fft_size, hop, center=True)
    S = jnp.abs(jnp.fft.rfft(frames * window, axis=-1))
    return S


def stft_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    fft_size: int,
    hop: int,
    win_length: int,
    w_sc: float = 1.0,
    w_log_mag: float = 1.0,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Single-resolution: spectral convergence + log-magnitude L1."""
    P = _stft_mag(pred, fft_size, hop, win_length)
    T = _stft_mag(target, fft_size, hop, win_length)
    sc = jnp.linalg.norm(T - P) / jnp.maximum(jnp.linalg.norm(T), eps)
    log_mag = jnp.mean(jnp.abs(jnp.log(T + eps) - jnp.log(P + eps)))
    return w_sc * sc + w_log_mag * log_mag


def multi_resolution_stft_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    fft_sizes: tuple[int, ...] = (1024, 2048, 512),
    hop_sizes: tuple[int, ...] = (120, 240, 50),
    win_lengths: tuple[int, ...] = (600, 1200, 240),
) -> jnp.ndarray:
    """pred/target: (..., T); channels/batch folded into the loss mean."""
    pred = pred.reshape(-1, pred.shape[-1])
    target = target.reshape(-1, target.shape[-1])
    losses = [
        stft_loss(pred, target, f, h, w)
        for f, h, w in zip(fft_sizes, hop_sizes, win_lengths)
    ]
    return jnp.mean(jnp.stack(losses))

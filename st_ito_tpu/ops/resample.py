"""Bandlimited resampling via FFT (exact sinc interpolation for periodic
extension), replacing torchaudio.functional.resample in the embed path
(reference: st_ito/utils.py:462-463).

FFT resampling is the TPU-natural choice: one batched FFT pair instead of a
strided polyphase convolution with awkward dynamic shapes. For audio-length
signals the boundary behavior differs from a windowed-sinc FIR only in the
first/last few samples.
"""

from __future__ import annotations

import jax.numpy as jnp


def resample(x: jnp.ndarray, orig_sr: int, new_sr: int) -> jnp.ndarray:
    """Resample along the last axis. Output length round(T * new/orig)."""
    if orig_sr == new_sr:
        return x
    T = x.shape[-1]
    T_new = int(round(T * new_sr / orig_sr))
    X = jnp.fft.rfft(x, axis=-1)
    n_in = X.shape[-1]
    n_out = T_new // 2 + 1
    if n_out <= n_in:
        Xr = X[..., :n_out]
        # zero the (possibly shared) Nyquist bin when truncating
        if T_new % 2 == 0:
            Xr = Xr.at[..., -1].set(Xr[..., -1].real.astype(Xr.dtype))
    else:
        pad = [(0, 0)] * (X.ndim - 1) + [(0, n_out - n_in)]
        Xr = jnp.pad(X, pad)
    y = jnp.fft.irfft(Xr, n=T_new, axis=-1) * (T_new / T)
    return y.astype(x.dtype)

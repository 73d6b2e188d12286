"""Audio I/O and normalization helpers (reference: st_ito/utils.py:28-60).

WAV I/O uses scipy (no libsndfile dependency in this environment); float32
in/out, shape convention (channels, samples).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def load_audio(path: str) -> tuple[np.ndarray, int]:
    """Read a WAV file -> (audio (C, T) float32 in [-1, 1], sample_rate)."""
    from scipy.io import wavfile

    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim == 1:
        data = data[None, :]
    else:
        data = data.T  # (T, C) -> (C, T)
    return np.ascontiguousarray(data), int(sr)


def save_audio(path: str, audio, sample_rate: int) -> None:
    """Write (C, T) float32 audio as 16-bit WAV."""
    from scipy.io import wavfile

    audio = np.asarray(audio, np.float32)
    if audio.ndim == 1:
        audio = audio[None, :]
    audio = np.clip(audio, -1.0, 1.0)
    wavfile.write(path, sample_rate, (audio.T * 32767.0).astype(np.int16))


import functools

import jax


@functools.partial(jax.jit, static_argnames=("num_samples",))
def apply_fade_in(x: jnp.ndarray, num_samples: int = 16384) -> jnp.ndarray:
    from st_ito_tpu.ops.waveshape import fade_in

    return fade_in(x, num_samples)


@jax.jit
def batch_peak_normalize(x: jnp.ndarray) -> jnp.ndarray:
    peak = jnp.max(jnp.abs(x), axis=tuple(range(1, x.ndim)), keepdims=True)
    return x / jnp.maximum(peak, 1e-8)


@functools.partial(jax.jit, static_argnames=("sample_rate", "target_lufs"))
def batch_loudness_normalize(
    x: jnp.ndarray, sample_rate: int, target_lufs: float
) -> jnp.ndarray:
    from st_ito_tpu.ops.loudness import loudness_normalize

    return loudness_normalize(x, sample_rate, target_lufs)

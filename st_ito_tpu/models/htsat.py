"""HTS-AT: hierarchical (Swin-style) audio transformer in pure JAX.

Compact faithful reimplementation of the reference's alternative pretext
encoder (reference: st_ito/models/htast.py:41-1005): log-mel front end,
patch embedding, four stages of windowed multi-head self-attention blocks
with shifted windows, relative position bias and patch merging between
stages, final norm + mean pool + linear head.

Windowed attention maps perfectly onto the MXU: all windows across the
batch fold into one (num_windows*B, tokens, C) batched attention.
Simplifications (documented): attention drop / stochastic depth omitted
(configurable off in the shipped config).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from st_ito_tpu.ops.stft import frame_signal, hann_window, mel_filterbank, power_to_db


@dataclasses.dataclass(frozen=True)
class HTSATConfig:
    embed_dim: int = 512
    dim: int = 96
    depths: tuple = (2, 2, 6, 2)
    heads: tuple = (4, 8, 16, 32)
    window: int = 8
    patch: int = 4
    mlp_ratio: float = 4.0
    sample_rate: float = 48000.0
    window_size: int = 2048
    hop_size: int = 1024
    mel_bins: int = 128
    fmin: float = 20.0
    fmax: float = 20000.0
    num_frames: int = 256  # spectrogram frames (crop/pad)


def _trunc_normal(key, shape, std=0.02):
    return jnp.clip(jax.random.normal(key, shape) * std, -2 * std, 2 * std)


def _linear_init(key, out_f, in_f):
    return {"weight": _trunc_normal(key, (out_f, in_f)),
            "bias": jnp.zeros(out_f)}


def _linear(p, x):
    return x @ p["weight"].T + p["bias"]


def _ln_init(c):
    return {"weight": jnp.ones(c), "bias": jnp.zeros(c)}


def _ln(p, x, eps=1e-5):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * p["weight"] + p["bias"]


def _init_block(key, dim, heads, window):
    ks = jax.random.split(key, 6)
    return {
        "norm1": _ln_init(dim),
        "qkv": _linear_init(ks[0], dim * 3, dim),
        "proj": _linear_init(ks[1], dim, dim),
        "rel_bias": _trunc_normal(ks[2], ((2 * window - 1) ** 2, heads)),
        "norm2": _ln_init(dim),
        "mlp1": _linear_init(ks[3], int(dim * 4), dim),
        "mlp2": _linear_init(ks[4], dim, int(dim * 4)),
    }


def init_htsat_params(key, cfg: HTSATConfig):
    keys = iter(jax.random.split(key, 256))
    params: dict = {}
    params["patch_embed"] = {
        "weight": _trunc_normal(next(keys),
                                (cfg.dim, 1, cfg.patch, cfg.patch)),
        "bias": jnp.zeros(cfg.dim),
        "norm": _ln_init(cfg.dim),
    }
    stages = []
    dim = cfg.dim
    for si, depth in enumerate(cfg.depths):
        blocks = [_init_block(next(keys), dim, cfg.heads[si], cfg.window)
                  for _ in range(depth)]
        stage = {"blocks": blocks}
        if si < len(cfg.depths) - 1:
            stage["merge"] = {
                "reduction": _linear_init(next(keys), dim * 2, dim * 4),
                "norm": _ln_init(dim * 4),
            }
            dim *= 2
        stages.append(stage)
    params["stages"] = stages
    params["norm"] = _ln_init(dim)
    params["head"] = _linear_init(next(keys), cfg.embed_dim, dim)
    return params


def _rel_bias_index(window: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + (window - 1)
    return (rel[..., 0] * (2 * window - 1) + rel[..., 1]).astype(np.int32)


def _window_attention(block, x, H, W, heads, window, shift):
    """x: (B, H*W, C). The effective window shrinks to min(window, H, W)
    on small late-stage grids (with bias sub-indexing), like Swin's
    window clamping."""
    B, N, C = x.shape
    win = min(window, H, W)
    shift = shift and win < min(H, W)
    h = _ln(block["norm1"], x).reshape(B, H, W, C)
    if shift:
        h = jnp.roll(h, (-win // 2, -win // 2), axis=(1, 2))
    # pad to window multiples
    pad_h = (-H) % win
    pad_w = (-W) % win
    if pad_h or pad_w:
        h = jnp.pad(h, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w
    nH, nW = Hp // win, Wp // win
    h = h.reshape(B, nH, win, nW, win, C)
    h = h.transpose(0, 1, 3, 2, 4, 5).reshape(B * nH * nW, win * win, C)

    qkv = _linear(block["qkv"], h).reshape(-1, win * win, 3, heads,
                                           C // heads)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    q = q.transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    scale = (C // heads) ** -0.5
    attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k)
    if win not in _REL_IDX:
        _REL_IDX[win] = jnp.asarray(_rel_bias_index(win))
    # sub-index the (2*window-1)^2 bias table for the effective window:
    # relative offsets of a win-window are a subset of the full table
    offset = window - win  # recenter into the full table's coordinates
    idx_small = _rel_bias_index(win)
    d = 2 * win - 1
    r0 = idx_small // d + offset
    r1 = idx_small % d + offset
    idx_full = r0 * (2 * window - 1) + r1
    bias = block["rel_bias"][jnp.asarray(idx_full.reshape(-1))].reshape(
        win * win, win * win, heads).transpose(2, 0, 1)
    attn = attn + bias[None]
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(-1, win * win, C)
    out = _linear(block["proj"], out)

    out = out.reshape(B, nH, nW, win, win, C)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
    if pad_h or pad_w:
        out = out[:, :H, :W]
    if shift:
        out = jnp.roll(out, (win // 2, win // 2), axis=(1, 2))
    return out.reshape(B, N, C)


_REL_IDX: dict = {}


def htsat_apply(params, x, cfg: HTSATConfig, training: bool = False, rng=None):
    """x (B, C, T) -> (embed, embed)."""
    if cfg.window not in _REL_IDX:
        _REL_IDX[cfg.window] = jnp.asarray(_rel_bias_index(cfg.window))

    mono = jnp.mean(x, axis=1)
    mel_matrix = mel_filterbank(cfg.sample_rate, cfg.window_size,
                                cfg.mel_bins, cfg.fmin, cfg.fmax)
    frames = frame_signal(mono, cfg.window_size, cfg.hop_size) * hann_window(
        cfg.window_size)
    S = jnp.abs(jnp.fft.rfft(frames, axis=-1)) ** 2
    mel_db = power_to_db(S @ mel_matrix)  # (B, frames, mel)
    mu = jnp.mean(mel_db, axis=(-1, -2), keepdims=True)
    std = jnp.std(mel_db, axis=(-1, -2), keepdims=True)
    mel_db = (mel_db - mu) / jnp.maximum(std, 1e-5)

    F_have = mel_db.shape[1]
    if F_have >= cfg.num_frames:
        mel_db = mel_db[:, :cfg.num_frames]
    else:
        mel_db = jnp.pad(mel_db, ((0, 0), (0, cfg.num_frames - F_have), (0, 0)))

    # patch embed: conv patch x patch stride patch on (B, 1, frames, mel)
    h = mel_db[:, None]
    h = jax.lax.conv_general_dilated(
        h, params["patch_embed"]["weight"],
        (cfg.patch, cfg.patch), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    ) + params["patch_embed"]["bias"][None, :, None, None]
    B, C, H, W = h.shape
    h = h.transpose(0, 2, 3, 1).reshape(B, H * W, C)
    h = _ln(params["patch_embed"]["norm"], h)

    for si, stage in enumerate(params["stages"]):
        heads = cfg.heads[si]
        for bi, block in enumerate(stage["blocks"]):
            shift = bi % 2 == 1
            h = h + _window_attention(block, h, H, W, heads, cfg.window, shift)
            m = _ln(block["norm2"], h)
            m = jax.nn.gelu(_linear(block["mlp1"], m))
            h = h + _linear(block["mlp2"], m)
        if "merge" in stage:
            # patch merging: 2x2 neighborhood concat -> linear reduction
            hh = h.reshape(B, H, W, -1)
            h0 = hh[:, 0::2, 0::2]
            h1 = hh[:, 1::2, 0::2]
            h2 = hh[:, 0::2, 1::2]
            h3 = hh[:, 1::2, 1::2]
            hh = jnp.concatenate([h0, h1, h2, h3], axis=-1)
            H, W = H // 2, W // 2
            hh = hh.reshape(B, H * W, -1)
            hh = _ln(stage["merge"]["norm"], hh)
            h = _linear(stage["merge"]["reduction"], hh)

    h = _ln(params["norm"], h)
    e = jnp.mean(h, axis=1)
    e = _linear(params["head"], e)
    return e, e

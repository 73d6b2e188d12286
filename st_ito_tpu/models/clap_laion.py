"""Checkpoint-faithful LAION-CLAP audio tower (HTSAT-unfused) in pure JAX.

The reference uses ``laion_clap.CLAP_Module(enable_fusion=False)`` as the
"-pt" frozen-pretrained pretext variant and as the ``--metric clap``
backend (reference: st_ito/models/clap.py:6-42, st_ito/utils.py:389-438,
cfg/model/pretext/param-clap-pt.yaml). This module reimplements that
tower so the released checkpoint can be converted and served torch-free:

  log-mel input_features -> per-mel-bin BatchNorm -> reshape_mel2img
  (4-crop stacking of the 1024-frame spectrogram into a 256x256 image,
  bicubic align-corners interpolation when shorter) -> 4x4 patch conv ->
  4 Swin stages (windowed MSA with relative position bias, cyclic-shifted
  odd blocks with the Swin attention mask, patch merging) -> LayerNorm ->
  mean pool -> 2-layer ReLU projection to the 512-d CLAP space.

Structure mirrors transformers' ``ClapAudioModelWithProjection`` (the HF
port of LAION's HTSAT tower) so the converter consumes either the HF
state_dict or the original LAION checkpoint's ``audio_branch`` keys.
Twin parity vs the HF module on random weights is tested in
tests/test_convert_parity.py; real-weight conversion is network-gated.

The mel frontend matches ``ClapFeatureExtractor`` for the unfused model:
48 kHz, n_fft 1024, hop 480, 64 Slaney-scale/Slaney-norm mel bins,
power_to_db with amin 1e-10 (tested against the HF extractor).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ClapLaionConfig:
    spec_size: int = 256
    patch: int = 4
    n_mels: int = 64
    window: int = 8
    depths: tuple = (2, 2, 6, 2)
    heads: tuple = (4, 8, 16, 32)
    patch_dim: int = 96
    hidden: int = 768  # patch_dim * 2**(len(depths)-1)
    proj_dim: int = 512
    mlp_ratio: float = 4.0
    eps: float = 1e-5
    # frontend
    sample_rate: int = 48000
    n_fft: int = 1024
    hop: int = 480
    fmin: float = 50.0
    fmax: float = 14000.0
    max_samples: int = 480000  # 10 s context (nb_max_samples)
    # optional converted-checkpoint path for the "-pt" pretext role
    ckpt_path: str | None = None

    @property
    def freq_ratio(self) -> int:
        return self.spec_size // self.n_mels

    @property
    def embed_dim(self) -> int:  # pretext-head width (the CLAP joint space)
        return self.proj_dim


def _ln(p, x, eps):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * p["weight"] + p["bias"]


def _lin(p, x):
    y = x @ p["weight"].T
    if "bias" in p:
        y = y + p["bias"]
    return y


def _tn(key, shape, std=0.02):
    return jnp.clip(jax.random.normal(key, shape) * std, -2 * std, 2 * std)


def _lin_init(key, o, i, bias=True):
    p = {"weight": _tn(key, (o, i))}
    if bias:
        p["bias"] = jnp.zeros(o)
    return p


def _ln_init(c):
    return {"weight": jnp.ones(c), "bias": jnp.zeros(c)}


def init_clap_laion_params(key, cfg: ClapLaionConfig = ClapLaionConfig()):
    keys = iter(jax.random.split(key, 512))
    p: dict = {
        "batch_norm": {"weight": jnp.ones(cfg.n_mels),
                       "bias": jnp.zeros(cfg.n_mels),
                       "running_mean": jnp.zeros(cfg.n_mels),
                       "running_var": jnp.ones(cfg.n_mels)},
        "patch_embed": {
            "proj": {"weight": _tn(next(keys), (cfg.patch_dim, 1, cfg.patch,
                                                cfg.patch)),
                     "bias": jnp.zeros(cfg.patch_dim)},
            "norm": _ln_init(cfg.patch_dim),
        },
    }
    layers = []
    dim = cfg.patch_dim
    for si, depth in enumerate(cfg.depths):
        blocks = []
        for _ in range(depth):
            blocks.append({
                "ln1": _ln_init(dim),
                "q": _lin_init(next(keys), dim, dim),
                "k": _lin_init(next(keys), dim, dim),
                "v": _lin_init(next(keys), dim, dim),
                "attn_out": _lin_init(next(keys), dim, dim),
                "rel_bias": _tn(next(keys),
                                ((2 * cfg.window - 1) ** 2, cfg.heads[si])),
                "ln2": _ln_init(dim),
                "fc1": _lin_init(next(keys), int(dim * cfg.mlp_ratio), dim),
                "fc2": _lin_init(next(keys), dim, int(dim * cfg.mlp_ratio)),
            })
        layer = {"blocks": blocks}
        if si < len(cfg.depths) - 1:
            layer["downsample"] = {
                "norm": _ln_init(dim * 4),
                "reduction": _lin_init(next(keys), dim * 2, dim * 4,
                                       bias=False),
            }
            dim *= 2
        layers.append(layer)
    p["layers"] = layers
    p["norm"] = _ln_init(dim)
    p["proj"] = {"linear1": _lin_init(next(keys), cfg.proj_dim, dim),
                 "linear2": _lin_init(next(keys), cfg.proj_dim, cfg.proj_dim)}
    return p


# ------------------------------------------------------------- attention


def _rel_index(win: int, full_window: int) -> np.ndarray:
    """Relative-position index of a win x win window into the
    (2*full_window-1)^2 bias table (Swin construction; sub-centered when
    the layer window is clamped below the table's window)."""
    coords = np.stack(np.meshgrid(np.arange(win), np.arange(win),
                                  indexing="ij")).reshape(2, -1)
    rel = (coords[:, :, None] - coords[:, None, :]).transpose(1, 2, 0)
    rel = rel + (full_window - 1)
    return (rel[..., 0] * (2 * full_window - 1) + rel[..., 1]).astype(
        np.int32)


def _swin_attn_mask(Hp: int, Wp: int, win: int, shift: int) -> np.ndarray:
    """(num_windows, N, N) additive mask for shifted windows (0 / -100),
    exactly transformers' get_attn_mask."""
    img = np.zeros((Hp, Wp))
    cnt = 0
    for hs in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
        for ws in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    img = img.reshape(Hp // win, win, Wp // win, win)
    img = img.transpose(0, 2, 1, 3).reshape(-1, win * win)
    mask = img[:, None, :] - img[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


def _block_attn(block, x, H, W, heads, window, shifted, eps):
    """One Swin block (attention half): x (B, H*W, C) -> (B, H*W, C)."""
    B, N, C = x.shape
    win = min(window, H, W)
    shift = win // 2 if (shifted and win < min(H, W)) else 0
    # NB: HF zeroes shift whenever min(res) <= window (set_shift_and_window
    # _size), which the win < min(H, W) condition reproduces

    h = _ln(block["ln1"], x, eps).reshape(B, H, W, C)
    pad_b = (-H) % win
    pad_r = (-W) % win
    if pad_b or pad_r:
        h = jnp.pad(h, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    Hp, Wp = H + pad_b, W + pad_r
    if shift:
        h = jnp.roll(h, (-shift, -shift), axis=(1, 2))
    nW = (Hp // win) * (Wp // win)
    h = h.reshape(B, Hp // win, win, Wp // win, win, C)
    h = h.transpose(0, 1, 3, 2, 4, 5).reshape(B * nW, win * win, C)

    d = C // heads
    q = _lin(block["q"], h).reshape(-1, win * win, heads, d).transpose(
        0, 2, 1, 3)
    k = _lin(block["k"], h).reshape(-1, win * win, heads, d).transpose(
        0, 2, 1, 3)
    v = _lin(block["v"], h).reshape(-1, win * win, heads, d).transpose(
        0, 2, 1, 3)
    attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) / math.sqrt(d)
    idx = _rel_index(win, window)
    bias = block["rel_bias"][jnp.asarray(idx.reshape(-1))].reshape(
        win * win, win * win, heads).transpose(2, 0, 1)
    attn = attn + bias[None]
    if shift:
        mask = jnp.asarray(_swin_attn_mask(Hp, Wp, win, shift))
        attn = attn.reshape(B, nW, heads, win * win, win * win)
        attn = attn + mask[None, :, None, :, :]
        attn = attn.reshape(B * nW, heads, win * win, win * win)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(-1, win * win, C)
    out = _lin(block["attn_out"], out)

    out = out.reshape(B, Hp // win, Wp // win, win, win, C)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
    if shift:
        out = jnp.roll(out, (shift, shift), axis=(1, 2))
    if pad_b or pad_r:
        out = out[:, :H, :W]
    return out.reshape(B, N, C)


# ------------------------------------------------------------- frontend


def _cubic_resize_matrix(src: int, dst: int) -> np.ndarray | None:
    """(dst, src) matrix for 1-D bicubic interpolation with
    align_corners=True and A=-0.75 (torch's F.interpolate convention)."""
    if src == dst:
        return None

    def kern(t):
        at = np.abs(t)
        A = -0.75
        return np.where(
            at <= 1.0, ((A + 2) * at - (A + 3)) * at * at + 1,
            np.where(at < 2.0, (((at - 5) * at + 8) * at - 4) * A, 0.0))

    x = np.arange(dst) * (src - 1) / (dst - 1)
    i0 = np.floor(x).astype(int)
    t = x - i0
    W = np.zeros((dst, src))
    for tap in (-1, 0, 1, 2):
        idx = np.clip(i0 + tap, 0, src - 1)
        W[np.arange(dst), idx] += kern(tap - t)
    return W.astype(np.float32)


def reshape_mel2img(feats: jnp.ndarray, cfg: ClapLaionConfig) -> jnp.ndarray:
    """(B, 1, T_frames, n_mels) -> (B, 1, spec_size, spec_size), exactly
    transformers' ClapAudioEncoder.reshape_mel2img."""
    B, C, T, F = feats.shape
    spec_w = cfg.spec_size * cfg.freq_ratio
    spec_h = cfg.spec_size // cfg.freq_ratio
    if T > spec_w or F > spec_h:
        raise ValueError("input longer than the swin input size")
    if T < spec_w:
        M = jnp.asarray(_cubic_resize_matrix(T, spec_w))
        feats = jnp.einsum("wt,bctf->bcwf", M, feats)
    if F < spec_h:
        M = jnp.asarray(_cubic_resize_matrix(F, spec_h))
        feats = jnp.einsum("hf,bctf->bcth", M, feats)
    B, C, T, F = feats.shape
    r = cfg.freq_ratio
    feats = feats.reshape(B, C * r, T // r, F)
    feats = feats.transpose(0, 1, 3, 2)
    return feats.reshape(B, C, F * r, T // r)


def clap_mel(x: jnp.ndarray, cfg: ClapLaionConfig) -> jnp.ndarray:
    """Waveform (B, T) at cfg.sample_rate -> (B, frames, 64) log-mel dB,
    matching ClapFeatureExtractor's rand_trunc path (Slaney mel filters,
    power spectrogram, 10*log10 with amin 1e-10)."""
    from st_ito_tpu.ops.stft import (
        hann_window,
        mel_filterbank,
        power_to_db,
        stft,
    )

    w = hann_window(cfg.n_fft)
    S = jnp.abs(stft(x, cfg.n_fft, cfg.hop, center=True, window=w)) ** 2
    mel_w = mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels,
                           cfg.fmin, cfg.fmax, htk=False, norm="slaney")
    return power_to_db(S @ mel_w, ref=1.0, amin=1e-10)


# ------------------------------------------------------------- forward


def clap_audio_tower(params: dict, input_features: jnp.ndarray,
                     cfg: ClapLaionConfig) -> tuple[jnp.ndarray, jnp.ndarray]:
    """input_features (B, 1, T_frames, n_mels) -> (pooled (B, hidden),
    projected (B, proj_dim))."""
    bn = params["batch_norm"]
    inv = jax.lax.rsqrt(bn["running_var"] + 1e-5)
    scale = bn["weight"] * inv
    shift = bn["bias"] - bn["running_mean"] * scale
    feats = input_features * scale[None, None, None, :] \
        + shift[None, None, None, :]

    img = reshape_mel2img(feats, cfg)  # (B, 1, S, S)
    h = jax.lax.conv_general_dilated(
        img, params["patch_embed"]["proj"]["weight"],
        (cfg.patch, cfg.patch), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    ) + params["patch_embed"]["proj"]["bias"][None, :, None, None]
    B, C, H, W = h.shape
    h = h.reshape(B, C, H * W).transpose(0, 2, 1)
    h = _ln(params["patch_embed"]["norm"], h, cfg.eps)

    for si, layer in enumerate(params["layers"]):
        for bi, block in enumerate(layer["blocks"]):
            h = h + _block_attn(block, h, H, W, cfg.heads[si], cfg.window,
                                shifted=bi % 2 == 1, eps=cfg.eps)
            m = _ln(block["ln2"], h, cfg.eps)
            m = jax.nn.gelu(_lin(block["fc1"], m), approximate=False)
            h = h + _lin(block["fc2"], m)
        if "downsample" in layer:
            hh = h.reshape(B, H, W, -1)
            if H % 2 or W % 2:
                hh = jnp.pad(hh, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
            h0 = hh[:, 0::2, 0::2]
            h1 = hh[:, 1::2, 0::2]
            h2 = hh[:, 0::2, 1::2]
            h3 = hh[:, 1::2, 1::2]
            hh = jnp.concatenate([h0, h1, h2, h3], axis=-1)
            H, W = (H + 1) // 2, (W + 1) // 2
            hh = hh.reshape(B, H * W, -1)
            hh = _ln(layer["downsample"]["norm"], hh, cfg.eps)
            h = _lin(layer["downsample"]["reduction"], hh)

    h = _ln(params["norm"], h, cfg.eps)
    pooled = jnp.mean(h, axis=1)  # == HF's group-reshape + avgpool
    proj = _lin(params["proj"]["linear1"], pooled)
    proj = _lin(params["proj"]["linear2"], jax.nn.relu(proj))
    return pooled, proj


# ------------------------------------------------------------- converter


def convert_clap_laion_state_dict(sd: dict,
                                  cfg: ClapLaionConfig = ClapLaionConfig()
                                  ) -> dict:
    """transformers ClapModel / ClapAudioModelWithProjection state_dict
    -> param pytree. Accepts the `audio_model.audio_encoder.` prefix (or
    bare `audio_encoder.`), plus `audio_projection.`."""

    def get(name):
        for k in (f"audio_model.audio_encoder.{name}", f"audio_encoder.{name}",
                  name):
            if k in sd:
                return jnp.asarray(np.asarray(sd[k]))
        raise KeyError(name)

    def lin(prefix, bias=True):
        p = {"weight": get(f"{prefix}.weight")}
        if bias:
            p["bias"] = get(f"{prefix}.bias")
        return p

    def ln(prefix):
        return {"weight": get(f"{prefix}.weight"),
                "bias": get(f"{prefix}.bias")}

    p: dict = {
        "batch_norm": {
            "weight": get("batch_norm.weight"),
            "bias": get("batch_norm.bias"),
            "running_mean": get("batch_norm.running_mean"),
            "running_var": get("batch_norm.running_var"),
        },
        "patch_embed": {"proj": lin("patch_embed.proj"),
                        "norm": ln("patch_embed.norm")},
    }
    layers = []
    for si, depth in enumerate(cfg.depths):
        blocks = []
        for bi in range(depth):
            pre = f"layers.{si}.blocks.{bi}"
            blocks.append({
                "ln1": ln(f"{pre}.layernorm_before"),
                "q": lin(f"{pre}.attention.self.query"),
                "k": lin(f"{pre}.attention.self.key"),
                "v": lin(f"{pre}.attention.self.value"),
                "attn_out": lin(f"{pre}.attention.output.dense"),
                "rel_bias": get(
                    f"{pre}.attention.self.relative_position_bias_table"),
                "ln2": ln(f"{pre}.layernorm_after"),
                "fc1": lin(f"{pre}.intermediate.dense"),
                "fc2": lin(f"{pre}.output.dense"),
            })
        layer = {"blocks": blocks}
        if si < len(cfg.depths) - 1:
            layer["downsample"] = {
                "norm": ln(f"layers.{si}.downsample.norm"),
                "reduction": lin(f"layers.{si}.downsample.reduction",
                                 bias=False),
            }
        layers.append(layer)
    p["layers"] = layers
    p["norm"] = ln("norm")

    def pget(name):
        for k in (f"audio_projection.{name}", name):
            if k in sd:
                return jnp.asarray(np.asarray(sd[k]))
        raise KeyError(name)

    p["proj"] = {
        "linear1": {"weight": pget("linear1.weight"),
                    "bias": pget("linear1.bias")},
        "linear2": {"weight": pget("linear2.weight"),
                    "bias": pget("linear2.bias")},
    }
    return p


# ------------------------------------------------------------- model API


@dataclasses.dataclass
class ClapLaionModel:
    params: dict
    config: ClapLaionConfig = ClapLaionConfig()
    embed_dim: int = 512


def load_clap_laion_model(ckpt_path: str | None = "checkpoints/clap-htsat-unfused.pt",
                          allow_random: bool = False, seed: int = 0,
                          use_gpu: bool = False) -> ClapLaionModel:
    """(reference: st_ito/models/clap.py:6-42 — laion_clap download; gated
    offline. ckpt_path may be an HF ClapModel state_dict .pt/.bin.)"""
    import os

    if ckpt_path and os.path.isfile(ckpt_path):
        import torch

        sd = torch.load(ckpt_path, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        params = jax.tree_util.tree_map(
            jnp.asarray, convert_clap_laion_state_dict(sd))
        return ClapLaionModel(params=params)
    if allow_random:
        return ClapLaionModel(params=init_clap_laion_params(
            jax.random.PRNGKey(seed)))
    raise FileNotFoundError(
        "LAION-CLAP checkpoint unavailable offline; pass a local HF "
        "ClapModel state_dict or allow_random=True")


@partial(jax.jit, static_argnames=("in_sr", "cfg"))
def _clap_laion_embed_impl(params, x, in_sr: int, cfg: ClapLaionConfig):
    from st_ito_tpu.ops.resample import resample

    mono = jnp.mean(x, axis=1)  # (B, T)
    mono = resample(mono, in_sr, cfg.sample_rate)
    T = mono.shape[-1]
    if T > cfg.max_samples:  # center-crop the 10 s context
        s = (T - cfg.max_samples) // 2
        mono = jax.lax.dynamic_slice_in_dim(mono, s, cfg.max_samples, -1)
    elif T < cfg.max_samples:  # repeatpad (the extractor's default)
        reps = -(-cfg.max_samples // T)
        mono = jnp.tile(mono, (1, reps))[:, :cfg.max_samples]
    mel = clap_mel(mono, cfg)  # (B, frames, 64)
    _, proj = clap_audio_tower(params, mel[:, None, :, :], cfg)
    norm = jnp.linalg.norm(proj, axis=-1, keepdims=True)
    return {"mono": proj / jnp.maximum(norm, 1e-12)}


def get_clap_laion_embeds(x: jnp.ndarray, model: ClapLaionModel, sample_rate,
                          params=None, midside: bool = False,
                          **kwargs) -> dict:
    """(reference: st_ito/utils.py:389-438 — mono or mid/side CLAP
    embeddings, L2-normalized.) Fully jitted and device-traceable — usable
    directly as an ES metric, unlike the reference's torch wrapper."""
    p = params if params is not None else model.params
    if midside and x.shape[1] == 2:
        return _clap_laion_embed_ms_impl(p, x, int(sample_rate),
                                         model.config)
    return _clap_laion_embed_impl(p, x, int(sample_rate), model.config)


@partial(jax.jit, static_argnames=("in_sr", "cfg"))
def _clap_laion_embed_ms_impl(params, x, in_sr: int, cfg: ClapLaionConfig):
    mid = (x[:, 0] + x[:, 1])[:, None, :]
    side = (x[:, 0] - x[:, 1])[:, None, :]
    e_mid = _clap_laion_embed_impl(params, mid, in_sr, cfg)["mono"]
    e_side = _clap_laion_embed_impl(params, side, in_sr, cfg)["mono"]
    return {"mid": e_mid, "side": e_side}


def get_clap_laion_embeds_midside(x, model, sample_rate, params=None,
                                  **kwargs) -> dict:
    """Mid/side CLAP metric (run_optim --metric clap with the native
    tower); device-traceable, so the ES engine jits it into the fitness
    program instead of the reference's host round trip."""
    return get_clap_laion_embeds(x, model, sample_rate, params=params,
                                 midside=True, **kwargs)


def clap_laion_pretext_apply(params, x, cfg: ClapLaionConfig,
                             training: bool = False, rng=None):
    """Pretext-encoder interface: x (B, C, T) at cfg.sample_rate ->
    (mid_embed, side_embed) through the checkpoint-faithful tower (the
    reference's "-pt" frozen/finetuned variant,
    cfg/model/pretext/param-clap-pt.yaml; st_ito/models/clap.py:20-42).
    LayerNorm-only transformer; the input BatchNorm uses its (converted or
    frozen) running statistics in both modes."""
    B = x.shape[0]
    if x.shape[1] == 2:
        mid = (x[:, 0] + x[:, 1]) / 2.0
        side = (x[:, 0] - x[:, 1]) / 2.0
        both = jnp.concatenate([mid, side], axis=0)
    else:
        both = x[:, 0]
    T = both.shape[-1]
    if T > cfg.max_samples:
        both = both[..., : cfg.max_samples]
    mel = clap_mel(both, cfg)
    _, proj = clap_audio_tower(params, mel[:, None, :, :], cfg)
    if x.shape[1] == 2:
        return proj[:B], proj[B:]
    return proj, proj

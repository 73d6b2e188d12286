"""Wav2CLIP audio tower in pure JAX.

Replaces the reference's ``wav2clip.get_model()`` wrapper (reference:
st_ito/utils.py:320-347 `load_wav2clip_model`/`get_wav2clip_embeds`;
st_ito/models/pretrained.py:64-74). Upstream: descriptinc/lyrebird-wav2clip
(Wu et al. 2022, "Wav2CLIP: Learning Robust Audio Representations From
CLIP") — a ResNet-18 spectrogram encoder distilled into CLIP's 512-d
joint space.

Architecture, per the release:
  log-mel spectrogram -> ResNet-18 (torchvision BasicBlock layout with a
  1-channel stem) -> global average pool -> fc -> 512-d -> projection MLP
  (the release's ``transform`` head used by ``get_model(pretrained=True)``).

The conv tower and head follow the torchvision state_dict naming under the
release's ``encoder.`` / ``transform.`` prefixes so the published
Wav2CLIP.pt converts 1:1. The spectrogram frontend constants live in
``Wav2ClipConfig``; they mirror the release defaults as documented, but —
the package and checkpoint being unavailable offline — they are the one
part that cannot be parity-verified here and should be re-checked against
``wav2clip/model/encoder.py`` when converting real weights (the conv
tower conversion itself is twin-parity-tested in
tests/test_convert_parity.py).

Embeddings are returned un-normalized, matching the reference wrapper
(utils.py:337-346), whose callers compute cosine similarities.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Wav2ClipConfig:
    sample_rate: int = 16000
    n_fft: int = 512
    hop_length: int = 160
    win_length: int = 400
    n_mels: int = 64
    mel_min_hz: float = 0.0
    mel_max_hz: float = 8000.0
    log_eps: float = 1e-10
    embed_dim: int = 512
    # ResNet-18 plan: stage channels and blocks
    stem_channels: int = 64


_STAGES = [(64, 1), (128, 2), (256, 2), (512, 2)]  # (channels, first stride)


def _conv2d(x, w, stride=1, padding=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(padding, padding), (padding, padding)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    )


def _bn(x, p, eps=1e-5):
    inv = jax.lax.rsqrt(p["running_var"] + eps)
    scale = p["weight"] * inv
    shift = p["bias"] - p["running_mean"] * scale
    return x * scale[None, :, None, None] + shift[None, :, None, None]


def _init_conv(key, out_c, in_c, k):
    fan = in_c * k * k
    std = math.sqrt(2.0 / fan)
    return jax.random.normal(key, (out_c, in_c, k, k), jnp.float32) * std


def _init_bn_params(c):
    return {"weight": jnp.ones(c), "bias": jnp.zeros(c),
            "running_mean": jnp.zeros(c), "running_var": jnp.ones(c)}


def init_wav2clip_params(key, cfg: Wav2ClipConfig = Wav2ClipConfig()) -> dict:
    keys = iter(jax.random.split(key, 64))
    p: dict = {
        "conv1": {"weight": _init_conv(next(keys), 64, 1, 7)},
        "bn1": _init_bn_params(64),
    }
    in_c = 64
    for si, (out_c, stride) in enumerate(_STAGES, start=1):
        layer = {}
        for bi in range(2):
            s = stride if bi == 0 else 1
            blk = {
                "conv1": {"weight": _init_conv(next(keys), out_c, in_c, 3)},
                "bn1": _init_bn_params(out_c),
                "conv2": {"weight": _init_conv(next(keys), out_c, out_c, 3)},
                "bn2": _init_bn_params(out_c),
            }
            if s != 1 or in_c != out_c:
                blk["downsample"] = {
                    "0": {"weight": _init_conv(next(keys), out_c, in_c, 1)},
                    "1": _init_bn_params(out_c),
                }
            layer[str(bi)] = blk
            in_c = out_c
        p[f"layer{si}"] = layer
    a = math.sqrt(6.0 / (512 + cfg.embed_dim))
    p["fc"] = {
        "weight": jax.random.uniform(next(keys), (cfg.embed_dim, 512),
                                     jnp.float32, -a, a),
        "bias": jnp.zeros(cfg.embed_dim),
    }
    # projection MLP (release `transform` head): 512 -> 512 -> 512
    p["transform"] = {
        "0": {"weight": jax.random.uniform(next(keys), (512, cfg.embed_dim),
                                           jnp.float32, -a, a),
              "bias": jnp.zeros(512)},
        "2": {"weight": jax.random.uniform(next(keys), (512, 512),
                                           jnp.float32, -a, a),
              "bias": jnp.zeros(512)},
    }
    return p


def _basic_block(x, p, stride):
    out = _conv2d(x, p["conv1"]["weight"], stride=stride, padding=1)
    out = jax.nn.relu(_bn(out, p["bn1"]))
    out = _conv2d(out, p["conv2"]["weight"], stride=1, padding=1)
    out = _bn(out, p["bn2"])
    if "downsample" in p:
        sc = _conv2d(x, p["downsample"]["0"]["weight"], stride=stride,
                     padding=0)
        sc = _bn(sc, p["downsample"]["1"])
    else:
        sc = x
    return jax.nn.relu(out + sc)


def resnet18_forward(params: dict, spec: jnp.ndarray) -> jnp.ndarray:
    """spec (N, 1, n_mels, frames) -> (N, embed_dim) through the
    torchvision ResNet-18 graph (stem 7x7/2 + 3x3/2 maxpool, 4 stages of
    2 BasicBlocks, global average pool, fc)."""
    x = jax.lax.conv_general_dilated(
        spec, params["conv1"]["weight"], (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    )
    x = jax.nn.relu(_bn(x, params["bn1"]))
    x = jax.lax.reduce_window(  # maxpool 3x3 stride 2 pad 1
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
        [(0, 0), (0, 0), (1, 1), (1, 1)])
    for si, (_, stride) in enumerate(_STAGES, start=1):
        layer = params[f"layer{si}"]
        for bi in range(2):
            x = _basic_block(x, layer[str(bi)], stride if bi == 0 else 1)
    x = jnp.mean(x, axis=(2, 3))  # adaptive avg pool to 1x1
    return x @ params["fc"]["weight"].T + params["fc"]["bias"]


def wav2clip_transform(params: dict, e: jnp.ndarray) -> jnp.ndarray:
    """Release projection MLP: Linear -> ReLU -> Linear."""
    t = params["transform"]
    h = jax.nn.relu(e @ t["0"]["weight"].T + t["0"]["bias"])
    return h @ t["2"]["weight"].T + t["2"]["bias"]


def wav2clip_log_mel(x: jnp.ndarray, cfg: Wav2ClipConfig,
                     mel_w: jnp.ndarray) -> jnp.ndarray:
    """x (B, T) -> (B, 1, n_mels, frames) log-mel spectrogram
    (center-padded STFT with a periodic Hann of win_length centered in the
    n_fft frame — torch.stft semantics — power spectrum, natural log)."""
    from st_ito_tpu.ops.stft import hann_window, stft

    w = hann_window(cfg.win_length)
    lpad = (cfg.n_fft - cfg.win_length) // 2
    w = jnp.pad(w, (lpad, cfg.n_fft - cfg.win_length - lpad))
    mag = jnp.abs(stft(x, cfg.n_fft, cfg.hop_length, center=True, window=w))
    mel = jnp.einsum("btf,fm->bmt", mag**2, mel_w)
    return jnp.log(jnp.maximum(mel, cfg.log_eps))[:, None, :, :]


def wav2clip_mel_matrix(cfg: Wav2ClipConfig = Wav2ClipConfig()) -> np.ndarray:
    """Slaney-normalized mel filterbank (librosa/torchaudio default
    family), (n_fft//2+1, n_mels)."""
    from st_ito_tpu.ops.stft import mel_filterbank

    return np.asarray(mel_filterbank(
        cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.mel_min_hz,
        cfg.mel_max_hz))


@dataclasses.dataclass
class Wav2ClipModel:
    params: dict
    config: Wav2ClipConfig = Wav2ClipConfig()
    embed_dim: int = 512


def convert_wav2clip_state_dict(sd: dict) -> dict:
    """Release Wav2CLIP.pt state_dict -> param pytree. The release nests
    the torchvision ResNet under ``encoder.`` and the projection MLP under
    ``transform.sequential.`` (plain MLP indices accepted too)."""

    def get(name):
        for k in (f"encoder.{name}", name):
            if k in sd:
                return jnp.asarray(np.asarray(sd[k]))
        raise KeyError(name)

    def bn(prefix):
        return {
            "weight": get(f"{prefix}.weight"),
            "bias": get(f"{prefix}.bias"),
            "running_mean": get(f"{prefix}.running_mean"),
            "running_var": get(f"{prefix}.running_var"),
        }

    p: dict = {"conv1": {"weight": get("conv1.weight")}, "bn1": bn("bn1")}
    in_c = 64
    for si, (out_c, stride) in enumerate(_STAGES, start=1):
        layer = {}
        for bi in range(2):
            pre = f"layer{si}.{bi}"
            blk = {
                "conv1": {"weight": get(f"{pre}.conv1.weight")},
                "bn1": bn(f"{pre}.bn1"),
                "conv2": {"weight": get(f"{pre}.conv2.weight")},
                "bn2": bn(f"{pre}.bn2"),
            }
            if bi == 0 and (stride != 1 or in_c != out_c):
                blk["downsample"] = {
                    "0": {"weight": get(f"{pre}.downsample.0.weight")},
                    "1": bn(f"{pre}.downsample.1"),
                }
            layer[str(bi)] = blk
            in_c = out_c
        p[f"layer{si}"] = layer
    p["fc"] = {"weight": get("fc.weight"), "bias": get("fc.bias")}

    tf = {}
    for out_i, cand in (("0", ("transform.sequential.0", "transform.0")),
                        ("2", ("transform.sequential.2", "transform.2"))):
        for c in cand:
            if f"{c}.weight" in sd:
                tf[out_i] = {"weight": jnp.asarray(np.asarray(sd[f"{c}.weight"])),
                             "bias": jnp.asarray(np.asarray(sd[f"{c}.bias"]))}
                break
    if tf:
        p["transform"] = tf
    return p


def load_wav2clip_model(ckpt_path: str | None = None,
                        allow_random: bool = False, seed: int = 0,
                        use_gpu: bool = False) -> Wav2ClipModel:
    """(reference: st_ito/utils.py:319-325 — downloads the release
    checkpoint; gated in zero-egress environments)."""
    import os

    if ckpt_path and os.path.isfile(ckpt_path):
        import torch

        sd = torch.load(ckpt_path, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        params = jax.tree_util.tree_map(
            jnp.asarray, convert_wav2clip_state_dict(sd))
        return Wav2ClipModel(params=params)
    if allow_random:
        return Wav2ClipModel(params=init_wav2clip_params(
            jax.random.PRNGKey(seed)))
    raise FileNotFoundError(
        "Wav2CLIP checkpoint unavailable offline; pass a local Wav2CLIP.pt "
        "or allow_random=True")


@partial(jax.jit, static_argnames=("in_sr", "cfg"))
def _wav2clip_embed_impl(params, x, in_sr: int, cfg: Wav2ClipConfig, mel_w):
    from st_ito_tpu.ops.resample import resample

    mono = jnp.mean(x, axis=1)  # (B, T) — reference mono-mixes (:336)
    mono = resample(mono, in_sr, cfg.sample_rate)
    spec = wav2clip_log_mel(mono, cfg, mel_w)
    e = resnet18_forward(params, spec)
    if "transform" in params:
        e = wav2clip_transform(params, e)
    return {"mono": e}


def get_wav2clip_embeds(x: jnp.ndarray, model: Wav2ClipModel, sample_rate,
                        params=None, **kwargs) -> dict:
    """(reference: st_ito/utils.py:329-347)."""
    p = params if params is not None else model.params
    mel_w = jnp.asarray(wav2clip_mel_matrix(model.config))
    return _wav2clip_embed_impl(p, x, int(sample_rate), model.config, mel_w)

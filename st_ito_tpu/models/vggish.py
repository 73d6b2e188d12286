"""VGGish metric backend in pure JAX.

Replaces the reference's torch.hub VGGish wrapper (reference:
st_ito/utils.py:353-383 `load_vggish_model`/`get_vggish_embeds`;
st_ito/models/pretrained.py:90-177 carries a partially-dead local variant).
Upstream model: harritaylor/torchvggish, itself a port of the TF-hub
VGGish of Hershey et al. 2017 ("CNN Architectures for Large-Scale Audio
Classification").

Pipeline (all constants from the upstream ``vggish_params``):
  waveform @16 kHz -> framed magnitude STFT (25 ms periodic-Hann window,
  10 ms hop, n_fft 512, NO centering) -> 64-band HTK-mel filterbank
  (125-7500 Hz) -> log(mel + 0.01) -> non-overlapping 0.96 s examples of
  96 frames -> VGG conv stack -> 3-layer MLP -> 128-d embedding per
  example -> mean over examples.

Unlike the reference (per-item Python loop over a numpy frontend,
utils.py:371-377), the whole batch runs as one jitted program: examples
from all items fold into the batch axis of the conv stack, which keeps
the MXU busy on (bs * num_examples) images at once.

The optional PCA postprocessor (torch.hub applies it by default:
pca_matrix projection, clip to [-2, 2], 8-bit quantization) is applied
when its parameters are present in the param pytree.

Param pytree uses the torch state_dict naming (``features.{i}`` /
``embeddings.{i}``) for 1:1 checkpoint conversion; weights themselves are
network-gated in this environment (load with ``allow_random=True`` for
architecture work, or convert a local ``vggish.pth``).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class VGGishConfig:
    sample_rate: int = 16000
    stft_win: int = 400  # 0.025 s
    stft_hop: int = 160  # 0.010 s
    n_fft: int = 512
    n_mels: int = 64
    mel_min_hz: float = 125.0
    mel_max_hz: float = 7500.0
    log_offset: float = 0.01
    example_frames: int = 96  # 0.96 s windows, hop == window
    embed_dim: int = 128


# conv plan: (layer index in torch Sequential, in_c, out_c); 'M' = maxpool
_VGG_PLAN = [(0, 1, 64), "M", (3, 64, 128), "M", (6, 128, 256),
             (8, 256, 256), "M", (11, 256, 512), (13, 512, 512), "M"]
_FC_PLAN = [(0, 512 * 4 * 6, 4096), (2, 4096, 4096), (4, 4096, 128)]


def _hertz_to_mel(f):
    return 1127.0 * np.log(1.0 + np.asarray(f, np.float64) / 700.0)


def vggish_mel_matrix(cfg: VGGishConfig = VGGishConfig()) -> np.ndarray:
    """(n_fft//2+1, n_mels) HTK-mel weights, exactly the upstream
    ``spectrogram_to_mel_matrix`` construction (triangles in mel space
    evaluated at the spectrogram bin frequencies; DC row zeroed)."""
    nbins = cfg.n_fft // 2 + 1
    bins_hz = np.linspace(0.0, cfg.sample_rate / 2.0, nbins)
    bins_mel = _hertz_to_mel(bins_hz)
    edges = np.linspace(_hertz_to_mel(cfg.mel_min_hz),
                        _hertz_to_mel(cfg.mel_max_hz), cfg.n_mels + 2)
    lower, center, upper = edges[:-2], edges[1:-1], edges[2:]
    lo_slope = (bins_mel[:, None] - lower[None, :]) / (center - lower)[None, :]
    hi_slope = (upper[None, :] - bins_mel[:, None]) / (upper - center)[None, :]
    W = np.maximum(0.0, np.minimum(lo_slope, hi_slope))
    W[0, :] = 0.0
    return W.astype(np.float32)


def vggish_log_mel_examples(x: jnp.ndarray, cfg: VGGishConfig,
                            mel_w: jnp.ndarray) -> jnp.ndarray:
    """x (B, T) at cfg.sample_rate -> (B, E, 96, 64) log-mel examples.
    Frame counts are static functions of T (tails that don't fill a frame
    or an example are dropped, as upstream)."""
    B, T = x.shape
    n_frames = 1 + (T - cfg.stft_win) // cfg.stft_hop
    idx = (jnp.arange(n_frames)[:, None] * cfg.stft_hop
           + jnp.arange(cfg.stft_win)[None, :])
    frames = x[:, idx]  # (B, F, win)
    n = jnp.arange(cfg.stft_win, dtype=jnp.float32)
    window = 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * n / cfg.stft_win)  # periodic
    spec = jnp.abs(jnp.fft.rfft(frames * window, n=cfg.n_fft, axis=-1))
    mel = spec @ mel_w  # (B, F, n_mels)
    log_mel = jnp.log(mel + cfg.log_offset)
    E = n_frames // cfg.example_frames
    ex = log_mel[:, : E * cfg.example_frames, :]
    return ex.reshape(B, E, cfg.example_frames, cfg.n_mels)


def init_vggish_params(key, cfg: VGGishConfig = VGGishConfig()) -> dict:
    params: dict = {"features": {}, "embeddings": {}}
    for item in _VGG_PLAN:
        if item == "M":
            continue
        i, in_c, out_c = item
        key, k1 = jax.random.split(key)
        a = math.sqrt(6.0 / (in_c * 9 + out_c * 9))
        params["features"][str(i)] = {
            "weight": jax.random.uniform(k1, (out_c, in_c, 3, 3),
                                         jnp.float32, -a, a),
            "bias": jnp.zeros(out_c),
        }
    for i, fan_in, fan_out in _FC_PLAN:
        key, k1 = jax.random.split(key)
        a = math.sqrt(6.0 / (fan_in + fan_out))
        params["embeddings"][str(i)] = {
            "weight": jax.random.uniform(k1, (fan_out, fan_in),
                                         jnp.float32, -a, a),
            "bias": jnp.zeros(fan_out),
        }
    return params


def _maxpool2x2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID")


def vggish_forward(params: dict, examples: jnp.ndarray) -> jnp.ndarray:
    """examples (N, 96, 64) -> (N, 128). Matches the torch VGG forward
    including its transpose-before-flatten (N,C,H,W) -> (N,H,W,C)."""
    x = examples[:, None, :, :]  # NCHW, H=frames, W=bands
    for item in _VGG_PLAN:
        if item == "M":
            x = _maxpool2x2(x)
            continue
        i, _, _ = item
        p = params["features"][str(i)]
        x = jax.lax.conv_general_dilated(
            x, p["weight"], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32,
        ) + p["bias"][None, :, None, None]
        x = jax.nn.relu(x)
    x = jnp.transpose(x, (0, 2, 3, 1))  # (N, H=6, W=4, C=512)
    x = x.reshape(x.shape[0], -1)
    for i, _, _ in _FC_PLAN:
        p = params["embeddings"][str(i)]
        x = jax.nn.relu(x @ p["weight"].T + p["bias"])
    return x


def vggish_postprocess(params: dict, e: jnp.ndarray) -> jnp.ndarray:
    """Upstream PCA postprocessor: project, clip to [-2, 2], quantize to
    0..255 (returned as float, as torch.hub does)."""
    M = params["pca_eigen_vectors"]  # (128, 128)
    mu = params["pca_means"].reshape(-1)  # (128,)
    v = (e - mu[None, :]) @ M.T
    v = jnp.clip(v, -2.0, 2.0)
    return jnp.round((v + 2.0) * (255.0 / 4.0))


@dataclasses.dataclass
class VGGishModel:
    params: dict
    config: VGGishConfig = VGGishConfig()
    embed_dim: int = 128


def convert_vggish_state_dict(sd: dict, pca: dict | None = None) -> dict:
    """torch state_dict (torch.hub `vggish`) -> param pytree. ``pca``
    optionally carries the separate vggish_pca_params tensors."""
    params: dict = {"features": {}, "embeddings": {}}
    for item in _VGG_PLAN:
        if item == "M":
            continue
        i, _, _ = item
        params["features"][str(i)] = {
            "weight": jnp.asarray(np.asarray(sd[f"features.{i}.weight"])),
            "bias": jnp.asarray(np.asarray(sd[f"features.{i}.bias"])),
        }
    for i, _, _ in _FC_PLAN:
        params["embeddings"][str(i)] = {
            "weight": jnp.asarray(np.asarray(sd[f"embeddings.{i}.weight"])),
            "bias": jnp.asarray(np.asarray(sd[f"embeddings.{i}.bias"])),
        }
    if pca is not None:
        params["pca_eigen_vectors"] = jnp.asarray(
            np.asarray(pca["pca_eigen_vectors"]))
        params["pca_means"] = jnp.asarray(np.asarray(pca["pca_means"]))
    return params


def load_vggish_model(ckpt_path: str | None = None,
                      pca_path: str | None = None,
                      allow_random: bool = False, seed: int = 0,
                      use_gpu: bool = False) -> VGGishModel:
    """(reference: st_ito/utils.py:352-358 — torch.hub download, gated in
    zero-egress environments; convert a local vggish.pth instead)."""
    import os

    if ckpt_path and os.path.isfile(ckpt_path):
        import torch

        sd = torch.load(ckpt_path, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        pca = None
        if pca_path and os.path.isfile(pca_path):
            pca = torch.load(pca_path, map_location="cpu", weights_only=False)
        params = jax.tree_util.tree_map(
            jnp.asarray, convert_vggish_state_dict(sd, pca))
        return VGGishModel(params=params)
    if allow_random:
        return VGGishModel(params=init_vggish_params(
            jax.random.PRNGKey(seed)))
    raise FileNotFoundError(
        "VGGish weights unavailable (torch.hub needs network access); pass "
        "a local ckpt_path or allow_random=True")


@partial(jax.jit, static_argnames=("in_sr", "cfg", "postprocess"))
def _vggish_embed_impl(params, x, in_sr: int, cfg: VGGishConfig,
                       postprocess: bool, mel_w):
    from st_ito_tpu.ops.resample import resample

    B = x.shape[0]
    mono = jnp.mean(x, axis=1)  # (B, T)
    mono = resample(mono, in_sr, cfg.sample_rate)
    ex = vggish_log_mel_examples(mono, cfg, mel_w)  # (B, E, 96, 64)
    E = ex.shape[1]
    emb = vggish_forward(params, ex.reshape(B * E, cfg.example_frames,
                                            cfg.n_mels))
    if postprocess:
        emb = vggish_postprocess(params, emb)
    emb = emb.reshape(B, E, -1).mean(axis=1)
    return {"mono": emb}


def get_vggish_embeds(x: jnp.ndarray, model: VGGishModel, sample_rate,
                      params=None, **kwargs) -> dict:
    """(reference: st_ito/utils.py:361-383 — mono mix, per-example embed,
    mean over examples; returns un-normalized embeddings like the
    reference, whose callers compute cosine distances.)"""
    p = params if params is not None else model.params
    postprocess = "pca_eigen_vectors" in p
    mel_w = jnp.asarray(vggish_mel_matrix(model.config))
    return _vggish_embed_impl(p, x, int(sample_rate), model.config,
                              postprocess, mel_w)

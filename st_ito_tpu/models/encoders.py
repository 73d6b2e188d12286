"""Alternative encoders: dsTCN and FXencoder in pure JAX.

- dsTCN (reference: st_ito/models/dstcn.py:26-152): raw-waveform
  downsampling TCN — N residual blocks of strided dilated conv1d + PReLU,
  max+mean pool over time, linear head. A pretext-encoder alternative
  (reference: cfg/model/pretext/param-dstcn.yaml).
- FXencoder (reference: st_ito/models/fx_encoder.py:288-363, Koo et al.
  mixing-style transfer): 12 residual 1-D conv blocks on the stereo
  waveform (kernels 25->5, strides 4->1, reflection-pad SAME, BatchNorm,
  ReLU), global average pool -> 2048-d embedding. An eval-only metric
  baseline (reference: st_ito/utils.py:554-608).

Param pytrees use torch-like nested naming so checkpoint conversion follows
the same pattern as the Cnn14 converter. Conv1d runs via
lax.conv_general_dilated with NCW/OIW dims (MXU-mapped).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np


def _xavier_conv(key, out_c, in_c, k):
    a = math.sqrt(6.0 / (in_c * k + out_c * k))
    return jax.random.uniform(key, (out_c, in_c, k), jnp.float32, -a, a)


def _conv1d(x, w, b=None, stride=1, dilation=1, padding="VALID"):
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=padding,
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        y = y + b[None, :, None]
    return y


def _batchnorm1d(x, bn, training: bool, eps: float = 1e-5):
    if training:
        mean = jnp.mean(x, axis=(0, 2))
        var = jnp.var(x, axis=(0, 2))
        from st_ito_tpu.models.bn_stats import record_bn

        record_bn(bn, mean, var, n=x.size // x.shape[1])
    else:
        mean, var = bn["running_mean"], bn["running_var"]
    y = (x - mean[None, :, None]) / jnp.sqrt(var[None, :, None] + eps)
    return y * bn["weight"][None, :, None] + bn["bias"][None, :, None]


def _init_bn(c):
    return {"weight": jnp.ones(c), "bias": jnp.zeros(c),
            "running_mean": jnp.zeros(c), "running_var": jnp.ones(c)}


# --------------------------------------------------------------------------
# dsTCN
# --------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DsTCNConfig:
    embed_dim: int = 512
    ninputs: int = 1
    nblocks: int = 8
    kernel_size: int = 13
    stride: int = 4
    dilation_growth: int = 8
    channel_growth: int = 2
    channel_width: int = 32
    stack_size: int = 4

    def block_channels(self):
        chans = []
        out_c = self.channel_width
        in_c = self.ninputs
        for n in range(self.nblocks):
            if n > 0:
                in_c = out_c
                out_c = in_c * self.channel_growth
            chans.append((in_c, out_c))
        return chans


def init_dstcn_params(key, cfg: DsTCNConfig):
    params = {"blocks": []}
    keys = jax.random.split(key, cfg.nblocks * 2 + 1)
    for n, (in_c, out_c) in enumerate(cfg.block_channels()):
        params["blocks"].append({
            "conv1": {
                "weight": _xavier_conv(keys[2 * n], out_c, in_c, cfg.kernel_size),
                "bias": jnp.zeros(out_c),
            },
            "prelu": jnp.full((out_c,), 0.25),
            "res_conv": {
                "weight": _xavier_conv(keys[2 * n + 1], out_c, in_c, 1),
                "bias": jnp.zeros(out_c),
            },
        })
    out_c = cfg.block_channels()[-1][1]
    a = math.sqrt(6.0 / (out_c + cfg.embed_dim))
    params["fc"] = {
        "weight": jax.random.uniform(keys[-1], (cfg.embed_dim, out_c),
                                     jnp.float32, -a, a),
        "bias": jnp.zeros(cfg.embed_dim),
    }
    return params


def dstcn_apply(params, x, cfg: DsTCNConfig, training: bool = False,
                rng=None):
    """x (B, C, T) -> (embed, embed) — single-head encoder, mid == side."""
    if x.shape[1] != cfg.ninputs:
        x = jnp.mean(x, axis=1, keepdims=True)
        if cfg.ninputs == 2:
            x = jnp.concatenate([x, x], axis=1)
    for n, block in enumerate(params["blocks"]):
        dilation = cfg.dilation_growth ** (n % cfg.stack_size)
        pad = ((cfg.kernel_size - 1) * dilation) // 2
        h = _conv1d(x, block["conv1"]["weight"], block["conv1"]["bias"],
                    stride=cfg.stride, dilation=dilation,
                    padding=[(pad, pad)])
        alpha = block["prelu"][None, :, None]
        h = jnp.where(h >= 0, h, alpha * h)
        res = _conv1d(x, block["res_conv"]["weight"], block["res_conv"]["bias"],
                      stride=cfg.stride, padding=[(0, 0)])
        # conv1 and res_conv can differ by a sample at odd paddings; crop
        L = min(h.shape[-1], res.shape[-1])
        x = h[..., :L] + res[..., :L]
    e = jnp.max(x, axis=2) + jnp.mean(x, axis=2)
    if training and rng is not None:
        keep = jax.random.bernoulli(rng, 0.5, e.shape)
        e = jnp.where(keep, e / 0.5, 0.0)
    e = e @ params["fc"]["weight"].T + params["fc"]["bias"]
    return e, e


# --------------------------------------------------------------------------
# FXencoder
# --------------------------------------------------------------------------

_FXE_CHANNELS = (2, 16, 32, 64, 128, 256, 256, 512, 512, 1024, 1024, 2048, 2048)
_FXE_KERNELS = (25, 25, 15, 15, 10, 10, 10, 10, 5, 5, 5, 5)
_FXE_STRIDES = (4, 4, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1)


@dataclasses.dataclass(frozen=True)
class FXEncoderConfig:
    embed_dim: int = 2048
    channels: tuple = _FXE_CHANNELS
    kernels: tuple = _FXE_KERNELS
    strides: tuple = _FXE_STRIDES


def init_fx_encoder_params(key, cfg: FXEncoderConfig = FXEncoderConfig()):
    params = {"encoder": []}
    keys = jax.random.split(key, 2 * len(cfg.kernels))
    for i, k in enumerate(cfg.kernels):
        in_c, out_c = cfg.channels[i], cfg.channels[i + 1]
        params["encoder"].append({
            # Res_ConvBlock: conv1 (in->in, stride 1) + residual, conv2 (in->out, stride s)
            "conv1": {"weight": _xavier_conv(keys[2 * i], in_c, in_c, k),
                      "bias": jnp.zeros(in_c), "bn": _init_bn(in_c)},
            "conv2": {"weight": _xavier_conv(keys[2 * i + 1], out_c, in_c, k),
                      "bias": jnp.zeros(out_c), "bn": _init_bn(out_c)},
        })
    return params


def _reflect_pad_1d(x, l_pad, r_pad):
    return jnp.pad(x, [(0, 0), (0, 0), (l_pad, r_pad)], mode="reflect")


def fx_encoder_apply(params, x, cfg: FXEncoderConfig = FXEncoderConfig(),
                     training: bool = False, rng=None):
    """x (B, 2, T) -> (B, 2048) global-avg-pooled embedding."""
    for i, block in enumerate(params["encoder"]):
        k, s = cfg.kernels[i], cfg.strides[i]
        pad = k - 1
        l_pad, r_pad = pad // 2, pad - pad // 2
        # conv1: stride 1, SAME reflect, + residual
        h = _conv1d(_reflect_pad_1d(x, l_pad, r_pad), block["conv1"]["weight"],
                    block["conv1"]["bias"], padding=[(0, 0)])
        h = _batchnorm1d(h, block["conv1"]["bn"], training)
        h = jax.nn.relu(h)
        x = h + x
        # conv2: stride s, SAME reflect
        h = _conv1d(_reflect_pad_1d(x, l_pad, r_pad), block["conv2"]["weight"],
                    block["conv2"]["bias"], stride=s, padding=[(0, 0)])
        h = _batchnorm1d(h, block["conv2"]["bn"], training)
        x = jax.nn.relu(h)
    return jnp.mean(x, axis=-1)  # AdaptiveAvgPool1d(1)


# --------------------------------------------------------------------------
# registry-facing wrappers
# --------------------------------------------------------------------------


@dataclasses.dataclass
class FXEncoderModel:
    params: dict
    config: FXEncoderConfig = FXEncoderConfig()
    embed_dim: int = 2048

    def __post_init__(self):
        cfg = self.config
        self._jitted = jax.jit(lambda p, x: fx_encoder_apply(p, x, cfg))

    def apply(self, params, x):
        return fx_encoder_apply(params, x, self.config)

    def __call__(self, x):
        return self._jitted(self.params, x)


def load_fx_encoder_model(ckpt_path: str | None = None,
                          allow_random: bool = False, seed: int = 0,
                          use_gpu: bool = False) -> FXEncoderModel:
    """(reference: st_ito/utils.py:582-608 — weights from the FXencoder
    release, DDP 'module.' prefix stripped on conversion)."""
    import os

    if ckpt_path and os.path.isfile(ckpt_path):
        import torch

        from st_ito_tpu.models.convert import (
            listify_numeric,
            strip_prefix,
            torch_state_dict_to_params,
        )

        ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
        sd = ckpt.get("model", ckpt)
        # DDP-trained release: strip the "module." prefix
        # (reference: st_ito/utils.py:594-598)
        sd = strip_prefix(sd, "module.") if any(
            k.startswith("module.") for k in sd) else sd
        # flatten the reference's Conv1d_layer nesting
        # (fx_encoder.py:114-205: convN.conv1d.{conv1d,batch_norm}.*)
        # onto this module's convN.{weight,bias,bn.*} layout
        sd = {
            k.replace(".conv1d.conv1d.", ".").replace(
                ".conv1d.batch_norm.", ".bn."): v
            for k, v in sd.items()
        }
        params = listify_numeric(torch_state_dict_to_params(sd))
        params = jax.tree_util.tree_map(jnp.asarray, params)
        return FXEncoderModel(params=params)
    if allow_random:
        return FXEncoderModel(
            params=init_fx_encoder_params(jax.random.PRNGKey(seed)))
    raise FileNotFoundError(
        "FXencoder checkpoint not found; pass ckpt_path or allow_random=True")


from functools import partial


@partial(jax.jit, static_argnames=("in_sr",))
def _fxe_core(p, x, in_sr: int):
    from st_ito_tpu.models.registry import _l2_normalize
    from st_ito_tpu.ops.resample import resample

    y = x
    if in_sr != 44100:
        y = resample(y, in_sr, 44100)
    peak = jnp.max(jnp.abs(y))
    y = y / jnp.maximum(peak, 1e-8)
    if y.shape[1] == 1:
        y = jnp.concatenate([y, y], axis=1)
    e = fx_encoder_apply(p, y)
    return _l2_normalize(e)


def get_fx_encoder_embeds(x, model: FXEncoderModel, sample_rate,
                          params=None, **kwargs):
    """Resample to 44.1k, peak normalize, stereo-conform, embed
    (reference: st_ito/utils.py:554-579)."""
    p = params if params is not None else model.params
    return {"stereo": _fxe_core(p, x, int(sample_rate))}

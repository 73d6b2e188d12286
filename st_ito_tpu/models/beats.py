"""BEATs-style audio transformer (eval-only metric baseline) in pure JAX.

Compact reimplementation of the vendored Microsoft BEATs encoder used by the
reference as an eval-only embedding backend
(reference: st_ito/models/beats/beats.py:87, backbone.py:26-420,
st_ito/utils.py:225-275): 128-mel fbank input normalized and patch-embedded
with a 16x16 conv, a grouped-conv positional embedding, and a deep post-LN
transformer encoder; embeddings are mean-pooled hidden states.

Simplifications (documented): the GRU-gated relative-position bias and the
tokenizer/EMA quantizer (training-time machinery) are omitted — the
reference uses BEATs purely as a frozen feature extractor. The iter3+
checkpoint is downloadable only online; the loader is gated accordingly.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from st_ito_tpu.ops.stft import frame_signal, hann_window, mel_filterbank


@dataclasses.dataclass(frozen=True)
class BEATsConfig:
    embed_dim: int = 768
    depth: int = 12
    heads: int = 12
    mlp_ratio: float = 4.0
    patch: int = 16
    conv_pos: int = 128
    conv_pos_groups: int = 16
    mel_bins: int = 128
    sample_rate: float = 16000.0
    window_size: int = 400  # 25 ms @ 16 kHz (kaldi fbank convention)
    hop_size: int = 160  # 10 ms


def _ln_init(c):
    return {"weight": jnp.ones(c), "bias": jnp.zeros(c)}


def _ln(p, x, eps=1e-5):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * p["weight"] + p["bias"]


def _linear_init(key, out_f, in_f):
    a = math.sqrt(6.0 / (in_f + out_f))
    return {"weight": jax.random.uniform(key, (out_f, in_f), jnp.float32, -a, a),
            "bias": jnp.zeros(out_f)}


def _linear(p, x):
    return x @ p["weight"].T + p["bias"]


def init_beats_params(key, cfg: BEATsConfig):
    keys = iter(jax.random.split(key, 8 + 6 * cfg.depth))
    d = cfg.embed_dim
    params: dict = {
        "patch_embed": {
            "weight": jax.random.normal(next(keys),
                                        (d, 1, cfg.patch, cfg.patch)) * 0.02,
            "bias": jnp.zeros(d),
        },
        "pos_conv": {
            "weight": jax.random.normal(
                next(keys), (d, d // cfg.conv_pos_groups, cfg.conv_pos)) * 0.02,
            "bias": jnp.zeros(d),
        },
        "norm_in": _ln_init(d),
        "layers": [],
    }
    for _ in range(cfg.depth):
        params["layers"].append({
            "qkv": _linear_init(next(keys), 3 * d, d),
            "proj": _linear_init(next(keys), d, d),
            "norm1": _ln_init(d),
            "fc1": _linear_init(next(keys), int(d * cfg.mlp_ratio), d),
            "fc2": _linear_init(next(keys), d, int(d * cfg.mlp_ratio)),
            "norm2": _ln_init(d),
        })
    return params


def beats_apply(params, x, cfg: BEATsConfig, training: bool = False, rng=None):
    """x (B, C, T) at cfg.sample_rate -> (B, embed_dim) mean-pooled."""
    mono = jnp.mean(x, axis=1)
    mel_matrix = mel_filterbank(cfg.sample_rate, 512, cfg.mel_bins, 20.0,
                                cfg.sample_rate / 2, htk=True, norm=None)
    frames = frame_signal(mono, cfg.window_size, cfg.hop_size,
                          center=False) * hann_window(cfg.window_size)
    S = jnp.abs(jnp.fft.rfft(frames, n=512, axis=-1)) ** 2
    fbank = jnp.log(S @ mel_matrix + 1e-6)
    fbank = (fbank - jnp.mean(fbank)) / (2.0 * jnp.std(fbank) + 1e-5)

    # crop frames to a patch multiple, layout (B, 1, frames, mel)
    Fh = (fbank.shape[1] // cfg.patch) * cfg.patch
    h = fbank[:, :Fh][:, None]
    h = jax.lax.conv_general_dilated(
        h, params["patch_embed"]["weight"], (cfg.patch, cfg.patch), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    ) + params["patch_embed"]["bias"][None, :, None, None]
    B, D, Hp, Wp = h.shape
    h = h.transpose(0, 2, 3, 1).reshape(B, Hp * Wp, D)
    h = _ln(params["norm_in"], h)

    # grouped-conv positional embedding over the token sequence
    pc = params["pos_conv"]
    pos = jax.lax.conv_general_dilated(
        h.transpose(0, 2, 1), pc["weight"], (1,), "SAME",
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=cfg.conv_pos_groups,
        preferred_element_type=jnp.float32,
    ) + pc["bias"][None, :, None]
    h = h + jax.nn.gelu(pos.transpose(0, 2, 1))

    heads = cfg.heads
    for layer in params["layers"]:
        # post-LN transformer block (fairseq convention)
        qkv = _linear(layer["qkv"], h).reshape(B, -1, 3, heads, D // heads)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        attn = jnp.einsum("bhnd,bhmd->bhnm", q * (D // heads) ** -0.5, k)
        attn = jax.nn.softmax(attn, axis=-1)
        o = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        o = o.transpose(0, 2, 1, 3).reshape(B, -1, D)
        h = _ln(layer["norm1"], h + _linear(layer["proj"], o))
        m = jax.nn.gelu(_linear(layer["fc1"], h))
        h = _ln(layer["norm2"], h + _linear(layer["fc2"], m))

    return jnp.mean(h, axis=1)


@dataclasses.dataclass
class BEATsModel:
    params: dict
    config: BEATsConfig = BEATsConfig()
    embed_dim: int = 768

    def __post_init__(self):
        cfg = self.config
        self._jitted = jax.jit(lambda p, x: beats_apply(p, x, cfg))

    def apply(self, params, x):
        return beats_apply(params, x, self.config)

    def __call__(self, x):
        return self._jitted(self.params, x)


def load_beats_model(ckpt_path: str | None = None, allow_random: bool = False,
                     seed: int = 0, use_gpu: bool = False) -> BEATsModel:
    """(reference: st_ito/utils.py:225-275 — downloads the iter3+ AS2M
    checkpoint; gated here for zero-egress environments)."""
    import os

    if ckpt_path and os.path.isfile(ckpt_path):
        import torch

        from st_ito_tpu.models.convert import torch_state_dict_to_params

        ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
        sd = ckpt.get("model", ckpt)
        return BEATsModel(params=torch_state_dict_to_params(sd))
    if allow_random:
        return BEATsModel(params=init_beats_params(jax.random.PRNGKey(seed)))
    raise FileNotFoundError(
        "BEATs checkpoint not found; download BEATs_iter3_plus_AS2M.pt and "
        "pass ckpt_path, or use allow_random=True")


from functools import partial


@partial(jax.jit, static_argnames=("in_sr", "cfg"))
def _beats_core(p, x, in_sr: int, cfg: BEATsConfig):
    from st_ito_tpu.models.registry import _l2_normalize
    from st_ito_tpu.ops.resample import resample

    y = x
    if in_sr != int(cfg.sample_rate):
        y = resample(y, in_sr, int(cfg.sample_rate))
    e = beats_apply(p, y, cfg)
    return _l2_normalize(e)


def get_beats_embeds(x, model: BEATsModel, sample_rate, params=None, **kwargs):
    """Resample to 16 kHz, embed, L2 (reference: st_ito/utils.py:225-275)."""
    p = params if params is not None else model.params
    return {"mono": _beats_core(p, x, int(sample_rate), model.config)}

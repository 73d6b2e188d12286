"""DeepGCN / ViG-style graph encoder in pure JAX.

Faithful compact reimplementation of the reference's alternative pretext
encoder (reference: st_ito/models/gcn.py:690-932): log-mel front end
(2048/512, fmax 4 kHz), overlapping conv Stem (/4), learned positional
embedding, four stages of [Grapher -> FFN] blocks with Downsample between
stages, global average pool and a 1x1-conv prediction head.

Grapher (reference: gcn.py:533-618) = 1x1 conv/BN -> dynamic-KNN
max-relative graph convolution (MRConv, reference: gcn.py:387-406, with the
stage reduce-ratio shrinking the candidate set) -> 1x1 conv/BN -> residual.
The KNN graph is rebuilt every block from pairwise feature distances —
dense (B, N, N/r^2) distance matrices map straight onto the MXU.

Simplifications vs the reference (documented): the fixed relative-position
distance bias and stochastic-depth are omitted (both off/minor in the
shipped config); batchnorm uses batch statistics in training and running
stats are folded at conversion time.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from st_ito_tpu.ops.stft import hann_window, mel_filterbank, power_to_db

_SIZES = {
    "t": ([2, 2, 6, 2], [48, 96, 240, 384]),
    "s": ([2, 2, 6, 2], [80, 160, 400, 640]),
    "m": ([2, 2, 16, 2], [96, 192, 384, 768]),
    "b": ([2, 2, 18, 2], [128, 256, 512, 1024]),
}


@dataclasses.dataclass(frozen=True)
class DeepGCNConfig:
    embed_dim: int = 512
    model_size: str = "t"
    k: int = 9
    sample_rate: float = 48000.0
    window_size: int = 2048
    hop_size: int = 512
    mel_bins: int = 128
    fmin: float = 20.0
    fmax: float = 4000.0
    num_frames: int = 512  # spectrogram frames consumed (crop/pad)

    @property
    def blocks(self):
        return _SIZES[self.model_size][0]

    @property
    def channels(self):
        return _SIZES[self.model_size][1]


def _he_conv(key, out_c, in_c, kh, kw):
    std = math.sqrt(2.0 / (in_c * kh * kw))
    return jax.random.normal(key, (out_c, in_c, kh, kw), jnp.float32) * std


def _conv2d(x, w, b=None, stride=1, padding="SAME"):
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        y = y + b[None, :, None, None]
    return y


def _bn_init(c):
    return {"weight": jnp.ones(c), "bias": jnp.zeros(c),
            "running_mean": jnp.zeros(c), "running_var": jnp.ones(c)}


def _bn(x, p, training, eps=1e-5):
    axes = (0, 2, 3)
    if training:
        mean, var = jnp.mean(x, axes), jnp.var(x, axes)
        from st_ito_tpu.models.bn_stats import record_bn

        record_bn(p, mean, var, n=x.size // x.shape[1])
    else:
        mean, var = p["running_mean"], p["running_var"]
    y = (x - mean[None, :, None, None]) / jnp.sqrt(var[None, :, None, None] + eps)
    return y * p["weight"][None, :, None, None] + p["bias"][None, :, None, None]


def _conv_bn_init(key, out_c, in_c, k):
    return {"weight": _he_conv(key, out_c, in_c, k, k),
            "bias": jnp.zeros(out_c), "bn": _bn_init(out_c)}


def init_deepgcn_params(key, cfg: DeepGCNConfig):
    blocks, channels = cfg.blocks, cfg.channels
    keys = iter(jax.random.split(key, 512))
    params: dict = {}
    c0 = channels[0]
    params["stem"] = [
        _conv_bn_init(next(keys), c0 // 2, 1, 3),
        _conv_bn_init(next(keys), c0, c0 // 2, 3),
        _conv_bn_init(next(keys), c0, c0, 3),
    ]
    params["pos_embed"] = jnp.zeros(
        (1, c0, cfg.mel_bins // 4, cfg.num_frames // 4))

    backbone = []
    for i in range(len(blocks)):
        if i > 0:
            backbone.append({
                "down": _conv_bn_init(next(keys), channels[i], channels[i - 1], 3),
            })
        for _ in range(blocks[i]):
            c = channels[i]
            backbone.append({
                "fc1": _conv_bn_init(next(keys), c, c, 1),
                "mr_nn": _conv_bn_init(next(keys), c * 2, c * 2, 1),
                "fc2": _conv_bn_init(next(keys), c, c * 2, 1),
                "ffn1": _conv_bn_init(next(keys), c * 4, c, 1),
                "ffn2": _conv_bn_init(next(keys), c, c * 4, 1),
            })
    params["backbone"] = backbone
    params["pred1"] = {"weight": _he_conv(next(keys), 1024, channels[-1], 1, 1),
                       "bias": jnp.zeros(1024)}
    params["pred2"] = {"weight": _he_conv(next(keys), cfg.embed_dim, 1024, 1, 1),
                       "bias": jnp.zeros(cfg.embed_dim)}
    return params


def _mr_graph_conv(x, block, k, r, training):
    """Max-relative dynamic-KNN graph conv on (B, C, H, W)."""
    B, C, H, W = x.shape
    N = H * W
    feat = x.reshape(B, C, N)  # nodes

    # reduced candidate set via average pooling (reference r=reduce_ratio)
    if r > 1:
        cand = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 1, r, r), (1, 1, r, r), "VALID"
        ) / (r * r)
        cand = cand.reshape(B, C, -1)
    else:
        cand = feat
    M = cand.shape[-1]

    # pairwise squared distances (B, N, M) -> MXU matmul
    xx = jnp.sum(feat**2, axis=1)[:, :, None]
    yy = jnp.sum(cand**2, axis=1)[:, None, :]
    xy = jnp.einsum("bcn,bcm->bnm", feat, cand)
    dist = xx - 2 * xy + yy

    k_eff = min(k, M)
    _, idx = jax.lax.top_k(-dist, k_eff)  # (B, N, k) nearest candidates

    # gather neighbor features: (B, C, N, k) without materializing (B,C,N,M)
    nbrs = jax.vmap(lambda c, i: jnp.take(c, i, axis=1))(cand, idx)
    rel = nbrs - feat[:, :, :, None]
    agg = jnp.max(rel, axis=-1)  # (B, C, N)

    h = jnp.concatenate([feat, agg], axis=1).reshape(B, 2 * C, H, W)
    h = _conv2d(h, block["mr_nn"]["weight"], block["mr_nn"]["bias"])
    h = _bn(h, block["mr_nn"]["bn"], training)
    return jax.nn.gelu(h)


def deepgcn_apply(params, x, cfg: DeepGCNConfig, training: bool = False,
                  rng=None, return_stats: bool = False):
    """x (B, C, T) -> (embed, embed). Mono-summed front end like the
    reference's reshape (gcn.py:889-892). With return_stats=True in
    training mode, also returns the partial pytree of updated BatchNorm
    running statistics (torch updates them in place on every forward;
    see models/bn_stats.py)."""
    if return_stats:
        from st_ito_tpu.models.bn_stats import collect_bn_stats, stats_tree

        with collect_bn_stats() as collected:
            mid, side = deepgcn_apply(params, x, cfg, training, rng)
        return mid, side, (stats_tree(params, collected) if training else {})
    B = x.shape[0]
    mono = jnp.mean(x, axis=1)

    mel_matrix = mel_filterbank(cfg.sample_rate, cfg.window_size,
                                cfg.mel_bins, cfg.fmin, cfg.fmax)
    window = hann_window(cfg.window_size)
    from st_ito_tpu.ops.stft import frame_signal

    frames = frame_signal(mono, cfg.window_size, cfg.hop_size) * window
    S = jnp.abs(jnp.fft.rfft(frames, axis=-1)) ** 2
    mel_db = power_to_db(S @ mel_matrix)  # (B, frames, mel)

    # standard normalization (use_stdnorm)
    mu = jnp.mean(mel_db, axis=(-1, -2), keepdims=True)
    std = jnp.std(mel_db, axis=(-1, -2), keepdims=True)
    mel_db = (mel_db - mu) / jnp.maximum(std, 1e-5)

    # crop/pad frames to num_frames, layout (B, 1, mel, frames)
    F_have = mel_db.shape[1]
    if F_have >= cfg.num_frames:
        mel_db = mel_db[:, :cfg.num_frames]
    else:
        mel_db = jnp.pad(mel_db, ((0, 0), (0, cfg.num_frames - F_have), (0, 0)))
    h = mel_db.transpose(0, 2, 1)[:, None]  # (B, 1, mel, frames)

    for i, conv in enumerate(params["stem"]):
        stride = 2 if i < 2 else 1
        h = _conv2d(h, conv["weight"], conv["bias"], stride=stride)
        h = _bn(h, conv["bn"], training)
        if i < 2:
            h = jax.nn.gelu(h)
    h = h + params["pos_embed"]

    reduce_ratios = [4, 2, 1, 1]
    stage = 0
    for entry in params["backbone"]:
        if "down" in entry:
            h = _conv2d(h, entry["down"]["weight"], entry["down"]["bias"],
                        stride=2)
            h = _bn(h, entry["down"]["bn"], training)
            stage += 1
            continue
        # Grapher
        res = h
        g = _conv2d(h, entry["fc1"]["weight"], entry["fc1"]["bias"])
        g = _bn(g, entry["fc1"]["bn"], training)
        g = _mr_graph_conv(g, entry, cfg.k, reduce_ratios[stage], training)
        g = _conv2d(g, entry["fc2"]["weight"], entry["fc2"]["bias"])
        g = _bn(g, entry["fc2"]["bn"], training)
        h = g + res
        # FFN
        res = h
        f = _conv2d(h, entry["ffn1"]["weight"], entry["ffn1"]["bias"])
        f = _bn(f, entry["ffn1"]["bn"], training)
        f = jax.nn.gelu(f)
        f = _conv2d(f, entry["ffn2"]["weight"], entry["ffn2"]["bias"])
        f = _bn(f, entry["ffn2"]["bn"], training)
        h = f + res

    h = jnp.mean(h, axis=(2, 3), keepdims=True)  # adaptive_avg_pool2d(1)
    h = _conv2d(h, params["pred1"]["weight"], params["pred1"]["bias"])
    h = jax.nn.gelu(h)
    if training and rng is not None:
        keep = jax.random.bernoulli(rng, 0.8, h.shape)
        h = jnp.where(keep, h / 0.8, 0.0)
    h = _conv2d(h, params["pred2"]["weight"], params["pred2"]["bias"])
    e = h[:, :, 0, 0]
    return e, e

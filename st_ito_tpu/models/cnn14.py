"""AFx-Rep backbone: mid/side Cnn14 in pure JAX.

Faithful reimplementation of the reference encoder
(reference: st_ito/models/panns.py:121-281): torchlibrosa-parity log-mel
front end (hann/center/reflect, power 2, Slaney mel, ref=1, amin=1e-10),
minmax input normalization, six 2-conv blocks (64->2048) with 2x2 avg pool
and BatchNorm, mel-mean then time-max+mean pooling, separate fc_mid/fc_side
heads.

The parameter pytree uses the torch state_dict naming
(``conv_block1.conv1.weight`` etc., stored as nested dicts with torch OIHW
weight layout) so the released checkpoint converts without renaming. Convs
run via lax.conv_general_dilated with NCHW/OIHW dimension numbers — XLA maps
these onto the MXU directly.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from st_ito_tpu.ops.stft import hann_window, mel_filterbank, power_to_db

Params = dict  # nested dict of jnp arrays


@dataclasses.dataclass(frozen=True)
class Cnn14Config:
    embed_dim: int = 512
    sample_rate: float = 48000.0
    window_size: int = 2048
    hop_size: int = 1024
    mel_bins: int = 128
    fmin: float = 20.0
    fmax: float = 20000.0
    use_batchnorm: bool = True
    input_norm: str = "minmax"
    base_channels: int = 64  # 64 = the reference Cnn14; smaller for tests
    compute_dtype: str = "float32"  # "bfloat16" runs the conv stack on the
    # MXU in half precision (fitness/ranking paths); params & heads stay f32

    # deployed AFx-Rep config = cfg/model/pretext/param-panns-concat-l2.yaml

    @property
    def channels(self) -> tuple[int, ...]:
        b = self.base_channels
        return (b, 2 * b, 4 * b, 8 * b, 16 * b, 32 * b)


def _init_conv(key, out_c, in_c, kh, kw):
    # xavier_uniform like reference init_layer (panns.py:10-16)
    fan_in, fan_out = in_c * kh * kw, out_c * kh * kw
    a = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, (out_c, in_c, kh, kw), jnp.float32, -a, a)


def _init_bn(c):
    return {
        "weight": jnp.ones(c, jnp.float32),
        "bias": jnp.zeros(c, jnp.float32),
        "running_mean": jnp.zeros(c, jnp.float32),
        "running_var": jnp.ones(c, jnp.float32),
    }


def _init_linear(key, out_f, in_f):
    a = math.sqrt(6.0 / (in_f + out_f))
    w = jax.random.uniform(key, (out_f, in_f), jnp.float32, -a, a)
    return {"weight": w, "bias": jnp.zeros(out_f, jnp.float32)}


def init_cnn14_params(key, config: Cnn14Config) -> Params:
    keys = jax.random.split(key, 16)
    params: Params = {"bn0": _init_bn(config.mel_bins)}
    in_c = 1
    for i, out_c in enumerate(config.channels):
        block = {
            "conv1": {"weight": _init_conv(keys[2 * i], out_c, in_c, 3, 3)},
            "conv2": {"weight": _init_conv(keys[2 * i + 1], out_c, out_c, 3, 3)},
        }
        if config.use_batchnorm:
            block["bn1"] = _init_bn(out_c)
            block["bn2"] = _init_bn(out_c)
        params[f"conv_block{i + 1}"] = block
        in_c = out_c
    params["fc_mid"] = _init_linear(keys[12], config.embed_dim, config.channels[-1])
    params["fc_side"] = _init_linear(keys[13], config.embed_dim, config.channels[-1])
    return params


def _conv3x3(x, w, out_dtype=jnp.float32):
    # out_dtype=bfloat16 on the inference fast path keeps the activation
    # traffic half-width (the MXU still accumulates in f32 internally);
    # training/parity paths keep f32 outputs
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=out_dtype,
    )


_BN_MOMENTUM = 0.1  # torch BatchNorm default


def _batchnorm(x, bn, training: bool, axis: int = 1, eps: float = 1e-5):
    """Eval-mode BN uses running stats; train-mode uses batch stats and
    returns the torch-convention running-stat update
    (running = (1-m)*running + m*batch, unbiased batch variance)."""
    shape = [1] * x.ndim
    shape[axis] = x.shape[axis]
    if training:
        axes = tuple(i for i in range(x.ndim) if i != axis)
        mean = jnp.mean(x, axis=axes)
        var = jnp.var(x, axis=axes)
        n = x.size // x.shape[axis]
        var_unbiased = var * (n / max(n - 1, 1))
        new_stats = {
            "running_mean": (1 - _BN_MOMENTUM) * bn["running_mean"]
            + _BN_MOMENTUM * mean,
            "running_var": (1 - _BN_MOMENTUM) * bn["running_var"]
            + _BN_MOMENTUM * var_unbiased,
        }
    else:
        mean = bn["running_mean"]
        var = bn["running_var"]
        new_stats = None
    y = (x - mean.reshape(shape)) / jnp.sqrt(var.reshape(shape) + eps)
    y = y * bn["weight"].reshape(shape) + bn["bias"].reshape(shape)
    return y, new_stats


def _avg_pool_2x2(x):
    # init must be a concrete numpy scalar of x's dtype: a traced init
    # routes to the generic reduce_window primitive, which has no transpose
    # rule (breaks reverse-mode autodiff in training)
    init = np.zeros((), jnp.dtype(x.dtype))[()]
    return jax.lax.reduce_window(
        x, init, jax.lax.add, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
    ) / 4.0


def _folded_bn(x, bn, eps: float = 1e-5):
    """Eval-mode BN folded to one scale+shift, computed in f32 and applied
    in x's (possibly bfloat16) dtype — keeps the fast path half-width."""
    scale = bn["weight"] / jnp.sqrt(bn["running_var"] + eps)
    shift = bn["bias"] - bn["running_mean"] * scale
    shape = (1, x.shape[1], 1, 1)
    return x * scale.astype(x.dtype).reshape(shape) + shift.astype(
        x.dtype).reshape(shape)


def _conv_block(x, block, training, dropout_rng, use_batchnorm, pool,
                compute_dtype=jnp.float32, stats_out: dict | None = None):
    # inference fast path in bfloat16: half-width activations end-to-end
    # (conv outputs, folded BN, ReLU, pool) — the conv stack is
    # HBM-bandwidth-bound at population scale, not MXU-bound
    fast = (not training) and compute_dtype == jnp.bfloat16
    out_dtype = compute_dtype if fast else jnp.float32

    h = _conv3x3(x.astype(compute_dtype), block["conv1"]["weight"], out_dtype)
    if use_batchnorm:
        if fast:
            h = _folded_bn(h, block["bn1"])
        else:
            h, s1 = _batchnorm(h, block["bn1"], training)
            if stats_out is not None and s1 is not None:
                stats_out["bn1"] = s1
    h = jax.nn.relu(h)
    h = _conv3x3(h.astype(compute_dtype), block["conv2"]["weight"], out_dtype)
    if use_batchnorm:
        if fast:
            h = _folded_bn(h, block["bn2"])
        else:
            h, s2 = _batchnorm(h, block["bn2"], training)
            if stats_out is not None and s2 is not None:
                stats_out["bn2"] = s2
    h = jax.nn.relu(h)
    if pool:
        h = _avg_pool_2x2(h)
    if training and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 0.8, h.shape)
        h = jnp.where(keep, h / 0.8, 0.0)
    return h


def _spec_augment(x, rng, time_drop_width=64, time_stripes=2,
                  freq_drop_width=8, freq_stripes=2):
    """SpecAugment-style time/freq stripe masking (training only;
    reference: panns.py:171-176, 247-248). x: (N, 1, T, F)."""
    N, _, T, F = x.shape
    keys = jax.random.split(rng, 4)
    t_idx = jnp.arange(T)
    f_idx = jnp.arange(F)
    mask = jnp.ones((N, 1, T, F), x.dtype)
    for s in range(time_stripes):
        starts = jax.random.randint(jax.random.fold_in(keys[0], s), (N,), 0,
                                    max(T - time_drop_width, 1))
        widths = jax.random.randint(jax.random.fold_in(keys[1], s), (N,), 0,
                                    time_drop_width + 1)
        m = ~((t_idx[None, :] >= starts[:, None])
              & (t_idx[None, :] < (starts + widths)[:, None]))
        mask = mask * m[:, None, :, None].astype(x.dtype)
    for s in range(freq_stripes):
        starts = jax.random.randint(jax.random.fold_in(keys[2], s), (N,), 0,
                                    max(F - freq_drop_width, 1))
        widths = jax.random.randint(jax.random.fold_in(keys[3], s), (N,), 0,
                                    freq_drop_width + 1)
        m = ~((f_idx[None, :] >= starts[:, None])
              & (f_idx[None, :] < (starts + widths)[:, None]))
        mask = mask * m[:, None, None, :].astype(x.dtype)
    return x * mask


def _logmel_frontend(x, config: Cnn14Config, mel_matrix, window):
    """(N, T) -> (N, 1, frames, mel_bins), torchlibrosa parity.

    In bfloat16 compute mode the power spectrum runs as a cos/sin DFT
    matrix product on the MXU (see ops/stft.py:dft_power_matmul) — XLA's
    batched small FFT is several times slower; the f32/parity path keeps
    the exact FFT."""
    from st_ito_tpu.ops.stft import (dft_power_matmul, frame_signal,
                                     frame_signal_rows)

    n_fft, hop = config.window_size, config.hop_size
    if x.ndim == 3:
        # hop-blocked rows form (N, R, hop) straight from the renderer —
        # framing never flattens (see frame_signal_rows)
        frames = frame_signal_rows(x, n_fft, hop, center=True) * window
    else:
        frames = frame_signal(x, n_fft, hop, center=True) * window
    if config.compute_dtype == "bfloat16":
        S = dft_power_matmul(frames)
    else:
        S = jnp.abs(jnp.fft.rfft(frames, axis=-1)) ** 2
    mel = S @ mel_matrix
    mel_db = power_to_db(mel, ref=1.0, amin=1e-10, top_db=None)
    return mel_db[:, None, :, :]


def cnn14_apply(
    params: Params,
    x: jnp.ndarray,
    config: Cnn14Config,
    training: bool = False,
    rng: jax.Array | None = None,
    return_stats: bool = False,
):
    """Forward pass. x: (batch, chs, T) with chs in {1, 2} — or the
    hop-blocked rows form (batch, chs, R, hop_size) the fused-LTI
    renderer can emit (identical math; the frontend frames rows directly
    and the (B, C, T) flatten retile never happens).
    Returns (mid_embed, side_embed), each (batch, embed_dim); with
    return_stats=True in training mode, also a pytree of updated BatchNorm
    running statistics to merge into the params (pure-functional stand-in
    for torch's in-place running-stat updates).
    """
    rows = x.ndim == 4
    if rows:
        if config.hop_size % x.shape[-1]:
            raise ValueError(f"rows input row length must divide hop_size "
                             f"({config.hop_size}), got {x.shape[-1]}")
        batch, chs, n_rows, row_len = x.shape
        seq_len = n_rows * row_len
    else:
        batch, chs, seq_len = x.shape

    # Static shape guard: 6 conv blocks pool time 2x each (the last block
    # pools only in the torch layout when pool_size covers it — 5 pools
    # here), so the logmel frame count must survive 2^5 halving or the
    # time max/mean below reduces a zero-size axis with a cryptic XLA
    # error. centered STFT frames = seq_len // hop + 1.
    frames = seq_len // config.hop_size + 1
    if frames >> 5 == 0:
        min_len = (32 - 1) * config.hop_size  # frames >= 32
        raise ValueError(
            f"input length {seq_len} yields {frames} logmel frames; Cnn14 "
            f"needs >= 32 frames (>= {min_len} samples at "
            f"sample_rate={config.sample_rate}, hop={config.hop_size})")

    if chs == 2:
        x_mid = (x[:, 0] + x[:, 1]) / 2.0
        x_side = (x[:, 0] - x[:, 1]) / 2.0
        x = jnp.stack([x_mid, x_side], axis=1)
    x = (x.reshape(batch * chs, n_rows, row_len) if rows
         else x.reshape(batch * chs, seq_len))

    mel_matrix = mel_filterbank(
        config.sample_rate, config.window_size, config.mel_bins,
        config.fmin, config.fmax,
    )
    window = hann_window(config.window_size)
    h = _logmel_frontend(x, config, mel_matrix, window)  # (N,1,T',F)

    if config.input_norm == "batchnorm":
        ht = jnp.swapaxes(h, 1, 3)  # (N,F,T',1)
        ht, _ = _batchnorm(ht, params["bn0"], training)
        h = jnp.swapaxes(ht, 1, 3)
    elif config.input_norm == "minmax":
        h = jnp.clip(h, -80.0, 40.0)
        h = (h + 80.0) / 120.0
        h = h * 2.0 - 1.0
    elif config.input_norm == "none":
        pass
    else:
        raise ValueError(f"Invalid input_norm: {config.input_norm}")

    if training and rng is not None:
        rng, aug_rng = jax.random.split(rng)
        h = _spec_augment(h, aug_rng)

    compute_dtype = jnp.dtype(config.compute_dtype)
    stats_updates: dict = {}
    for i in range(6):
        pool = i < 5  # block6 uses pool_size (1,1) (panns.py:260)
        drop_rng = None
        if training and rng is not None:
            rng, drop_rng = jax.random.split(rng)
        block_stats: dict = {} if (return_stats and training) else None
        h = _conv_block(h, params[f"conv_block{i + 1}"], training, drop_rng,
                        config.use_batchnorm, pool, compute_dtype,
                        stats_out=block_stats)
        if block_stats:
            stats_updates[f"conv_block{i + 1}"] = block_stats

    h = h.astype(jnp.float32)  # pool + heads in f32 (tiny tensors)
    h = jnp.mean(h, axis=3)  # mean over mel
    h = jnp.max(h, axis=2) + jnp.mean(h, axis=2)  # (N, 2048)

    h = h.reshape(batch, chs, -1)

    def linear(p, v):
        return v @ p["weight"].T + p["bias"]

    if chs == 1:
        mid = linear(params["fc_mid"], h[:, 0, :])
        side = mid
    else:
        mid = linear(params["fc_mid"], h[:, 0, :])
        side = linear(params["fc_side"], h[:, 1, :])
    if return_stats:
        return mid, side, stats_updates
    return mid, side

"""Style-transfer training: learned-inference baseline (DeepAFx-ST-style).

Functional JAX port of the reference's StyleTransferSystem
(reference: st_ito/methods/style.py:542-894):

- predict_params: encoder(input), encoder(target) on analysis_length center
  crops -> concat 4 mid/side embeds -> ParameterRegressor (MLP + sigmoid) or
  ParameterClassifier (per-param softmax over num_bins)
- render: the native differentiable chain (replaces both the serial VST
  render AND the SPSA finite-difference workaround — true gradients flow
  through any chain here), or the 21/51-param dasp-style processors
- losses: parameter regression (MSE), parameter classification (CE),
  audio (multi-resolution STFT)
- on_the_fly: random target params (gain pinned to 0.5, reverb mix randomly
  zeroed) rendered in-loop ON DEVICE — the reference did this serially on
  CPU inside the training step
- split_section: train on (input_A, target_B) halves; random +-12 dB gain
  augmentation on input and target
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Callable

import chex
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from st_ito_tpu import proc
from st_ito_tpu.chain import ChainSpec, build_render_fn
from st_ito_tpu.models.cnn14 import Cnn14Config, cnn14_apply, init_cnn14_params
from st_ito_tpu.ops.losses import multi_resolution_stft_loss


@dataclasses.dataclass(frozen=True)
class StyleTransferConfig:
    encoder: Cnn14Config = Cnn14Config()
    lr: float = 1e-4
    analysis_length: int = 131072
    weight_decay: float = 1e-3
    max_epochs: int = 250
    loss_type: str = "parameter-regression"  # | parameter-classification | audio
    autodiff_processor: str = "chain"  # chain | simple | complex
    on_the_fly: bool = False
    split_section: bool = False
    num_bins: int = 64
    sample_rate: int = 48000
    total_steps: int = 0  # > 0 enables the reference's MultiStepLR schedule
    # (x0.1 at 80% and 95% of training, reference: style.py:643-660)

    @property
    def head_input_dim(self) -> int:
        return 4 * self.encoder.embed_dim


@chex.dataclass
class StyleTrainState:
    params: Any  # {"encoder", "estimator"}
    opt_state: Any
    step: jnp.ndarray


def _xavier(k, o, i):
    a = math.sqrt(6.0 / (i + o))
    return jax.random.uniform(k, (o, i), jnp.float32, -a, a)


def init_regressor(key, input_dim: int, num_params: int):
    k1, k2 = jax.random.split(key)
    h = 2 * input_dim
    return {
        "fc1": {"weight": _xavier(k1, h, input_dim), "bias": jnp.zeros(h)},
        "fc2": {"weight": _xavier(k2, num_params, h), "bias": jnp.zeros(num_params)},
    }


def regressor_apply(p, embed):
    h = jax.nn.relu(embed @ p["fc1"]["weight"].T + p["fc1"]["bias"])
    return jax.nn.sigmoid(h @ p["fc2"]["weight"].T + p["fc2"]["bias"])


def init_classifier(key, input_dim: int, num_params: int, num_bins: int,
                    hidden_dim: int = 256):
    k1, k2 = jax.random.split(key)
    # per-parameter heads, stored stacked: (num_params, ...)
    w1 = jax.vmap(lambda k: _xavier(k, hidden_dim, input_dim))(
        jax.random.split(k1, num_params))
    w2 = jax.vmap(lambda k: _xavier(k, num_bins, hidden_dim))(
        jax.random.split(k2, num_params))
    return {
        "fc1": {"weight": w1, "bias": jnp.zeros((num_params, hidden_dim))},
        "fc2": {"weight": w2, "bias": jnp.zeros((num_params, num_bins))},
    }


def classifier_apply(p, embed):
    """embed (bs, D) -> logits (bs, num_params, num_bins)."""
    h = jnp.einsum("bd,phd->bph", embed, p["fc1"]["weight"]) + p["fc1"]["bias"]
    h = jax.nn.relu(h)
    return jnp.einsum("bph,pnh->bpn", h, p["fc2"]["weight"]) + p["fc2"]["bias"]


def classifier_logits_to_params(logits, num_bins: int):
    vals = jnp.linspace(0.0, 1.0, num_bins)
    return vals[jnp.argmax(logits, axis=-1)]


def params_to_bin_index(params, num_bins: int):
    """searchsorted into linspace(0,1,num_bins)
    (reference: style.py:493-499)."""
    vals = jnp.linspace(0.0, 1.0, num_bins)
    return jnp.searchsorted(vals, params).astype(jnp.int32)


class StyleTransferSystem:
    """Holds config + chain + pure functions; state lives in StyleTrainState."""

    def __init__(self, cfg: StyleTransferConfig, chain: ChainSpec | None = None):
        self.cfg = cfg
        self.chain = chain
        if cfg.autodiff_processor == "simple":
            self.num_params = proc.NUM_SIMPLE_PARAMS
            self._proc = proc.apply_simple_autodiff_processor
        elif cfg.autodiff_processor == "complex":
            self.num_params = proc.NUM_COMPLEX_PARAMS
            self._proc = proc.apply_complex_autodiff_processor
        else:
            assert chain is not None, "chain required for autodiff_processor='chain'"
            self.num_params = chain.num_params
            render = build_render_fn(chain, cfg.sample_rate, 2,
                                     peak_normalize_output=False)
            self._proc = lambda audio, params, sr: jax.vmap(render)(params, audio)

    # -- init ---------------------------------------------------------------

    def init(self, key) -> StyleTrainState:
        k_enc, k_est = jax.random.split(key)
        cfg = self.cfg
        if cfg.loss_type == "parameter-classification":
            est = init_classifier(k_est, cfg.head_input_dim, self.num_params,
                                  cfg.num_bins)
        else:
            est = init_regressor(k_est, cfg.head_input_dim, self.num_params)
        params = {"encoder": init_cnn14_params(k_enc, cfg.encoder),
                  "estimator": est}
        opt_state = self.optimizer.init(params)
        return StyleTrainState(params=params, opt_state=opt_state,
                               step=jnp.zeros((), jnp.int32))

    @property
    def optimizer(self) -> optax.GradientTransformation:
        cfg = self.cfg
        if cfg.total_steps > 0:
            schedule = optax.piecewise_constant_schedule(
                cfg.lr,
                {int(cfg.total_steps * 0.8): 0.1,
                 int(cfg.total_steps * 0.95): 0.1},
            )
            return optax.adamw(schedule, weight_decay=cfg.weight_decay)
        return optax.adamw(cfg.lr, weight_decay=cfg.weight_decay)

    # -- model --------------------------------------------------------------

    def predict_params(self, params, input_audio, target_audio, training, rng):
        """(reference: style.py:662-701)"""
        cfg = self.cfg
        L = cfg.analysis_length

        def center_crop(x):
            T = x.shape[-1]
            if T > L:
                s = (T - L) // 2
                return x[..., s:s + L]
            return x

        r1 = r2 = None
        if rng is not None:
            r1, r2 = jax.random.split(rng)
        bn_stats = {}
        if training:
            in_mid, in_side, bn_stats = cnn14_apply(
                params["encoder"], center_crop(input_audio), cfg.encoder,
                training=True, rng=r1, return_stats=True)
        else:
            in_mid, in_side = cnn14_apply(
                params["encoder"], center_crop(input_audio), cfg.encoder,
                training=False, rng=r1)
        tg_mid, tg_side = cnn14_apply(params["encoder"], center_crop(target_audio),
                                      cfg.encoder, training=training, rng=r2)
        feats = jnp.concatenate([in_mid, in_side, tg_mid, tg_side], axis=-1)

        if cfg.loss_type == "parameter-classification":
            logits = classifier_apply(params["estimator"], feats)
            w = classifier_logits_to_params(logits, cfg.num_bins)
            return w, logits, bn_stats
        w = regressor_apply(params["estimator"], feats)
        return w, None, bn_stats

    def render(self, audio, w):
        return self._proc(audio, w, self.cfg.sample_rate)

    def forward(self, params, input_audio, target_audio, render_audio=True,
                training=False, rng=None):
        w, logits, _ = self.predict_params(params, input_audio, target_audio,
                                           training, rng)
        if render_audio:
            output_audio = self.render(input_audio, w)
        else:
            output_audio = jnp.zeros_like(input_audio)
        return output_audio, w, logits

    # -- training step --------------------------------------------------------

    def loss_fn(self, params, batch, rng, training: bool = True):
        """batch: {"input_audio" (bs,2,T), "target_audio", "target_params"}.
        (reference: style.py:726-886)"""
        cfg = self.cfg
        input_audio = batch["input_audio"]
        target_audio = batch.get("target_audio")
        target_params = batch.get("target_params")
        bs = input_audio.shape[0]

        rng, r_gain, r_otf, r_tgain, r_model = jax.random.split(rng, 5)

        peak = jnp.max(jnp.abs(input_audio))
        input_audio = input_audio / jnp.maximum(peak, 1e-8)
        gain_db = -jax.random.uniform(r_gain, (bs,)) * 12.0
        input_audio = input_audio * (10 ** (gain_db / 20.0))[:, None, None]

        if cfg.on_the_fly:
            k1, k2, k3 = jax.random.split(r_otf, 3)
            target_params = jax.random.uniform(k1, (bs, self.num_params))
            target_params = target_params.at[:, -1].set(0.5)  # pin gain
            rev_on = (jax.random.uniform(k2, (bs,)) <= 0.5).astype(jnp.float32)
            target_params = target_params.at[:, -2].multiply(rev_on)
            extra_gain_db = -jax.random.uniform(k3, (bs,)) * 24.0
            x_t = input_audio * (10 ** (extra_gain_db / 20.0))[:, None, None]
            target_audio = jax.lax.stop_gradient(self.render(x_t, target_params))
            peaks = jnp.max(jnp.abs(target_audio), axis=(-2, -1), keepdims=True)
            g = jnp.clip(1.0 / jnp.maximum(peaks, 1e-8), 10 ** (-48 / 20),
                         10 ** (48 / 20))
            target_audio = target_audio * g

        tgain_db = -jax.random.uniform(r_tgain, (bs,)) * 12.0
        target_audio = target_audio * (10 ** (tgain_db / 20.0))[:, None, None]

        T = input_audio.shape[-1]
        if cfg.split_section:
            input_A = input_audio[..., : T // 2]
            target_A = target_audio[..., : T // 2]
            target_B = target_audio[..., T // 2:]
        else:
            input_A = input_audio
            target_A = target_audio
            target_B = target_audio

        render_audio = cfg.loss_type == "audio" or not training
        w, logits, bn_stats = self.predict_params(
            params, input_A, target_B, training,
            r_model if training else None)
        if render_audio:
            output_A = self.render(input_A, w)
        else:
            output_A = jnp.zeros_like(input_A)

        metrics = {}
        loss = 0.0
        if cfg.loss_type == "audio":
            audio_loss = multi_resolution_stft_loss(output_A, target_A)
            loss = loss + audio_loss
            metrics["audio_loss"] = audio_loss
        elif cfg.loss_type == "parameter-regression":
            param_loss = jnp.mean((w - target_params) ** 2)
            loss = loss + param_loss
            metrics["param_loss"] = param_loss
        else:  # parameter-classification
            target_idx = params_to_bin_index(target_params, cfg.num_bins)
            param_loss = optax.softmax_cross_entropy_with_integer_labels(
                logits.reshape(-1, cfg.num_bins), target_idx.reshape(-1)
            ).mean()
            loss = loss + param_loss
            metrics["param_loss"] = param_loss

        if cfg.loss_type != "audio" and not training:
            metrics["audio_loss"] = multi_resolution_stft_loss(output_A, target_A)

        metrics["loss"] = loss
        aux = {"output_audio": output_A, "params_pred": w,
               "bn_stats": bn_stats}
        return loss, (metrics, aux)

    def make_train_step(self, mesh: Mesh | None = None) -> Callable:
        opt = self.optimizer

        def step(state: StyleTrainState, batch, rng):
            (loss, (metrics, aux)), grads = jax.value_and_grad(
                self.loss_fn, has_aux=True)(state.params, batch, rng, True)
            updates, opt_state = opt.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            bn_stats = aux.get("bn_stats") or {}
            if bn_stats:
                from st_ito_tpu.models.bn_stats import merge_bn_stats

                new_params["encoder"] = merge_bn_stats(new_params["encoder"],
                                                       bn_stats)
            return StyleTrainState(params=new_params, opt_state=opt_state,
                                   step=state.step + 1), metrics

        if mesh is None:
            return jax.jit(step)

        batch_sharding = NamedSharding(mesh, P("data"))
        rep = NamedSharding(mesh, P())
        jitted = jax.jit(step)

        def place(state, batch, rng):
            batch = {k: jax.device_put(v, batch_sharding) for k, v in batch.items()}
            state = jax.device_put(state, rep)
            return jitted(state, batch, rng)

        return place

    def make_eval_step(self) -> Callable:
        return jax.jit(partial(self.loss_fn, training=False))

    def make_train_block(self, k: int) -> Callable:
        """k training steps as ONE jitted lax.scan dispatch over a
        device-resident source pool — the style-training counterpart of
        run_es's gens_per_dispatch blocks. Per-step host dispatch through
        the tunneled TPU relay costs 0.1-0.8 s on bad days (PERF_NOTES
        "Relay latency variability"); a measured 400-step run spent ~95%
        of its wall-clock there. block(state, pool, idx, rng):
        pool (N, C, T) resident on device, idx (k, bs) int32 per-step
        gather indices, rng a single key split per step. Returns
        (state, losses (k,))."""
        opt = self.optimizer

        def block_impl(state, pool, idx, rng):
            def one(state, xs):
                ind, r = xs
                batch = {"input_audio": jnp.take(pool, ind, axis=0)}
                (loss, (metrics, aux)), grads = jax.value_and_grad(
                    self.loss_fn, has_aux=True)(state.params, batch, r, True)
                updates, opt_state = opt.update(grads, state.opt_state,
                                                state.params)
                new_params = optax.apply_updates(state.params, updates)
                bn_stats = aux.get("bn_stats") or {}
                if bn_stats:
                    from st_ito_tpu.models.bn_stats import merge_bn_stats

                    new_params["encoder"] = merge_bn_stats(
                        new_params["encoder"], bn_stats)
                return StyleTrainState(params=new_params,
                                       opt_state=opt_state,
                                       step=state.step + 1), metrics["loss"]

            rngs = jax.random.split(rng, k)
            state, losses = jax.lax.scan(one, state, (idx, rngs))
            return state, losses

        return jax.jit(block_impl)

"""Model registry + embedding API — the framework's public metric surface.

Mirrors the reference's loader/embed pairs (reference: st_ito/utils.py):
``load_param_model``/``get_param_embeds`` for AFx-Rep (utils.py:444-551),
MFCC feature embeds (utils.py:100-159), MIR feature embeds (utils.py:66-94).
Every ``get_*_embeds`` returns a dict of L2-normalized embeddings keyed by
head name ("mid"/"side"/"mono"), exactly like the reference, so ITO fitness
code is head-agnostic.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from st_ito_tpu.models import convert as _convert
from st_ito_tpu.models.cnn14 import Cnn14Config, cnn14_apply, init_cnn14_params
from st_ito_tpu.ops.resample import resample
from st_ito_tpu.ops.stft import mfcc as _mfcc


@dataclasses.dataclass
class ParamModel:
    """AFx-Rep model handle: params pytree + config.

    ``apply(params, x)`` is the pure function for use inside larger jitted
    programs — pass the pytree through the jit boundary so the ~80M weights
    become program *arguments*, never baked-in constants (baking them blows
    the serialized HLO past compile-service limits). ``__call__`` is the
    eager convenience path (jitted, params as argument).
    """

    params: dict
    config: Cnn14Config
    embed_dim: int = 512

    def __post_init__(self):
        cfg = self.config
        self._jitted = jax.jit(
            lambda p, x: cnn14_apply(p, x, cfg, training=False)
        )

    def apply(self, params: dict, x: jnp.ndarray):
        return cnn14_apply(params, x, self.config, training=False)

    def __call__(self, x: jnp.ndarray):
        return self._jitted(self.params, x)


def load_param_model(
    ckpt_path: str | None = None,
    use_gpu: bool = False,  # accepted for API parity; device placement is JAX's
    allow_random: bool = False,
    seed: int = 0,
) -> ParamModel:
    """Load the AFx-Rep encoder.

    Search order: explicit ckpt_path -> ./tmp/afx-rep.{npz,ckpt} ->
    $STITO_CKPT_DIR. A torch .ckpt is converted on the fly (and cached as
    .npz next to it). With allow_random=True a randomly initialized encoder
    is returned when no checkpoint exists (useful for tests/benchmarks in
    offline environments).
    """
    candidates = []
    if ckpt_path is not None:
        candidates.append(ckpt_path)
    for root in (os.path.join(os.getcwd(), "tmp"), os.environ.get("STITO_CKPT_DIR", "")):
        if root:
            candidates.append(os.path.join(root, "afx-rep.npz"))
            candidates.append(os.path.join(root, "afx-rep.ckpt"))

    for path in candidates:
        if not os.path.isfile(path):
            continue
        if path.endswith(".npz"):
            import json

            data = np.load(path)
            config = Cnn14Config()
            if "__config__" in data.files:
                config = Cnn14Config(**json.loads(bytes(data["__config__"])))
            params: dict = {}
            for key in data.files:
                if key == "__config__":
                    continue
                parts = key.split(".")
                node = params
                for p in parts[:-1]:
                    node = node.setdefault(p, {})
                node[parts[-1]] = data[key]
            # device-resident once at load: numpy leaves would re-upload
            # the whole encoder through the jit boundary on EVERY fitness
            # call (measured ~12 s/generation through the tunneled relay)
            params = jax.tree_util.tree_map(jnp.asarray, params)
            return ParamModel(params=params, config=config,
                              embed_dim=config.embed_dim)
        params, config = _convert.load_torch_checkpoint(path)
        npz_path = os.path.splitext(path)[0] + ".npz"
        try:
            _convert.save_params_npz(params, npz_path)
        except OSError:
            pass
        params = jax.tree_util.tree_map(jnp.asarray, params)
        return ParamModel(params=params, config=config, embed_dim=config.embed_dim)

    if allow_random:
        config = Cnn14Config()
        params = init_cnn14_params(jax.random.PRNGKey(seed), config)
        return ParamModel(params=params, config=config, embed_dim=config.embed_dim)

    raise FileNotFoundError(
        "afx-rep checkpoint not found (looked in: "
        + ", ".join(candidates)
        + "). Download https://huggingface.co/csteinmetz1/afx-rep/resolve/main/"
        "afx-rep.ckpt to ./tmp/, or pass allow_random=True."
    )


def _l2_normalize(e: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), eps)


def _param_embed_core(params, x, rng, config: Cnn14Config, in_sr: int,
                      peak_normalize: bool, dropout: float):
    if in_sr != int(config.sample_rate):
        if x.ndim == 4:  # rows form carries no benefit through a resample
            x = x.reshape(*x.shape[:2], -1)
        x = resample(x, in_sr, int(config.sample_rate))
    if peak_normalize:
        peak = jnp.max(jnp.abs(x), axis=tuple(range(1, x.ndim)),
                       keepdims=True)
        x = x / jnp.maximum(peak, 1e-8)
    mid, side = cnn14_apply(params, x, config, training=False)
    if dropout > 0.0 and rng is not None:
        k1, k2 = jax.random.split(rng)
        keep = 1.0 - dropout
        mid = jnp.where(jax.random.bernoulli(k1, keep, mid.shape), mid / keep, 0.0)
        side = jnp.where(jax.random.bernoulli(k2, keep, side.shape), side / keep, 0.0)
    mid = jnp.nan_to_num(mid)
    side = jnp.nan_to_num(side)
    return {"mid": _l2_normalize(mid), "side": _l2_normalize(side)}


_param_embed_jit = jax.jit(
    _param_embed_core, static_argnames=("config", "in_sr", "peak_normalize",
                                        "dropout"),
)


def get_param_embeds(
    x: jnp.ndarray,
    model: ParamModel,
    sample_rate: float,
    requires_grad: bool = False,  # API parity; grads always flow under jax.grad
    peak_normalize: bool = True,
    dropout: float = 0.0,
    rng: jax.Array | None = None,
    params: dict | None = None,
) -> dict[str, jnp.ndarray]:
    """AFx-Rep embeddings of x (bs, chs, T) ->
    {"mid": (bs, 512), "side": (bs, 512)}, L2-normalized
    (reference: st_ito/utils.py:444-508).

    Always executes as a jitted program (eager op-by-op dispatch is
    unimplemented on some TPU backends). Inside a larger jitted program,
    pass the weights via ``params`` so they enter through the jit boundary
    instead of being captured as constants.
    """
    p = params if params is not None else model.params
    return _param_embed_jit(p, x, rng, model.config, int(sample_rate),
                            peak_normalize, float(dropout))


# get_param_embeds peak-normalizes its own input (peak_normalize=True,
# mirroring the reference's get_param_embeds, utils.py:444-508) — fitness
# builders can therefore skip the renderer-level output normalization,
# whose global-max reduce + divide run on the badly tiled (B, 2, T)
# layout (~4x sublane padding at C=2). Scale invariance makes the two
# paths equal: embed(y / max|y|) == embed(y).
get_param_embeds.peak_normalizes_input = True
# accepts the renderer's hop-blocked rows form (bs, chs, R, hop_size) in
# place of (bs, chs, T) — same math, no flatten retile (cnn14_apply)
get_param_embeds.supports_rows = True


def get_param_embeds_chunked(
    x: jnp.ndarray,
    model: ParamModel,
    sample_rate: float,
    chunk_len: int = 262144,
    hop: int | None = None,
    **kwargs,
) -> dict[str, jnp.ndarray]:
    """Long-audio embedding: overlap-chunk the signal, embed every chunk as
    one batch, average and re-normalize. Minutes-long audio is handled by
    windowing rather than any sequence parallelism — the encoder is a CNN
    (SURVEY §5.7); the reference simply cropped to 262144 samples.
    """
    bs, chs, T = x.shape
    hop = hop or chunk_len
    if T <= chunk_len:
        return get_param_embeds(x, model, sample_rate, **kwargs)
    n_chunks = (T - chunk_len) // hop + 1
    starts = [i * hop for i in range(n_chunks)]
    chunks = jnp.stack([x[:, :, s:s + chunk_len] for s in starts], axis=1)
    chunks = chunks.reshape(bs * n_chunks, chs, chunk_len)
    e = get_param_embeds(chunks, model, sample_rate, **kwargs)
    out = {}
    for k, v in e.items():
        v = v.reshape(bs, n_chunks, -1).mean(axis=1)
        out[k] = _l2_normalize(v)
    return out


# per-chunk normalization inside get_param_embeds makes the chunked embed
# scale-invariant as well (norm of each chunk of c*x == norm of the chunk
# of x), so renderer-level peak normalization is equally skippable
get_param_embeds_chunked.peak_normalizes_input = True


def export_encoder_npz(params: dict, path: str,
                       config: Cnn14Config | None = None) -> None:
    """Save a trained encoder pytree (+ its config) so load_param_model can
    serve it (train CLI interop)."""
    import json

    flat = {}

    def walk(node, prefix):
        for k, v in node.items():
            key = f"{prefix}.{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, key)
            else:
                flat[key] = np.asarray(v)

    walk(params, "")
    if config is not None:
        flat["__config__"] = np.frombuffer(
            json.dumps(dataclasses.asdict(config)).encode(), dtype=np.uint8)
    np.savez(path, **flat)


# ---------------- CLAP metric (reference: utils.py:389-438) ----------------


@dataclasses.dataclass
class ClapModelHandle:
    model: Any
    processor: Any
    embed_dim: int = 512
    sample_rate: int = 48000


def load_clap_model(
    use_gpu: bool = False,
    model_id: str = "laion/clap-htsat-unfused",
    ckpt_path: str | None = "checkpoints/clap-htsat-unfused.pt",
    native: bool = True,
):
    """LAION-CLAP. Preference order:
    1. the NATIVE JAX tower (models/clap_laion.py, twin-parity-tested vs
       transformers) converted from a local state_dict at ``ckpt_path``,
    2. the native tower converted from the HF cache (torch touched only
       at load time),
    3. the torch host-side ClapModel handle (HF cache),
    else raises — no network egress here."""
    if native:
        from st_ito_tpu.models.clap_laion import (
            ClapLaionModel,
            convert_clap_laion_state_dict,
            load_clap_laion_model,
        )

        try:
            return load_clap_laion_model(ckpt_path=ckpt_path)
        except (FileNotFoundError, KeyError):
            pass
        try:
            from transformers import ClapModel

            # cache-local: no 5x network retries in offline environments
            m = ClapModel.from_pretrained(model_id, local_files_only=True)
            params = jax.tree_util.tree_map(
                jnp.asarray, convert_clap_laion_state_dict(m.state_dict()))
            return ClapLaionModel(params=params)
        except (OSError, ImportError, KeyError, EnvironmentError):
            pass
    try:
        from transformers import ClapModel, ClapProcessor

        model = ClapModel.from_pretrained(model_id)
        processor = ClapProcessor.from_pretrained(model_id)
    except (OSError, ImportError) as e:
        raise FileNotFoundError(
            f"CLAP weights for {model_id} not available locally "
            f"(offline environment). Pre-populate the HF cache, drop a "
            f"state_dict at {ckpt_path}, or use --metric param/mfcc. "
            f"Original error: {e}"
        ) from e
    model.eval()
    return ClapModelHandle(model=model, processor=processor)


def get_clap_embeds(
    x: jnp.ndarray,
    model,
    sample_rate: float,
    midside: bool = False,
    **kwargs,
) -> dict[str, jnp.ndarray]:
    """CLAP audio embeddings; mono (or mid/side heads with midside=True),
    L2-normalized (reference: st_ito/utils.py:389-438). Dispatches to the
    native JAX tower (fully traceable) or the torch handle."""
    from st_ito_tpu.models.clap_laion import ClapLaionModel

    if isinstance(model, ClapLaionModel):
        from st_ito_tpu.models.clap_laion import get_clap_laion_embeds

        return get_clap_laion_embeds(x, model, sample_rate, midside=midside,
                                     **kwargs)
    import torch

    bs, chs, _ = x.shape
    if sample_rate != 48000:
        x = resample(x, int(sample_rate), 48000)
    xn = np.asarray(x, np.float32)

    if chs == 2 and midside:
        signals = {"mid": xn[:, 0] + xn[:, 1], "side": xn[:, 0] - xn[:, 1]}
    else:
        signals = {"mono": xn.mean(axis=1)}

    out = {}
    with torch.no_grad():
        for name, sig in signals.items():
            inputs = model.processor(
                audios=[s for s in sig], sampling_rate=48000,
                return_tensors="pt",
            )
            feats = model.model.get_audio_features(**inputs)
            feats = torch.nn.functional.normalize(feats, p=2, dim=-1)
            out[name] = jnp.asarray(feats.numpy())
    return out


# torch runs on host — the ITO engine routes these through its host-side
# fitness path instead of tracing them into the jitted program
get_clap_embeds.host_side = True


# ------------- wav2vec2 / wav2clip / vggish (reference: utils.py:279-383) --


@dataclasses.dataclass
class Wav2Vec2Handle:
    model: Any
    embed_dim: int = 768


def load_wav2vec2_model(use_gpu: bool = False,
                        model_id: str = "facebook/wav2vec2-base") -> Wav2Vec2Handle:
    """Gated transformers Wav2Vec2 (torch, host-side eval baseline,
    reference: st_ito/utils.py:279-314)."""
    try:
        from transformers import Wav2Vec2Model

        model = Wav2Vec2Model.from_pretrained(model_id)
    except (OSError, ImportError) as e:
        raise FileNotFoundError(
            f"wav2vec2 weights for {model_id} not in the local HF cache "
            f"(offline environment). Original error: {e}") from e
    model.eval()
    return Wav2Vec2Handle(model=model)


def get_wav2vec2_embeds(x: jnp.ndarray, model: Wav2Vec2Handle,
                        sample_rate: float, **kwargs) -> dict:
    """Resample to 16 kHz, mono, mean-pool hidden states, L2
    (reference: st_ito/utils.py:279-314)."""
    import torch

    if sample_rate != 16000:
        x = resample(x, int(sample_rate), 16000)
    mono = np.asarray(jnp.mean(x, axis=1), np.float32)
    with torch.no_grad():
        out = model.model(torch.from_numpy(mono)).last_hidden_state
        feats = torch.nn.functional.normalize(out.mean(dim=1), p=2, dim=-1)
    return {"mono": jnp.asarray(feats.numpy())}


get_wav2vec2_embeds.host_side = True


def load_wav2clip_model(ckpt_path: str | None = "checkpoints/Wav2CLIP.pt",
                        allow_random: bool = False, use_gpu: bool = False):
    """Native JAX Wav2CLIP tower (reference: st_ito/utils.py:320-347);
    see st_ito_tpu/models/wav2clip.py."""
    from st_ito_tpu.models.wav2clip import load_wav2clip_model as _load

    return _load(ckpt_path=ckpt_path, allow_random=allow_random)


def get_wav2clip_embeds(x, model, sample_rate, **kwargs):
    """(reference: st_ito/utils.py:329-347)."""
    from st_ito_tpu.models.wav2clip import get_wav2clip_embeds as _get

    return _get(x, model, sample_rate, **kwargs)


def load_vggish_model(ckpt_path: str | None = "checkpoints/vggish.pth",
                      pca_path: str | None = "checkpoints/vggish_pca_params.pth",
                      allow_random: bool = False, use_gpu: bool = False):
    """Native JAX VGGish (reference: st_ito/utils.py:352-358);
    see st_ito_tpu/models/vggish.py."""
    from st_ito_tpu.models.vggish import load_vggish_model as _load

    return _load(ckpt_path=ckpt_path, pca_path=pca_path,
                 allow_random=allow_random)


def get_vggish_embeds(x, model, sample_rate, **kwargs):
    """(reference: st_ito/utils.py:361-383)."""
    from st_ito_tpu.models.vggish import get_vggish_embeds as _get

    return _get(x, model, sample_rate, **kwargs)


# ---------------- MFCC feature metric (reference: utils.py:100-159) --------


@dataclasses.dataclass
class MFCCFeatureExtractor:
    sample_rate: int = 48000
    n_mfcc: int = 25
    embed_dim: int = 75


def load_mfcc_feature_extractor(use_gpu: bool = False) -> MFCCFeatureExtractor:
    return MFCCFeatureExtractor()


def _mfcc_embed_core(x, in_sr: int, model_sr: int, n_mfcc: int, midside: bool):
    bs, chs, _ = x.shape
    if in_sr != model_sr:
        x = resample(x, in_sr, model_sr)
    if chs == 2 and midside:
        x = jnp.stack([x[:, 0] + x[:, 1], x[:, 0] - x[:, 1]], axis=1)
    else:
        x = jnp.mean(x, axis=1, keepdims=True)
    M = _mfcc(x, model_sr, n_mfcc=n_mfcc)  # (bs, ch, frames, n_mfcc)
    M = jnp.swapaxes(M, -1, -2)  # stats over frames
    feats = jnp.concatenate(
        [M.mean(axis=-1), M.std(axis=-1), M.max(axis=-1)], axis=-1
    ).reshape(bs, -1)
    return {"mono": _l2_normalize(feats)}


_mfcc_embed_jit = jax.jit(
    _mfcc_embed_core,
    static_argnames=("in_sr", "model_sr", "n_mfcc", "midside"),
)


def get_mfcc_feature_embeds(
    x: jnp.ndarray,
    model: MFCCFeatureExtractor,
    sample_rate: float,
    midside: bool = False,
    **kwargs,
) -> dict[str, jnp.ndarray]:
    return _mfcc_embed_jit(x, int(sample_rate), model.sample_rate,
                           model.n_mfcc, midside)

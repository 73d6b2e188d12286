"""ITO methods: CMA-ES style transfer, staged ES, gradient ITO, baselines.

API mirrors the reference (reference: st_ito/style_transfer.py:121-692,
scripts/run_optim.py:39-297) with the chain spec replacing the plugin dicts.

Performance architecture: ``make_fitness_fn`` compiles
render(whole population) -> embed(one batch) -> -cosine into a single jitted
XLA program. One device launch per CMA-ES generation, instead of the
reference's popsize serial C++ renders + one GPU forward. With a mesh, the
population axis is sharded across devices and XLA partitions the program
(SPMD); CMA-ES ask/tell stays on host.
"""

from __future__ import annotations

import os
import time
import warnings
from functools import partial
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from st_ito_tpu.chain import ChainSpec, build_render_fn, parameters_to_dict
from st_ito_tpu.chain.executor import build_batched_render_fn
from st_ito_tpu.ito.cmaes import CMAES
from st_ito_tpu.models.registry import get_param_embeds


# --------------------------------------------------------------------------
# fitness program
# --------------------------------------------------------------------------


def _embedding_distance(output_embeds, target_embeds, content_scale=None):
    """Mean over heads of -cosine(out, target); L2-normalized inputs make
    cosine a dot product (reference: st_ito/style_transfer.py:545-571)."""
    dists = []
    for name, out in output_embeds.items():
        tgt = target_embeds[name]
        d = -jnp.sum(out * tgt, axis=-1) / (
            jnp.linalg.norm(out, axis=-1) * jnp.linalg.norm(tgt, axis=-1) + 1e-12
        )
        if content_scale is not None:
            d = content_scale * d
        dists.append(d)
    return jnp.stack(dists, axis=0)


# Compiled-program caches. Keys include id(obj) for the unhashable
# chain/model objects; the cache VALUE pins a strong reference to every
# id()-keyed object so a garbage-collected chain can never alias a new
# allocation at the same address (stale-program hazard).
_FITNESS_CACHE: dict = {}
_RENDER_CACHE: dict = {}


def _resolve_fitness_dtype(compute_dtype: str | None) -> str | None:
    """Default fitness compute dtype: bfloat16 on TPU (the MXU's native
    precision; conv/matmul accumulation stays f32 and ranking agreement is
    tested), exact f32 elsewhere."""
    if compute_dtype is not None:
        return compute_dtype
    return "bfloat16" if jax.default_backend() == "tpu" else None


def _model_dtype_variant(model, compute_dtype: str | None):
    """Return ``model`` with its config's compute_dtype overridden (for
    models that support one, e.g. the Cnn14 ParamModel); otherwise return
    the model unchanged."""
    import dataclasses

    cfg = getattr(model, "config", None)
    if (
        compute_dtype is None
        or cfg is None
        or not hasattr(cfg, "compute_dtype")
        or cfg.compute_dtype == compute_dtype
        or not dataclasses.is_dataclass(model)
    ):
        return model
    return dataclasses.replace(
        model, config=dataclasses.replace(cfg, compute_dtype=compute_dtype))


def _cached_render(chain, sample_rate, num_channels, normalize_stages=False,
                   batched=False):
    key = (id(chain), sample_rate, num_channels, normalize_stages, batched)
    if key not in _RENDER_CACHE:
        if batched:
            fn = jax.jit(build_batched_render_fn(chain, sample_rate,
                                                 num_channels, fast=True))
        else:
            fn = jax.jit(build_render_fn(chain, sample_rate, num_channels,
                                         normalize_stages=normalize_stages))
        _RENDER_CACHE[key] = (fn, chain)  # hold chain ref so id stays valid
    return _RENDER_CACHE[key][0]


def make_fitness_fn(
    chain: ChainSpec,
    model,
    sample_rate: int,
    num_channels: int,
    embed_func: Callable = get_param_embeds,
    content_model=None,
    content_embed_func: Callable | None = None,
    dropout: float = 0.0,
    normalize_stages: bool = False,
    mesh: Mesh | None = None,
    return_audio: bool = False,
    compute_dtype: str | None = None,
    fft_precision: str = "high",
    fft_mode: str = "auto",
    pop_microbatch: int | None = None,
    renderer_fast: bool = True,
    max_lti_pad: int | None = None,
):
    """Build fitness(W (pop,P), x (C,T), target_embeds, rng) -> fvals (pop,)
    (or (fvals, embeds, audio) when return_audio). Jitted; one XLA program.

    With ``mesh`` (axis name "pop"), W is sharded over devices and the render
    + embed partition across them — the TPU replacement for the reference's
    mp.Pool render parallelism (reference: style_transfer.py:499-502).

    ``compute_dtype``: embed-path matmul/conv precision. Defaults to
    bfloat16 on TPU (f32 accumulation; argsort agreement with f32 is
    tested), f32 elsewhere. Pass "float32" to force the exact path.

    ``pop_microbatch``: evaluate the population in sub-batches of this size
    via lax.map (sequential; compute per candidate is unchanged). Caps the
    live render/FFT working set — a full-length 60 s chunked render at
    popsize 128 needs ~24 GB of HBM temps at once, ~6 GB at microbatch 32.
    Applied when it divides the population; ignored with return_audio,
    a mesh (the pop axis is already split across devices), or dropout > 0
    (the embed-dropout mask would repeat across sub-batches).

    ``renderer_fast=False`` swaps the Pallas time-domain kernels for the
    associative-scan forms (serial == parallel, tested) — the
    differentiable path. Long signals no longer need it: the Pallas scan
    segment-chunks T with bounded memory (ops/pallas/scan.py _run_scan).

    Programs are cached per (chain, model, config) so repeated run_es calls
    in one process (e.g. the PST benchmark looping over examples) reuse the
    compiled executable instead of re-jitting per call.
    """
    compute_dtype = _resolve_fitness_dtype(compute_dtype)
    if return_audio or mesh is not None or dropout > 0.0:
        pop_microbatch = None
    cache_key = (id(chain), id(model), id(content_model), sample_rate,
                 num_channels, embed_func, content_embed_func, dropout,
                 normalize_stages, id(mesh), return_audio, compute_dtype,
                 fft_precision, fft_mode, pop_microbatch, renderer_fast,
                 max_lti_pad)
    if cache_key in _FITNESS_CACHE:
        return _FITNESS_CACHE[cache_key][0]
    orig_model = model  # id()-keyed; pinned below alongside the variant
    model = _model_dtype_variant(model, compute_dtype)
    if normalize_stages:
        # per-stage normalization is incompatible with LTI fusion; fall back
        # to the per-candidate renderer under vmap
        per_render = build_render_fn(chain, sample_rate, num_channels,
                                     normalize_stages=True)

        def render(W, x):
            return jax.vmap(per_render, in_axes=(0, None))(W, x)
    else:
        # natively batched population renderer: fused LTI groups + Pallas
        # compressor ballistics (ES needs no gradients -> fast=True).
        # When the style (and content, if any) embed peak-normalizes its
        # own input (get_param_embeds does, like the reference's), the
        # renderer-level output normalization is redundant for the fitness
        # value — skip its global-max reduce + divide passes over the
        # badly tiled (B, 2, T) layout. return_audio keeps it: savepop
        # writes the normalized audio out.
        skip_norm = (
            not return_audio
            and getattr(embed_func, "peak_normalizes_input", False)
            and (content_model is None
                 or getattr(content_embed_func, "peak_normalizes_input",
                            False)))
        # rows contract: when the embed can frame hop-blocked rows
        # directly (get_param_embeds -> Cnn14), ask the renderer for its
        # native (B, C, T // hop, hop) output — the (B, C, T) flatten
        # retile after the fused-LTI inverse kernel disappears. The
        # renderer falls back to flat whenever shapes/ordering don't
        # qualify, and the embed accepts both ranks.
        rows_hop = None
        if (getattr(embed_func, "supports_rows", False)
                and not return_audio
                and content_model is None
                and getattr(getattr(model, "config", None), "hop_size", None)
                and sample_rate == int(model.config.sample_rate)):
            rows_hop = int(model.config.hop_size)
        render = build_batched_render_fn(chain, sample_rate, num_channels,
                                         fast=renderer_fast,
                                         fft_mode=fft_mode,
                                         fft_precision=fft_precision,
                                         peak_normalize_output=not skip_norm,
                                         max_lti_pad=max_lti_pad,
                                         out_rows_hop=rows_hop)

    # Host-side metric backends (CLAP / wav2vec2 torch wrappers, marked
    # with .host_side) cannot trace into the jitted program: render on
    # device, embed on host, score in numpy — the reference's exact
    # structure for these metrics (style_transfer.py:541-571 with a torch
    # model).
    if getattr(embed_func, "host_side", False):
        # the host path scores style similarity only — refuse configs whose
        # terms it would otherwise drop silently
        if content_model is not None:
            raise ValueError(
                "host-side metric backends do not support a content model; "
                "use an on-device style metric or drop content_model")
        if dropout > 0.0:
            warnings.warn(
                "embedding dropout is ignored by host-side metric backends",
                stacklevel=2)
        render_j = jax.jit(render)

        def host_fitness(W, x, target_embeds, target_content_embeds, rng):
            Y = render_j(jnp.asarray(W, jnp.float32), x)
            out = embed_func(Y, model, sample_rate)
            dists = []
            for name, e in out.items():
                t = np.asarray(target_embeds[name])
                e = np.asarray(e)
                d = -np.sum(e * t, axis=-1) / (
                    np.linalg.norm(e, axis=-1) * np.linalg.norm(t, axis=-1)
                    + 1e-12)
                dists.append(d)
            fvals = np.mean(np.stack(dists, axis=0), axis=0)
            if return_audio:
                return fvals, out, Y
            return fvals

        _FITNESS_CACHE[cache_key] = (host_fitness, chain, orig_model, model,
                                     content_model, mesh)
        return host_fitness

    # Model weights flow through the jit boundary as arguments — closing
    # over ~80M params would bake them into the HLO as constants and blow
    # past compile-service size limits.
    model_params = getattr(model, "params", None)
    content_params = getattr(content_model, "params", None)

    def _score_impl(mparams, cparams, W, x, target_embeds,
                    target_content_embeds, rng):
        Y = render(W, x)  # (pop, C, T)
        output_embeds = embed_func(
            Y, model, sample_rate,
            dropout=dropout, rng=rng if dropout > 0.0 else None,
            params=mparams,
        )
        dists = _embedding_distance(output_embeds, target_embeds)
        if content_model is not None and target_content_embeds is not None:
            out_content = content_embed_func(Y, content_model, sample_rate,
                                             params=cparams)
            cdists = _embedding_distance(out_content, target_content_embeds,
                                         content_scale=2.0)
            dists = jnp.concatenate([dists, cdists], axis=0)
        fvals = jnp.mean(dists, axis=0)
        if return_audio:
            return fvals, output_embeds, Y
        return fvals

    def fitness_impl(mparams, cparams, W, x, target_embeds,
                     target_content_embeds, rng):
        mb = pop_microbatch
        if (mb and not return_audio and W.shape[0] > mb
                and W.shape[0] % mb == 0):
            Wb = W.reshape(W.shape[0] // mb, mb, W.shape[1])
            fvals = jax.lax.map(
                lambda Wi: _score_impl(mparams, cparams, Wi, x,
                                       target_embeds, target_content_embeds,
                                       rng), Wb)
            return fvals.reshape(-1)
        return _score_impl(mparams, cparams, W, x, target_embeds,
                           target_content_embeds, rng)

    if mesh is not None:
        w_sharding = NamedSharding(mesh, P("pop", None))
        rep = NamedSharding(mesh, P())
        jitted = jax.jit(
            fitness_impl,
            in_shardings=(rep, rep, w_sharding, rep, rep, rep, rep),
        )
    else:
        jitted = jax.jit(fitness_impl)

    def fitness(W, x, target_embeds, target_content_embeds, rng):
        return jitted(model_params, content_params, W, x, target_embeds,
                      target_content_embeds, rng)

    # expose the raw traceable impl so the device-resident ES loop
    # (ito/device_es.py) can compose it into its k-generation scan
    fitness._impl = fitness_impl
    fitness._model_params = model_params
    fitness._content_params = content_params

    # pin refs for every id()-keyed object (see cache comment above)
    _FITNESS_CACHE[cache_key] = (fitness, chain, orig_model, model,
                                 content_model, mesh)
    return fitness


def _crop_or_pad_impl(x: jnp.ndarray, start, crop_len: int) -> jnp.ndarray:
    """Same-crop-for-population windowing
    (reference: style_transfer.py:505-518)."""
    T = x.shape[-1]
    if T > crop_len:
        return jax.lax.dynamic_slice_in_dim(x, start, crop_len, axis=-1)
    if T < crop_len:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, crop_len - T)]
        return jnp.pad(x, pad)
    return x


# All host-level device math is jitted: eager op-by-op dispatch is
# unimplemented on some TPU backends (remote-compile relays).
_crop_or_pad = jax.jit(_crop_or_pad_impl, static_argnames=("crop_len",))

_peak_norm = jax.jit(lambda x: x / jnp.maximum(jnp.max(jnp.abs(x)), 1e-8))

_CHUNKED_EMBED_CACHE: dict = {}


def _chunked_embed_for(base_embed: Callable, chunk_len: int,
                       hop: int | None = None) -> Callable:
    """Generic long-audio wrapper: overlap-chunk, embed all chunks as one
    batch through ``base_embed``, average, re-normalize (the param-model
    specific version: registry.get_param_embeds_chunked; reference handles
    long audio by cropping instead, style_transfer.py:505-518). Cached per
    (base, chunk_len, hop) so repeated run_es calls reuse the same
    function identity (and thus the same compiled fitness program)."""
    key = (base_embed, chunk_len, hop)
    if key in _CHUNKED_EMBED_CACHE:
        return _CHUNKED_EMBED_CACHE[key]
    h = hop or chunk_len

    # The chunk/reduce glue MUST be jitted: run_es calls the wrapper at
    # host level for the target embedding, and eager op-by-op dispatch is
    # unimplemented on the remote-relay TPU backend — the failure surfaces
    # asynchronously at the NEXT blocking fetch (debugged as a spurious
    # "constant fetch UNIMPLEMENTED" during the ES runner's lowering).
    @partial(jax.jit, static_argnames=("n_chunks", "hop", "chunk"))
    def _split(x, n_chunks, hop, chunk):
        bs, chs, _ = x.shape
        chunks = jnp.stack(
            [jax.lax.dynamic_slice_in_dim(x, i * hop, chunk, axis=-1)
             for i in range(n_chunks)], axis=1)
        return chunks.reshape(bs * n_chunks, chs, chunk)

    @partial(jax.jit, static_argnames=("bs", "n_chunks"))
    def _reduce(e, bs, n_chunks):
        out = {}
        for k, v in e.items():
            v = v.reshape(bs, n_chunks, -1).mean(axis=1)
            out[k] = v / jnp.maximum(
                jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
        return out

    def chunked(x, model, sample_rate, **kwargs):
        bs, chs, T = x.shape
        if T <= chunk_len:
            return base_embed(x, model, sample_rate, **kwargs)
        n_chunks = (T - chunk_len) // h + 1
        chunks = _split(x, n_chunks=n_chunks, hop=h, chunk=chunk_len)
        e = base_embed(chunks, model, sample_rate, **kwargs)
        return _reduce(e, bs=bs, n_chunks=n_chunks)

    chunked.peak_normalizes_input = getattr(
        base_embed, "peak_normalizes_input", False)
    _CHUNKED_EMBED_CACHE[key] = chunked
    return chunked


@jax.jit
def _lift_slice_impl(template, W, s0):
    Wf = jnp.tile(template[None, :], (W.shape[0], 1))
    return jax.lax.dynamic_update_slice(Wf, W, (0, s0))


def _lift_slice(template, W, s0: int):
    """Embed slice-width candidates into the full frozen parameter vector
    (run_es opt_slice support)."""
    return _lift_slice_impl(template, W, jnp.asarray(s0, jnp.int32))

_peak_norm_items = jax.jit(
    lambda x: x / jnp.maximum(
        jnp.max(jnp.abs(x), axis=(-2, -1), keepdims=True), 1e-8))


# --------------------------------------------------------------------------
# main ES method
# --------------------------------------------------------------------------


def run_es(
    input_audio: jnp.ndarray,
    target_audio: jnp.ndarray,
    sample_rate: int,
    chain: ChainSpec,
    model,
    embed_func: Callable = get_param_embeds,
    content_model=None,
    content_embed_func: Callable | None = None,
    max_iters: int = 100,
    w0: np.ndarray | None = None,
    find_w0: bool = True,
    sigma0: float = 0.1,
    distance: str = "cosine",
    random_crop: bool = False,
    crop_len: int = 262144,
    popsize: int = 32,
    parallel: bool = True,  # accepted for API parity; always parallel on TPU
    dropout: float = 0.0,
    savepop: bool = False,
    run_dir: str = ".",
    normalize_stages: bool = False,
    seed: int = 0,
    mesh: Mesh | None = None,
    early_stop_patience: int = 10,
    early_stop_threshold: float = -0.01,
    verbose: bool = True,
    es_state_path: str | None = None,
    fitness_dtype: str | None = None,
    gens_per_dispatch: int = 1,
    opt_slice: tuple[int, int] | None = None,
    w_template: np.ndarray | None = None,
    chunked: bool = False,
    fft_mode: str = "auto",
    pop_microbatch: int | None = None,
    **kwargs,
):
    """CMA-ES inference-time optimization
    (reference: st_ito/style_transfer.py:399-692).

    ``opt_slice=(start, end)`` optimizes only that slice of the parameter
    vector; the other entries stay frozen at ``w_template`` (default:
    chain init). This is the frozen-prefix mechanism run_staged_es uses
    to give every stage the full ES loop (reference staged runner:
    scripts/run_optim.py:39-234). ``w0`` is then slice-width.

    ``chunked=True`` (long-audio mode, BASELINE config 5): instead of the
    reference's random ``crop_len`` window (style_transfer.py:505-518),
    render every candidate on the FULL input and score it with
    overlap-chunked embeddings of length ``crop_len`` averaged over the
    signal — minutes-long audio optimizes end-to-end with the embed
    program compiled once at the chunk length.

    input_audio/target_audio: (1, C, T). Returns the reference's result dict
    plus timing/throughput statistics.

    ``es_state_path``: optional .npz snapshot path — the ES state
    (mean/covariance/paths/best) is saved every iteration and restored on
    start if the file exists, making long ITO runs preemption-safe (an
    auxiliary capability the reference lacks, SURVEY §5.4).

    ``gens_per_dispatch`` > 1 moves the CMA-ES ask/tell math on device and
    runs that many generations per XLA dispatch (ito/device_es.py), paying
    one host round trip per block instead of per generation. Early
    stopping, snapshots, and verbose stats then operate at block
    granularity (history/stop semantics are unchanged; a stop mid-block
    truncates the reported history at the stopping generation). Requires a
    device-traceable metric; savepop forces the per-generation path.
    """
    rng = np.random.default_rng(seed)
    jrng = jax.random.PRNGKey(seed)

    if chunked:
        embed_func = _chunked_embed_for(embed_func, chunk_len=crop_len)
        random_crop = False

    input_audio = _peak_norm(input_audio)
    target_audio = _peak_norm(target_audio)

    target_embed = embed_func(target_audio, model, sample_rate)
    target_content_embed = None
    if content_model is not None:
        target_content_embed = content_embed_func(
            target_audio, content_model, sample_rate
        )

    num_params = chain.num_params
    if opt_slice is not None:
        s0, s1 = opt_slice
        opt_width = s1 - s0
        template = (np.asarray(w_template, np.float64)
                    if w_template is not None
                    else np.asarray(chain.init_params(), np.float64))
        lift_t = jnp.asarray(template, jnp.float32)

        def lift_np(w):
            full = template.copy()
            full[s0:s1] = w
            return full
    else:
        opt_width = num_params
        lift_t = None

        def lift_np(w):
            return w
    x_full = input_audio[0]  # (C, T)
    T = x_full.shape[-1]
    if chunked:
        eval_len = T  # full signal; embeddings chunk at crop_len
    else:
        # Never longer than the signal: padding candidates to crop_len
        # would dilute their time-pooled embeddings with silence while
        # target_embed stays unpadded, corrupting the objective. Random
        # crops only exist when T is meaningfully longer than the window
        # (reference crop semantics: style_transfer.py:505-518).
        eval_len = min(T, crop_len)

    # Chunked mode caps the fused-LTI tail guard at ~10 s: the worst-case
    # freeverb RT60. A full-T guard on a 60 s input doubles the FFT grid
    # to next_pow2(2T) = 2^23, whose XLA program was measured to OOM-kill
    # the remote compile helper; the capped grid stays at next_pow2(T+10s)
    # with tail wraparound <= -60 dB.
    max_lti_pad = min(T, 10 * int(sample_rate)) if chunked else None

    if chunked and pop_microbatch is None and mesh is None and not savepop:
        # Auto-cap the live HBM working set: the full-length render's
        # dominant temps scale with the LTI FFT grid, measured ~45 B per
        # FFT sample per candidate on v5e (pop 128 @ 60 s = 24 GB
        # requested vs 15.75 GB HBM at the old 2T grid). Halve the
        # sub-batch until ~8 GB of temps fit; compute per candidate is
        # unchanged (lax.map serializes the sub-batches).
        from st_ito_tpu.ops.iir import next_pow2

        per_cand = 48 * next_pow2(T + max_lti_pad)
        mb = popsize
        while mb > 8 and mb % 2 == 0 and mb * per_cand > (8 << 30):
            mb //= 2
        pop_microbatch = mb if mb < popsize else None

    # Very long eval windows used to force the associative-scan renderer
    # here (the Pallas scan's fat (T, 1024) layouts blew HBM); _run_scan
    # now segment-chunks T with explicit carry I/O, so the fast renderer
    # holds at any length with bounded memory — and avoids the
    # assoc-scan's log2(T)-stage HLO, which took >23 min to compile at
    # 60 s through the relay compile service.
    renderer_fast = True

    fitness = make_fitness_fn(
        chain, model, sample_rate, x_full.shape[0], embed_func,
        content_model, content_embed_func, dropout,
        normalize_stages, mesh, return_audio=savepop,
        compute_dtype=fitness_dtype, fft_mode=fft_mode,
        pop_microbatch=pop_microbatch, renderer_fast=renderer_fast,
        max_lti_pad=max_lti_pad,
    )
    # Dropout is disabled on the final generation (reference:
    # style_transfer.py:632-635); a second cached program with dropout=0
    # serves that generation.
    fitness_nodrop = fitness if dropout == 0.0 else make_fitness_fn(
        chain, model, sample_rate, x_full.shape[0], embed_func,
        content_model, content_embed_func, 0.0,
        normalize_stages, mesh, return_audio=savepop,
        compute_dtype=fitness_dtype, fft_mode=fft_mode,
        pop_microbatch=pop_microbatch, renderer_fast=renderer_fast,
        max_lti_pad=max_lti_pad,
    )

    def eval_W(W, iteration_rng, dropout_active=True):
        if random_crop and (T - crop_len) > 16384:
            start = int(rng.integers(16384, T - crop_len))
        else:
            start = 0
        x = _crop_or_pad(x_full, jnp.asarray(start, jnp.int32), crop_len=eval_len)
        fit = fitness if dropout_active else fitness_nodrop
        W = jnp.asarray(W, jnp.float32)
        if lift_t is not None:  # jitted: no eager dispatch on the TPU relay
            W = _lift_slice(lift_t, W, s0)
        out = fit(W, x, target_embed,
                  target_content_embed, iteration_rng)
        if savepop:
            fvals, embeds, audio = out
            return np.asarray(fvals), embeds, audio
        return np.asarray(out), None, None

    t_start = time.time()
    total_evals = 0

    # find the best starting point among random candidates
    # (reference: style_transfer.py:576-603)
    if find_w0:
        W_init = rng.random((popsize, opt_width))
        jrng, sub = jax.random.split(jrng)
        fvals, embeds, audio = eval_W(W_init, sub)
        total_evals += popsize
        w0 = W_init[int(np.argmin(fvals))]
        if savepop:
            _savepop_to_disk(-1, fvals, audio, run_dir, sample_rate)
    elif w0 is None:
        w0 = np.full(opt_width, 0.5)
    else:
        w0 = np.asarray(w0, np.float64)

    es_resume_state = None
    if es_state_path is not None and os.path.isfile(es_state_path):
        snap = np.load(es_state_path)
        es_resume_state = {k: snap[k] for k in snap.files}

    fval_history: list[float] = []
    wopt_history: list[np.ndarray] = []
    iters_without_improvement = 0

    use_device_es = (gens_per_dispatch > 1 and not savepop
                     and hasattr(fitness, "_impl"))
    if use_device_es:
        lift_args = ((lift_t, jnp.asarray(s0, jnp.int32))
                     if opt_slice is not None else None)
        wopt, fopt, total_evals = _run_es_device_loop(
            fitness, fitness_nodrop, opt_width, lift_args, lift_np, x_full,
            target_embed,
            target_content_embed, w0, sigma0, popsize, max_iters, dropout,
            gens_per_dispatch, random_crop, crop_len, eval_len, mesh,
            early_stop_patience, early_stop_threshold, verbose,
            es_state_path, es_resume_state, jrng, total_evals,
            fval_history, wopt_history)
        elapsed = time.time() - t_start
        render = _cached_render(chain, sample_rate, x_full.shape[0],
                                normalize_stages)
        output_audio = render(jnp.asarray(wopt, jnp.float32), x_full)[None]
        return {
            "output_audio": output_audio,
            "params": parameters_to_dict(wopt, chain),
            "fopt": fopt,
            "wopt": wopt,
            "fval_history": fval_history,
            "wopt_history": wopt_history,
            "time_elapsed": elapsed,
            "total_evals": total_evals,
            "evals_per_sec": total_evals / max(elapsed, 1e-9),
        }

    es = CMAES(w0, sigma0, popsize=popsize, bounds=(0.0, 1.0), seed=seed)
    if es_resume_state is not None:
        es.load_state_dict(es_resume_state)
        if verbose:
            print(f"resumed ES state from {es_state_path} "
                  f"(gen {es.generation})")

    for iteration in range(max_iters):
        W = es.ask()
        jrng, sub = jax.random.split(jrng)
        # best BEFORE this generation — comparing against a best that already
        # includes this generation makes the delta >= 0 forever and turns
        # early stopping into a hard cap at patience+1 generations
        prev_best = min(fval_history) if fval_history else None
        # no dropout on the final iteration (reference: :632-635)
        fvals, embeds, audio = eval_W(
            W, sub, dropout_active=(iteration + 1 < max_iters))
        total_evals += popsize
        es.tell(W, fvals)
        if verbose:
            es.disp()

        wopt_history.append(lift_np(es.result[0]))
        fval_history.append(es.result[1])

        if es_state_path is not None:
            np.savez(es_state_path, **es.state_dict())

        if savepop:
            _savepop_to_disk(iteration, fvals, audio, run_dir, sample_rate)

        # early stopping (reference: :654-670): improvement of this
        # generation's best over the best of all previous generations
        if prev_best is not None:
            fval_delta = float(np.min(fvals)) - prev_best
        else:
            fval_delta = -0.02
        if fval_delta > early_stop_threshold:
            iters_without_improvement += 1
        else:
            iters_without_improvement = 0
        if iters_without_improvement > early_stop_patience:
            if verbose:
                print("Stopping early due to no improvement.")
            break

    elapsed = time.time() - t_start
    wopt, fopt = es.result
    wopt = lift_np(wopt)

    render = _cached_render(chain, sample_rate, x_full.shape[0],
                            normalize_stages)
    output_audio = render(jnp.asarray(wopt, jnp.float32), x_full)[None]

    return {
        "output_audio": output_audio,
        "params": parameters_to_dict(wopt, chain),
        "fopt": fopt,
        "wopt": wopt,
        "fval_history": fval_history,
        "wopt_history": wopt_history,
        "time_elapsed": elapsed,
        "total_evals": total_evals,
        "evals_per_sec": total_evals / max(elapsed, 1e-9),
    }


_BLOCK_RUNNER_CACHE: dict = {}


def _block_runner_for(fitness, impl, consts, k, crop_len, mesh,
                      lift: bool = False):
    """Cache jitted k-generation runners per (fitness program, width, k,
    crop, lift); with lift the frozen template/offset flow through as
    runner arguments, so one compiled runner serves every stage of a
    staged run."""
    key = (id(fitness), consts.N, consts.lam, k, crop_len, id(mesh), lift)
    if key not in _BLOCK_RUNNER_CACHE:
        from st_ito_tpu.ito.device_es import make_block_runner

        ws = NamedSharding(mesh, P("pop", None)) if mesh is not None else None
        _BLOCK_RUNNER_CACHE[key] = (
            make_block_runner(impl, consts, k, crop_len=crop_len,
                              w_sharding=ws, lift=lift),
            fitness,  # pin: cache key is id()-based
            mesh,
        )
    return _BLOCK_RUNNER_CACHE[key][0]


def _run_es_device_loop(
    fitness, fitness_nodrop, opt_width, lift_args, lift_np, x_full,
    target_embed,
    target_content_embed, w0, sigma0, popsize, max_iters, dropout,
    gens_per_dispatch, random_crop, crop_len, eval_len, mesh,
    early_stop_patience, early_stop_threshold, verbose, es_state_path,
    es_resume_state, jrng, total_evals, fval_history, wopt_history,
):
    """Device-resident ES loop: k generations per dispatch (see run_es).

    Mutates fval_history/wopt_history in place (per-generation, same
    contents as the host loop); returns (wopt, fopt, total_evals).
    ``lift_args`` (opt_slice support) is passed through to the runner as
    data so a single compiled runner serves every stage of a staged run.
    """
    from st_ito_tpu.ito import device_es

    consts = device_es.cma_consts(opt_width, popsize)
    if es_resume_state is not None:
        state = device_es.state_from_dict(es_resume_state)
        if verbose:
            print(f"resumed ES state from {es_state_path} "
                  f"(gen {int(state.generation)})")
    else:
        state = device_es.cma_init(w0, sigma0)

    T = x_full.shape[-1]
    if random_crop and (T - crop_len) > 16384:
        x_eval, blk_crop = x_full, crop_len
    else:
        x_eval = _crop_or_pad(x_full, jnp.asarray(0, jnp.int32),
                              crop_len=eval_len)
        blk_crop = None

    # the reference disables embedding dropout on the final generation
    # (style_transfer.py:632-635): run it as its own 1-generation block
    main_gens = max_iters if dropout == 0.0 else max_iters - 1
    stopped = False
    done = 0
    iters_without_improvement = 0
    while done < main_gens and not stopped:
        k = min(gens_per_dispatch, main_gens - done)
        runner = _block_runner_for(fitness, fitness._impl, consts, k,
                                   blk_crop, mesh,
                                   lift=lift_args is not None)
        jrng, sub = jax.random.split(jrng)
        state, stats = runner(state, fitness._model_params,
                              fitness._content_params, x_eval, target_embed,
                              target_content_embed, sub, lift_args)
        packed = np.asarray(stats.packed)  # ONE relay round trip per block
        gen_min = packed[:, 0]
        best_f = packed[:, 1]
        best_x = packed[:, 2:]
        for j in range(k):
            prev_best = min(fval_history) if fval_history else None
            total_evals += popsize
            fval_history.append(float(best_f[j]))
            wopt_history.append(lift_np(best_x[j].astype(np.float64)))
            if verbose:
                print(f"gen {done + j + 1:4d}  evals {total_evals:6d}  "
                      f"fbest {best_f[j]:+.6f}")
            fval_delta = (float(gen_min[j]) - prev_best
                          if prev_best is not None else -0.02)
            if fval_delta > early_stop_threshold:
                iters_without_improvement += 1
            else:
                iters_without_improvement = 0
            if iters_without_improvement > early_stop_patience:
                if verbose:
                    print("Stopping early due to no improvement.")
                stopped = True
                break
        done += k
        if es_state_path is not None:
            np.savez(es_state_path, **device_es.state_to_dict(state))

    if dropout > 0.0 and not stopped and max_iters > 0:
        runner = _block_runner_for(fitness_nodrop, fitness_nodrop._impl,
                                   consts, 1, blk_crop, mesh,
                                   lift=lift_args is not None)
        jrng, sub = jax.random.split(jrng)
        state, stats = runner(state, fitness_nodrop._model_params,
                              fitness_nodrop._content_params, x_eval,
                              target_embed, target_content_embed, sub,
                              lift_args)
        total_evals += popsize
        packed = np.asarray(stats.packed)
        fval_history.append(float(packed[0, 1]))
        wopt_history.append(lift_np(packed[0, 2:].astype(np.float64)))
        if es_state_path is not None:
            np.savez(es_state_path, **device_es.state_to_dict(state))

    wopt = (wopt_history[-1] if wopt_history
            else lift_np(np.asarray(w0, np.float64)))
    fopt = fval_history[-1] if fval_history else float("inf")
    return wopt, fopt, total_evals


def _savepop_to_disk(iteration, fvals, audio, run_dir, sample_rate):
    """(reference: st_ito/style_transfer.py:362-396)"""
    from st_ito_tpu.utils import save_audio

    pop_dir = os.path.join(run_dir, f"pop_{iteration}")
    os.makedirs(pop_dir, exist_ok=True)
    audio = np.asarray(audio)
    order = np.argsort(np.asarray(fvals))
    for rank, idx in enumerate(order):
        a = audio[idx]
        a = a / max(np.abs(a).max(), 1e-8)
        save_audio(
            os.path.join(pop_dir, f"output_audio_pop_{rank}_fval_{fvals[idx]:0.4e}.wav"),
            a, sample_rate,
        )


# --------------------------------------------------------------------------
# batched multi-track ES (BASELINE.json config 5)
# --------------------------------------------------------------------------


def run_es_multitrack(
    input_audio: jnp.ndarray,
    target_audio: jnp.ndarray,
    sample_rate: int,
    chain: ChainSpec,
    model,
    embed_func: Callable = get_param_embeds,
    max_iters: int = 32,
    popsize: int = 32,
    sigma0: float = 0.33,
    dropout: float = 0.0,
    seed: int = 0,
    mesh: Mesh | None = None,
    verbose: bool = False,
    **kwargs,
):
    """Independent CMA-ES per track, but every generation of every track
    renders+embeds in ONE device program: W (tracks*pop, P) through the
    batched renderer with per-candidate input audio.

    input_audio/target_audio: (tracks, C, T).
    """
    tracks = input_audio.shape[0]
    num_params = chain.num_params

    input_audio = _peak_norm_items(input_audio)
    target_audio = _peak_norm_items(target_audio)

    target_embeds = embed_func(target_audio, model, sample_rate)
    model = _model_dtype_variant(model, _resolve_fitness_dtype(
        kwargs.get("fitness_dtype")))
    model_params = getattr(model, "params", None)

    render = build_batched_render_fn(chain, sample_rate, input_audio.shape[1],
                                     fast=True)

    def fitness_impl(mparams, W_flat, x_flat, tmid, tside, rng):
        Y = render(W_flat, x_flat)
        embeds = embed_func(Y, model, sample_rate, params=mparams,
                            dropout=dropout, rng=rng if dropout > 0 else None)
        dists = []
        for name, out in embeds.items():
            tgt = {"mid": tmid, "side": tside}.get(name)
            if tgt is None:
                continue
            dists.append(-jnp.sum(out * tgt, axis=-1))
        return jnp.mean(jnp.stack(dists, axis=0), axis=0)  # (tracks*pop,)

    if mesh is not None:
        rep = NamedSharding(mesh, P())
        pop_shard = NamedSharding(mesh, P("pop"))
        jitted = jax.jit(fitness_impl,
                         in_shardings=(rep, pop_shard, pop_shard, pop_shard,
                                       pop_shard, rep))
    else:
        jitted = jax.jit(fitness_impl)

    _rep = jax.jit(lambda a: jnp.repeat(a, popsize, axis=0))
    x_flat = _rep(input_audio)  # (tracks*pop, C, T)
    tmid = _rep(target_embeds["mid"])
    tside = _rep(target_embeds.get("side", target_embeds["mid"]))

    rng = np.random.default_rng(seed)
    jrng = jax.random.PRNGKey(seed)
    ess = [CMAES(np.full(num_params, 0.5), sigma0, popsize=popsize,
                 bounds=(0.0, 1.0), seed=seed + t) for t in range(tracks)]

    t_start = time.time()
    total_evals = 0
    fval_history = [[] for _ in range(tracks)]
    for iteration in range(max_iters):
        Ws = [es.ask() for es in ess]
        W_flat = jnp.asarray(np.concatenate(Ws, axis=0), jnp.float32)
        jrng, sub = jax.random.split(jrng)
        fvals = np.asarray(jitted(model_params, W_flat, x_flat, tmid, tside, sub))
        total_evals += tracks * popsize
        for t, es in enumerate(ess):
            es.tell(Ws[t], fvals[t * popsize:(t + 1) * popsize])
            fval_history[t].append(es.result[1])
        if verbose:
            print(f"gen {iteration}: " + " ".join(
                f"{es.result[1]:+.4f}" for es in ess))

    elapsed = time.time() - t_start
    final_render = _cached_render(chain, sample_rate, input_audio.shape[1],
                                  batched=True)
    W_opt = jnp.asarray(np.stack([es.result[0] for es in ess]), jnp.float32)
    output_audio = final_render(W_opt, input_audio)

    return {
        "output_audio": output_audio,
        "params": [parameters_to_dict(es.result[0], chain) for es in ess],
        "fopt": [es.result[1] for es in ess],
        "wopt": np.stack([es.result[0] for es in ess]),
        "fval_history": fval_history,
        "time_elapsed": elapsed,
        "total_evals": total_evals,
        "evals_per_sec": total_evals / max(elapsed, 1e-9),
    }


# --------------------------------------------------------------------------
# staged ES (reference: scripts/run_optim.py:39-234)
# --------------------------------------------------------------------------


def run_staged_es(
    input_audio: jnp.ndarray,
    target_audio: jnp.ndarray,
    sample_rate: int,
    chain: ChainSpec,
    model,
    embed_func: Callable = get_param_embeds,
    max_iters: int = 25,
    popsize: int = 32,
    sigma0: float = 0.33,
    dropout: float = 0.0,
    seed: int = 0,
    mesh: Mesh | None = None,
    verbose: bool = True,
    early_stop_patience: int = 10,
    early_stop_threshold: float = -0.01,
    savepop: bool = False,
    run_dir: str = ".",
    es_state_path: str | None = None,
    gens_per_dispatch: int = 1,
    **kwargs,
):
    """Optimize one stage at a time, freezing earlier stages at their
    optimum (reference: scripts/run_optim.py:39-234).

    Each stage routes through run_es with ``opt_slice`` (the frozen-prefix
    wrapper), so stages get the FULL ES loop: early-stop patience, savepop
    (per-stage subdirectories), preemption-safe state snapshots (one
    ``.stage{i}.npz`` per stage — a resumed run replays completed stages,
    which early-stop immediately), and device-batched k-generation
    dispatch."""
    w_full = np.asarray(chain.init_params(), np.float64)
    fval_history: list[float] = []
    wopt_history: list[np.ndarray] = []
    total_evals = 0
    t_start = time.time()

    # per-stage starts are always the frozen template slice; drop caller
    # keys that would collide with the explicit per-stage arguments
    for k in ("find_w0", "w0", "opt_slice", "w_template"):
        kwargs.pop(k, None)

    for stage_idx, (stage, start, end) in enumerate(chain.stage_slices()):
        res = run_es(
            input_audio, target_audio, sample_rate, chain, model,
            embed_func=embed_func, max_iters=max_iters, popsize=popsize,
            sigma0=sigma0, dropout=dropout, find_w0=False,
            w0=w_full[start:end].copy(), opt_slice=(start, end),
            w_template=w_full, seed=seed + stage_idx, mesh=mesh,
            verbose=False, early_stop_patience=early_stop_patience,
            early_stop_threshold=early_stop_threshold, savepop=savepop,
            run_dir=(os.path.join(run_dir, f"stage_{stage_idx}_{stage.name}")
                     if savepop else run_dir),
            es_state_path=(f"{es_state_path}.stage{stage_idx}.npz"
                           if es_state_path else None),
            gens_per_dispatch=gens_per_dispatch,
            **kwargs,
        )
        w_full = np.asarray(res["wopt"], np.float64)
        fval_history.extend(res["fval_history"])
        wopt_history.extend(res["wopt_history"])
        total_evals += res["total_evals"]
        if verbose:
            print(f"stage {stage.name}: fbest {res['fopt']:+.5f} "
                  f"({len(res['fval_history'])} gens)")

    elapsed = time.time() - t_start
    render = _cached_render(chain, sample_rate, input_audio.shape[1])
    output_audio = render(jnp.asarray(w_full, jnp.float32),
                          _peak_norm(input_audio)[0])[None]
    return {
        "output_audio": output_audio,
        "params": parameters_to_dict(w_full, chain),
        "fopt": fval_history[-1] if fval_history else np.inf,
        "wopt": w_full,
        "fval_history": fval_history,
        "wopt_history": wopt_history,
        "time_elapsed": elapsed,
        "total_evals": total_evals,
        "evals_per_sec": total_evals / max(elapsed, 1e-9),
    }


# --------------------------------------------------------------------------
# gradient ITO (reference: scripts/run_optim.py:237-297)
# --------------------------------------------------------------------------


def run_autodiff(
    input_audio: jnp.ndarray,
    target_audio: jnp.ndarray,
    sample_rate: int,
    model,
    embed_func: Callable = get_param_embeds,
    chain: ChainSpec | None = None,
    lr: float = 1e-2,
    n_iters: int = 300,
    dropout: float = 0.0,
    seed: int = 0,
    verbose: bool = True,
    **kwargs,
):
    """First-class gradient ITO: Adam on sigmoid-parameterized params through
    the differentiable chain. The reference needed the 51-param dasp
    processor for this; here ANY chain is differentiable. With chain=None the
    reference's complex processor (51 params) is used.
    """
    from st_ito_tpu import proc

    input_audio = _peak_norm(input_audio)
    target_audio = _peak_norm(target_audio)
    target_embed = embed_func(target_audio, model, sample_rate)

    if chain is None:
        num_params = proc.NUM_COMPLEX_PARAMS

        def render_batch(w):
            return proc.apply_complex_autodiff_processor(
                input_audio, w[None, :], sample_rate
            )
    else:
        num_params = chain.num_params
        render = build_render_fn(chain, sample_rate, input_audio.shape[1])

        def render_batch(w):
            return render(w, input_audio[0])[None]

    model_params = getattr(model, "params", None)

    def loss_fn(theta, mparams, rng):
        w = jax.nn.sigmoid(theta)
        y = render_batch(w)
        out_embeds = embed_func(y, model, sample_rate,
                                dropout=dropout,
                                rng=rng if dropout > 0 else None,
                                params=mparams)
        d = _embedding_distance(out_embeds, target_embed)
        return jnp.mean(d)

    theta = jnp.zeros(num_params)  # sigmoid(0) = 0.5
    opt = optax.adam(lr)
    opt_state = opt.init(theta)

    def _step(th, st, mparams, rng):
        loss, grads = jax.value_and_grad(loss_fn)(th, mparams, rng)
        updates, st = opt.update(grads, st)
        th = optax.apply_updates(th, updates)
        return th, st, loss

    step = jax.jit(_step)

    jrng = jax.random.PRNGKey(seed)
    fval_history = []
    wopt_history = []
    t_start = time.time()
    for i in range(n_iters):
        jrng, sub = jax.random.split(jrng)
        theta, opt_state, loss = step(theta, opt_state, model_params, sub)
        fval_history.append(float(loss))
        wopt_history.append(np.asarray(jax.nn.sigmoid(theta)))
        if verbose and (i % 25 == 0 or i == n_iters - 1):
            print(f"iter {i:4d}  loss {float(loss):+.6f}")

    elapsed = time.time() - t_start
    w = jax.nn.sigmoid(theta)
    output_audio = jax.jit(render_batch)(w)
    params = (
        parameters_to_dict(np.asarray(w), chain) if chain is not None
        else {f"{i}": float(v) for i, v in enumerate(np.asarray(w))}
    )
    return {
        "output_audio": output_audio,
        "params": params,
        "fopt": fval_history[-1],
        "wopt": np.asarray(w),
        "fval_history": fval_history,
        "wopt_history": wopt_history,
        "time_elapsed": elapsed,
        "total_evals": n_iters,
        "evals_per_sec": n_iters / max(elapsed, 1e-9),
    }




# --------------------------------------------------------------------------
# baselines (reference: st_ito/style_transfer.py:121-318)
# --------------------------------------------------------------------------


def run_input(input_audio, target_audio, sample_rate, chain=None, model=None,
              *args, **kwargs):
    return {"output_audio": input_audio, "time_elapsed": 0.0}


def run_random(input_audio, target_audio, sample_rate, chain: ChainSpec,
               model=None, seed: int = 0, **kwargs):
    rng = np.random.default_rng(seed)
    w = rng.random(chain.num_params)
    t0 = time.time()
    render = _cached_render(chain, sample_rate, input_audio.shape[1])
    y = render(jnp.asarray(w, jnp.float32), input_audio[0])[None]
    return {
        "output_audio": y,
        "param_dict": parameters_to_dict(w, chain),
        "time_elapsed": time.time() - t0,
    }


# jitted forwards per system — a benchmark sweep calls the method once per
# example and must not recompile each time (same policy as _FITNESS_CACHE;
# the value pins the system so the id cannot alias a new object)
_LEARNED_CACHE: dict = {}


def run_learned_inference(
    input_audio,
    target_audio,
    sample_rate,
    system,
    state,
    chain=None,
    model=None,
    **kwargs,
):
    """DeepAFx-ST-style learned inference as a benchmark method
    (reference: st_ito/style_transfer.py:281-318): one forward pass of a
    trained StyleTransferSystem predicts chain parameters directly."""
    t0 = time.time()
    x = input_audio
    if x.shape[1] == 1:
        x = jnp.concatenate([x, x], axis=1)
    y = target_audio
    if y.shape[1] == 1:
        y = jnp.concatenate([y, y], axis=1)
    entry = _LEARNED_CACHE.get(id(system))
    if entry is None:
        fwd = jax.jit(
            lambda p, a, b: system.forward(p, a, b, render_audio=True))
        _LEARNED_CACHE[id(system)] = entry = (fwd, system)
    fwd = entry[0]
    output_audio, w, _ = fwd(state.params, x, y)
    result = {
        "output_audio": output_audio,
        "params": {f"{i}": float(v) for i, v in enumerate(np.asarray(w[0]))},
        "time_elapsed": time.time() - t0,
    }
    return result


@partial(jax.jit, static_argnames=("sample_rate",))
def _rb_lufs(sig, sample_rate):
    from st_ito_tpu.ops.loudness import integrated_loudness

    return integrated_loudness(sig, sample_rate)


@partial(jax.jit, static_argnames=("sample_rate",))
def _rb_comp_step(sig, th, sample_rate):
    from st_ito_tpu.ops.dynamics import compressor
    from st_ito_tpu.ops.loudness import integrated_loudness

    y = compressor(sig, sample_rate, threshold_db=th, ratio=3.0,
                   attack_ms=1.0, release_ms=100.0, knee_db=0.5)
    y = y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-8) * 10 ** (-12 / 20)
    return y, integrated_loudness(y, sample_rate)


def run_rule_based(
    input_audio,
    target_audio,
    sample_rate,
    chain=None,
    model=None,
    n_fft: int = 16384,
    n_taps: int = 2048,
    **kwargs,
):
    """Matched-EQ FIR + iterative compressor-threshold hill climb on the LUFS
    delta (reference: st_ito/style_transfer.py:184-278). Host-side
    scipy filter design; rendering on device. The device helpers are
    module-level jitted functions so a benchmark sweep over many examples
    compiles them once, not once per example."""
    import scipy.signal

    t0 = time.time()
    bs = input_audio.shape[0]
    outs = []
    for b in range(bs):
        x = np.asarray(input_audio[b])
        t = np.asarray(target_audio[b])
        x = x / max(np.abs(x).max(), 1e-8) * 10 ** (-12 / 20)
        t = t / max(np.abs(t).max(), 1e-8) * 10 ** (-12 / 20)

        def avg_spec(sig):
            mono = sig.mean(axis=0)
            f, _, Z = scipy.signal.stft(mono, nperseg=n_fft, noverlap=n_fft // 2,
                                        padded=True)
            return np.abs(Z).mean(axis=-1)

        in_spec = scipy.signal.savgol_filter(avg_spec(x), 1025, 2)
        ref_spec = scipy.signal.savgol_filter(avg_spec(t), 1025, 2)
        response = ref_spec / np.maximum(in_spec, 1e-10)
        response[-1] = 0.0
        freqs = np.linspace(0, 1.0, (n_fft // 2) + 1)
        fir = scipy.signal.firwin2(n_taps, freqs * (sample_rate / 2), response,
                                   fs=sample_rate)
        x_filt = scipy.signal.lfilter(fir, [1.0], x).astype(np.float32)
        x_filt = x_filt / max(np.abs(x_filt).max(), 1e-8) * 10 ** (-12 / 20)

        target_lufs = float(_rb_lufs(jnp.asarray(t), sample_rate))
        x_cur = jnp.asarray(x_filt)
        cur_lufs = float(_rb_lufs(x_cur, sample_rate))
        delta = target_lufs - cur_lufs
        threshold_db = 0.0
        while delta > 0.25 and threshold_db > -80.0:
            y, y_lufs = _rb_comp_step(jnp.asarray(x_filt),
                                      jnp.asarray(threshold_db, jnp.float32),
                                      sample_rate)
            cur_lufs = float(y_lufs)
            delta = target_lufs - cur_lufs
            threshold_db -= 2.0
            x_cur = y
        outs.append(np.asarray(x_cur))
    return {
        "output_audio": jnp.asarray(np.stack(outs)),
        "time_elapsed": time.time() - t0,
    }

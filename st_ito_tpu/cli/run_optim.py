"""Style-transfer CLI — the framework's main entry point.

Flag surface mirrors the reference (reference: scripts/run_optim.py:300-322):

    python -m st_ito_tpu.cli.run_optim input.wav target.wav \
        --max-iters 300 --popsize 32 --max-length 262144 \
        [--staged] [--savepop] [--normalize-stages] [--use-gpu] [--parallel] \
        [--effect-type {vst,basic}] [--algorithm {es,autodiff}] \
        [--dropout 0.0] [--metric {param,mfcc,clap}]

Pass ``None`` as target to run the built-in synthetic-target self test
(reference: run_optim.py:452-521): a target is rendered from known
parameters and the optimizer must recover it.

Differences from the reference, by design:
- --effect-type vst maps to a native TPU chain of the same effect classes
  (EQ -> delay -> reverb, matching the reference's ZamEQ2 -> FlyingDelay ->
  TAL-Reverb-4 chain); VST3 binaries cannot run on TPU.
- --use-gpu / --parallel are accepted no-ops: placement is JAX's, and the
  population always renders in parallel on the accelerator.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def build_chain(effect_type: str, algorithm: str, with_bypass: bool = False):
    from st_ito_tpu.chain import (
        ChainSpec,
        basic_chain,
        basic_delay,
        basic_parametric_eq,
        basic_reverb,
    )

    if algorithm == "autodiff":
        return None  # 51-param complex processor, no chain spec
    if effect_type == "basic":
        return basic_chain(with_bypass=with_bypass)
    # "vst": native chain standing in for ZamEQ2 -> FlyingDelay -> TAL-Reverb-4
    return ChainSpec(
        stages=(basic_parametric_eq(), basic_delay(), basic_reverb()),
        with_bypass=with_bypass,
    )


def synthetic_target_params(chain) -> np.ndarray:
    """Stylized target parameters (bass cut, bright shelf, compression,
    moderate reverb) — the recoverable self-test target
    (reference: run_optim.py:456-507)."""
    rng = np.random.default_rng(1234)
    w = np.full(chain.num_params, 0.5)
    for stage, start, end in chain.stage_slices():
        off = start + (1 if chain.with_bypass else 0)
        if stage.effect == "parametric_eq":
            w[off:off + 3] = [0.1, 0.5, 0.2]      # low shelf cut
            w[off + 15:off + 18] = [0.7, 0.5, 0.2]  # high shelf boost
        elif stage.effect == "compressor":
            w[off:off + 4] = [0.8, 0.3, 0.1, 0.1]
        elif stage.effect == "distortion":
            w[off:off + 2] = [0.5, 0.5]
        elif stage.effect == "delay":
            w[off:off + 3] = [0.2, 0.2, 0.15]
        elif stage.effect == "reverb":
            w[off:off + 4] = [0.6, 0.4, 0.3, 0.7]
        if chain.with_bypass:
            w[start] = 0.0
    return w


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("input", type=str)
    parser.add_argument("target", type=str)
    parser.add_argument("--max-iters", type=int, default=300)
    parser.add_argument("--popsize", type=int, default=32)
    parser.add_argument("--max-length", type=int, default=262144)
    parser.add_argument("--staged", action="store_true")
    parser.add_argument("--savepop", action="store_true")
    parser.add_argument("--normalize-stages", action="store_true")
    parser.add_argument("--use-gpu", action="store_true")
    parser.add_argument("--parallel", action="store_true")
    parser.add_argument("--effect-type", type=str, default="vst",
                        choices=["vst", "basic"])
    parser.add_argument("--algorithm", type=str, default="es",
                        choices=["es", "autodiff"])
    parser.add_argument("--dropout", type=float, default=0.0)
    parser.add_argument("--metric", type=str, default="param",
                        choices=["param", "clap", "mfcc"])
    # extensions beyond the reference surface:
    parser.add_argument("--sigma0", type=float, default=0.33)
    parser.add_argument("--chunked", action="store_true",
                        help="long-audio mode: optimize the full signal "
                             "with overlap-chunked embeddings instead of "
                             "cropping to --max-length")
    parser.add_argument("--gens-per-dispatch", type=int, default=1,
                        help=">1 runs the CMA-ES on device, this many "
                             "generations per dispatch")
    parser.add_argument("--pop-microbatch", type=int, default=None,
                        help="evaluate the population in sub-batches of "
                             "this size (caps HBM temps for long-audio "
                             "renders; auto-sized in --chunked mode)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--output-dir", type=str, default="output/optim")
    parser.add_argument("--allow-random-model", action="store_true",
                        help="use a randomly initialized encoder when no "
                             "checkpoint is available (offline testing)")
    parser.add_argument("--num-devices", type=int, default=0,
                        help="shard the population over this many devices "
                             "(0 = single device)")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from st_ito_tpu.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from st_ito_tpu.ito import run_autodiff, run_es, run_staged_es
    from st_ito_tpu.ops.resample import resample
    from st_ito_tpu.utils import load_audio, save_audio

    sample_rate = 48000
    os.makedirs(args.output_dir, exist_ok=True)

    chain = build_chain(args.effect_type, args.algorithm)

    # ---- load audio ----
    input_audio, input_sr = load_audio(args.input)
    input_name = os.path.basename(args.input).replace(".wav", "")
    input_audio = jnp.asarray(input_audio)
    if input_sr != sample_rate:
        input_audio = jax.jit(
            lambda a: resample(a, input_sr, sample_rate))(input_audio)

    # ---- metric ----
    if args.metric == "param":
        from st_ito_tpu.models.registry import get_param_embeds, load_param_model

        model = load_param_model(allow_random=args.allow_random_model)
        embed_func = get_param_embeds
    elif args.metric == "mfcc":
        from st_ito_tpu.models.registry import (
            get_mfcc_feature_embeds,
            load_mfcc_feature_extractor,
        )

        model = load_mfcc_feature_extractor()
        embed_func = get_mfcc_feature_embeds
    else:
        # CLAP metric (reference: run_optim.py:541-549): the loader serves
        # the native JAX tower when a converted checkpoint / HF cache is
        # available (device-traceable fitness) and falls back to the
        # host-side torch handle; raises with instructions otherwise.
        from st_ito_tpu.models.clap_laion import ClapLaionModel
        from st_ito_tpu.models.registry import get_clap_embeds, load_clap_model

        model = load_clap_model()
        if isinstance(model, ClapLaionModel):
            from st_ito_tpu.models.clap_laion import (
                get_clap_laion_embeds_midside as embed_func,
            )
        else:
            def embed_func(x, m, sr, **kw):
                return get_clap_embeds(x, m, sr, midside=True)

            embed_func.host_side = True

    # ---- target ----
    if args.target in (None, "None", "none"):
        if args.algorithm == "autodiff":
            from st_ito_tpu import proc

            w_target = np.full(proc.NUM_COMPLEX_PARAMS, 0.5, np.float32)
            w_target[:3] = [0.1, 0.5, 0.2]
            w_target[15:18] = [0.7, 0.5, 0.2]
            w_target[18:24] = [0.8, 0.3, 0.1, 0.1, 0.5, 0.1]
            target_audio = jax.jit(
                lambda a, w: proc.apply_complex_autodiff_processor(
                    a[None], w[None], sample_rate)[0]
            )(input_audio, jnp.asarray(w_target))
        else:
            from st_ito_tpu.chain import build_render_fn

            w_target = synthetic_target_params(chain)
            render = jax.jit(
                build_render_fn(chain, sample_rate, input_audio.shape[0]))
            target_audio = render(jnp.asarray(w_target, jnp.float32), input_audio)
        target_name = "synthetic_target"
    else:
        target_np, target_sr = load_audio(args.target)
        target_audio = jnp.asarray(target_np)
        if target_sr != sample_rate:
            target_audio = jax.jit(
                lambda a: resample(a, target_sr, sample_rate))(target_audio)
        target_name = os.path.basename(args.target).replace(".wav", "")

    input_audio = input_audio[:, : args.max_length]
    target_audio = target_audio[:, : args.max_length]

    run_name = f"{input_name}_to_{target_name}_{args.algorithm}"
    run_dir = os.path.join(args.output_dir, run_name)
    os.makedirs(run_dir, exist_ok=True)

    save_audio(os.path.join(run_dir, "input_audio.wav"),
               np.asarray(input_audio), sample_rate)
    t = np.asarray(target_audio)
    save_audio(os.path.join(run_dir, "target_audio.wav"),
               t / max(np.abs(t).max(), 1e-8), sample_rate)

    mesh = None
    if args.num_devices and args.num_devices > 1:
        from st_ito_tpu.parallel import make_mesh

        mesh = make_mesh(args.num_devices, "pop")

    # ---- run ----
    sigma0 = args.sigma0
    if args.algorithm == "autodiff":
        result = run_autodiff(
            input_audio[None], target_audio[None], sample_rate, model,
            embed_func=embed_func, lr=1e-2, n_iters=args.max_iters,
            dropout=args.dropout, seed=args.seed,
        )
    else:
        es_func = run_staged_es if args.staged else run_es
        result = es_func(
            input_audio[None], target_audio[None], sample_rate, chain, model,
            embed_func=embed_func, max_iters=args.max_iters,
            popsize=args.popsize, find_w0=True, sigma0=sigma0,
            distance="cosine", dropout=args.dropout, savepop=args.savepop,
            normalize_stages=args.normalize_stages, run_dir=run_dir,
            seed=args.seed, mesh=mesh, chunked=args.chunked,
            gens_per_dispatch=args.gens_per_dispatch,
            pop_microbatch=args.pop_microbatch,
        )

    # ---- save results ----
    out = np.asarray(result["output_audio"])[0]
    out = out / max(np.abs(out).max(), 1e-8)
    save_audio(os.path.join(run_dir, f"output_audio_sigma={sigma0:0.2f}.wav"),
               out, sample_rate)

    with open(os.path.join(run_dir, f"parameters_sigma={sigma0:0.2f}.json"), "w") as f:
        json.dump(result["params"], f, indent=4, default=float)

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6, 4))
        ax.plot(result["fval_history"], label=f"sigma0={sigma0:0.2f}")
        ax.set_xlabel("Iteration")
        ax.set_ylabel("Distance")
        ax.legend()
        fig.savefig(os.path.join(run_dir, "plot.png"), dpi=150)
        plt.close(fig)
    except Exception as e:  # plotting is best-effort
        print(f"plot skipped: {e}", file=sys.stderr)

    summary = {
        "run_dir": run_dir,
        "fopt": float(result.get("fopt", np.nan)),
        "time_elapsed": result.get("time_elapsed"),
        "total_evals": result.get("total_evals"),
        "evals_per_sec": result.get("evals_per_sec"),
    }
    print(json.dumps(summary, indent=2, default=float))
    return result


if __name__ == "__main__":
    main()

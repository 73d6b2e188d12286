"""Headline benchmark: full effect-chain candidate evaluations per second.

One candidate evaluation = render the 5-effect basic chain (EQ -> compressor
-> distortion -> delay -> Freeverb, 36 params) on stereo 262144-sample
48 kHz audio AND embed the result with the AFx-Rep Cnn14 + cosine fitness —
i.e. everything inside the reference's CMA-ES inner loop
(reference: st_ito/style_transfer.py:474-573).

Measured through the REAL optimization loop: run_es with the
device-resident CMA-ES (gens_per_dispatch blocks), so the number includes
the ask/tell update, early-stop bookkeeping and per-block host fetches —
not just raw fitness dispatches.

Baseline target (BASELINE.json): >= 1024 evals/sec on TPU v5e-8 with
embedding cosine within 1e-3 of the PyTorch reference. vs_baseline is
value / 1024.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
"""

import argparse
import os
import json
import sys


import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true",
                        help="small shapes on CPU for smoke testing")
    parser.add_argument("--popsize", type=int, default=0,
                        help="0 = auto (512 per device)")
    parser.add_argument("--iters", type=int, default=240,
                        help="timed ES generations (multiple of --block)")
    parser.add_argument("--block", type=int, default=120,
                        help="generations per device dispatch; large "
                        "blocks amortize tunneled-relay round-trip "
                        "latency (measured 0.1-1 s/round-trip on bad "
                        "days vs 3-5 ms on good ones) so the recorded "
                        "number tracks device throughput, not relay "
                        "weather (block 60 -> 120 measured +3% wall)")
    parser.add_argument("--profile", type=str, default="",
                        help="write a jax.profiler trace to this directory")
    parser.add_argument("--length", type=int, default=0,
                        help="0 = auto (262144, or 32768 with --quick)")
    parser.add_argument("--fft-mode", type=str, default="auto",
                        choices=["auto", "mx", "fused", "mega", "mega2",
                                 "xla"],
                        help="fused-LTI FFT implementation (fused = the "
                        "two-stage Pallas VMEM kernel, mega = the "
                        "glue-free Pallas FFT pair, mega2 = forward FFT "
                        "+ response fused into ONE kernel; A/B vs mx)")
    args = parser.parse_args()

    if args.quick:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from st_ito_tpu.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from st_ito_tpu.chain import basic_chain
    from st_ito_tpu.ito import run_es
    from st_ito_tpu.models.registry import load_param_model
    from st_ito_tpu.parallel import make_mesh

    n_dev = len(jax.devices())
    # 512/device amortizes fixed per-generation overheads best on v5e
    # (256: 725 evals/s, 512: 856, 768: 842, 1024: OOM — measured r2)
    popsize = args.popsize or (8 if args.quick else 512 * n_dev)
    T = args.length or (32768 if args.quick else 262144)
    sample_rate = 48000
    if args.quick:  # smoke run: the long-block defaults are TPU-sized and
        # a 1-core host executes ~45 s per pop-16 generation at 32768
        # samples — cap the smoke at ~1 min of compute, it only has to
        # prove the ES block runs end-to-end
        args.iters = min(args.iters, 4)
        args.block = min(args.block, 2)
    block = max(1, min(args.block, args.iters))
    iters = max(block, (args.iters // block) * block)

    chain = basic_chain()
    # STITO_BENCH_ENCODER: optional trained-encoder npz (e.g. the one
    # scripts/regen_pst_artifact.sh trains) — gives the benched objective a
    # real landscape instead of the random-weight degenerate cosine. NOT
    # the default: the recorded headline series uses the faithful
    # random-weight Cnn14 config so numbers stay comparable across rounds.
    enc = os.environ.get("STITO_BENCH_ENCODER", "")
    model = load_param_model(ckpt_path=enc or None, allow_random=True)
    mesh = make_mesh(n_dev, "pop") if n_dev > 1 else None

    rng = np.random.default_rng(0)
    if enc:
        # program material, not white noise: a broadband noise floor under
        # enveloped harmonic partials — white noise swamps effect
        # differences in any spectral embedding (first-generation best
        # cosine was 0.999999 on noise even with a trained encoder)
        t = np.arange(T, dtype=np.float32) / sample_rate
        sig = 0.05 * rng.standard_normal((2, T)).astype(np.float32)
        for f0, amp in ((110.0, 0.3), (220.0, 0.22), (331.0, 0.15),
                        (551.0, 0.1), (1103.0, 0.07)):
            env = (0.5 + 0.5 * np.sin(2 * np.pi * (0.31 * amp + 0.13) * t)
                   ).astype(np.float32)
            sig += amp * env * np.sin(2 * np.pi * f0 * t
                                      + rng.uniform(0, 6.28))
        x = jnp.asarray(sig[None] * 0.5)
    else:
        x = jnp.asarray(
            rng.standard_normal((1, 2, T)).astype(np.float32) * 0.5)
    if enc:
        # trained-encoder mode: make the target a STYLED render of x so the
        # optimized objective has a real landscape (fopt then reports a
        # meaningful best-cosine, not the noise-to-noise degenerate -1)
        from st_ito_tpu.chain import build_render_fn

        w_t = jnp.asarray(rng.uniform(0.25, 0.75, chain.num_params)
                          .astype(np.float32))
        y = jax.jit(lambda w, xx: build_render_fn(chain, sample_rate, 2)(
            w, xx[0])[None])(w_t, x)
    else:
        y = jnp.asarray(rng.standard_normal((1, 2, T)).astype(np.float32)
                        * 0.5)

    common = dict(
        chain=chain, model=model, popsize=popsize, find_w0=False,
        sigma0=0.33, crop_len=T, seed=0, mesh=mesh, verbose=False,
        early_stop_patience=10**9, gens_per_dispatch=block,
        fft_mode=args.fft_mode,
    )
    # warmup: compiles the fitness program, the k-generation ES runner and
    # the final render once (all cached for the timed run)
    run_es(x, y, sample_rate, max_iters=block, **common)

    if args.profile:
        jax.profiler.start_trace(args.profile)
    res = run_es(x, y, sample_rate, max_iters=iters, **common)
    if args.profile:
        jax.profiler.stop_trace()

    evals_per_sec = res["evals_per_sec"]
    print(json.dumps({
        "metric": "candidate_evals_per_sec",
        "value": round(evals_per_sec, 2),
        "unit": "evals/s",
        "vs_baseline": round(evals_per_sec / 1024.0, 4),
    }))
    print(
        f"# devices={n_dev} popsize={popsize} T={T} iters={iters} "
        f"block={block} elapsed={res['time_elapsed']:.2f}s "
        f"fopt={res['fopt']:+.4f} platform={jax.devices()[0].platform}"
        + (f" encoder={enc} f_first={res['fval_history'][0]:+.6f} "
           f"f_best={res['fopt']:+.6f}" if enc else ""),
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()

"""Headline benchmark: full effect-chain candidate evaluations per second.

One candidate evaluation = render the 5-effect basic chain (EQ -> compressor
-> distortion -> delay -> Freeverb, 36 params) on stereo 262144-sample
48 kHz audio AND embed the result with the AFx-Rep Cnn14 + cosine fitness —
i.e. everything inside the reference's CMA-ES inner loop
(reference: st_ito/style_transfer.py:474-573).

Baseline target (BASELINE.json): >= 1024 evals/sec on TPU v5e-8 with
embedding cosine within 1e-3 of the PyTorch reference. vs_baseline is
value / 1024.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
"""

import argparse
import json
import sys
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true",
                        help="small shapes on CPU for smoke testing")
    parser.add_argument("--popsize", type=int, default=0,
                        help="0 = auto (512 per device)")
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--length", type=int, default=0,
                        help="0 = auto (262144, or 65536 with --quick)")
    parser.add_argument("--profile", type=str, default="",
                        help="write a jax.profiler trace to this directory")
    args = parser.parse_args()

    if args.quick:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from st_ito_tpu.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from st_ito_tpu.chain import basic_chain, build_render_fn
    from st_ito_tpu.ito import make_fitness_fn
    from st_ito_tpu.models.registry import get_param_embeds, load_param_model
    from st_ito_tpu.parallel import make_mesh

    n_dev = len(jax.devices())
    # 512/device amortizes fixed per-generation overheads best on v5e
    # (256: 725 evals/s, 512: 856, 768: 842, 1024: OOM — measured r2)
    popsize = args.popsize or (16 if args.quick else 512 * n_dev)
    T = args.length or (32768 if args.quick else 262144)
    sample_rate = 48000

    chain = basic_chain()
    model = load_param_model(allow_random=True)
    mesh = make_mesh(n_dev, "pop") if n_dev > 1 else None
    fitness = make_fitness_fn(chain, model, sample_rate, num_channels=2,
                              mesh=mesh)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, T)).astype(np.float32) * 0.5)
    target = get_param_embeds(x[None], model, sample_rate)
    W = jnp.asarray(rng.random((popsize, chain.num_params)).astype(np.float32))
    key = jax.random.PRNGKey(0)

    # warmup / compile
    fvals = np.asarray(fitness(W, x, target, None, key))

    # Per-iteration host fetch of the fitness values — exactly what the
    # CMA-ES ask/tell loop does. (block_until_ready alone is unreliable on
    # tunneled backends; fetching the result is the honest sync point.)
    Ws = [jnp.asarray(rng.random((popsize, chain.num_params)).astype(np.float32))
          for _ in range(args.iters)]
    if args.profile:
        jax.profiler.start_trace(args.profile)
    t0 = time.time()
    for i in range(args.iters):
        fvals = np.asarray(fitness(Ws[i], x, target, None, key))
    elapsed = time.time() - t0
    if args.profile:
        jax.profiler.stop_trace()

    evals_per_sec = popsize * args.iters / elapsed
    print(json.dumps({
        "metric": "candidate_evals_per_sec",
        "value": round(evals_per_sec, 2),
        "unit": "evals/s",
        "vs_baseline": round(evals_per_sec / 1024.0, 4),
    }))
    print(
        f"# devices={n_dev} popsize={popsize} T={T} iters={args.iters} "
        f"elapsed={elapsed:.2f}s platform={jax.devices()[0].platform}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()

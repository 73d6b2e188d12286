"""Chunked long-audio ES at realistic scale on real TPU (BASELINE config 5
beyond the unit test): a >=60 s stereo input optimized on its FULL length
via overlap-chunked embeddings (the reference instead crops one window,
st_ito/style_transfer.py:505-518), popsize >=128, with wall-clock and a
no-recompile assertion across generations.

    python examples/chunked_es_tpu.py [--out examples/chunked_es_tpu.json]
"""

import argparse
import json
import logging
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _HERE)
sys.path.insert(0, os.path.dirname(_HERE))
from train_demo import synth_sources  # noqa: E402


class _CompileCounter(logging.Handler):
    def __init__(self):
        super().__init__()
        self.events = []

    def emit(self, record):
        msg = record.getMessage()
        if "Compiling" in msg or "compil" in msg.lower():
            self.events.append((time.time(), msg[:120]))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="examples/chunked_es_tpu.json")
    parser.add_argument("--seconds", type=float, default=60.0)
    parser.add_argument("--popsize", type=int, default=128)
    parser.add_argument("--max-iters", type=int, default=24)
    parser.add_argument("--gens-per-dispatch", type=int, default=4)
    parser.add_argument("--crop-len", type=int, default=262144)
    parser.add_argument(
        "--encoder", default="examples/pst_demo_full/run/encoder.npz",
        help="trained encoder npz (produced by scripts/regen_pst_artifact.sh)"
             " — gives the run a REAL objective landscape; falls back to a"
             " random-weight faithful Cnn14 when the file is absent")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from st_ito_tpu.chain import basic_chain, build_render_fn
    from st_ito_tpu.compile_cache import enable_persistent_cache
    from st_ito_tpu.ito import run_es
    from st_ito_tpu.models.registry import get_param_embeds, load_param_model

    enable_persistent_cache()
    sr = 48000
    T = int(args.seconds * sr)

    # >=60 s of varied synthetic program material (4 stitched sources)
    srcs = synth_sources(n=8, T=T // 4 + 1, seed=3)
    x = np.concatenate([s[..., : T // 4] for s in srcs[:4]], axis=-1)
    x = jnp.asarray(x[None])  # (1, 2, T)
    print(f"input: {x.shape[-1] / sr:.1f} s stereo @ {sr} Hz")

    chain = basic_chain()
    enc = args.encoder if os.path.isfile(args.encoder) else None
    model = load_param_model(ckpt_path=enc, allow_random=True)
    print(f"encoder: {'trained ' + enc if enc else 'random weights'}")
    # jit the whole target prep: build_render_fn returns an UNJITTED pure
    # function and eager op-by-op dispatch is unimplemented on the relay
    # TPU backend (errors surface asynchronously at the next fetch)
    render = jax.jit(
        lambda w, xx: build_render_fn(chain, sr, 2)(w, xx[0])[None])
    rng = np.random.default_rng(0)
    w_target = jnp.asarray(
        rng.uniform(0.25, 0.75, chain.num_params).astype(np.float32))
    y_target = render(w_target, x)

    counter = _CompileCounter()
    jax.config.update("jax_log_compiles", True)
    logging.getLogger("jax").addHandler(counter)
    logging.getLogger("jax").setLevel(logging.WARNING)
    logging.getLogger("jax._src.dispatch").setLevel(logging.WARNING)
    logging.getLogger("jax._src.interpreters.pxla").setLevel(logging.WARNING)

    t0 = time.time()
    result = run_es(
        x, y_target, sr, chain, model, max_iters=args.max_iters,
        popsize=args.popsize, sigma0=0.3, crop_len=args.crop_len,
        chunked=True, find_w0=False, seed=0, verbose=True,
        gens_per_dispatch=args.gens_per_dispatch,
    )
    wall = time.time() - t0

    # Every LOOP compile must happen during the first dispatch block: a
    # chunked run that recompiled per generation/block would show compile
    # STARTS of population-shaped programs spread across the whole window.
    # Three kinds of late events are legitimate and excluded: "Finished..."
    # stragglers of compiles that started in block 1 (the device-ES block
    # takes ~70 s to compile through the relay), the end-of-run
    # full-length output render (a fresh jit instance at single-candidate
    # shapes, by design), and its scalar/broadcast glue.
    n_blocks = -(-args.max_iters // args.gens_per_dispatch)
    first_block_end = t0 + (wall / n_blocks) * 1.5
    late_all = [(t - t0, m) for t, m in counter.events if t > first_block_end]
    late_bad = [
        (dt, m) for dt, m in late_all
        if m.startswith("Compiling")
        and ("jit(run)" in m or f"float32[{args.popsize}," in m
             or f"float32[{args.popsize}]" in m)
    ]
    assert not late_bad, f"loop recompiles after the first block: {late_bad}"

    report = {
        "seconds": x.shape[-1] / sr,
        "popsize": args.popsize,
        "max_iters": args.max_iters,
        "gens_per_dispatch": args.gens_per_dispatch,
        "crop_len": args.crop_len,
        "wall_clock_s": round(wall, 2),
        "evals_per_sec": round(result["evals_per_sec"], 2),
        "fopt": float(result["fopt"]),
        "f_identity_gap": float(result["fval_history"][0]
                                - result["fopt"]),
        "output_len": int(np.asarray(result["output_audio"]).shape[-1]),
        "encoder": ("trained:" + args.encoder) if enc else "random",
        "compile_events": len(counter.events),
        "late_compile_events": len(late_all),
        "late_loop_recompiles": 0,
        "platform": jax.devices()[0].platform,
        "fval_history": [round(float(v), 6)
                         for v in result["fval_history"]],
    }
    assert report["output_len"] == x.shape[-1], "output must cover FULL length"
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items()
                      if k != "fval_history"}, indent=2))


if __name__ == "__main__":
    main()

"""Effect/chain introspection + smoke test
(reference: scripts/data/vst_info.py, vst_test.py).

    python -m st_ito_tpu.cli.effect_info                    # list registry
    python -m st_ito_tpu.cli.effect_info parametric_eq      # parameters
    python -m st_ito_tpu.cli.effect_info parametric_eq --test  # random render
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("effect", nargs="?", default=None)
    parser.add_argument("--test", action="store_true",
                        help="render random noise through the effect with "
                             "random parameters and report stats")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    from st_ito_tpu.chain import EFFECT_REGISTRY

    if args.effect is None:
        print("registered effects:")
        for name in sorted(EFFECT_REGISTRY):
            stage = EFFECT_REGISTRY[name]()
            kind = ("LTI (fusable)" if stage.response_fn is not None
                    else "nonlinear")
            print(f"  {name:16s} {len(stage.params):2d} params  "
                  f"{stage.num_channels}ch  {kind}")
        return

    stage = EFFECT_REGISTRY[args.effect]()
    print(f"{stage.name} ({args.effect}), num_channels={stage.num_channels}")
    for p in stage.params:
        print(f"  {p.name:28s} [{p.min_value:10.2f}, {p.max_value:10.2f}] "
              f"default={p.default:8.2f} (raw {p.default_raw:.3f})")

    if args.test:
        import numpy as np
        import jax
        import jax.numpy as jnp

        from st_ito_tpu.chain import ChainSpec
        from st_ito_tpu.chain.executor import build_render_fn

        chain = ChainSpec(stages=(stage,), with_bypass=False)
        render = jax.jit(build_render_fn(chain, 48000, 2,
                                         peak_normalize_output=False))
        rng = np.random.default_rng(args.seed)
        x = jnp.asarray(rng.standard_normal((2, 48000)).astype(np.float32) * 0.3)
        w = jnp.asarray(rng.random(chain.num_params).astype(np.float32))
        y = np.asarray(render(w, x))
        print(f"\nsmoke test (random params, 1 s noise):")
        print(f"  finite: {np.isfinite(y).all()}")
        print(f"  in  rms {np.sqrt(np.mean(np.asarray(x)**2)):.4f} "
              f"peak {np.abs(np.asarray(x)).max():.4f}")
        print(f"  out rms {np.sqrt(np.mean(y**2)):.4f} peak {np.abs(y).max():.4f}")


if __name__ == "__main__":
    main()

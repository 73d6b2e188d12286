"""Probe which ops Mosaic lowers on real TPU (temp tooling, not committed)."""
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

X = np.arange(512 * 1024, dtype=np.float32).reshape(512, 1024)


def run(name, body, out_shape=None):
    out_shape = out_shape or X.shape

    def kernel(x_ref, y_ref):
        y_ref[...] = body(x_ref[...])

    try:
        y = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        )(jnp.asarray(X))
        y = np.asarray(y)
        print(f"OK   {name}: sum={y.sum():.1f}")
        return y
    except Exception as e:
        msg = str(e).split("\n")[0][:120]
        print(f"FAIL {name}: {msg}")
        return None


run("flip lanes (axis=-1)", lambda x: jnp.flip(x, axis=-1))
run("flip sublanes (axis=0)", lambda x: jnp.flip(x, axis=0))
run("roll lanes by 1", lambda x: jnp.roll(x, 1, axis=-1))
run("roll sublanes by 1", lambda x: jnp.roll(x, 1, axis=0))
run("concat lanes", lambda x: jnp.concatenate([x[:, 1:], x[:, :1]], axis=1))
run("concat sublanes", lambda x: jnp.concatenate([x[1:], x[:1]], axis=0))
run("iota 2d", lambda x: x + jax.lax.broadcasted_iota(jnp.float32, x.shape, 1))
run("dyn slice lanes", lambda x: jax.lax.dynamic_slice(x, (0, 3), (512, 512)),
    out_shape=(512, 512))
EOF = None

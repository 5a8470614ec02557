"""Probe which packed-i16 ops Mosaic can legalize in a Pallas kernel."""

import functools

import numpy as np
import jax
import _cache  # noqa: F401
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.default_backend(), flush=True)

a = jnp.asarray(np.random.default_rng(0).integers(0, 256, (32, 32, 128)), jnp.int16)
b = jnp.asarray(np.random.default_rng(1).integers(0, 256, (32, 32, 128)), jnp.int16)


def run(tag, body):
    def kern(a_ref, b_ref, o_ref):
        o_ref[...] = body(a_ref[...], b_ref[...])

    try:
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((16, 16, 128), jnp.int16),
        )(a, b)
        ref = body(np.asarray(a, np.int32).astype(np.int16),
                   np.asarray(b, np.int32).astype(np.int16))
        ok = np.array_equal(np.asarray(out), np.asarray(ref))
        print(f"{tag:40s} OK match={ok}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{tag:40s} FAIL {type(e).__name__}: {str(e)[:120]}", flush=True)


def pool(x):
    return x.reshape(16, 2, 16, 2, 128).sum(axis=(1, 3))


run("maxmin+pool i16", lambda x, y: pool(jnp.maximum(x, y) - jnp.minimum(x, y)))
run("sub+pool i16", lambda x, y: pool(x - y))
run("abs i16", lambda x, y: pool(jnp.abs(x - y)))
run("where+pool i16", lambda x, y: pool(jnp.where(x > y, x - y, y - x)))
run("maxmin only -> slice", lambda x, y: (jnp.maximum(x, y) - jnp.minimum(x, y))[:16, :16])

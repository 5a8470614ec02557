"""Probe: can the pooled kernel store to compact K-slot tables?

Pattern: grid (chunk, dy); out block (K, s, 128) revisited across dy steps;
per (dy, dx-unrolled) a STATIC slot index k is written iff SMEM-prefetched
delta values match the runtime (dy, dx) scalars -> @pl.when with a scalar
predicate and a static store index.
"""

import numpy as np
import _cache  # noqa: F401
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import functools

K, SIDE, S, NCH = 8, 5, 16, 2


def kernel(dv_ref, x_ref, out_ref):
    ch = pl.program_id(0)
    dy = pl.program_id(1)

    @pl.when(dy == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    for dx in range(SIDE):
        val = x_ref[0, dx].astype(jnp.int32) + dy  # (S, 128)
        for k in range(K):
            match = (dv_ref[ch, k, 0] == dy) & (dv_ref[ch, k, 1] == dx)

            @pl.when(match)
            def _(k=k, val=val):
                out_ref[0, k] = val


def run():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 100, size=(NCH, SIDE, S, 128), dtype=np.int32))
    # per-chunk slot lists: slot k holds delta (dy, dx)
    dv = np.zeros((NCH, K, 2), np.int32)
    for c in range(NCH):
        picks = rng.choice(SIDE * SIDE, size=K, replace=False)
        dv[c, :, 0] = picks // SIDE
        dv[c, :, 1] = picks % SIDE
    dvj = jnp.asarray(dv)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NCH, SIDE),
        in_specs=[
            pl.BlockSpec((1, SIDE, S, 128), lambda c, dy, sc: (c, dy, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, K, S, 128), lambda c, dy, sc: (c, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((NCH, K, S, 128), jnp.int32),
    )(dvj, x)
    out = np.asarray(out)
    want = np.zeros_like(out)
    for c in range(NCH):
        for k in range(K):
            dy, dx = dv[c, k]
            want[c, k] = np.asarray(x)[c, dx] + dy
    np.testing.assert_array_equal(out, want)
    print("slot-store probe OK")


if __name__ == "__main__":
    run()

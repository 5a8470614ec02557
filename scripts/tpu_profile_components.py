"""Per-component TPU timing: search scan vs regularizer sweeps at each bs."""

import time

import numpy as np
import jax
import _cache  # noqa: F401  (persistent compile cache)
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from blockbasedmotionestimation_tpu.ops.search import block_search_level
from blockbasedmotionestimation_tpu.ops.regularize import regularize_sweep

H, W = 1088, 1920
rng = np.random.default_rng(0)
im1 = jnp.asarray(rng.integers(0, 256, size=(H, W), dtype=np.uint8))
im2 = jnp.asarray(rng.integers(0, 256, size=(H, W), dtype=np.uint8))


def timeit(fn, *args, n=3, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args, **kw)
        jax.block_until_ready(out)
    return (time.time() - t0) / n


bs, ss = 32, 64
pred = jnp.zeros((H // bs, W // bs, 2), dtype=jnp.float32)
dt = timeit(block_search_level, im1, im2, pred, bs, ss)
print(f"search bs={bs} ss={ss}: {dt*1000:.1f} ms", flush=True)

for cur in (32, 16, 8, 4, 2):
    grid = jnp.zeros((H // cur, W // cur, 2), dtype=jnp.float32)
    for mode in ("fourcolor", "jacobi"):
        dt = timeit(
            regularize_sweep, im1, im2, grid, cur,
            jnp.float32(16.0), jnp.float32(1.0), mode, n=2,
        )
        print(f"sweep bs={cur} {mode}: {dt*1000:.1f} ms", flush=True)

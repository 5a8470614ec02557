"""Which component's REMOTE compile is slow? Time each jit separately."""

import time

import numpy as np
import jax
import _cache  # noqa: F401  (persistent compile cache)
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from blockbasedmotionestimation_tpu.ops.search import block_search_level
from blockbasedmotionestimation_tpu.ops.regularize import run_schedule, regularize_sweep

H, W = 1088, 1920
rng = np.random.default_rng(0)
im1 = jax.device_put(jnp.asarray(rng.integers(0, 256, size=(H, W), dtype=np.uint8)))
im2 = jax.device_put(jnp.asarray(rng.integers(0, 256, size=(H, W), dtype=np.uint8)))
_ = np.asarray(im1[0, 0])


def stamp(tag, t0):
    print(f"{tag}: {time.time()-t0:.1f}s", flush=True)


bs, ss = 32, 64
pred = jnp.zeros((H // bs, W // bs, 2), dtype=jnp.float32)

t0 = time.time()
g = block_search_level(im1, im2, pred, bs, ss)
_ = float(np.asarray(g[0, 0, 0]))
stamp("search compile+run", t0)

t0 = time.time()
out = regularize_sweep(im1, im2, g, bs, jnp.float32(16.0), jnp.float32(1.0), "fourcolor")
_ = float(np.asarray(out[0, 0, 0]))
stamp("one static fourcolor sweep compile+run", t0)

sched1 = jax.jit(
    lambda a, b, gg: run_schedule(a, b, gg, 32, 16.0, 1, "fourcolor"),
)
t0 = time.time()
out = sched1(im1, im2, g)
_ = float(np.asarray(out[0, 0, 0]))
stamp("full schedule (1 sweep/round, 5 rounds) compile+run", t0)

t0 = time.time()
out = sched1(im1, im2, g)
_ = float(np.asarray(out[0, 0, 0]))
stamp("full schedule repeat (cached)", t0)

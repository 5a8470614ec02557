"""Consolidated TPU measurement: search impls, schedule, full bench."""

import time

import numpy as np
import jax
import _cache  # noqa: F401
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from blockbasedmotionestimation_tpu.config import MotionConfig
from blockbasedmotionestimation_tpu.models.engine import estimate_flow
from blockbasedmotionestimation_tpu.ops.search import block_search_level
from blockbasedmotionestimation_tpu.ops.windowed import windowed_schedule

H, W = 1088, 1920
bs, ss = 32, 64
rng = np.random.default_rng(0)
im1 = jax.device_put(jnp.asarray(rng.integers(0, 256, size=(H, W), dtype=np.uint8)))
im2 = jax.device_put(jnp.asarray(rng.integers(0, 256, size=(H, W), dtype=np.uint8)))
pred = jnp.zeros((H // bs, W // bs, 2), dtype=jnp.float32)


def sync(x):
    return float(np.asarray(jnp.ravel(x)[0]))


def bench(tag, fn, n=3):
    t0 = time.time()
    out = fn()
    sync(out)
    print(f"{tag}: compile+first {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(n):
        sync(fn())
    print(f"{tag}: {(time.time()-t0)/n*1000:.1f} ms", flush=True)
    return out

a = bench("search xla lane-major",
          lambda: block_search_level(im1, im2, pred, bs, ss, impl="xla"))
try:
    b = bench("search pallas",
              lambda: block_search_level(im1, im2, pred, bs, ss, impl="pallas"))
    print("pallas == xla:", np.array_equal(np.asarray(a), np.asarray(b)), flush=True)
except Exception as e:  # noqa: BLE001
    print(f"search pallas FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)

grid0 = block_search_level(im1, im2, pred, bs, ss)
sched = jax.jit(lambda x, y, g: windowed_schedule(x, y, g, bs, ss, 16.0, 2))
bench("windowed schedule lane-major", lambda: sched(im1, im2, grid0))

cfg = MotionConfig(block_sizes=(32,)*4, search_sizes=(64,)*4,
                   interp_factor=1, regularizer="windowed")
bench("full 4-level pipeline", lambda: estimate_flow(im1, im2, cfg)[0], n=3)

"""Throughput cost of rival windows at the bench shape (1080p, B=8)."""

import time

import _cache  # noqa: F401
import numpy as np

import jax
import jax.numpy as jnp

from blockbasedmotionestimation_tpu.config import MotionConfig
from blockbasedmotionestimation_tpu.models.engine import estimate_flow_batched

H, W, B = 1080, 1920, 4


def sync(x):
    return float(np.asarray(x[0, 0, 0]))


rng = np.random.default_rng(0)
base = rng.integers(0, 256, size=(B, H + 16, W + 16), dtype=np.uint8)
im1 = jax.device_put(jnp.asarray(base[:, :H, :W]))
im2 = jax.device_put(jnp.asarray(base[:, 5 : 5 + H, 9 : 9 + W]))

for name, cfg in (
    ("windowed", MotionConfig(interp_factor=1, regularizer="windowed")),
    ("rival", MotionConfig(interp_factor=1, regularizer="windowed",
                           rival_window=True)),
):
    flow, _ = estimate_flow_batched(im1, im2, cfg)
    sync(flow[0])
    t0 = time.time()
    iters = 5
    for _ in range(iters):
        flow, _ = estimate_flow_batched(im1, im2, cfg)
        sync(flow[0])
    dt = (time.time() - t0) / iters / B
    print(f"{name}: {dt * 1e3:.1f} ms/field = {1 / dt:.2f} fields/s", flush=True)

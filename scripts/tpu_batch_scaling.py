"""fields/s vs batch size for the production batched pipeline (bench workload)."""

import time

import numpy as np
import jax
import _cache  # noqa: F401
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from blockbasedmotionestimation_tpu.config import MotionConfig
from blockbasedmotionestimation_tpu.models.engine import estimate_flow_batched

H, W = 1080, 1920
cfg = MotionConfig(
    block_sizes=(32, 32, 32, 32),
    search_sizes=(64, 64, 64, 64),
    interp_factor=1,
    regularizer="windowed",
)
rng = np.random.default_rng(0)


def sync(x):
    return float(np.asarray(jnp.ravel(x)[0]))


for B in (2, 4, 6, 8):
    base = rng.integers(0, 256, size=(B, H + 16, W + 16), dtype=np.uint8)
    im1 = jax.device_put(jnp.asarray(base[:, :H, :W]))
    im2 = jax.device_put(jnp.asarray(base[:, 5:5 + H, 9:9 + W]))
    try:
        flow, _ = estimate_flow_batched(im1, im2, cfg)
        sync(flow)
        n = 5
        t0 = time.time()
        for _ in range(n):
            flow, _ = estimate_flow_batched(im1, im2, cfg)
            sync(flow)
        dt = (time.time() - t0) / n / B
        print(f"B={B}: {1.0/dt:6.2f} fields/s  ({dt*1000:.1f} ms/field)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"B={B}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)

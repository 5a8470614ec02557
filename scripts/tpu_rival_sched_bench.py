"""Throughput of per-level rival-radius schedules at the production bench.

Accuracy frontier is in EVAL_rival_sched.json; this times the same schedules
on the bench workload (1080p, B=8, windowed + r_store) so the shipped
default can sit on the measured accuracy/throughput frontier.

Run on the TPU from repo root: python scripts/tpu_rival_sched_bench.py
"""

import time

import numpy as np
import jax
import _cache  # noqa: F401
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from blockbasedmotionestimation_tpu.config import MotionConfig
from blockbasedmotionestimation_tpu.models.engine import estimate_flow_batched

B, H, W = 8, 1080, 1920
rng = np.random.default_rng(0)
base = rng.integers(0, 256, size=(B, H + 16, W + 16), dtype=np.uint8)
im1 = jax.device_put(jnp.asarray(base[:, :H, :W]))
im2 = jax.device_put(jnp.asarray(base[:, 5:5 + H, 9:9 + W]))

SCHEDULES = {
    "r8": 8,
    "sched_8_full_8_8": (8, None, 8, 8),
    "sched_12_full_8_8": (12, None, 8, 8),
}

for label, rr in SCHEDULES.items():
    cfg = MotionConfig(
        block_sizes=(32,) * 4, search_sizes=(64,) * 4, interp_factor=1,
        regularizer="windowed", rival_window=True, rival_radius=rr,
    )
    flow, _ = estimate_flow_batched(im1, im2, cfg)
    float(np.asarray(flow[0, 0, 0, 0]))
    t0 = time.time()
    iters = 6
    for _ in range(iters):
        flow, _ = estimate_flow_batched(im1, im2, cfg)
        float(np.asarray(flow[0, 0, 0, 0]))
    rate = iters * B / (time.time() - t0)
    print(f"{label}: {rate:.2f} fields/s", flush=True)

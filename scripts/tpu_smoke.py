"""TPU smoke/perf probe for the XLA engine path (run on the axon chip)."""

import sys
import time

import numpy as np

import jax
import _cache  # noqa: F401  (persistent compile cache)

print("backend:", jax.default_backend(), jax.devices(), flush=True)

from blockbasedmotionestimation_tpu.config import MotionConfig
from blockbasedmotionestimation_tpu.models import engine

levels = int(sys.argv[1]) if len(sys.argv) > 1 else 1
h, w = (int(sys.argv[2]), int(sys.argv[3])) if len(sys.argv) > 3 else (1080, 1920)
reg = sys.argv[4] if len(sys.argv) > 4 else "fourcolor"

cfg = MotionConfig(
    block_sizes=(32,) * levels,
    search_sizes=(64,) * levels,
    interp_factor=1,
    regularizer=reg,
)
rng = np.random.default_rng(0)
im1 = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
im2 = rng.integers(0, 256, size=(h, w), dtype=np.uint8)

t0 = time.time()
flow, p = engine.estimate_flow(im1, im2, cfg)
flow.block_until_ready()
print(f"compile+first run: {time.time()-t0:.2f}s  padded={p.padded_h}x{p.padded_w}", flush=True)

for i in range(3):
    t0 = time.time()
    flow, _ = engine.estimate_flow(im1, im2, cfg)
    flow.block_until_ready()
    dt = time.time() - t0
    print(f"run {i}: {dt*1000:.1f} ms  ({1.0/dt:.2f} fields/s)", flush=True)

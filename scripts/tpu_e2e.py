"""End-to-end TPU timing; sync via tiny device->host fetch (axon backend is
fully async - block_until_ready does not wait for remote execution)."""

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

print("backend:", jax.default_backend(), flush=True)

from blockbasedmotionestimation_tpu.config import MotionConfig
from blockbasedmotionestimation_tpu.models.engine import estimate_flow

H, W = 1080, 1920
rng = np.random.default_rng(0)
base = rng.integers(0, 256, size=(H + 16, W + 16), dtype=np.uint8)
im1 = jax.device_put(jnp.asarray(base[:H, :W]))
im2 = jax.device_put(jnp.asarray(base[5:5 + H, 9:9 + W]))
_ = np.asarray(im1[0, 0])  # force upload

import sys
reg = sys.argv[1] if len(sys.argv) > 1 else "windowed"
cfg = MotionConfig(block_sizes=(32,)*4, search_sizes=(64,)*4,
                   interp_factor=1, regularizer=reg)


def sync(x):
    return float(np.asarray(x[0, 0, 0]))


t0 = time.time()
flow, _p = estimate_flow(im1, im2, cfg)
sync(flow)
print(f"compile+first(sync): {time.time()-t0:.2f}s", flush=True)

for i in range(4):
    t0 = time.time()
    flow, _p = estimate_flow(im1, im2, cfg)
    sync(flow)
    dt = time.time() - t0
    print(f"run {i}: {dt*1000:.1f} ms ({1/dt:.2f} fields/s)", flush=True)

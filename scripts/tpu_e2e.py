"""End-to-end TPU timing with device-resident inputs (no tunnel I/O in loop)."""

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

t0 = time.time()
im1 = jax.device_put(jnp.asarray(base[:H, :W]))
im2 = jax.device_put(jnp.asarray(base[5:5 + H, 9:9 + W]))
jax.block_until_ready((im1, im2))
print(f"host->device 2x2MB: {time.time()-t0:.2f}s", flush=True)

cfg = MotionConfig(block_sizes=(32,)*4, search_sizes=(64,)*4,
                   interp_factor=1, regularizer="fourcolor")

t0 = time.time()
flow, _ = estimate_flow(im1, im2, cfg)
jax.block_until_ready(flow)
print(f"compile+first: {time.time()-t0:.2f}s", flush=True)

for i in range(5):
    t0 = time.time()
    flow, _ = estimate_flow(im1, im2, cfg)
    jax.block_until_ready(flow)
    dt = time.time() - t0
    print(f"run {i}: {dt*1000:.1f} ms ({1/dt:.2f} fields/s)", flush=True)

t0 = time.time()
f_np = np.asarray(flow)
print(f"device->host 16.7MB: {time.time()-t0:.2f}s  mean|u|={np.abs(f_np[...,0]).mean():.2f}", flush=True)

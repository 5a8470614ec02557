"""Differential stubbing of the batched bench program (B=4, 1080p).

Monkeypatches one component at a time with a shape-preserving stub (kept
input-dependent so XLA cannot DCE upstream producers we are not measuring),
re-jits the whole batched pipeline, and reports full - stubbed = the
component's cost inside the real program.
"""

import time

import numpy as np
import jax
import _cache  # noqa: F401  (persistent compile cache)
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from blockbasedmotionestimation_tpu.config import MotionConfig
from blockbasedmotionestimation_tpu.models import engine
from blockbasedmotionestimation_tpu.ops import resample, search, windowed

H, W = 1080, 1920
B = 8
cfg = MotionConfig(
    block_sizes=(32, 32, 32, 32),
    search_sizes=(64, 64, 64, 64),
    interp_factor=1,
    regularizer="windowed",
)
rng = np.random.default_rng(0)
base = rng.integers(0, 256, size=(B, H + 16, W + 16), dtype=np.uint8)
im1 = jax.device_put(jnp.asarray(base[:, :H, :W]))
im2 = jax.device_put(jnp.asarray(base[:, 5:5 + H, 9:9 + W]))


def sync(x):
    return float(np.asarray(jnp.ravel(x)[0]))


def run(tag):
    # fresh jit cache per variant: the public wrapper caches on (cfg, p)
    p = engine.pad_ops.compute_padding(H, W, cfg)
    fn = jax.jit(
        lambda a, b: jax.vmap(
            lambda x, y: engine.estimate_flow_padded(
                engine.pad_ops.pad_frame(x, p), engine.pad_ops.pad_frame(y, p), cfg
            )
        )(a, b)
    )
    sync(fn(im1, im2))
    t0 = time.time()
    n = 5
    for _ in range(n):
        sync(fn(im1, im2))
    dt = (time.time() - t0) / n / B
    print(f"{tag:28s} {dt*1000:7.1f} ms/field", flush=True)
    return dt


full = run("full")

# --- stub the pyramid's Gaussian blur: strided decimate only -----------------
real_pyr = resample.build_pyramid
def stub_pyr(im, levels):
    out = [im]
    for _ in range(levels - 1):
        out.append(out[-1][::2, ::2])
    return out
resample.build_pyramid = stub_pyr
engine.resample.build_pyramid = stub_pyr
no_pyr = run("pyramid -> decimate")
resample.build_pyramid = real_pyr
engine.resample.build_pyramid = real_pyr

# --- stub the block search: prediction passthrough ----------------------------
real_search = engine.block_search_level
def stub_search(im1, im2, pred, bs, ss, **kw):
    bias = (im1[0, 0].astype(jnp.float32) - im2[0, 0].astype(jnp.float32)) * 0.0
    return jnp.trunc(pred) + bias
engine.block_search_level = stub_search
no_search = run("search -> passthrough")
engine.block_search_level = real_search

# --- stub the windowed schedule: pure subdivision to stride 1 -----------------
real_sched = engine.windowed_schedule
def stub_sched(im1, im2, grid, bs, ss, lam0, sweeps, **kw):
    bias = (im1[0, 0].astype(jnp.float32) - im2[0, 0].astype(jnp.float32)) * 0.0
    out = grid
    cur = bs
    while cur > 1:
        out = engine.subdivide(out)
        cur //= 2
    return out + bias
engine.windowed_schedule = stub_sched
no_sched = run("windowed -> subdivide")
engine.windowed_schedule = real_sched

# --- stub both search and schedule: leaves pyramid + transfer + glue ----------
engine.block_search_level = stub_search
engine.windowed_schedule = stub_sched
skeleton = run("skeleton (pyr+transfer)")
engine.block_search_level = real_search
engine.windowed_schedule = real_sched

print("\nattribution (ms/field):")
print(f"  pyramid blur     {max(0.0, (full-no_pyr))*1000:7.1f}")
print(f"  search (all lv)  {max(0.0, (full-no_search))*1000:7.1f}")
print(f"  windowed (all)   {max(0.0, (full-no_sched))*1000:7.1f}")
print(f"  skeleton+misc    {skeleton*1000:7.1f}")

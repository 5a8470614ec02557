"""Break down windowed-schedule time per level and per phase on TPU."""

import time

import numpy as np
import jax
import _cache  # noqa: F401  (persistent compile cache)
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from blockbasedmotionestimation_tpu.ops.search import block_search_level
from blockbasedmotionestimation_tpu.ops.windowed import windowed_schedule, _compute_cv
from blockbasedmotionestimation_tpu.ops.spiral import spiral_extent

rng = np.random.default_rng(0)


def sync(x):
    return float(np.asarray(jnp.ravel(x)[0]))


def t(fn, *a, n=2, **kw):
    sync(fn(*a, **kw))
    t0 = time.time()
    for _ in range(n):
        sync(fn(*a, **kw))
    return (time.time() - t0) / n


bs, ss = 32, 64
for (h, w) in [(1088, 1920), (544, 960), (272, 480), (136, 240)]:
    im1 = jax.device_put(jnp.asarray(rng.integers(0, 256, size=(h, w), dtype=np.uint8)))
    im2 = jax.device_put(jnp.asarray(rng.integers(0, 256, size=(h, w), dtype=np.uint8)))
    if h % bs or w % bs:
        continue
    pred = jnp.zeros((h // bs, w // bs, 2), dtype=jnp.float32)
    dt_s = t(block_search_level, im1, im2, pred, bs, ss)
    grid0 = block_search_level(im1, im2, pred, bs, ss)

    sched = jax.jit(lambda a, b, g: windowed_schedule(a, b, g, bs, ss, 16.0, 2))
    dt_w = t(sched, im1, im2, grid0)
    print(f"{h}x{w}: search {dt_s*1000:.1f} ms, windowed schedule {dt_w*1000:.1f} ms",
          flush=True)

# sub-phase at full res: CV compute per round
h, w = 1088, 1920
im1 = jax.device_put(jnp.asarray(rng.integers(0, 256, size=(h, w), dtype=np.uint8)))
im2 = jax.device_put(jnp.asarray(rng.integers(0, 256, size=(h, w), dtype=np.uint8)))
ext = spiral_extent(ss - bs)
npy, npx = h // bs, w // bs
patches1 = im1.reshape(npy, bs, npx, bs).transpose(0, 2, 1, 3).astype(jnp.int16)
windows = jnp.zeros((npy, npx, bs + 2 * ext, bs + 2 * ext), dtype=jnp.int16)
for cur in (32, 16, 8, 4, 2):
    cvf = jax.jit(lambda p, wn, cur=cur: _compute_cv(p, wn, bs, cur, ext, ext, "sad"))
    dt = t(cvf, patches1, windows)
    print(f"cv compute cur={cur}: {dt*1000:.1f} ms", flush=True)

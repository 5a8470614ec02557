"""Phase breakdown of the production (windowed+pallas) pipeline on TPU.

Per pyramid level: search vs whole windowed schedule, plus window gather and
the pooled CV build at full res.  Dispatch floor is measured and subtracted;
values under ~5 ms are noise (see DESIGN.md section 5).
"""

import time

import numpy as np
import jax
import _cache  # noqa: F401  (persistent compile cache)
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from blockbasedmotionestimation_tpu.ops.search import block_search_level, _gather_windows
from blockbasedmotionestimation_tpu.ops.spiral import spiral_extent
from blockbasedmotionestimation_tpu.ops.windowed import (
    windowed_schedule,
    _all_round_cvs_pallas,
)

rng = np.random.default_rng(0)


def sync(x):
    return float(np.asarray(jnp.ravel(x)[0]))


def t(fn, *a, n=5, **kw):
    sync(fn(*a, **kw))
    t0 = time.time()
    for _ in range(n):
        sync(fn(*a, **kw))
    return (time.time() - t0) / n


floor = t(jax.jit(lambda x: x + 1.0), jnp.zeros((8, 8, 8)), n=10)
print(f"dispatch floor {floor*1000:.1f} ms", flush=True)

bs, ss = 32, 64
ext = spiral_extent(ss - bs)
# coherent pair (bench-like): im2 is a shifted copy of im1
for (h, w) in [(1088, 1920), (544, 960), (272, 480), (128, 256)]:
    h = (h // bs) * bs
    w = (w // bs) * bs
    base = rng.integers(0, 256, size=(h + 16, w + 16), dtype=np.uint8)
    im1 = jax.device_put(jnp.asarray(base[:h, :w]))
    im2 = jax.device_put(jnp.asarray(base[5:5 + h, 9:9 + w]))
    pred = jnp.zeros((h // bs, w // bs, 2), dtype=jnp.float32)
    dt_s = t(lambda: block_search_level(im1, im2, pred, bs, ss, impl="pallas"))
    grid0 = block_search_level(im1, im2, pred, bs, ss, impl="pallas")

    sched = jax.jit(
        lambda a, b, g: windowed_schedule(a, b, g, bs, ss, 16.0, 2, impl="pallas")
    )
    dt_w = t(sched, im1, im2, grid0)
    print(
        f"{h}x{w}: search {(dt_s-floor)*1000:7.1f} ms   "
        f"windowed {(dt_w-floor)*1000:7.1f} ms",
        flush=True,
    )

# full-res sub-phases
h, w = 1088, 1920
base = rng.integers(0, 256, size=(h + 16, w + 16), dtype=np.uint8)
im1 = jax.device_put(jnp.asarray(base[:h, :w]))
im2 = jax.device_put(jnp.asarray(base[5:5 + h, 9:9 + w]))
npy, npx = h // bs, w // bs
pred = jnp.zeros((npy, npx, 2), dtype=jnp.float32)
grid0 = block_search_level(im1, im2, pred, bs, ss, impl="pallas")
patches1 = im1.reshape(npy, bs, npx, bs).transpose(0, 2, 1, 3).astype(jnp.int16)


@jax.jit
def gather(im2_, g):
    pm = g.astype(jnp.int32)
    oy = jnp.arange(npy, dtype=jnp.int32)[:, None] * bs
    ox = jnp.arange(npx, dtype=jnp.int32)[None, :] * bs
    wy = jnp.clip(oy + pm[..., 1], 0, im2_.shape[0] - bs)
    wx = jnp.clip(ox + pm[..., 0], 0, w - bs)
    return (
        _gather_windows(im2_, wy.reshape(-1), wx.reshape(-1), bs, ext)
        .astype(jnp.int16)
        .reshape(npy, npx, bs + 2 * ext, bs + 2 * ext)
    )


dt = t(gather, im2, grid0)
print(f"window gather: {(dt-floor)*1000:.1f} ms", flush=True)
windows = gather(im2, grid0)

cvs = jax.jit(
    lambda p, wn: _all_round_cvs_pallas(p, wn, bs, ext, ext, "sad", False)[2]
)
dt = t(lambda: cvs(patches1, windows))
print(f"pooled CV build: {(dt-floor)*1000:.1f} ms", flush=True)

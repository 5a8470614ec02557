"""Phase breakdown of the current production (windowed+pallas) pipeline on TPU.

Per pyramid level: search vs whole windowed schedule.  At full res, the
schedule's internals: window gather, Pallas all-round CV build, and each
subdivision round's color-step scan.
"""

import time

import numpy as np
import jax
import _cache  # noqa: F401  (persistent compile cache)
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from blockbasedmotionestimation_tpu.ops import regularize as reg
from blockbasedmotionestimation_tpu.ops.search import block_search_level, _gather_windows
from blockbasedmotionestimation_tpu.ops.spiral import spiral_extent
from blockbasedmotionestimation_tpu.ops.windowed import (
    windowed_schedule,
    _all_round_cvs_pallas,
)

rng = np.random.default_rng(0)


def sync(x):
    return float(np.asarray(jnp.ravel(x)[0]))


def t(fn, *a, n=3, **kw):
    sync(fn(*a, **kw))
    t0 = time.time()
    for _ in range(n):
        sync(fn(*a, **kw))
    return (time.time() - t0) / n


bs, ss = 32, 64
ext = spiral_extent(ss - bs)
total = 0.0
for (h, w) in [(1088, 1920), (544, 960), (272, 480), (136, 256)]:
    if h % bs or w % bs:
        h = (h // bs) * bs
        w = (w // bs) * bs
    im1 = jax.device_put(jnp.asarray(rng.integers(0, 256, size=(h, w), dtype=np.uint8)))
    im2 = jax.device_put(jnp.asarray(rng.integers(0, 256, size=(h, w), dtype=np.uint8)))
    pred = jnp.zeros((h // bs, w // bs, 2), dtype=jnp.float32)
    dt_s = t(lambda: block_search_level(im1, im2, pred, bs, ss, impl="pallas"))
    grid0 = block_search_level(im1, im2, pred, bs, ss, impl="pallas")

    sched = jax.jit(
        lambda a, b, g: windowed_schedule(a, b, g, bs, ss, 16.0, 2, impl="pallas")
    )
    dt_w = t(sched, im1, im2, grid0)
    total += dt_s + dt_w
    print(
        f"{h}x{w}: search {dt_s*1000:7.1f} ms   windowed {dt_w*1000:7.1f} ms",
        flush=True,
    )
print(f"sum over levels: {total*1000:.1f} ms", flush=True)

# --- full-res sub-phases ---
h, w = 1088, 1920
im1 = jax.device_put(jnp.asarray(rng.integers(0, 256, size=(h, w), dtype=np.uint8)))
im2 = jax.device_put(jnp.asarray(rng.integers(0, 256, size=(h, w), dtype=np.uint8)))
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
print(f"window gather: {dt*1000:.1f} ms", flush=True)
windows = gather(im2, grid0)

cvs = jax.jit(
    lambda p, wn: _all_round_cvs_pallas(p, wn, bs, ext, ext, "sad", False)
)
dt = t(lambda: cvs(patches1, windows)[2])
print(f"pallas all-round CVs: {dt*1000:.1f} ms", flush=True)

# selection-round cost: run the schedule but stop after round `cur`
# approximate per-round cost by timing schedules with reg_radius=ext and
# truncating rounds via block size: run full schedule already timed; instead
# time _select_costs-like load per round below.
from blockbasedmotionestimation_tpu.ops.windowed import _select_costs

side = 2 * ext + 1
for cur in (32, 16, 8, 4, 2):
    f = bs // cur
    nby, nbx = npy * f, npx * f
    m2, n2 = (nby + 1) // 2, (nbx + 1) // 2
    cv_slab = jnp.zeros((side * side, m2, n2), dtype=jnp.uint16)
    ddy = jnp.zeros((m2, n2, 9), dtype=jnp.int32)
    ddx = jnp.zeros((m2, n2, 9), dtype=jnp.int32)
    selc = jax.jit(lambda c, a, b: _select_costs(c, a, b, ext))
    dt = t(selc, cv_slab, ddy, ddx)
    # 8 color-steps per round use this once each
    print(
        f"_select_costs cur={cur} ({m2}x{n2}): {dt*1000:6.1f} ms x8 = {dt*8000:7.1f} ms",
        flush=True,
    )

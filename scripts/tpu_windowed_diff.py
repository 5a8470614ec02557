"""Differential timing of windowed-schedule internals on TPU.

Subtracts the async-tunnel dispatch floor, and compares:
  A) full schedule
  B) _select_costs stubbed to zeros  (cost of selection passes)
  C) color-step body = identity      (cost of CV build + glue)
  D) vmap over a batch of 4 frames   (batching amortization)
"""

import time

import numpy as np
import jax
import _cache  # noqa: F401
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

import blockbasedmotionestimation_tpu.ops.windowed as wnd
from blockbasedmotionestimation_tpu.ops.search import block_search_level

rng = np.random.default_rng(0)


def sync(x):
    return float(np.asarray(jnp.ravel(x)[0]))


def t(fn, *a, n=4, **kw):
    sync(fn(*a, **kw))
    t0 = time.time()
    for _ in range(n):
        sync(fn(*a, **kw))
    return (time.time() - t0) / n


# dispatch floor
floor_fn = jax.jit(lambda x: x + 1.0)
xsmall = jax.device_put(jnp.zeros((8, 8, 8), jnp.float32))
floor = t(floor_fn, xsmall, n=10)
print(f"dispatch floor: {floor*1000:.1f} ms", flush=True)

h, w = 1088, 1920
bs, ss = 32, 64
im1 = jax.device_put(jnp.asarray(rng.integers(0, 256, size=(h, w), dtype=np.uint8)))
im2 = jax.device_put(jnp.asarray(rng.integers(0, 256, size=(h, w), dtype=np.uint8)))
pred = jnp.zeros((h // bs, w // bs, 2), dtype=jnp.float32)
grid0 = block_search_level(im1, im2, pred, bs, ss, impl="pallas")
sync(grid0)

sched = jax.jit(lambda a, b, g: wnd.windowed_schedule(a, b, g, bs, ss, 16.0, 2, impl="pallas"))
dt_a = t(sched, im1, im2, grid0)
print(f"A full schedule: {(dt_a-floor)*1000:.1f} ms", flush=True)

orig_select = wnd._select_costs
wnd._select_costs = lambda cv_slab, ddy, ddx, r: jnp.zeros(
    ddy.shape, dtype=jnp.float32
)
sched_b = jax.jit(lambda a, b, g: wnd.windowed_schedule(a, b, g, bs, ss, 16.0, 2, impl="pallas"))
dt_b = t(sched_b, im1, im2, grid0)
print(f"B select stubbed: {(dt_b-floor)*1000:.1f} ms  (selection = {(dt_a-dt_b)*1000:.1f} ms)", flush=True)
wnd._select_costs = orig_select

# C: CV build + loop glue only — stub the whole color-step scan
orig_cv = wnd._all_round_cvs_pallas


def _probe_c():
    import blockbasedmotionestimation_tpu.ops.windowed as W

    def sched_c_fn(a, b, g):
        return W.windowed_schedule(a, b, g, bs, ss, 16.0, 2, impl="pallas")

    return jax.jit(sched_c_fn)


orig_scan = jax.lax.scan
dt_c = None
# skip C if monkeypatching scan is too invasive; approximate via CV-only timing
cvs_only = jax.jit(
    lambda p, wn_: orig_cv(p, wn_, bs, 16, 16, "sad", False)[2]
)

npy, npx = h // bs, w // bs
patches1 = im1.reshape(npy, bs, npx, bs).transpose(0, 2, 1, 3).astype(jnp.int16)
from blockbasedmotionestimation_tpu.ops.search import _gather_windows
from blockbasedmotionestimation_tpu.ops.spiral import spiral_extent

ext = spiral_extent(ss - bs)
pm = grid0.astype(jnp.int32)
oy = jnp.arange(npy, dtype=jnp.int32)[:, None] * bs
ox = jnp.arange(npx, dtype=jnp.int32)[None, :] * bs
wy = jnp.clip(oy + pm[..., 1], 0, h - bs)
wx = jnp.clip(ox + pm[..., 0], 0, w - bs)
windows = (
    _gather_windows(im2, wy.reshape(-1), wx.reshape(-1), bs, ext)
    .astype(jnp.int16)
    .reshape(npy, npx, bs + 2 * ext, bs + 2 * ext)
)
sync(windows)
dt_cv = t(cvs_only, patches1, windows)
print(f"CV build alone: {(dt_cv-floor)*1000:.1f} ms", flush=True)

# D: batch of 4 via vmap
B = 4
im1b = jax.device_put(
    jnp.asarray(rng.integers(0, 256, size=(B, h, w), dtype=np.uint8))
)
im2b = jax.device_put(
    jnp.asarray(rng.integers(0, 256, size=(B, h, w), dtype=np.uint8))
)
gridb = jnp.broadcast_to(grid0, (B,) + grid0.shape)


def one(a, b, g):
    return wnd.windowed_schedule(a, b, g, bs, ss, 16.0, 2, impl="pallas")


try:
    sched_d = jax.jit(jax.vmap(one))
    dt_d = t(sched_d, im1b, im2b, gridb, n=2)
    print(
        f"D vmap batch {B}: {(dt_d-floor)*1000:.1f} ms total, "
        f"{(dt_d-floor)*1000/B:.1f} ms/field",
        flush=True,
    )
except Exception as e:  # pallas kernels may not vmap
    print(f"D vmap failed: {type(e).__name__}: {e}", flush=True)

"""Per-round breakdown of the windowed schedule at full res (L0, B=1).

Times, each inside one jit with a scan over repeats (the ~26 ms dispatch
floor would otherwise swamp every number):
  * window gather + patch prep
  * the pooled all-round CV build (Pallas)
  * each subdivision round (cur = 32..2) -- full, and with the color-step
    kernel stubbed out (isolates per-step XLA glue: shifts/stack/pad)
"""

import time

import numpy as np
import jax
import _cache  # noqa: F401  (persistent compile cache)
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from blockbasedmotionestimation_tpu.kernels import reg_step
from blockbasedmotionestimation_tpu.ops import windowed
from blockbasedmotionestimation_tpu.ops.search import _gather_windows, block_search_level
from blockbasedmotionestimation_tpu.ops.spiral import spiral_extent

H, W = 1152, 1920
bs, ss = 32, 64
ext = spiral_extent(ss - bs)
r = ext
side = 2 * r + 1
rng = np.random.default_rng(0)
base = rng.integers(0, 256, size=(H + 16, W + 16), dtype=np.uint8)
im1 = jax.device_put(jnp.asarray(base[:H, :W]))
im2 = jax.device_put(jnp.asarray(base[5:5 + H, 9:9 + W]))
npy, npx = H // bs, W // bs


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(jnp.ravel(leaf)[0]))


def t(fn, *a, n=4):
    sync(fn(*a))
    t0 = time.time()
    for _ in range(n):
        sync(fn(*a))
    return (time.time() - t0) / n


floor = t(jax.jit(lambda x: x + 1.0), jnp.zeros((8, 8)))
print(f"dispatch floor {floor*1000:.1f} ms", flush=True)

grid0 = jax.jit(
    lambda a, b: block_search_level(a, b, jnp.zeros((npy, npx, 2)), bs, ss)
)(im1, im2)
sync(grid0)


def prep(a, b, g0):
    parent_mv = g0.astype(jnp.int32)
    oy = jnp.arange(npy, dtype=jnp.int32)[:, None] * bs
    ox = jnp.arange(npx, dtype=jnp.int32)[None, :] * bs
    wy = jnp.clip(oy + parent_mv[..., 1], 0, b.shape[0] - bs)
    wx = jnp.clip(ox + parent_mv[..., 0], 0, W - bs)
    windows = (
        _gather_windows(b, wy.reshape(-1), wx.reshape(-1), bs, ext)
        .astype(jnp.int16)
        .reshape(npy, npx, bs + 2 * ext, bs + 2 * ext)
    )
    patches1 = (
        a.reshape(npy, bs, npx, bs).transpose(0, 2, 1, 3).astype(jnp.int16)
    )
    return parent_mv, windows, patches1


jprep = jax.jit(prep)
parent_mv, windows, patches1 = jprep(im1, im2, grid0)
sync(windows)
dt = t(jprep, im1, im2, grid0) - floor
print(f"prep (windows+patches): {dt*1000:7.1f} ms", flush=True)

jcv = jax.jit(
    lambda p, w: windowed._all_round_cvs_pallas(p, w, bs, ext, r, "sad", False)
)
cvs = jcv(patches1, windows)
sync(cvs[2])
dt = t(jcv, patches1, windows) - floor
print(f"pooled CV build (all rounds): {dt*1000:7.1f} ms", flush=True)

real_kernel = reg_step.windowed_color_step_pm
real_kernel_dyn = reg_step.windowed_color_step_pm_dyn
real_kernel_slab = reg_step.windowed_color_step


def stub_pm(scalars, lam_mult, cv_in, cands, pm_lane, present_pm, rank_pm,
            oy_cell, ox_cell, side, r, cur, h, w, interpret=False):
    z = (cv_in[0, 0, 0, 0, 0].astype(jnp.int32) * 0
         + present_pm[0, 0, 0, 0, 0] * 0 + rank_pm[0, 0, 0, 0, 0] * 0)
    return cands[0] + z


def stub_slab(scalars, lam_mult, cv_colors, cands, pm_colors, present_colors,
              rank_colors, side, r, cur, h, w, interpret=False):
    z = (cv_colors[0, 0, 0, 0].astype(jnp.int32) * 0
         + present_colors[0, 0, 0, 0] * 0)
    return cands[0] + z


def round_at(cur, stub=False, reps=4, noise=4, kernel="dyn"):
    f = bs // cur
    if f >= 2:
        fn = windowed._pallas_round_pm
    else:
        fn = windowed._pallas_round
    nby, nbx = npy * f, npx * f

    def make_gp(g):
        return jnp.pad(g, ((1, 2), (1, 2), (0, 0)))

    def run(g0, cvq, pmv):
        def one(g, _):
            out = fn(
                g, cvq, pmv, bs=bs, cur=cur, side=side, r=r, h=H, w=W,
                row0_b=jnp.asarray(0, jnp.int32), lam=16.0,
                sweeps_per_round=2, make_gp=make_gp, interp=False,
            )
            return out, None

        g, _ = jax.lax.scan(one, g0, None, length=reps)
        return g

    g0 = jnp.asarray(
        rng.integers(-noise, noise + 1, size=(nby, nbx, 2)).astype(np.float32)
    ) + jnp.repeat(jnp.repeat(parent_mv, f, axis=0), f, axis=1).astype(jnp.float32)
    jr = jax.jit(run)
    if stub:
        reg_step.windowed_color_step_pm = stub_pm
        reg_step.windowed_color_step_pm_dyn = stub_pm
        reg_step.windowed_color_step = stub_slab
    elif kernel == "old":
        reg_step.windowed_color_step_pm_dyn = real_kernel
    try:
        dt = (t(jr, g0, cvs[cur], parent_mv) - floor) / reps
    finally:
        reg_step.windowed_color_step_pm = real_kernel
        reg_step.windowed_color_step_pm_dyn = real_kernel_dyn
        reg_step.windowed_color_step = real_kernel_slab
    return dt


total = {"dyn": 0.0, "old": 0.0}
for cur in (32, 16, 8, 4, 2):
    full = round_at(cur)
    old = round_at(cur, kernel="old")
    glue = round_at(cur, stub=True)
    wild = round_at(cur, noise=12)
    wild_old = round_at(cur, noise=12, kernel="old")
    total["dyn"] += full
    total["old"] += old
    print(
        f"round cur={cur:2d}: dyn {full*1000:7.1f} old {old*1000:7.1f} ms"
        f"  (glue {glue*1000:6.1f},"
        f" noise12 dyn {wild*1000:7.1f} old {wild_old*1000:7.1f} ms)",
        flush=True,
    )
print(f"rounds total: dyn {total['dyn']*1000:7.1f}"
      f" old {total['old']*1000:7.1f} ms", flush=True)

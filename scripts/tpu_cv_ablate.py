"""Ablate the pooled-CV kernel: what fraction is diff+slice vs pool+store?

v_a: diff+abs only, accumulated over dx, one store per instance.
v_b: diff+abs+first pool (cur=2) only, stores only the cur=2 volume.
baseline: full multi-size pooling + stores.
"""

import functools
import time

import numpy as np
import jax
import _cache  # noqa: F401
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.default_backend(), flush=True)

from blockbasedmotionestimation_tpu.kernels.cv_diff import delta_pooled_cvs

bs, ext, r = 32, 16, 16
side = 2 * r + 1
H, W = 1152, 1920
n_p = (H // bs) * (W // bs)
rng = np.random.default_rng(0)
win = bs + 2 * ext
patches = jax.device_put(
    jnp.asarray(rng.integers(0, 256, size=(bs, bs, n_p)).astype(np.int16))
)
windows = jax.device_put(
    jnp.asarray(rng.integers(0, 256, size=(win, win, n_p)).astype(np.int16))
)


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(jnp.ravel(leaf)[0]))


def t(fn, *a, n=5):
    sync(fn(*a))
    t0 = time.time()
    for _ in range(n):
        sync(fn(*a))
    return (time.time() - t0) / n


floor = t(jax.jit(lambda x: x + 1.0), jnp.zeros((8, 8)))
print(f"floor {floor*1000:.1f} ms", flush=True)

cb = 128
ngroups = (side + 7) // 8
cols = 8 * ngroups + bs


def prep(patches_t, windows_t):
    npad = -n_p % cb
    if npad:
        patches_t = jnp.pad(patches_t, ((0, 0), (0, 0), (0, npad)))
        windows_t = jnp.pad(windows_t, ((0, 0), (0, 0), (0, npad)))
    wslab = windows_t[:, ext - r :, :]
    pad_c = cols - wslab.shape[1]
    wslab = jnp.pad(wslab, ((0, 0), (0, pad_c), (0, 0))) if pad_c > 0 else wslab[:, :cols, :]
    return patches_t, wslab, patches_t.shape[-1]


def _kern_a(patches_ref, wslab_ref, out_ref, *, mode):
    dy = pl.program_id(1)
    b = patches_ref[...].astype(jnp.int32)
    cbl = b.shape[-1]
    if mode == "diff":
        acc0 = jnp.zeros((bs, bs, cbl), jnp.int32)
    else:
        acc0 = jnp.zeros((bs // 2, bs // 2, cbl), jnp.int32)

    def body(g, acc):
        wide = wslab_ref[pl.ds(ext - r + dy, bs), pl.ds(8 * g, bs + 8), :]
        for dxr in range(8):
            dx = 8 * g + dxr
            w = wide[:, dxr : dxr + bs, :].astype(jnp.int32)
            pool = jnp.abs(b - w)
            if mode == "pool2":
                pool = pool.reshape(bs // 2, 2, bs // 2, 2, cbl).sum(axis=(1, 3))
            acc = acc + pool
        return acc

    out_ref[0] = jax.lax.fori_loop(0, ngroups, body, acc0).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("mode",))
def run_abl(patches_t, windows_t, mode):
    p, w, n = prep(patches_t, windows_t)
    s = bs if mode == "diff" else bs // 2
    return pl.pallas_call(
        functools.partial(_kern_a, mode=mode),
        grid=(n // cb, side),
        in_specs=[
            pl.BlockSpec((bs, bs, cb), lambda i, j: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((win, cols, cb), lambda i, j: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, s, s, cb), lambda i, j: (j, 0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((side, s, s, n), jnp.int32),
    )(p, w)


base = jax.jit(lambda p, w: delta_pooled_cvs(p, w, bs, ext, r, "sad"))
dt = t(base, patches, windows) - floor
print(f"baseline full:     {dt*1000:7.1f} ms", flush=True)
for mode in ("diff", "pool2"):
    try:
        fn = jax.jit(lambda p, w, m=mode: run_abl(p, w, m))
        dt = t(fn, patches, windows) - floor
        print(f"ablation {mode:6s}:  {dt*1000:7.1f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{mode}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)

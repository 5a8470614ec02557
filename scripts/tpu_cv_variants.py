"""CV-build kernel variants (packed i16 is dead: Mosaic can't legalize any
16-bit int vector ALU here - see tpu_i16_probe.py).

v3: feed i32 inputs (kills ~1.4G in-kernel i16->i32 widenings) and move the
diff computation inside pl.when (masked dx iterations currently burn 17% of
the base diff work).
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

from blockbasedmotionestimation_tpu.kernels.cv_diff import (
    cv_dtype, delta_pooled_cvs,
)

bs, ext, r = 32, 16, 16
side = 2 * r + 1
H, W = 1152, 1920
npy, npx = H // bs, W // bs
n_p = npy * npx
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


def _pooled_kernel_v3(patches_ref, wslab_ref, *out_refs, bs, ext, r, cost):
    dy = pl.program_id(1)
    side = 2 * r + 1
    b = patches_ref[...]  # (bs, bs, CB) i32
    cb = b.shape[-1]

    def body(g, _):
        wide = wslab_ref[pl.ds(ext - r + dy, bs), pl.ds(8 * g, bs + 8), :]
        for dxr in range(8):
            dx = 8 * g + dxr

            @pl.when(dx < side)
            def _():
                w = wide[:, dxr : dxr + bs, :]
                if cost == "sad":
                    pool = jnp.abs(b - w)
                else:
                    d = b - w
                    pool = d * d
                s, cur, k = bs, 1, 0
                while cur < bs:
                    pool = pool.reshape(s // 2, 2, s // 2, 2, cb).sum(axis=(1, 3))
                    s >>= 1
                    cur <<= 1
                    if cur >= 2:
                        dt = out_refs[k].dtype
                        if cur <= bs // 2:
                            ps = pool.reshape(s, s // 2, 2, cb)
                            for bx in range(2):
                                out_refs[k][0, dx, :, bx] = ps[:, :, bx].astype(dt)
                        else:
                            out_refs[k][0, dx] = pool.astype(dt)
                        k += 1
        return 0

    jax.lax.fori_loop(0, (side + 7) // 8, body, 0)


@functools.partial(jax.jit, static_argnames=("bs", "ext", "r", "cost", "cb"))
def pooled_v3(patches_t, windows_t, bs, ext, r, cost="sad", cb=128):
    n_p = patches_t.shape[-1]
    side = 2 * r + 1
    npad = -n_p % cb
    if npad:
        patches_t = jnp.pad(patches_t, ((0, 0), (0, 0), (0, npad)))
        windows_t = jnp.pad(windows_t, ((0, 0), (0, 0), (0, npad)))
    n = n_p + npad
    ngroups = (side + 7) // 8
    cols = 8 * ngroups + bs
    wslab = windows_t[:, ext - r :, :].astype(jnp.int32)
    pad_c = cols - wslab.shape[1]
    wslab = jnp.pad(wslab, ((0, 0), (0, pad_c), (0, 0))) if pad_c > 0 else wslab[:, :cols, :]
    patches_t = patches_t.astype(jnp.int32)

    curs, out_shapes, out_specs = [], [], []
    cur = 2
    while cur <= bs:
        curs.append(cur)
        s = bs // cur
        if cur <= bs // 2:
            out_shapes.append(
                jax.ShapeDtypeStruct((side, side, s, 2, s // 2, n), cv_dtype(cur, cost))
            )
            out_specs.append(
                pl.BlockSpec((1, side, s, 2, s // 2, cb), lambda i, j: (j, 0, 0, 0, 0, i),
                             memory_space=pltpu.VMEM)
            )
        else:
            out_shapes.append(
                jax.ShapeDtypeStruct((side, side, s, s, n), cv_dtype(cur, cost))
            )
            out_specs.append(
                pl.BlockSpec((1, side, s, s, cb), lambda i, j: (j, 0, 0, 0, i),
                             memory_space=pltpu.VMEM)
            )
        cur <<= 1
    win = windows_t.shape[0]
    return pl.pallas_call(
        functools.partial(_pooled_kernel_v3, bs=bs, ext=ext, r=r, cost=cost),
        grid=(n // cb, side),
        in_specs=[
            pl.BlockSpec((bs, bs, cb), lambda i, j: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((win, cols, cb), lambda i, j: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
    )(patches_t, wslab)


base = jax.jit(lambda p, w: delta_pooled_cvs(p, w, bs, ext, r, "sad"))
ref = base(patches, windows)
dt = t(base, patches, windows) - floor
print(f"baseline i32:      {dt*1000:7.1f} ms", flush=True)

for cb in (128, 256):
    try:
        v3 = jax.jit(lambda p, w, cb=cb: pooled_v3(p, w, bs, ext, r, "sad", cb=cb))
        out = v3(patches, windows)
        od = dict(zip([2, 4, 8, 16, 32], out))
        ok = all(
            bool(jnp.array_equal(ref[c][..., :n_p], od[c][..., :n_p]))
            for c in (2, 4, 8, 16, 32)
        )
        dt = t(v3, patches, windows) - floor
        print(f"v3 i32-fed cb={cb}: {dt*1000:7.1f} ms  match={ok}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"v3 cb={cb}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)

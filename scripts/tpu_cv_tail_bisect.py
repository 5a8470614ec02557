"""Bisect the static pooled-CV kernel's tail cost.

s1: cur2 split store + cur4 unsplit store per dx (== ablation static_store)
s2: s1 but cur4 goes to a VMEM scratch instead of an output (adds readback
    of nothing; isolates scratch-store cost vs HBM-block store)
s3: s2 + batched tail pooling (cur4 split + cur8/16/32 outs) == production
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

from blockbasedmotionestimation_tpu.kernels.cv_diff import cv_dtype, delta_pooled_cvs

bs, ext, r = 32, 16, 16
side = 2 * r + 1
H, W = 1152, 1920
n_p = (H // bs) * (W // bs)
win = bs + 2 * ext
q4, s2 = bs // 4, bs // 2
rng = np.random.default_rng(0)
patches = jax.device_put(
    jnp.asarray(rng.integers(0, 256, size=(bs, bs, n_p)).astype(np.int16))
)
windows = jax.device_put(
    jnp.asarray(rng.integers(0, 256, size=(win, win, n_p)).astype(np.int16))
)


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(jnp.ravel(leaf)[0]))


def t(fn, *a, n=8):
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
colsq = cols // 4


def kern(patches_ref, wplanes_ref, *refs, stage):
    dy = pl.program_id(1)
    if stage == "s1":
        out_refs, p4_ref = refs, None
    else:
        out_refs, p4_ref = refs[:-1], refs[-1]
    bp = [patches_ref[p].astype(jnp.int32) for p in range(4)]
    wq = [wplanes_ref[c, pl.ds(ext - r + dy, bs), :, :] for c in range(4)]
    dt2 = out_refs[0].dtype
    for dx in range(side):
        halves = []
        for bx in range(2):
            acc = None
            for p in (2 * bx, 2 * bx + 1):
                c = (p + dx) % 4
                off = (p + dx) // 4
                d = bp[p] - wq[c][:, off : off + q4, :].astype(jnp.int32)
                acc = jnp.abs(d) if acc is None else acc + jnp.abs(d)
            halves.append(acc.reshape(s2, 2, q4, cb).sum(axis=1))
        for bx in range(2):
            out_refs[0][0, dx, :, bx] = halves[bx].astype(dt2)
        pool4 = (halves[0] + halves[1]).reshape(q4, 2, q4, cb).sum(axis=1)
        if stage == "s1":
            out_refs[1][0, dx] = pool4.astype(jnp.uint16)
        else:
            p4_ref[dx] = pool4.astype(jnp.uint16)
    if stage == "s3":
        c = p4_ref[...].astype(jnp.int32)
        cur, k, s = 4, 1, q4
        while True:
            dt = out_refs[k].dtype
            if cur < bs:
                cr = c.reshape(side, s, s // 2, 2, cb)
                for bx in range(2):
                    out_refs[k][0, :, :, bx] = cr[:, :, :, bx].astype(dt)
            else:
                out_refs[k][0] = c.astype(dt)
                break
            a = cr[:, :, :, 0] + cr[:, :, :, 1]
            ar = a.reshape(side, s // 2, 2, s // 2, cb)
            c = ar[:, :, 0] + ar[:, :, 1]
            cur, k, s = cur * 2, k + 1, s // 2
    elif stage == "s2":
        out_refs[1][0, 0] = p4_ref[0].astype(jnp.uint16)


@functools.partial(jax.jit, static_argnames=("stage",))
def run(patches_t, windows_t, stage):
    npad = -n_p % cb
    if npad:
        patches_t = jnp.pad(patches_t, ((0, 0), (0, 0), (0, npad)))
        windows_t = jnp.pad(windows_t, ((0, 0), (0, 0), (0, npad)))
    n = patches_t.shape[-1]
    wslab = windows_t[:, ext - r :, :]
    pad_c = cols - wslab.shape[1]
    wslab = (
        jnp.pad(wslab, ((0, 0), (0, pad_c), (0, 0)))
        if pad_c > 0
        else wslab[:, :cols, :]
    )
    psplit = patches_t.reshape(bs, q4, 4, n).transpose(2, 0, 1, 3)
    wplanes = wslab.reshape(win, colsq, 4, n).transpose(2, 0, 1, 3)

    out_shapes = [
        jax.ShapeDtypeStruct((side, side, s2, 2, s2 // 2, n), jnp.uint16)
    ]
    out_specs = [
        pl.BlockSpec((1, side, s2, 2, s2 // 2, cb),
                     lambda i, j: (j, 0, 0, 0, 0, i),
                     memory_space=pltpu.VMEM)
    ]
    if stage in ("s1", "s2"):
        out_shapes.append(
            jax.ShapeDtypeStruct((side, side, q4, q4, n), jnp.uint16)
        )
        out_specs.append(
            pl.BlockSpec((1, side, q4, q4, cb), lambda i, j: (j, 0, 0, 0, i),
                         memory_space=pltpu.VMEM)
        )
    else:
        cur = 4
        while cur <= bs:
            s = bs // cur
            if cur < bs:
                out_shapes.append(
                    jax.ShapeDtypeStruct(
                        (side, side, s, 2, s // 2, n), cv_dtype(cur, "sad")
                    )
                )
                out_specs.append(
                    pl.BlockSpec((1, side, s, 2, s // 2, cb),
                                 lambda i, j: (j, 0, 0, 0, 0, i),
                                 memory_space=pltpu.VMEM)
                )
            else:
                out_shapes.append(
                    jax.ShapeDtypeStruct((side, side, s, s, n),
                                         cv_dtype(cur, "sad"))
                )
                out_specs.append(
                    pl.BlockSpec((1, side, s, s, cb),
                                 lambda i, j: (j, 0, 0, 0, i),
                                 memory_space=pltpu.VMEM)
                )
            cur *= 2
    scratch = [] if stage == "s1" else [pltpu.VMEM((side, q4, q4, cb), jnp.uint16)]
    return pl.pallas_call(
        functools.partial(kern, stage=stage),
        grid=(n // cb, side),
        in_specs=[
            pl.BlockSpec((4, bs, q4, cb), lambda i, j: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, win, colsq, cb), lambda i, j: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )(psplit, wplanes)


for stage in ("s1", "s2", "s3"):
    try:
        fn = jax.jit(lambda p, w, s=stage: run(p, w, s))
        dt = t(fn, patches, windows) - floor
        print(f"{stage}: {dt*1000:7.1f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{stage}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)

prod = jax.jit(
    lambda p, w: delta_pooled_cvs(p, w, bs, ext, r, "sad", variant="static")
)
print(f"production static: {(t(prod, patches, windows)-floor)*1000:7.1f} ms",
      flush=True)

"""Two-kernel pooled-CV: main diff kernel (cur2 split + cur4 unsplit) and a
separate tail kernel (cur4 split + deeper sizes from the HBM cur4 volume).

Tests whether the ~7 ms in-kernel tail cost is intrinsic to the pooling ops
or a fusion/scheduling artifact, and whether the (plane, offset) slice cache
pays for itself under the raised 64M scoped-vmem budget.
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

from blockbasedmotionestimation_tpu.kernels.cv_diff import cv_dtype

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
VP = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def main_kern(patches_ref, wplanes_ref, o2_ref, o4_ref, *, cache):
    dy = pl.program_id(1)
    bp = [patches_ref[p].astype(jnp.int32) for p in range(4)]
    wq = [wplanes_ref[c, pl.ds(ext - r + dy, bs), :, :] for c in range(4)]
    sl = {}

    def shifted(c, off):
        if not cache:
            return wq[c][:, off : off + q4, :].astype(jnp.int32)
        if (c, off) not in sl:
            sl[(c, off)] = wq[c][:, off : off + q4, :].astype(jnp.int32)
        return sl[(c, off)]

    for dx in range(side):
        halves = []
        for bx in range(2):
            acc = None
            for p in (2 * bx, 2 * bx + 1):
                d = jnp.abs(bp[p] - shifted((p + dx) % 4, (p + dx) // 4))
                acc = d if acc is None else acc + d
            halves.append(acc.reshape(s2, 2, q4, cb).sum(axis=1))
        for bx in range(2):
            o2_ref[0, dx, :, bx] = halves[bx].astype(jnp.uint16)
        pool4 = (halves[0] + halves[1]).reshape(q4, 2, q4, cb).sum(axis=1)
        o4_ref[0, dx] = pool4.astype(jnp.uint16)


def tail_kern(cv4_ref, *out_refs):
    c = cv4_ref[0].astype(jnp.int32)  # (side, q4, q4, cb)
    cur, k, s = 4, 0, q4
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


@functools.partial(jax.jit, static_argnames=("cache",))
def run_main(patches_t, windows_t, cache):
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
    return pl.pallas_call(
        functools.partial(main_kern, cache=cache),
        grid=(n // cb, side),
        in_specs=[
            pl.BlockSpec((4, bs, q4, cb), lambda i, j: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, win, colsq, cb), lambda i, j: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, side, s2, 2, s2 // 2, cb),
                         lambda i, j: (j, 0, 0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, side, q4, q4, cb), lambda i, j: (j, 0, 0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((side, side, s2, 2, s2 // 2, n), jnp.uint16),
            jax.ShapeDtypeStruct((side, side, q4, q4, n), jnp.uint16),
        ],
        compiler_params=VP,
    )(psplit, wplanes)


@jax.jit
def run_tail(cv4):
    n = cv4.shape[-1]
    out_shapes, out_specs = [], []
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
    return pl.pallas_call(
        tail_kern,
        grid=(n // cb, side),
        in_specs=[
            pl.BlockSpec((1, side, q4, q4, cb), lambda i, j: (j, 0, 0, 0, i),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=VP,
    )(cv4)


for cache in (False, True):
    try:
        fn = jax.jit(lambda p, w, c=cache: run_main(p, w, c))
        dt = t(fn, patches, windows) - floor
        print(f"main (cache={cache}): {dt*1000:7.1f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"main cache={cache}: FAILED {str(e)[:300]}", flush=True)

cv4 = run_main(patches, windows, True)[1]
cv4 = jax.device_put(np.asarray(cv4))
try:
    dt = t(run_tail, cv4) - floor
    print(f"tail kernel        : {dt*1000:7.1f} ms", flush=True)
except Exception as e:  # noqa: BLE001
    print(f"tail: FAILED {str(e)[:300]}", flush=True)

try:
    both = jax.jit(lambda p, w: run_tail(run_main(p, w, True)[1]))
    dt = t(both, patches, windows) - floor
    print(f"main+tail fused jit: {dt*1000:7.1f} ms", flush=True)
except Exception as e:  # noqa: BLE001
    print(f"both: FAILED {str(e)[:300]}", flush=True)


# --- variant B: main stores cur4 SPLIT per-dx; tail pools from split ---

def main_kern_b(patches_ref, wplanes_ref, o2_ref, o4_ref):
    dy = pl.program_id(1)
    bp = [patches_ref[p].astype(jnp.int32) for p in range(4)]
    wq = [wplanes_ref[c, pl.ds(ext - r + dy, bs), :, :] for c in range(4)]
    for dx in range(side):
        halves = []
        for bx in range(2):
            acc = None
            for p in (2 * bx, 2 * bx + 1):
                d = jnp.abs(bp[p] - wq[(p + dx) % 4][:, (p + dx) // 4 : (p + dx) // 4 + q4, :].astype(jnp.int32))
                acc = d if acc is None else acc + d
            halves.append(acc.reshape(s2, 2, q4, cb).sum(axis=1))
        for bx in range(2):
            o2_ref[0, dx, :, bx] = halves[bx].astype(jnp.uint16)
        pool4 = (halves[0] + halves[1]).reshape(q4, 2, q4, cb).sum(axis=1)
        ps = pool4.reshape(q4, q4 // 2, 2, cb)
        for bx in range(2):
            o4_ref[0, dx, :, bx] = ps[:, :, bx].astype(jnp.uint16)


def tail_kern_b(cv4_ref, *out_refs):
    # input: (1, side, s, 2, s//2, cb) SPLIT cur4; cascade split->split
    c = cv4_ref[0].astype(jnp.int32)  # (side, s, 2, s//2, cb)
    cur, k, s = 4, 0, q4
    while cur < bs:
        a = c[:, :, 0] + c[:, :, 1]                    # x-pair: free select
        ar = a.reshape(side, s // 2, 2, s // 2, cb)    # y split: non-minor
        b = ar[:, :, 0] + ar[:, :, 1]                  # (side, s/2, s/2, cb)
        cur, s = cur * 2, s // 2
        dt = out_refs[k].dtype
        if cur < bs:
            cr = b.reshape(side, s, s // 2, 2, cb)     # sublane re-split
            for bx in range(2):
                out_refs[k][0, :, :, bx] = cr[:, :, :, bx].astype(dt)
            c = cr.transpose(0, 1, 3, 2, 4) if False else jnp.stack(
                [cr[:, :, :, 0], cr[:, :, :, 1]], axis=2
            )
        else:
            out_refs[k][0] = b.astype(dt)
        k += 1


@jax.jit
def run_main_b(patches_t, windows_t):
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
    return pl.pallas_call(
        main_kern_b,
        grid=(n // cb, side),
        in_specs=[
            pl.BlockSpec((4, bs, q4, cb), lambda i, j: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, win, colsq, cb), lambda i, j: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, side, s2, 2, s2 // 2, cb),
                         lambda i, j: (j, 0, 0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, side, q4, 2, q4 // 2, cb),
                         lambda i, j: (j, 0, 0, 0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((side, side, s2, 2, s2 // 2, n), jnp.uint16),
            jax.ShapeDtypeStruct((side, side, q4, 2, q4 // 2, n), jnp.uint16),
        ],
        compiler_params=VP,
    )(psplit, wplanes)


@jax.jit
def run_tail_b(cv4s):
    n = cv4s.shape[-1]
    out_shapes, out_specs = [], []
    cur = 8
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
    return pl.pallas_call(
        tail_kern_b,
        grid=(n // cb, side),
        in_specs=[
            pl.BlockSpec((1, side, q4, 2, q4 // 2, cb),
                         lambda i, j: (j, 0, 0, 0, 0, i),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=VP,
    )(cv4s)


try:
    dt = t(run_main_b, patches, windows) - floor
    print(f"main_b (cur4 split in-dx): {dt*1000:7.1f} ms", flush=True)
    both_b = jax.jit(lambda p, w: run_tail_b(run_main_b(p, w)[1]))
    dt = t(both_b, patches, windows) - floor
    print(f"main_b+tail_b fused jit  : {dt*1000:7.1f} ms", flush=True)
except Exception as e:  # noqa: BLE001
    print(f"variant B: FAILED {str(e)[:400]}", flush=True)

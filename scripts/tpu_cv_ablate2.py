"""Second-round ablation of the parity-plane pooled-CV kernel.

Variants (all compute cur=2 + cur=4 cost volumes only; the deeper sizes in
the production kernel pool from cur=4 and are comparatively tiny):

  grp_store   : production structure - fori over 8-dx groups, per-group
                window x-split relayout, u16 stores
  grp_acc     : same compute, accumulate instead of store (isolates the
                per-dx u16 convert+store cost)
  static_store: dx fully unrolled (no group fori), window planes pre-split
                in XLA, per-(plane, offset) slices cached/CSE'd, u16 stores
  static_acc  : static_store with accumulation instead of stores
  full        : kernels.cv_diff.delta_pooled_cvs baseline (all sizes)
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
q4 = bs // 4
s2 = bs // 2
colsq = cols // 4  # 18


def prep(patches_t, windows_t, presplit_w):
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
    if presplit_w:
        wslab = wslab.reshape(win, colsq, 4, n).transpose(2, 0, 1, 3)
    return psplit, wslab, n


def _grp_kern(patches_ref, wslab_ref, o2_ref, o4_ref, *, store):
    dy = pl.program_id(1)
    cbl = patches_ref.shape[-1]
    bp = [patches_ref[p].astype(jnp.int32) for p in range(4)]
    acc0 = (
        jnp.zeros((s2, 2, q4, cbl), jnp.int32),
        jnp.zeros((q4, q4, cbl), jnp.int32),
    )

    def body(g, accs):
        acc2, acc4 = accs
        wide = wslab_ref[pl.ds(ext - r + dy, bs), pl.ds(8 * g, bs + 8), :]
        wr = wide.reshape(bs, q4 + 2, 4, cbl)
        wq = [wr[:, :, c, :].astype(jnp.int32) for c in range(4)]
        for dxr in range(8):
            dx = 8 * g + dxr
            halves = []
            for bx in range(2):
                acc = None
                for p in (2 * bx, 2 * bx + 1):
                    c = (p + dxr) % 4
                    off = (p + dxr) // 4
                    d = jnp.abs(bp[p] - wq[c][:, off : off + q4, :])
                    acc = d if acc is None else acc + d
                halves.append(acc.reshape(s2, 2, q4, cbl).sum(axis=1))
            pool4 = (halves[0] + halves[1]).reshape(q4, 2, q4, cbl).sum(axis=1)
            if store:
                @pl.when(dx < side)
                def _():
                    for bx in range(2):
                        o2_ref[0, dx, :, bx] = halves[bx].astype(jnp.uint16)
                    o4_ref[0, dx] = pool4.astype(jnp.uint16)
            else:
                acc2 = acc2 + jnp.stack(halves, axis=1)
                acc4 = acc4 + pool4
        return (acc2, acc4)

    acc2, acc4 = jax.lax.fori_loop(0, ngroups, body, acc0)
    if not store:
        o2_ref[0, 0, :, 0] = acc2[:, 0].astype(jnp.uint16)
        o2_ref[0, 0, :, 1] = acc2[:, 1].astype(jnp.uint16)
        o4_ref[0, 0] = acc4.astype(jnp.uint16)


def _static_kern(patches_ref, wplanes_ref, o2_ref, o4_ref, *, store):
    dy = pl.program_id(1)
    cbl = patches_ref.shape[-1]
    bp = [patches_ref[p].astype(jnp.int32) for p in range(4)]
    wq = [
        wplanes_ref[c, pl.ds(ext - r + dy, bs), :, :].astype(jnp.int32)
        for c in range(4)
    ]
    sl = {}

    def shifted(c, off):
        if (c, off) not in sl:
            sl[(c, off)] = wq[c][:, off : off + q4, :]
        return sl[(c, off)]

    acc2 = jnp.zeros((s2, 2, q4, cbl), jnp.int32)
    acc4 = jnp.zeros((q4, q4, cbl), jnp.int32)
    for dx in range(side):
        halves = []
        for bx in range(2):
            acc = None
            for p in (2 * bx, 2 * bx + 1):
                c = (p + dx) % 4
                off = (p + dx) // 4
                d = jnp.abs(bp[p] - shifted(c, off))
                acc = d if acc is None else acc + d
            halves.append(acc.reshape(s2, 2, q4, cbl).sum(axis=1))
        pool4 = (halves[0] + halves[1]).reshape(q4, 2, q4, cbl).sum(axis=1)
        if store:
            for bx in range(2):
                o2_ref[0, dx, :, bx] = halves[bx].astype(jnp.uint16)
            o4_ref[0, dx] = pool4.astype(jnp.uint16)
        else:
            acc2 = acc2 + jnp.stack(halves, axis=1)
            acc4 = acc4 + pool4
    if not store:
        o2_ref[0, 0, :, 0] = acc2[:, 0].astype(jnp.uint16)
        o2_ref[0, 0, :, 1] = acc2[:, 1].astype(jnp.uint16)
        o4_ref[0, 0] = acc4.astype(jnp.uint16)


@functools.partial(jax.jit, static_argnames=("kind", "store"))
def run(patches_t, windows_t, kind, store):
    presplit = kind == "static"
    psplit, wsl, n = prep(patches_t, windows_t, presplit)
    if presplit:
        wspec = pl.BlockSpec(
            (4, win, colsq, cb), lambda i, j: (0, 0, 0, i),
            memory_space=pltpu.VMEM,
        )
        kern = functools.partial(_static_kern, store=store)
    else:
        wspec = pl.BlockSpec(
            (win, cols, cb), lambda i, j: (0, 0, i), memory_space=pltpu.VMEM
        )
        kern = functools.partial(_grp_kern, store=store)
    return pl.pallas_call(
        kern,
        grid=(n // cb, side),
        in_specs=[
            pl.BlockSpec((4, bs, q4, cb), lambda i, j: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            wspec,
        ],
        out_specs=[
            pl.BlockSpec((1, side, s2, 2, q4, cb),
                         lambda i, j: (j, 0, 0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, side, q4, q4, cb), lambda i, j: (j, 0, 0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((side, side, s2, 2, q4, n), jnp.uint16),
            jax.ShapeDtypeStruct((side, side, q4, q4, n), jnp.uint16),
        ],
    )(psplit, wsl)


base = jax.jit(lambda p, w: delta_pooled_cvs(p, w, bs, ext, r, "sad"))
dt = t(base, patches, windows) - floor
print(f"full baseline : {dt*1000:7.1f} ms", flush=True)
for label, kind, store in (
    ("grp_store", "grp", True),
    ("grp_acc", "grp", False),
    ("static_store", "static", True),
    ("static_acc", "static", False),
):
    try:
        fn = jax.jit(lambda p, w, k=kind, s=store: run(p, w, k, s))
        dt = t(fn, patches, windows) - floor
        print(f"{label:14s}: {dt*1000:7.1f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)

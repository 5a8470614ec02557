"""Prototype: Pallas DMA window gather vs the XLA vmapped dynamic_slice.

The engine gathers one (win, win) frame-2 window per parent block at data-
dependent offsets.  XLA lowers the vmapped dynamic_slice to a sequential
while loop (~1.1 us/window); here a Pallas kernel issues GW outstanding
async copies per grid step instead.
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

from blockbasedmotionestimation_tpu.ops.search import _gather_windows

bs, ext = 32, 16
win = bs + 2 * ext
H, W = 1280, 2048
npy, npx = H // bs, W // bs
nblk = npy * npx
rng = np.random.default_rng(0)
im2 = jax.device_put(jnp.asarray(rng.integers(0, 256, (H, W), dtype=np.uint8)))
by = jax.device_put(jnp.asarray(rng.integers(0, H - bs, nblk, dtype=np.int32)))
bx = jax.device_put(jnp.asarray(rng.integers(0, W - bs, nblk, dtype=np.int32)))


def sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(jnp.ravel(leaf)[0]))


def t(fn, *a, n=10):
    sync(fn(*a))
    t0 = time.time()
    for _ in range(n):
        sync(fn(*a))
    return (time.time() - t0) / n


floor = t(jax.jit(lambda x: x + 1.0), jnp.zeros((8, 8)))
print(f"floor {floor*1000:.1f} ms", flush=True)


def _gather_kernel(off_ref, im_ref, out_ref, sems, *, gw):
    g = pl.program_id(0)
    copies = []
    for k in range(gw):
        b = g * gw + k
        c = pltpu.make_async_copy(
            im_ref.at[pl.ds(off_ref[0, b], win), pl.ds(off_ref[1, b], win)],
            out_ref.at[k],
            sems.at[k],
        )
        c.start()
        copies.append(c)
    for c in copies:
        c.wait()


@functools.partial(jax.jit, static_argnames=("gw",))
def pallas_gather(im2, by, bx, gw):
    im2p = jnp.pad(im2, ((ext, ext), (ext, ext)))
    nb = by.shape[0]
    nbp = -(-nb // gw) * gw
    offs = jnp.stack([
        jnp.pad(by, (0, nbp - nb)), jnp.pad(bx, (0, nbp - nb))
    ])
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbp // gw,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((gw, win, win), lambda g, sc: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((gw,))],
    )
    out = pl.pallas_call(
        functools.partial(_gather_kernel, gw=gw),
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((nbp, win, win), jnp.uint8),
    )(offs, im2p)
    return out[:nb]


# reference path (current): gather + i16 + lane-major transpose
@jax.jit
def xla_path(im2, by, bx):
    w = _gather_windows(im2, by, bx, bs, ext).astype(jnp.int16)
    return w.transpose(1, 2, 0)


@functools.partial(jax.jit, static_argnames=("gw",))
def pallas_path(im2, by, bx, gw):
    w = pallas_gather(im2, by, bx, gw).astype(jnp.int16)
    return w.transpose(1, 2, 0)


ref = np.asarray(jax.jit(lambda i, y, x: _gather_windows(i, y, x, bs, ext))(im2, by, bx))
for gw in (8, 16, 32):
    try:
        got = np.asarray(pallas_gather(im2, by, bx, gw))
        np.testing.assert_array_equal(got, ref)
        dt = t(lambda i, y, x, g=gw: pallas_gather(i, y, x, g), im2, by, bx) - floor
        print(f"pallas gather gw={gw:2d}: {dt*1000:7.2f} ms (correct)", flush=True)
    except AssertionError:
        print(f"pallas gather gw={gw}: WRONG RESULT", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"pallas gather gw={gw}: FAILED {str(e)[:300]}", flush=True)

dt = t(xla_path, im2, by, bx) - floor
print(f"xla gather+i16+T    : {dt*1000:7.2f} ms", flush=True)
try:
    dt = t(lambda i, y, x: pallas_path(i, y, x, 16), im2, by, bx) - floor
    print(f"pallas gather+i16+T : {dt*1000:7.2f} ms", flush=True)
except Exception as e:  # noqa: BLE001
    print(f"pallas path: FAILED {str(e)[:300]}", flush=True)

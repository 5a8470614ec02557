"""Window gather: XLA vmapped dynamic-slice loop vs Pallas DMA gather.

The production gather fetches one (win, win) u8 window per parent block from
the ext-padded frame-2 (20k windows across levels at the bench shape) - as
XLA ops that's a ~20k-iteration serialized slice+update storm measured at
~25-45 ms of device time.  A Pallas kernel can instead issue grouped async
DMAs from the HBM-resident frame at scalar-prefetched offsets.
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

from blockbasedmotionestimation_tpu.ops.search import _gather_windows_impl

B = 8
H, W = 1088, 1920
bs, ext = 32, 16
win = bs + 2 * ext
Hp, Wp = H + 2 * ext, W + 2 * ext
nW = B * (H // bs) * (W // bs)

rng = np.random.default_rng(0)
flat = jax.device_put(
    jnp.asarray(rng.integers(0, 256, size=(B * Hp, Wp), dtype=np.uint8))
)
# windows never cross frame bands (each frame keeps its own ext padding)
by_f = rng.integers(0, Hp - win + 1, size=nW).astype(np.int32)
by_f += (np.arange(nW) // (nW // B)).astype(np.int32) * Hp
bx_f = rng.integers(0, Wp - win + 1, size=nW).astype(np.int32)
by = jax.device_put(jnp.asarray(by_f))
bx = jax.device_put(jnp.asarray(bx_f))


def sync(x):
    return float(np.asarray(jnp.ravel(x)[0]))


def t(fn, *a, n=20):
    sync(fn(*a))
    t0 = time.time()
    for _ in range(n):
        sync(fn(*a))
    return (time.time() - t0) / n


floor = t(jax.jit(lambda x: x + 1.0), jnp.zeros((8, 8)))
print(f"floor {floor*1000:.2f} ms", flush=True)

# -- current XLA path ---------------------------------------------------
xla = jax.jit(functools.partial(_gather_windows_impl, win=win))
out_ref = xla(flat, by, bx)
print(f"xla   : {(t(xla, flat, by, bx)-floor)*1000:.2f} ms", flush=True)


# -- pallas DMA gather ---------------------------------------------------
def _kernel(by_ref, bx_ref, im_ref, out_ref, sem, *, g_sz, win):
    g = pl.program_id(0)
    cps = []
    for k in range(g_sz):
        i = g * g_sz + k
        cp = pltpu.make_async_copy(
            im_ref.at[pl.ds(by_ref[i], win), pl.ds(bx_ref[i], win)],
            out_ref.at[k],
            sem,
        )
        cp.start()
        cps.append(cp)
    for cp in cps:
        cp.wait()


def make_pallas(g_sz):
    grid = nW // g_sz

    def run(im, by, bx):
        return pl.pallas_call(
            functools.partial(_kernel, g_sz=g_sz, win=win),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(grid,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
                out_specs=pl.BlockSpec(
                    (g_sz, win, win), lambda g, by, bx: (g, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                scratch_shapes=[pltpu.SemaphoreType.DMA(())],
            ),
            out_shape=jax.ShapeDtypeStruct((nW, win, win), jnp.uint8),
        )(by, bx, im)

    return jax.jit(run)


for g_sz in (8, 16, 32, 64):
    if nW % g_sz:
        continue
    try:
        f = make_pallas(g_sz)
        out_p = f(flat, by, bx)
        ok = bool(jnp.array_equal(out_p, out_ref))
        dt = t(f, flat, by, bx) - floor
        print(f"pallas G={g_sz:3d}: {dt*1000:.2f} ms equal={ok}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"pallas G={g_sz}: FAILED {str(e)[:200]}", flush=True)

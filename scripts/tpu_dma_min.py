"""Minimal probes: (a) manual DMA copy, (b) scalar prefetch, in isolation."""

import numpy as np
import jax
import _cache  # noqa: F401
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.default_backend(), flush=True)

x = jax.device_put(jnp.arange(256 * 256, dtype=jnp.float32).reshape(256, 256))


def run(name, fn):
    try:
        out = fn()
        print(f"{name}: OK sum={float(jnp.sum(out)):.1f} "
              f"exp={float(jnp.sum(x[:8])):.1f}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL {str(e)[:150]}".replace("\n", " "), flush=True)


# (a) manual DMA HBM->VMEM, static offsets, no scalar prefetch
def dma_kern(im_ref, out_ref, sem):
    cp = pltpu.make_async_copy(im_ref.at[pl.ds(0, 8)], out_ref, sem)
    cp.start()
    cp.wait()


run("manual-dma-static", lambda: pl.pallas_call(
    dma_kern,
    grid=(1,),
    in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
    out_specs=pl.BlockSpec((8, 256), lambda g: (0, 0),
                           memory_space=pltpu.VMEM),
    scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    out_shape=jax.ShapeDtypeStruct((8, 256), jnp.float32),
)(x))


# (b) scalar prefetch driving an index_map, no manual DMA
def sp_kern(idx_ref, im_ref, out_ref):
    out_ref[...] = im_ref[...]


idx = jax.device_put(jnp.zeros((1,), dtype=jnp.int32))
run("scalar-prefetch", lambda: pl.pallas_call(
    sp_kern,
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec((8, 256), lambda g, i: (i[0], 0))],
        out_specs=pl.BlockSpec((8, 256), lambda g, i: (0, 0)),
    ),
    out_shape=jax.ShapeDtypeStruct((8, 256), jnp.float32),
)(idx, x))


# (c) manual DMA with dynamic offset from scalar prefetch
def dma_dyn_kern(y_ref, im_ref, out_ref, sem):
    cp = pltpu.make_async_copy(
        im_ref.at[pl.ds(y_ref[0], 8)], out_ref, sem
    )
    cp.start()
    cp.wait()


run("manual-dma-dynamic", lambda: pl.pallas_call(
    dma_dyn_kern,
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((8, 256), lambda g, y: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    ),
    out_shape=jax.ShapeDtypeStruct((8, 256), jnp.float32),
)(idx, x))


# (d) manual DMA with dynamic offset from an SMEM input (no prefetch)
def dma_smem_kern(y_ref, im_ref, out_ref, sem):
    cp = pltpu.make_async_copy(
        im_ref.at[pl.ds(y_ref[0], 8)], out_ref, sem
    )
    cp.start()
    cp.wait()


run("manual-dma-smem", lambda: pl.pallas_call(
    dma_smem_kern,
    grid=(1,),
    in_specs=[
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ],
    out_specs=pl.BlockSpec((8, 256), lambda g: (0, 0),
                           memory_space=pltpu.VMEM),
    scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    out_shape=jax.ShapeDtypeStruct((8, 256), jnp.float32),
)(idx, x))


# (e) same but offset into BOTH dims from SMEM
def dma_smem2_kern(y_ref, im_ref, out_ref, sem):
    cp = pltpu.make_async_copy(
        im_ref.at[pl.ds(y_ref[0] + 3, 8), pl.ds(y_ref[0] + 17, 128)],
        out_ref, sem,
    )
    cp.start()
    cp.wait()


def run2(name, fn, exp):
    try:
        out = fn()
        print(f"{name}: OK equal={bool(jnp.array_equal(out, exp))}",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL {str(e)[:150]}".replace("\n", " "), flush=True)


run2("manual-dma-smem-2d", lambda: pl.pallas_call(
    dma_smem2_kern,
    grid=(1,),
    in_specs=[
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pl.ANY),
    ],
    out_specs=pl.BlockSpec((8, 128), lambda g: (0, 0),
                           memory_space=pltpu.VMEM),
    scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
)(idx, x), x[3:11, 17:145])

"""Probe which async-DMA slice forms compile on this Mosaic version."""

import functools

import numpy as np
import jax
import _cache  # noqa: F401
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("backend:", jax.default_backend(), flush=True)

H, W = 512, 1024
win = 64
n = 128
rng = np.random.default_rng(0)


def probe(name, dtype, both_dims, align_lane):
    im = jax.device_put(
        jnp.asarray(rng.integers(0, 200, size=(H, W)).astype(dtype))
    )
    ys = jax.device_put(
        jnp.asarray(rng.integers(0, H - win, size=n).astype(np.int32))
    )
    if align_lane:
        xs_np = (rng.integers(0, (W - 2 * win) // 128, size=n) * 128)
    else:
        xs_np = rng.integers(0, W - win, size=n)
    xs = jax.device_put(jnp.asarray(xs_np.astype(np.int32)))
    wout = win if both_dims else W

    def kern(y_ref, x_ref, im_ref, out_ref, sem):
        g = pl.program_id(0)
        if both_dims:
            src = im_ref.at[pl.ds(y_ref[g], win), pl.ds(x_ref[g], win)]
        else:
            src = im_ref.at[pl.ds(y_ref[g], win)]
        cp = pltpu.make_async_copy(src, out_ref.at[0], sem)
        cp.start()
        cp.wait()

    try:
        out = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(n,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=pl.BlockSpec(
                    (1, win, wout), lambda g, y, x: (g, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                scratch_shapes=[pltpu.SemaphoreType.DMA(())],
            ),
            out_shape=jax.ShapeDtypeStruct((n, win, wout), im.dtype),
        )(ys, xs, im)
        got = np.asarray(out)
        exp = np.stack([
            np.asarray(im)[y : y + win, x : x + win]
            if both_dims else np.asarray(im)[y : y + win]
            for y, x in zip(np.asarray(ys), np.asarray(xs))
        ])
        print(f"{name}: OK equal={np.array_equal(got, exp)}", flush=True)
    except Exception as e:  # noqa: BLE001
        msg = str(e).replace("\n", " ")[:160]
        print(f"{name}: FAIL {msg}", flush=True)


probe("u8  rows-only        ", np.uint8, False, False)
probe("u8  both-dims  free-x", np.uint8, True, False)
probe("u8  both-dims  128-x ", np.uint8, True, True)
probe("i16 both-dims  free-x", np.int16, True, False)
probe("i32 both-dims  free-x", np.int32, True, False)

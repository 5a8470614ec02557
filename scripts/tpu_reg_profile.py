"""Per-block-size regularizer sweep timing on TPU + gather formulation test."""

import time

import numpy as np
import jax
import _cache  # noqa: F401  (persistent compile cache)
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from blockbasedmotionestimation_tpu.ops.regularize import regularize_sweep

H, W = 1088, 1920
rng = np.random.default_rng(0)
im1 = jax.device_put(jnp.asarray(rng.integers(0, 256, size=(H, W), dtype=np.uint8)))
im2 = jax.device_put(jnp.asarray(rng.integers(0, 256, size=(H, W), dtype=np.uint8)))
_ = np.asarray(im1[0, 0])


def sync(x):
    return float(np.asarray(x.reshape(-1)[0]))


for cur in (32, 16, 8, 4, 2):
    grid = jax.device_put(
        jnp.asarray(rng.integers(-4, 5, size=(H // cur, W // cur, 2)).astype(np.float32))
    )
    out = regularize_sweep(im1, im2, grid, cur, jnp.float32(16.0), jnp.float32(1.0), "fourcolor")
    sync(out)  # compile
    t0 = time.time()
    out = regularize_sweep(im1, im2, grid, cur, jnp.float32(16.0), jnp.float32(1.0), "fourcolor")
    sync(out)
    print(f"fourcolor sweep bs={cur}: {(time.time()-t0)*1000:.1f} ms", flush=True)

# gather formulation microbench at bs=2: vmap-dynamic-slice vs flat take
bs = 2
nblk = (H // bs) * (W // bs) // 4
ty = jax.device_put(jnp.asarray(rng.integers(0, H - bs, size=(nblk,), dtype=np.int32)))
tx = jax.device_put(jnp.asarray(rng.integers(0, W - bs, size=(nblk,), dtype=np.int32)))


@jax.jit
def gather_vmap(im, y, x):
    def one(yy, xx):
        return jax.lax.dynamic_slice(im, (yy, xx), (bs, bs))
    return jax.vmap(one)(y, x).astype(jnp.int32).sum()


@jax.jit
def gather_flat(im, y, x):
    flat = im.reshape(-1).astype(jnp.int32)
    r = jnp.arange(bs, dtype=jnp.int32)
    idx = ((y[:, None] + r[None, :])[:, :, None] * W + (x[:, None] + r[None, :])[:, None, :])
    return jnp.take(flat, idx.reshape(-1), mode="clip").sum()


@jax.jit
def gather_rows(im, y, x):
    # full-row gather then masked column pick
    r = jnp.arange(bs, dtype=jnp.int32)
    rows = im[jnp.clip(y[:, None] + r[None, :], 0, H - bs)]  # (nblk, bs, W) gather of rows
    return rows.astype(jnp.int32).sum()


for name, fn in [("vmap_dslice", gather_vmap), ("flat_take", gather_flat), ("row_gather", gather_rows)]:
    out = fn(im2, ty, tx)
    _ = int(np.asarray(out))
    t0 = time.time()
    out = fn(im2, ty, tx)
    _ = int(np.asarray(out))
    print(f"{name} ({nblk} blocks of {bs}x{bs}): {(time.time()-t0)*1000:.1f} ms", flush=True)

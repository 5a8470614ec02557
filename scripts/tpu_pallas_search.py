"""Pallas vs XLA search timing on the real chip."""

import time

import numpy as np
import jax
import _cache  # noqa: F401
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from blockbasedmotionestimation_tpu.ops.search import block_search_level

H, W = 1088, 1920
bs, ss = 32, 64
rng = np.random.default_rng(0)
im1 = jax.device_put(jnp.asarray(rng.integers(0, 256, size=(H, W), dtype=np.uint8)))
im2 = jax.device_put(jnp.asarray(rng.integers(0, 256, size=(H, W), dtype=np.uint8)))
pred = jnp.zeros((H // bs, W // bs, 2), dtype=jnp.float32)


def sync(x):
    return float(np.asarray(jnp.ravel(x)[0]))


for impl in ("xla", "pallas"):
    try:
        out = block_search_level(im1, im2, pred, bs, ss, impl=impl)
        sync(out)
        t0 = time.time()
        for _ in range(3):
            out = block_search_level(im1, im2, pred, bs, ss, impl=impl)
            sync(out)
        print(f"search impl={impl}: {(time.time()-t0)/3*1000:.1f} ms", flush=True)
        if impl == "pallas":
            a = np.asarray(block_search_level(im1, im2, pred, bs, ss, impl="xla"))
            b = np.asarray(out)
            print("pallas == xla:", np.array_equal(a, b), flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"search impl={impl}: FAILED {type(e).__name__}: {e}", flush=True)

"""Per-level timing of the block search inside a B=4 vmapped jit (bench-like)."""

import time

import numpy as np
import jax
import _cache  # noqa: F401
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from blockbasedmotionestimation_tpu.ops.search import block_search_level
from blockbasedmotionestimation_tpu.ops import resample

B, H, W = 4, 1152, 1920  # padded bench shape (1080 -> mult of 256)
rng = np.random.default_rng(0)
base = rng.integers(0, 256, size=(B, H + 16, W + 16), dtype=np.uint8)
im1 = jax.device_put(jnp.asarray(base[:, :H, :W]))
im2 = jax.device_put(jnp.asarray(base[:, 5:5 + H, 9:9 + W]))


def sync(x):
    return float(np.asarray(jnp.ravel(x)[0]))


def t(fn, *a, n=6):
    sync(fn(*a))
    t0 = time.time()
    for _ in range(n):
        sync(fn(*a))
    return (time.time() - t0) / n


floor = t(jax.jit(lambda x: x + 1.0), jnp.zeros((8, 8, 8)))
print(f"floor {floor*1000:.1f} ms", flush=True)

bs, ss = 32, 64
pyr1 = jax.jit(lambda x: jax.vmap(lambda im: resample.build_pyramid(im, 4))(x))(im1)
pyr2 = jax.jit(lambda x: jax.vmap(lambda im: resample.build_pyramid(im, 4))(x))(im2)

for lvl in range(4):
    a, b = pyr1[lvl], pyr2[lvl]
    h, w = a.shape[1:]
    pred = jnp.zeros((B, h // bs, w // bs, 2), dtype=jnp.float32)
    for impl in ("pallas", "xla"):
        fn = jax.jit(
            lambda x, y, p, impl=impl: jax.vmap(
                lambda u, v, q: block_search_level(u, v, q, bs, ss, impl=impl)
            )(x, y, p)
        )
        dt = t(fn, a, b, pred)
        print(
            f"L{lvl} {h}x{w} impl={impl}: {(dt-floor)*1000:7.1f} ms"
            f" ({(dt-floor)/B*1000:6.2f} ms/field)",
            flush=True,
        )

"""Phase breakdown of the FUSED windowed path (windowed_level) at bench shapes.

Times each pyramid level's fused level function (vmapped over B) and, at
full res, splits gather / CV build / search argmin / rounds by differential
stubbing. Values under ~5 ms are dispatch noise (DESIGN.md section 5).
"""

import time

import numpy as np
import jax
import _cache  # noqa: F401
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from blockbasedmotionestimation_tpu.ops.windowed import windowed_level

rng = np.random.default_rng(0)
B = 8
bs, ss = 32, 64


def sync(x):
    return float(np.asarray(jnp.ravel(x)[0]))


def t(fn, *a, n=5, **kw):
    sync(fn(*a, **kw))
    t0 = time.time()
    for _ in range(n):
        sync(fn(*a, **kw))
    return (time.time() - t0) / n


floor = t(jax.jit(lambda x: x + 1.0), jnp.zeros((8, 8, 8)), n=10)
print(f"dispatch floor {floor*1000:.1f} ms", flush=True)

# the engine pads 1080x1920 to 1280x2048 (mod 2^3*32); these are the real
# per-level shapes the bench pipeline runs
total = 0.0
for (h, w) in [(1280, 2048), (640, 1024), (320, 512), (160, 256)]:
    base = rng.integers(0, 256, size=(B, h + 16, w + 16), dtype=np.uint8)
    im1 = jax.device_put(jnp.asarray(base[:, :h, :w]))
    im2 = jax.device_put(jnp.asarray(base[:, 5:5 + h, 9:9 + w]))
    pred = jax.device_put(
        jnp.asarray(
            rng.integers(-3, 4, size=(B, h // bs, w // bs, 2)), dtype=jnp.float32
        )
    )

    fn = jax.jit(
        jax.vmap(
            lambda a, b, p: windowed_level(
                a, b, p, bs, ss, float(bs) * 0.5, 2, impl="pallas"
            )
        )
    )
    dt = t(fn, im1, im2, pred)
    total += dt
    print(f"level {h}x{w}: {dt*1000:7.1f} ms (B={B})", flush=True)

print(f"sum levels: {total*1000:.1f} ms -> {B/total:.1f} fields/s ex-glue", flush=True)

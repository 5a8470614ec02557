"""A/B the pooled-CV kernel variants: reshape-pooling vs parity-plane.

The ablation (tpu_cv_ablate.py) showed diff+slices cost ~1.4 ms but the 2x2
x-pool reshapes cost ~12 ms (sublane splits relayout every element, once per
delta column).  The planes variant de-interleaves the window slab once per
8-dx group instead (see kernels/cv_diff._pooled_kernel_planes).
"""

import os
import time

import numpy as np
import jax
import _cache  # noqa: F401
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from blockbasedmotionestimation_tpu.kernels.cv_diff import delta_pooled_cvs

INTERP = bool(int(os.environ.get("CV_INTERPRET", "0")))
bs, ext, r = 32, 16, 16
side = 2 * r + 1
H, W = 1152, 1920
n_p = 7 if INTERP else (H // bs) * (W // bs)
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

ref = None
for cost in ("sad", "ssd"):
    for variant in ("reshape", "planes"):
        fn = jax.jit(
            lambda p, w, c=cost, v=variant: delta_pooled_cvs(
                p, w, bs, ext, r, c, interpret=INTERP, variant=v
            )
        )
        try:
            out = fn(patches, windows)
            if variant == "reshape":
                ref = out
                ok = True
            else:
                ok = all(
                    bool(jnp.array_equal(ref[c][..., :n_p], out[c][..., :n_p]))
                    for c in ref
                )
            dt = t(fn, patches, windows) - floor
            print(f"{cost} {variant:8s}: {dt*1000:7.1f} ms  match={ok}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{cost} {variant}: FAILED {type(e).__name__}:"
                  f" {str(e)[:300]}", flush=True)

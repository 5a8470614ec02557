"""Microbenchmark the chunk-fused color step vs the dense CV path at the
L0 bench shape (1080p padded: 1280x2048, bs=32, B=8 -> 20480 parents).

Isolates: (a) CV build cost deep vs full, (b) one cur=2 color step fused vs
dense, with near-uniform candidate deltas (the bench workload's regime).
"""

import sys
import time

import numpy as np

import _cache  # noqa: F401
import jax
import jax.numpy as jnp

from blockbasedmotionestimation_tpu.kernels import cv_diff, fused_step, reg_step

BS, EXT = 32, 16
SIDE = 2 * EXT + 1
NP_TOT = 8 * 40 * 64  # B=8 x (1280/32) x (2048/32)
H, W = 1280, 2048


def sync(x):
    # device-side scalar index FIRST; np.asarray on the full array would
    # download gigabytes through the remote tunnel
    return float(np.asarray(x[(0,) * x.ndim]))


def timeit(name, fn, *args, iters=5, keep=True, **kw):
    out = fn(*args, **kw)
    o = list(out.values())[0] if isinstance(out, dict) else out
    sync(o)
    if not keep:
        # multi-GB outputs: never hold two result sets at once
        del out, o
    t0 = time.time()
    for _ in range(iters):
        nxt = fn(*args, **kw)
        o = list(nxt.values())[0] if isinstance(nxt, dict) else nxt
        sync(o)
        if keep:
            out = nxt
        del nxt, o
    dt = (time.time() - t0) / iters
    print(f"{name:36s}: {dt*1e3:8.2f} ms", flush=True)
    return out if keep else None


def main():
    rng = np.random.default_rng(0)
    patches = jnp.asarray(
        rng.integers(0, 256, (BS, BS, NP_TOT), dtype=np.int16)
    )
    win = BS + 2 * EXT
    windows = jnp.asarray(
        rng.integers(0, 256, (win, win, NP_TOT), dtype=np.int16)
    )

    print(f"nP={NP_TOT} ({NP_TOT//128} chunks)", flush=True)
    timeit(
        "delta_pooled_cvs (dense build)", cv_diff.delta_pooled_cvs,
        patches, windows, BS, EXT, EXT, "sad", iters=3, keep=False,
    )
    timeit(
        "deep_pooled_cvs (fused build)", cv_diff.deep_pooled_cvs,
        patches, windows, BS, EXT, EXT, 4, "sad", iters=3, keep=False,
    )
    dense = cv_diff.delta_pooled_cvs(patches, windows, BS, EXT, EXT, "sad")
    dense = {2: dense[2], 4: dense[4]}  # drop the small deeper volumes

    # one cur=2 color step: cands near-uniform (deltas in {-1,0,1})
    cur = 2
    f = BS // cur
    s2 = f // 2
    npp = NP_TOT
    nch = npp // 128
    pm = jnp.zeros((nch, 2, 128), jnp.int32)
    cands = jnp.asarray(
        rng.integers(-1, 2, (nch, 9, 2, s2, s2, 128), dtype=np.int32)
    )
    present = jnp.ones((4, nch, 9, s2, s2, 128), jnp.int32)
    rank = jnp.asarray(
        np.broadcast_to(
            np.arange(9, dtype=np.int32)[None, None, :, None, None, None],
            (4, nch, 9, s2, s2, 128),
        ).copy()
    )
    oy = jnp.asarray(
        np.broadcast_to(
            (np.arange(s2, dtype=np.int32) * cur * 2)[None, None, :, None, None],
            (4, nch, s2, 1, 128),
        ).copy()
    )
    ox = jnp.asarray(
        np.broadcast_to(
            (np.arange(s2, dtype=np.int32) * cur * 2)[None, None, :, None],
            (4, nch, s2, 128),
        ).copy()
    )
    sc = jnp.asarray([0, 0, 0, 0], jnp.int32)
    lam = jnp.float32(16.0)

    cur4 = 4
    s24 = (BS // cur4) // 2
    cands4 = jnp.asarray(
        rng.integers(-1, 2, (nch, 9, 2, s24, s24, 128), dtype=np.int32)
    )
    present4 = jnp.ones((4, nch, 9, s24, s24, 128), jnp.int32)
    rank4 = jnp.asarray(
        np.broadcast_to(
            np.arange(9, dtype=np.int32)[None, None, :, None, None, None],
            (4, nch, 9, s24, s24, 128),
        ).copy()
    )
    oy4 = jnp.zeros((4, nch, s24, 1, 128), jnp.int32)
    ox4 = jnp.zeros((4, nch, s24, 128), jnp.int32)

    timeit(
        "dense pm color step (cur=2)", reg_step.windowed_color_step_pm,
        sc, lam, dense[2], cands, pm, present, rank, oy, ox,
        SIDE, EXT, cur, H, W, iters=10,
    )
    timeit(
        "dense pm color step (cur=4)", reg_step.windowed_color_step_pm,
        sc, lam, dense[4], cands4, pm, present4, rank4, oy4, ox4,
        SIDE, EXT, cur4, H, W, iters=10,
    )
    del dense  # free ~14 GB before the fused variants run

    patches_pl, wslab = fused_step.prep_slabs(patches, windows, BS, EXT, EXT)
    timeit(
        "fused color step (cur=2, d<=1)", fused_step.windowed_color_step_pm_fused,
        sc, lam, patches_pl, wslab, cands, pm, present, rank, oy, ox,
        BS, EXT, EXT, cur, "sad", H, W, iters=10,
    )
    # wider spread: deltas in [-4, 4]
    cands2 = jnp.asarray(
        rng.integers(-4, 5, (nch, 9, 2, s2, s2, 128), dtype=np.int32)
    )
    timeit(
        "fused color step (cur=2, d<=4)", fused_step.windowed_color_step_pm_fused,
        sc, lam, patches_pl, wslab, cands2, pm, present, rank, oy, ox,
        BS, EXT, EXT, cur, "sad", H, W, iters=10,
    )
    timeit(
        "fused color step (cur=4, d<=1)", fused_step.windowed_color_step_pm_fused,
        sc, lam, patches_pl, wslab, cands4, pm, present4, rank4, oy4, ox4,
        BS, EXT, EXT, cur4, "sad", H, W, iters=10,
    )


if __name__ == "__main__":
    main()

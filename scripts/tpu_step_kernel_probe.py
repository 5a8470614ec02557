"""Standalone timing of windowed_color_step_pm at bench L0 shapes (B=1).

Separates DMA floor (bytes / 819 GB/s) from per-tile overhead + compute for
each round size.  One color step per measurement, scan over REPS inside one
jit to amortize dispatch.
"""

import time

import numpy as np
import jax
import _cache  # noqa: F401
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from blockbasedmotionestimation_tpu.kernels.reg_step import windowed_color_step_pm

H, W = 1280, 2048
bs, ss, ext = 32, 64, 16
side = 2 * ext + 1
npy, npx = H // bs, W // bs
n_p = npy * npx
npp = -(-n_p // 128) * 128
nch = npp // 128
rng = np.random.default_rng(0)

REPS = 10


def sync(x):
    return float(np.asarray(jnp.ravel(x)[0]))


def t(fn, *a, n=4):
    sync(fn(*a))
    t0 = time.time()
    for _ in range(n):
        sync(fn(*a))
    return (time.time() - t0) / n


floor = t(jax.jit(lambda x: x + 1.0), jnp.zeros((8, 8)), n=10)
print(f"floor {floor*1000:.1f} ms", flush=True)

for cur in (2, 4, 8, 16):
    f = bs // cur
    s2 = f // 2
    cvdt = jnp.uint16
    cv = jnp.asarray(
        rng.integers(0, 60000, (f, 2, nch, side, side, s2, 128)), dtype=cvdt
    )
    cands = jnp.asarray(
        rng.integers(-3, 4, (9, 2, s2, s2, npp)), dtype=jnp.int32
    )
    pm = jnp.zeros((2, npp), jnp.int32)
    present = jnp.ones((4, 9, s2, s2, npp), jnp.int32)
    rank = jnp.asarray(
        np.broadcast_to(np.arange(9)[None, :, None, None, None],
                        (4, 9, s2, s2, npp)).copy(), dtype=jnp.int32
    )
    oy = jnp.zeros((4, s2, 1, npp), jnp.int32)
    ox = jnp.zeros((4, s2, npp), jnp.int32)
    sc = jnp.asarray([0, 0, 0, 0], jnp.int32)
    lam = jnp.float32(16.0)

    args = (cv, cands, pm, present, rank, oy, ox)

    def run(cv, cands, pm, present, rank, oy, ox, cur=cur, s2=s2):
        def step(c, _):
            nm = windowed_color_step_pm(
                sc, lam, cv, cands + c, pm, present, rank, oy, ox,
                side, ext, cur, H, W,
            )
            return c + 0 * nm[0, 0, 0, 0], None

        c, _ = jax.lax.scan(step, jnp.int32(0), None, length=REPS)
        return c

    jr = jax.jit(run)
    dt = (t(jr, *args) - floor) / REPS
    bytes_tile = side * side * s2 * 128 * 2
    tiles = (f // 2) * nch
    dma = (
        bytes_tile * tiles
        + cands.nbytes + present.nbytes // 4 + rank.nbytes // 4
    ) / 819e9
    print(
        f"cur={cur:2d}: {dt*1e6:8.1f} us/step  tiles={tiles:4d}"
        f"  dma-floor={dma*1e6:7.1f} us  overhead+compute={1e6*(dt-dma):7.1f} us"
        f"  ({1e6*(dt-dma)/tiles:5.2f} us/tile)",
        flush=True,
    )

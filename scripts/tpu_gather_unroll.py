"""Window gather: does unrolling K slices per scan step beat vmap'd ds?"""

import functools
import time

import numpy as np
import jax
import _cache  # noqa: F401
import jax.numpy as jnp

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

xla = jax.jit(functools.partial(_gather_windows_impl, win=win))
out_ref = xla(flat, by, bx)
print(f"vmap-ds      : {(t(xla, flat, by, bx)-floor)*1000:.2f} ms", flush=True)


def make_unrolled(K):
    nc = nW // K

    def run(im, by, bx):
        byc = by.reshape(nc, K)
        bxc = bx.reshape(nc, K)

        def step(_, yx):
            ys, xs = yx
            wins = [
                jax.lax.dynamic_slice(im, (ys[k], xs[k]), (win, win))
                for k in range(K)
            ]
            return None, jnp.stack(wins)

        _, out = jax.lax.scan(step, None, (byc, bxc))
        return out.reshape(nW, win, win)

    return jax.jit(run)


for K in (4, 8, 16):
    f = make_unrolled(K)
    out = f(flat, by, bx)
    ok = bool(jnp.array_equal(out, out_ref))
    print(f"scan-unroll K={K:2d}: {(t(f, flat, by, bx)-floor)*1000:.2f} ms "
          f"equal={ok}", flush=True)


# row-pair trick: windows as (win, 2*win) fetches of two x-neighbors when
# their rows coincide? (not general) -- instead try fetching at u32 lanes:
# reinterpret 4 u8 cols as one u32 so the minor dim shrinks 4x
def make_u32():
    assert Wp % 4 == 0

    def run(im, by, bx):
        im32 = jax.lax.bitcast_convert_type(
            im.reshape(B * Hp, Wp // 4, 4), jnp.uint32
        )
        # window x must be 4-aligned: fetch win//4+1 u32 cols starting at
        # floor(x/4), then realign bytes in a second pass
        xq, xr = bx // 4, bx % 4

        def one(y, x):
            return jax.lax.dynamic_slice(im32, (y, x), (win, win // 4 + 1))

        w32 = jax.vmap(one)(by, xq)  # (nW, win, win//4+1)
        wb = jax.lax.bitcast_convert_type(w32, jnp.uint8).reshape(
            nW, win, (win // 4 + 1) * 4
        )
        # realign: shift each window left by xr bytes
        idx = xr[:, None, None] + jnp.arange(win)[None, None, :]
        return jnp.take_along_axis(
            wb, jnp.broadcast_to(idx, (nW, win, win)), axis=2
        )

    return jax.jit(run)


f = make_u32()
out = f(flat, by, bx)
ok = bool(jnp.array_equal(out, out_ref))
print(f"u32-lanes    : {(t(f, flat, by, bx)-floor)*1000:.2f} ms equal={ok}",
      flush=True)

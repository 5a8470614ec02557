"""MXU-SSD cost-volume probe (r3 VERDICT item 1 lever) + e2e SSD bench.

Two measurements:

1. **e2e**: the production bench program with ``cost="ssd"`` (the existing
   diff kernels compute (a-b)^2 instead of |a-b| - same structure, one
   extra multiply) vs ``cost="sad"``.

2. **micro**: the named-but-untried MXU decomposition of the SSD cross
   term.  SSD(delta) = ||a||^2 - 2<a, b_delta> + ||b_delta||^2 where the
   cross term over the FULL block is a depthwise 2-D cross-correlation of
   each parent's patch with its window - XLA lowers
   ``conv_general_dilated(feature_group_count=nblk)`` onto the MXU - and
   ||b_delta||^2 is a box-sum (ones-kernel depthwise conv).  Compared
   against the direct Pallas diff kernel (``cv_diff.full_block_volume``)
   producing the identical cur==bs volume, both verified equal.

   Scope note (why full-block only): the fine-cell volumes (cur=2/4) have
   no profitable matmul embedding - the correlation has NO operand reuse
   across parents (windows are gathered per parent at data-dependent
   centers), so any Hankel/one-hot staging of a cell-resolved matmul costs
   at least as many VPU element-writes as the direct diff computes
   (2 nonzeros per 64-wide contraction row = 32x MXU waste, and the
   operand build is itself ~1 op per useful MAC).  The full-block volume
   is the only resolution where contraction length (bs^2 = 1024) gives the
   MXU real work per staged byte.

Run on the TPU: python scripts/tpu_ssd_probe.py
"""

import time

import numpy as np
import jax
import _cache  # noqa: F401
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from blockbasedmotionestimation_tpu.config import MotionConfig
from blockbasedmotionestimation_tpu.models.engine import estimate_flow_batched
from blockbasedmotionestimation_tpu.kernels.cv_diff import full_block_volume


def _sync(x):
    return float(np.asarray(jnp.ravel(x)[0]))


def bench_e2e(cost: str, B: int = 8) -> float:
    H, W = 1080, 1920
    cfg = MotionConfig(
        block_sizes=(32,) * 4, search_sizes=(64,) * 4, interp_factor=1,
        regularizer="windowed", rival_window=True, rival_radius=8, cost=cost,
    )
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, size=(B, H + 16, W + 16), dtype=np.uint8)
    im1 = jax.device_put(jnp.asarray(base[:, :H, :W]))
    im2 = jax.device_put(jnp.asarray(base[:, 5:5 + H, 9:9 + W]))
    flow, _ = estimate_flow_batched(im1, im2, cfg)
    _sync(flow)
    t0 = time.time()
    iters = 8
    for _ in range(iters):
        flow, _ = estimate_flow_batched(im1, im2, cfg)
        _sync(flow)
    dt = (time.time() - t0) / iters / B
    print(f"e2e {cost} B={B}: {dt*1e3:.2f} ms/field = {1/dt:.2f} fields/s",
          flush=True)
    return dt


# ---- micro: MXU conv decomposition vs direct Pallas diff -----------------

def mxu_ssd_full_block(patches, windows, bs, ext,
                       precision=None):
    """(side, side, nblk) i32 full-block SSD volume via MXU depthwise conv.

    patches: (nblk, bs, bs) i16; windows: (nblk, win, win) i16.
    """
    nblk = patches.shape[0]
    win = windows.shape[1]
    side = 2 * ext + 1
    wf = windows.astype(jnp.float32)[None]          # (1, nblk, win, win)
    pf = patches.astype(jnp.float32)[:, None]       # (nblk, 1, bs, bs)
    # cross[delta] = <patch, window shifted>: depthwise valid correlation
    cross = jax.lax.conv_general_dilated(
        wf, pf, window_strides=(1, 1), padding="VALID",
        feature_group_count=nblk, precision=precision,
        preferred_element_type=jnp.float32,
    )[0]                                             # (nblk, side, side)
    ones = jnp.ones((nblk, 1, bs, bs), jnp.float32)
    b2 = jax.lax.conv_general_dilated(
        (wf * wf), ones, window_strides=(1, 1), padding="VALID",
        feature_group_count=nblk, precision=precision,
        preferred_element_type=jnp.float32,
    )[0]
    a2 = jnp.sum(pf * pf, axis=(1, 2, 3))            # (nblk,)
    ssd = a2[:, None, None] - 2.0 * cross + b2
    return jnp.rint(ssd).astype(jnp.int32).transpose(1, 2, 0)


def micro():
    bs, ext = 32, 16
    win = bs + 2 * ext
    side = 2 * ext + 1
    nblk = 2560  # one 1080p level's parents (40 x 64)
    rng = np.random.default_rng(0)
    patches = jnp.asarray(
        rng.integers(0, 256, size=(nblk, bs, bs)), jnp.int16
    )
    windows = jnp.asarray(
        rng.integers(0, 256, size=(nblk, win, win)), jnp.int16
    )
    patches_t = patches.transpose(1, 2, 0)
    windows_t = windows.transpose(1, 2, 0)

    from blockbasedmotionestimation_tpu.kernels.cv_diff import (
        delta_pooled_cvs,
    )

    direct = jax.jit(
        lambda p, w: full_block_volume(p, w, bs, ext, ext, "ssd")
    )
    pooled = jax.jit(
        lambda p, w: delta_pooled_cvs(p, w, bs, ext, ext, "ssd")[bs]
    )
    convd = jax.jit(lambda p, w: mxu_ssd_full_block(p, w, bs, ext))
    convh = jax.jit(
        lambda p, w: mxu_ssd_full_block(
            p, w, bs, ext, precision=jax.lax.Precision.HIGHEST
        )
    )

    d = direct(patches_t, windows_t)
    c = convh(patches, windows)
    _sync(d), _sync(c)
    dv = np.asarray(d[:, :, 0, 0, :nblk]).astype(np.int64)
    cvv = np.asarray(c).astype(np.int64)
    # bit-exactness is IMPOSSIBLE at bs=32 even at HIGHEST precision: the
    # f32 accumulator rounds sums above 2^24 (full-block SSD reaches 6.7e7)
    print("HIGHEST-precision conv max |diff|:",
          int(np.abs(dv - cvv).max()),
          f"(relative {np.abs(dv - cvv).max() / dv.max():.2e};"
          " non-zero = f32 accumulator past 2^24, disqualifying for the"
          " bit-exact reference-parity path)",
          flush=True)

    for name, fn, args in (
        ("direct pallas diff (ssd, cur=bs only)", direct,
         (patches_t, windows_t)),
        ("production pooled diff pass (ALL volumes, ssd)", pooled,
         (patches_t, windows_t)),
        ("mxu depthwise conv (default bf16 precision, WRONG values)",
         convd, (patches, windows)),
        ("mxu depthwise conv (HIGHEST precision)", convh,
         (patches, windows)),
    ):
        t0 = time.time()
        iters = 20
        for _ in range(iters):
            out = fn(*args)
            _sync(out)
        dt = (time.time() - t0) / iters
        macs = nblk * side * side * bs * bs
        print(f"{name}: {dt*1e3:.2f} ms  "
              f"({macs/dt/1e12:.2f} T useful-MAC/s)", flush=True)


if __name__ == "__main__":
    micro()
    # SSD doubles the fine-volume bytes (cur=2/4 peaks exceed u16 -> i32),
    # so B=8 dense OOMs HBM (22.8 GB > 17): measure both costs at B=4
    sad = bench_e2e("sad", B=4)
    ssd = bench_e2e("ssd", B=4)
    print(f"ssd/sad e2e ratio at B=4: {ssd/sad:.3f}")

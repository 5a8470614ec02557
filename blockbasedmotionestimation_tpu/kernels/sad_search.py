"""Pallas TPU kernel for the spiral block-search cost volume.

Computes, for a batch of blocks, the (2S+1)^2 SAD cost volume against each
block's search window and the spiral-order strict-< argmin - the same math as
``ops.search.block_search_level``'s XLA scan (reference hot kernel,
``motion_framework.cpp:296-422``), with explicit VMEM residency and a
lane-friendly layout:

  * blocks and windows are laid out (rows, cols, CB) with the BLOCK index on
    the 128-wide lane dimension, so every VPU op runs at full lane
    utilization and window slicing shifts sublanes/planes, never lanes;
  * the offset loop reads spiral-ordered (dy, dx) pairs from SMEM via scalar
    prefetch; the strict-< update reproduces first-visit-wins tie-breaks;
  * out-of-frame offsets are masked to +INT_MAX per block from the center
    coordinates, matching the walk's skipped-but-advancing cursor.

VMEM per grid step (CB=128, bs=32, S=16): windows 64*64*128*2B = 1 MB,
blocks 32*32*128*2B = 0.25 MB - well inside the ~16 MB budget, so several
grid steps pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blockbasedmotionestimation_tpu.ops.spiral import spiral_offsets

_I32_MAX = np.int32(np.iinfo(np.int32).max)


def _kernel(
    # scalar prefetch
    dy_ref,      # (K,) i32 spiral-ordered window row offsets (0..2S)
    dx_ref,      # (K,) i32 spiral-ordered window col offsets (0..2S)
    # tensor inputs
    blocks_ref,  # (bs, bs, CB) i16  - im1 blocks, block index on lanes
    windows_ref, # (win, win, CB) i16 - im2 search windows
    cy_ref,      # (1, CB) i32 global center rows
    cx_ref,      # (1, CB) i32 global center cols
    # outputs
    dy_out,      # (1, CB) i32 winning window row offset
    dx_out,      # (1, CB) i32 winning window col offset
    *,
    bs: int,
    ext: int,
    full_h: int,
    full_w: int,
    cost: str,
):
    k_total = dy_ref.shape[0]
    b = blocks_ref[...].astype(jnp.int32)  # (bs, bs, CB)
    cy = cy_ref[0, :]  # (CB,)
    cx = cx_ref[0, :]

    def body(k, carry):
        best_sad, best_dy, best_dx = carry  # (CB,) i32
        dy = dy_ref[k]
        dx = dx_ref[k]
        win = windows_ref[pl.ds(dy, bs), pl.ds(dx, bs), :].astype(jnp.int32)
        d = b - win
        if cost == "sad":
            sad = jnp.sum(jnp.abs(d), axis=(0, 1))  # (CB,) i32
        else:  # ssd
            sad = jnp.sum(d * d, axis=(0, 1))
        ty = cy + (dy - ext)
        tx = cx + (dx - ext)
        ok = (ty >= 0) & (ty <= full_h - bs) & (tx >= 0) & (tx <= full_w - bs)
        sad = jnp.where(ok, sad, _I32_MAX)
        better = sad < best_sad  # strict <: first spiral visit wins ties
        return (
            jnp.where(better, sad, best_sad),
            jnp.where(better, dy, best_dy),
            jnp.where(better, dx, best_dx),
        )

    cb = b.shape[-1]
    init = (
        jnp.full((cb,), _I32_MAX, dtype=jnp.int32),
        jnp.full((cb,), ext, dtype=jnp.int32),
        jnp.full((cb,), ext, dtype=jnp.int32),
    )
    _, bdy, bdx = jax.lax.fori_loop(0, k_total, body, init)
    dy_out[0, :] = bdy
    dx_out[0, :] = bdx


@functools.partial(
    jax.jit,
    static_argnames=("bs", "ss", "full_h", "full_w", "block_chunk", "interpret", "cost"),
)
def sad_spiral_argmin(
    blocks: jnp.ndarray,   # (nblk, bs, bs) uint8/int16 im1 blocks
    windows: jnp.ndarray,  # (nblk, win, win) uint8/int16 im2 windows
    cy: jnp.ndarray,       # (nblk,) i32 global center rows
    cx: jnp.ndarray,       # (nblk,) i32 global center cols
    bs: int,
    ss: int,
    full_h: int,
    full_w: int,
    block_chunk: int = 128,
    interpret: bool = False,
    cost: str = "sad",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Spiral-order SAD argmin over each block's search window.

    Returns (best_dy, best_dx), each (nblk,) i32 in window coordinates
    (0..2S, center at S=ext); the caller converts to MVs and applies the
    zero-MV early-out.
    """
    nblk = blocks.shape[0]
    shift = ss - bs
    dys, dxs, ext = spiral_offsets(shift)
    win = bs + 2 * ext
    k_total = len(dys)

    cb = min(block_chunk, nblk)
    npad = -nblk % cb
    if npad:
        blocks = jnp.pad(blocks, ((0, npad), (0, 0), (0, 0)))
        windows = jnp.pad(windows, ((0, npad), (0, 0), (0, 0)))
        cy = jnp.pad(cy, (0, npad))
        cx = jnp.pad(cx, (0, npad))
    n = nblk + npad

    blocks_t = blocks.astype(jnp.int16).transpose(1, 2, 0)    # (bs, bs, n)
    windows_t = windows.astype(jnp.int16).transpose(1, 2, 0)  # (win, win, n)
    cy2 = cy.astype(jnp.int32).reshape(1, n)
    cx2 = cx.astype(jnp.int32).reshape(1, n)

    grid = (n // cb,)
    kern = functools.partial(
        _kernel, bs=bs, ext=ext, full_h=full_h, full_w=full_w, cost=cost
    )
    out_dy, out_dx = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bs, bs, cb), lambda i, *_: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((win, win, cb), lambda i, *_: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cb), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cb), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, cb), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cb), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, n), jnp.int32),
            jax.ShapeDtypeStruct((1, n), jnp.int32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=3 * n * k_total * bs * bs,
            bytes_accessed=n * (win * win + bs * bs) * 2 + 2 * n * 4,
            transcendentals=0,
        ),
    )(jnp.asarray(dys + ext), jnp.asarray(dxs + ext), blocks_t, windows_t, cy2, cx2)

    return out_dy[0, :nblk], out_dx[0, :nblk]

"""Pallas TPU kernel for the spiral block-search cost volume.

Computes, for a batch of blocks, the (2S+1)^2 SAD/SSD cost volume against
each block's search window and the spiral-order argmin - the same math as
``ops.search.block_search_level``'s XLA scan (reference hot kernel,
``motion_framework.cpp:296-422``), with explicit VMEM residency and a
lane-friendly layout:

  * blocks and windows are laid out (rows, cols, CB) with the BLOCK index on
    the 128-wide lane dimension, so every VPU op runs at full lane
    utilization;
  * the offset loop is a fori over window rows (dynamic index on the untiled
    major dim - Mosaic allows any offset there) with window columns unrolled
    at STATIC offsets (dynamic sublane offsets would need provable tile
    alignment);
  * visiting offsets in raster order with a lexicographic (cost, spiral_rank)
    update is equivalent to the walk's first-visit-wins strict-< updates;
    ranks stream from SMEM via scalar prefetch;
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

from blockbasedmotionestimation_tpu.ops.spiral import spiral_rank

_I32_MAX = np.int32(np.iinfo(np.int32).max)


def _kernel(
    # scalar prefetch
    rank_ref,    # (side*side,) i32 spiral first-visit rank, raster order
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
    side = 2 * ext + 1
    b = blocks_ref[...].astype(jnp.int32)  # (bs, bs, CB)
    cy = cy_ref[0, :]  # (CB,)
    cx = cx_ref[0, :]
    cb = b.shape[-1]

    def row_body(dy, carry):
        best_sad, best_rank, best_dy, best_dx = carry
        strip = windows_ref[pl.ds(dy, bs), :, :].astype(jnp.int32)  # (bs, win, CB)
        ty = cy + (dy - ext)
        ok_y = (ty >= 0) & (ty <= full_h - bs)
        for dx in range(side):
            win = strip[:, dx : dx + bs, :]
            d = b - win
            if cost == "sad":
                sad = jnp.sum(jnp.abs(d), axis=(0, 1))  # (CB,) i32
            else:  # ssd
                sad = jnp.sum(d * d, axis=(0, 1))
            tx = cx + (dx - ext)
            ok = ok_y & (tx >= 0) & (tx <= full_w - bs)
            sad = jnp.where(ok, sad, _I32_MAX)
            rank = rank_ref[dy * side + dx]
            # lexicographic (cost, spiral rank) == first-visit-wins strict <
            better = (sad < best_sad) | ((sad == best_sad) & (rank < best_rank))
            best_sad = jnp.where(better, sad, best_sad)
            best_rank = jnp.where(better, rank, best_rank)
            best_dy = jnp.where(better, dy, best_dy)
            best_dx = jnp.where(better, dx, best_dx)
        return best_sad, best_rank, best_dy, best_dx

    init = (
        jnp.full((cb,), _I32_MAX, dtype=jnp.int32),
        jnp.full((cb,), _I32_MAX, dtype=jnp.int32),
        jnp.full((cb,), ext, dtype=jnp.int32),
        jnp.full((cb,), ext, dtype=jnp.int32),
    )
    _, _, bdy, bdx = jax.lax.fori_loop(0, side, row_body, init)
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
    """Spiral-order SAD/SSD argmin over each block's search window.

    Returns (best_dy, best_dx), each (nblk,) i32 in window coordinates
    (0..2S, center at S=ext); the caller converts to MVs and applies the
    zero-MV early-out.
    """
    nblk = blocks.shape[0]
    shift = ss - bs
    ranks = spiral_rank(shift)  # (side, side) first-visit ranks
    ext = (ranks.shape[0] - 1) // 2
    side = 2 * ext + 1
    win = bs + 2 * ext

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
            num_scalar_prefetch=1,
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
            flops=3 * n * side * side * bs * bs,
            bytes_accessed=n * (win * win + bs * bs) * 2 + 2 * n * 4,
            transcendentals=0,
        ),
    )(jnp.asarray(ranks.reshape(-1)), blocks_t, windows_t, cy2, cx2)

    return out_dy[0, :nblk], out_dx[0, :nblk]

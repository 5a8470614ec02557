"""Per-block window gather: aligned DMA superwindows + MXU column extract.

The engine needs, for every parent block, the (win, win) frame-2 search
window whose top-left is a data-dependent clipped prediction (the TPU
re-expression of the reference's per-block window addressing,
``motion_framework.cpp:249,299``).  XLA lowers the natural
``vmap(dynamic_slice)`` formulation to a serialized per-parent
slice + dynamic-update-slice loop - ~60 ms/batch at the 1080p bench shape
(20480 windows), pure bookkeeping.

Arbitrary (y, x) offsets cannot be DMA'd directly: Mosaic requires slice
offsets on the tiled (sublane, lane) pair of an HBM memref to be tile-
aligned (8, 128).  Two tricks make every offset land on an UNTILED dim:

* rows: 8 row-shifted copies of the (stacked) frame buffer, reshaped so
  8-row blocks sit on a free dim - window row y selects copy ``y % 8`` at
  block row ``y // 8``, exact to the row;
* cols: the DMA fetches a 128-aligned superwindow ``wq*128`` wide (wide
  enough for any ``x % 128`` residual); the exact ``win`` columns are then
  extracted for ALL windows at once by a batched one-hot bf16 matmul - a
  few GFLOP, noise on the MXU - instead of 20480 per-window shifts on the
  VPU (u8 pixel values are exact in bf16, so the extraction is lossless).

Result: one 16-descriptor DMA per window issued straight from a Pallas
kernel + two dense XLA ops, ~6 ms where the dynamic-slice loop took ~34.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# windows per grid step: amortizes grid bookkeeping over G in-flight DMAs
_G = 16


def _dma_kernel(s_ref, yb_ref, xc_ref, imsh_ref, out_ref, sems, *, wb, wq):
    i = pl.program_id(0)
    dmas = []
    for g in range(_G):
        k = i * _G + g
        d = pltpu.make_async_copy(
            imsh_ref.at[s_ref[k], pl.ds(yb_ref[k], wb), pl.ds(xc_ref[k], wq)],
            out_ref.at[k],
            sems.at[g],
        )
        d.start()
        dmas.append(d)
    for d in dmas:
        d.wait()


@functools.partial(jax.jit, static_argnames=("win", "interpret"))
def gather_windows_dma(
    im2p: jnp.ndarray,  # (Hf, Wf) padded (stacked) frame buffer
    by: jnp.ndarray,    # (nblk,) i32 window top row in im2p coords
    bx: jnp.ndarray,    # (nblk,) i32 window left col in im2p coords
    win: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """(nblk, win, win) windows; im2p[by[k] : by[k]+win, bx[k] : bx[k]+win].

    ``interpret=True`` runs the DMA kernel in Pallas interpret mode so the
    index math (row-shift copy select, 8-block rows, 128-superwindow cols,
    MXU one-hot extract) is testable on CPU without a chip
    (``tests/test_pallas_search.py::test_gather_windows_dma_interpret``).
    """
    assert win % 8 == 0, win
    hf, wf = im2p.shape
    wb = win // 8                      # 8-row blocks per window
    wq = (win + 127 + 127) // 128      # 128-col chunks per superwindow
    nblk = by.shape[0]
    npad = -nblk % _G
    n = nblk + npad
    if npad:
        by = jnp.pad(by, (0, npad))
        bx = jnp.pad(bx, (0, npad))

    # 8 row-shifted copies, rows split into 8-blocks, cols into 128-chunks,
    # laid out (copy, row_block, col_chunk, 8, 128) so every DMA slice
    # offset is on an untiled dim and each run is one contiguous (8, 128)
    hq = -(-hf // 8)
    wc = -(-wf // 128) + (wq - 1)
    imp = jnp.pad(im2p, ((0, hq * 8 + 7 - hf), (0, wc * 128 - wf)))
    imsh = jnp.stack([imp[s : s + hq * 8] for s in range(8)])
    imsh6 = (
        imsh.reshape(8, hq, 8, wc, 128).transpose(0, 1, 3, 2, 4)
    )  # (8, hq, wc, 8, 128)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n // _G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_G,))],
    )
    sup = pl.pallas_call(
        functools.partial(_dma_kernel, wb=wb, wq=wq),
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((n, wb, wq, 8, 128), im2p.dtype),
        interpret=interpret,
    )(
        (by & 7).astype(jnp.int32),
        (by >> 3).astype(jnp.int32),
        (bx >> 7).astype(jnp.int32),
        imsh6,
    )

    # (n, wb, wq, 8, 128) -> (n, win, wq*128) logical rows/cols, then MXU
    # one-hot extract of cols xr..xr+win-1 (u8 exact in bf16)
    supw = (
        sup.transpose(0, 1, 3, 2, 4)
        .reshape(n, win, wq * 128)
        .astype(jnp.bfloat16)
    )
    xr = (bx & 127).astype(jnp.int32)
    sel = (
        xr[:, None, None] + jax.lax.broadcasted_iota(jnp.int32, (1, 1, win), 2)
        == jax.lax.broadcasted_iota(jnp.int32, (1, wq * 128, 1), 1)
    ).astype(jnp.bfloat16)  # (n, wq*128, win)
    out = jax.lax.dot_general(
        supw, sel, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    return out.astype(im2p.dtype)[:nblk]

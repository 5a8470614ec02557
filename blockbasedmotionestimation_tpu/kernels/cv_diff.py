"""Pallas kernel feeding the windowed regularizer's cost volumes.

Emits the per-delta absolute-difference (or squared-difference) maps between
each parent block and its search window:

    diffs[(dy, dx), :, :, P] = |patch1[P] - window[P] shifted by (dy-R, dx-R)|

using the same Mosaic-friendly structure as the search kernel: parent blocks
on the 128-wide lane dim, the delta ROW as a grid dimension (windows stay
VMEM-resident across it), delta columns unrolled at static offsets.  The
per-round cost volumes for every subdivision size then come from cheap
hierarchical XLA pooling of these maps (u8 -> u16 -> i32 as sums grow).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(patches_ref, windows_ref, out_ref, *, bs, ext, r, cost):
    # grid = (nP_chunks, side); delta row varies fastest so the window block
    # stays resident in VMEM across all side^2 deltas of a parent chunk
    dy = pl.program_id(1)
    side = 2 * r + 1
    # int32 arithmetic: Mosaic cannot legalize abs on packed int16 vectors
    b = patches_ref[...].astype(jnp.int32)  # (bs, bs, CB)
    strip = windows_ref[pl.ds(ext - r + dy, bs), :, :].astype(jnp.int32)
    for dx in range(side):
        w = strip[:, ext - r + dx : ext - r + dx + bs, :]
        d = b - w
        if cost == "sad":
            out_ref[0, dx] = jnp.abs(d).astype(jnp.uint8)
        else:  # ssd: d^2 <= 65025 fits u16
            out_ref[0, dx] = (d * d).astype(jnp.uint16)


@functools.partial(
    jax.jit, static_argnames=("bs", "ext", "r", "cost", "block_chunk", "interpret")
)
def delta_diff_maps(
    patches_t: jnp.ndarray,  # (bs, bs, nP) i16 frame-1 parent blocks
    windows_t: jnp.ndarray,  # (win, win, nP) i16 frame-2 windows
    bs: int,
    ext: int,
    r: int,
    cost: str = "sad",
    block_chunk: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """(side, side, bs, bs, nP) u8/u16 per-delta difference maps."""
    n_p = patches_t.shape[-1]
    side = 2 * r + 1
    win = windows_t.shape[0]
    cb = min(block_chunk, n_p)
    npad = -n_p % cb
    if npad:
        patches_t = jnp.pad(patches_t, ((0, 0), (0, 0), (0, npad)))
        windows_t = jnp.pad(windows_t, ((0, 0), (0, 0), (0, npad)))
    n = n_p + npad
    out_dt = jnp.uint8 if cost == "sad" else jnp.uint16

    out = pl.pallas_call(
        functools.partial(_kernel, bs=bs, ext=ext, r=r, cost=cost),
        grid=(n // cb, side),
        in_specs=[
            pl.BlockSpec((bs, bs, cb), lambda i, j: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((win, win, cb), lambda i, j: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, side, bs, bs, cb), lambda i, j: (j, 0, 0, 0, i),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((side, side, bs, bs, n), out_dt),
        interpret=interpret,
    )(patches_t, windows_t)
    return out[..., :n_p]

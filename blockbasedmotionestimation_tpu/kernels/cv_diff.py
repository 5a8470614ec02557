"""Pallas kernel feeding the windowed regularizer's cost volumes.

Emits the per-delta absolute-difference (or squared-difference) maps between
each parent block and its search window:

    diffs[(dy, dx), :, :, P] = |patch1[P] - window[P] shifted by (dy-R, dx-R)|

and pools them to every subdivision size inside VMEM (the raw maps never
reach HBM).  Structure: parent blocks on the 128-wide lane dim, the delta
ROW as a grid dimension (windows stay VMEM-resident across it), delta
columns in 8-aligned groups.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def cv_dtype(cur: int, cost: str):
    """Smallest unsigned/int dtype holding a worst-case cost at block size cur."""
    peak = (255 * 255 if cost == "ssd" else 255) * cur * cur
    return jnp.uint16 if peak < (1 << 16) else jnp.int32


def _pooled_kernel(patches_ref, wslab_ref, *out_refs, bs, ext, r, cost):
    """Per-delta diff maps pooled to every subdivision size in one pass.

    Writes out_refs[k] = the (s_k, s_k, CB) cost maps at sub-block size
    cur = 2, 4, ..., bs (ascending k), without ever materializing the raw
    (bs, bs) diff maps in HBM.

    wslab_ref cols are pre-cropped so delta column dx reads cols
    [dx, dx+bs); the dx loop runs as a fori_loop over 8-aligned groups
    (Mosaic: dynamic sublane starts must be multiples of 8) with a static
    8-wide unroll inside, so loop-body stack is reused instead of
    allocating ~side copies of the diff intermediates.
    """
    dy = pl.program_id(1)
    side = 2 * r + 1
    b = patches_ref[...].astype(jnp.int32)  # (bs, bs, CB)
    cb = b.shape[-1]

    def body(g, _):
        wide = wslab_ref[pl.ds(ext - r + dy, bs), pl.ds(8 * g, bs + 8), :]
        for dxr in range(8):
            dx = 8 * g + dxr
            w = wide[:, dxr : dxr + bs, :].astype(jnp.int32)
            pool = jnp.abs(b - w) if cost == "sad" else (b - w) * (b - w)
            s, cur, k = bs, 1, 0

            @pl.when(dx < side)
            def _():
                nonlocal pool, s, cur, k
                while cur < bs:
                    # 2x2 pooling on the two leading (non-lane) axes
                    pool = pool.reshape(s // 2, 2, s // 2, 2, cb).sum(axis=(1, 3))
                    s >>= 1
                    cur <<= 1
                    if cur >= 2:
                        dt = out_refs[k].dtype
                        if cur <= bs // 2:
                            # X-parity de-interleaved layout: the color-step
                            # kernel picks a color plane purely via its
                            # index_map (row 2j+ci, plane cj) - no XLA-side
                            # color slicing of the CV at all
                            ps = pool.reshape(s, s // 2, 2, cb)
                            for bx in range(2):
                                out_refs[k][0, dx, :, bx] = ps[:, :, bx].astype(dt)
                        else:  # cur == bs: f == 1, legacy unsplit layout
                            out_refs[k][0, dx] = pool.astype(dt)
                        k += 1
        return 0

    jax.lax.fori_loop(0, (side + 7) // 8, body, 0)


@functools.partial(
    jax.jit, static_argnames=("bs", "ext", "r", "cost", "block_chunk", "interpret")
)
def delta_pooled_cvs(
    patches_t: jnp.ndarray,  # (bs, bs, nP) i16 frame-1 parent blocks
    windows_t: jnp.ndarray,  # (win, win, nP) i16 frame-2 windows
    bs: int,
    ext: int,
    r: int,
    cost: str = "sad",
    block_chunk: int = 128,
    interpret: bool = False,
) -> dict[int, jnp.ndarray]:
    """Pooled cost volumes per sub-block size, s = bs // cur.

    cur <= bs/2: (side, side, s, 2, s//2, nPad) with the X parity
    de-interleaved so a color plane is pure index arithmetic downstream;
    cur == bs: (side, side, 1, 1, nPad) unsplit.  nPad = nP rounded up to
    the lane-chunk multiple.
    """
    n_p = patches_t.shape[-1]
    side = 2 * r + 1
    win = windows_t.shape[0]
    cb = block_chunk  # always full lane chunks: consumers tile lanes by 128
    npad = -n_p % cb
    if npad:
        patches_t = jnp.pad(patches_t, ((0, 0), (0, 0), (0, npad)))
        windows_t = jnp.pad(windows_t, ((0, 0), (0, 0), (0, npad)))
    n = n_p + npad

    # crop cols so the kernel's delta column dx starts at col dx, padded out
    # to the 8-aligned group loads' reach (8*ngroups + bs)
    ngroups = (side + 7) // 8
    cols = 8 * ngroups + bs
    wslab = windows_t[:, ext - r :, :]
    pad_c = cols - wslab.shape[1]
    if pad_c > 0:
        wslab = jnp.pad(wslab, ((0, 0), (0, pad_c), (0, 0)))
    else:
        wslab = wslab[:, :cols, :]

    curs = []
    cur = 2
    while cur <= bs:
        curs.append(cur)
        cur <<= 1
    out_shapes, out_specs = [], []
    for c in curs:
        s = bs // c
        if c <= bs // 2:  # X-parity de-interleaved (see kernel)
            out_shapes.append(
                jax.ShapeDtypeStruct(
                    (side, side, s, 2, s // 2, n), cv_dtype(c, cost)
                )
            )
            out_specs.append(
                pl.BlockSpec(
                    (1, side, s, 2, s // 2, cb),
                    lambda i, j: (j, 0, 0, 0, 0, i),
                    memory_space=pltpu.VMEM,
                )
            )
        else:  # cur == bs: unsplit legacy layout
            out_shapes.append(
                jax.ShapeDtypeStruct((side, side, s, s, n), cv_dtype(c, cost))
            )
            out_specs.append(
                pl.BlockSpec(
                    (1, side, s, s, cb),
                    lambda i, j: (j, 0, 0, 0, i),
                    memory_space=pltpu.VMEM,
                )
            )
    outs = pl.pallas_call(
        functools.partial(_pooled_kernel, bs=bs, ext=ext, r=r, cost=cost),
        grid=(n // cb, side),
        in_specs=[
            pl.BlockSpec((bs, bs, cb), lambda i, j: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((win, cols, cb), lambda i, j: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(patches_t, wslab)
    # lane axis stays PADDED to the chunk multiple - slicing it off here
    # would copy the whole volume; consumers mask or slice as needed
    return dict(zip(curs, outs))

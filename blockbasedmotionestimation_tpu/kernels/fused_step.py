"""Chunk-fused color step: candidate costs recomputed from VMEM windows.

The windowed regularizer's fine rounds (cur = 2, 4) dominated the pipeline's
distance to its structural floor (DESIGN.md section 7): the dense cur=2 cost
volume is ~1.1 GB/frame, written once by the diff pass and then STREAMED from
HBM once per sweep by the color-step kernels - pure bandwidth, ~63% of HBM
peak, and the HBM-capacity cap that kept rival mode from batching (B=8) and
8K frames from running single-chip at all.

This kernel removes the volume: each color-step tile keeps its 128 parents'
frame-2 search windows (~1.2 MB) and frame-1 blocks VMEM-resident and
recomputes the pooled candidate costs IN the step, visiting only the delta
bounding box the tile's candidates actually span (the same bbox trick the
CV-reading kernel uses for compute, now applied to the diff work itself).
Costs are bit-identical to the dense path: same parity-plane |a-b| diffs,
same pooling tree, same (energy, rank) winner - only never materialized.

Work accounting per color step per chunk: bbox_deltas x bs^2 int-ops (diff +
pool) vs the dense path's (side,side) CV tile DMA.  On locally smooth flow
the bbox is a few cells; the fully-random worst case re-runs the diff pass
per step, bounded by side^2 (the algorithm's own search extent).

The reference analogue of what is being fused: the regularizer's arbitrary
per-candidate block fetch + SAD (``motion_framework.cpp:594-602``), which on
TPU became build-volume-then-select, and here becomes recompute-on-tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blockbasedmotionestimation_tpu.kernels.reg_step import _finish_step

_I32_BIG = np.int32(1 << 20)


def prep_slabs(
    patches_t: jnp.ndarray,  # (bs, bs, nP) i16
    windows_t: jnp.ndarray,  # (win, win, nP) i16
    bs: int,
    ext: int,
    r: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Lane-padded kernel inputs: (4, bs, bs//4, nPp) frame-1 parity planes
    and the (win, cols, nPp) frame-2 window slab (columns cropped/padded to
    the 8-aligned group loads' reach, mirroring the CV build kernels)."""
    cb = 128
    n_p = patches_t.shape[-1]
    npad = -n_p % cb
    if npad:
        patches_t = jnp.pad(patches_t, ((0, 0), (0, 0), (0, npad)))
        windows_t = jnp.pad(windows_t, ((0, 0), (0, 0), (0, npad)))
    n = n_p + npad
    side = 2 * r + 1
    ngroups = (side + 7) // 8
    cols = 8 * ngroups + bs
    wslab = windows_t[:, ext - r :, :]
    pad_c = cols - wslab.shape[1]
    if pad_c > 0:
        wslab = jnp.pad(wslab, ((0, 0), (0, pad_c), (0, 0)))
    else:
        wslab = wslab[:, :cols, :]
    patches_pl = patches_t.reshape(bs, bs // 4, 4, n).transpose(2, 0, 1, 3)
    return patches_pl, wslab


def _pool_select_color(halves, bs: int, cur: int, ci, cj):
    """(s2, s2, cb) cost cells of color (ci, cj) at sub-block size cur.

    halves[bx]: (bs//2, bs//4, cb) cur=2 cell costs, y-pooled, x-parity
    separated (bx = cell-x parity; slot xq covers pixels 4*xq + 2*bx ..).
    ci/cj are traced scalars - parity picks are elementwise selects.
    """
    cb = halves[0].shape[-1]
    q4 = bs // 4
    if cur == 2:
        hm = jnp.where(cj == 0, halves[0], halves[1])      # (bs//2, q4, cb)
        hr = hm.reshape(bs // 4, 2, q4, cb)
        return jnp.where(ci == 0, hr[:, 0], hr[:, 1])       # (s2, s2, cb)
    # merge x parities (slot xq -> 4-px cell) and y pairs -> cur=4 map
    m = (halves[0] + halves[1]).reshape(q4, 2, q4, cb).sum(axis=1)
    f, c = q4, 4
    while c < cur:
        m = m.reshape(f // 2, 2, f, cb).sum(axis=1)
        m = m.reshape(f // 2, f // 2, 2, cb).sum(axis=2)
        f //= 2
        c <<= 1
    mr = m.reshape(f // 2, 2, f, cb)
    m = jnp.where(ci == 0, mr[:, 0], mr[:, 1])
    mr2 = m.reshape(f // 2, f // 2, 2, cb)
    return jnp.where(cj == 0, mr2[:, :, 0], mr2[:, :, 1])   # (s2, s2, cb)


def _accumulate_bbox(
    acc_ref, wslab_ref, bp, key, dmin_y, dmax_y, dmin_x, dmax_x,
    *, bs: int, ext: int, r: int, side: int, cur: int, cost: str, ci, cj,
):
    """Visit every delta in the [dmin, dmax] bbox (CV-index coords): compute
    the pooled color-cell costs from the VMEM window slab and one-hot
    accumulate them into the 9-candidate acc wherever ``key`` matches.

    Structure: straight-line 8-delta groups (one slab load + ONE parity-
    plane relayout + ONE acc read-modify-write per group; the 8 per-delta
    cost trees run unconditionally and out-of-bbox deltas simply match no
    key).  A per-delta predicated version RMW'd the full (9, s2, s2, 128)
    accumulator through VMEM once per delta and ran ~5x slower.
    """
    q4 = bs // 4
    s2h = bs // 2
    cb = bp[0].shape[-1]

    def row_body(dyi, _):
        def grp_body(g, __):
            wide = wslab_ref[pl.ds(ext - r + dyi, bs), pl.ds(8 * g, bs + 8), :]
            wr = wide.reshape(bs, (bs + 8) // 4, 4, cb)
            acc = acc_ref[...]
            for j in range(8):
                dxi = 8 * g + j
                halves = []
                for bx in range(2):
                    accp = None
                    for p in (2 * bx, 2 * bx + 1):
                        c = (p + j) % 4
                        off = (p + j) // 4
                        d = bp[p] - wr[:, off : off + q4, c, :].astype(
                            jnp.int32
                        )
                        d = jnp.abs(d) if cost == "sad" else d * d
                        accp = d if accp is None else accp + d
                    halves.append(accp.reshape(s2h, 2, q4, cb).sum(axis=1))
                h = _pool_select_color(halves, bs, cur, ci, cj)
                s_flat = dyi * side + dxi
                # dxi < side guards the group tail from aliasing row dyi+1
                acc = jnp.where(
                    jnp.logical_and(key == s_flat, dxi < side), h[None], acc
                )
            acc_ref[...] = acc
            return 0

        jax.lax.fori_loop(dmin_x // 8, dmax_x // 8 + 1, grp_body, 0)
        return 0

    jax.lax.fori_loop(dmin_y, dmax_y + 1, row_body, 0)


def _kernel_pm_fused(
    sc_ref,        # (4,) i32 prefetch: [color, ci, cj, row0_b]
    lam_ref,       # (1, 1) f32 SMEM
    patches_ref,   # (4, bs, bs//4, 128) i16 x-parity planes of frame-1 blocks
    wslab_ref,     # (win, cols, 128) i16 frame-2 window slab
    cands_ref,     # (9, 2, s2, s2, 128) i32
    pm_ref,        # (2, 128) i32 window-center MVs
    present_ref,   # (1, 9, s2, s2, 128) i32
    rank_ref,      # (1, 9, s2, s2, 128) i32
    oy_ref,        # (1, s2, 1, 128) i32
    ox_ref,        # (1, s2, 128) i32
    out_ref,       # (2, s2, s2, 128) i32
    acc_ref,       # scratch (9, s2, s2, 128) i32
    *,
    bs: int,
    ext: int,
    r: int,
    cur: int,
    cost: str,
    full_h: int,
    full_w: int,
):
    side = 2 * r + 1
    ci = sc_ref[1]
    cj = sc_ref[2]
    cands = cands_ref[...]
    cx, cy = cands[:, 0], cands[:, 1]          # (9, s2, s2, 128)
    pm = pm_ref[...]
    present = present_ref[0]
    rank = rank_ref[0]
    lam = lam_ref[0, 0]

    ddx = cx - pm[0][None, None, None]
    ddy = cy - pm[1][None, None, None]
    in_window = (ddx >= -r) & (ddx <= r) & (ddy >= -r) & (ddy <= r)
    key = jnp.where(in_window, (ddy + r) * side + (ddx + r), -1)

    bound_on = in_window & (present != 0)
    ymin = jnp.min(jnp.where(bound_on, ddy, _I32_BIG)) + r
    ymax = jnp.max(jnp.where(bound_on, ddy, -_I32_BIG)) + r
    xmin = jnp.min(jnp.where(bound_on, ddx, _I32_BIG)) + r
    xmax = jnp.max(jnp.where(bound_on, ddx, -_I32_BIG)) + r

    acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.int32)
    bp = [patches_ref[p].astype(jnp.int32) for p in range(4)]
    _accumulate_bbox(
        acc_ref, wslab_ref, bp, key, ymin, ymax, xmin, xmax,
        bs=bs, ext=ext, r=r, side=side, cur=cur, cost=cost, ci=ci, cj=cj,
    )
    costs = acc_ref[...]

    tx = ox_ref[0][None, None] + cx
    ty = oy_ref[0][None] + cy
    in_img = (
        (tx >= 0) & (tx <= full_w - cur) & (ty >= 0) & (ty <= full_h - cur)
    )
    _finish_step(cx, cy, costs, present, rank, lam, in_window, in_img, out_ref)


def _kernel_pm_fused_rival(
    sc_ref, lam_ref, patches_ref, wslab_ref, rwslab_ref, cands_ref, pm_ref,
    rpm_ref, present_ref, rank_ref, oy_ref, ox_ref, out_ref, acc_ref,
    *,
    bs: int,
    ext: int,
    r: int,
    r2: int,
    cur: int,
    cost: str,
    full_h: int,
    full_w: int,
):
    """Rival-window fused step: own-excluded candidates recomputed against
    the VMEM-resident rival slab (see ``reg_step._kernel_pm_rival``)."""
    side = 2 * r + 1
    side2 = 2 * r2 + 1
    ci = sc_ref[1]
    cj = sc_ref[2]
    cands = cands_ref[...]
    cx, cy = cands[:, 0], cands[:, 1]
    pm = pm_ref[...]
    rpm = rpm_ref[...]
    present = present_ref[0]
    rank = rank_ref[0]
    lam = lam_ref[0, 0]

    ddx = cx - pm[0][None, None, None]
    ddy = cy - pm[1][None, None, None]
    in_window = (ddx >= -r) & (ddx <= r) & (ddy >= -r) & (ddy <= r)
    key = jnp.where(in_window, (ddy + r) * side + (ddx + r), -1)
    rdx = cx - rpm[0][None, None, None]
    rdy = cy - rpm[1][None, None, None]
    in_rival = (rdx >= -r2) & (rdx <= r2) & (rdy >= -r2) & (rdy <= r2)
    key_r = jnp.where(
        in_rival & ~in_window, (rdy + r2) * side2 + (rdx + r2), -1
    )

    acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.int32)
    bp = [patches_ref[p].astype(jnp.int32) for p in range(4)]

    bound_on = in_window & (present != 0)
    ymin = jnp.min(jnp.where(bound_on, ddy, _I32_BIG)) + r
    ymax = jnp.max(jnp.where(bound_on, ddy, -_I32_BIG)) + r
    xmin = jnp.min(jnp.where(bound_on, ddx, _I32_BIG)) + r
    xmax = jnp.max(jnp.where(bound_on, ddx, -_I32_BIG)) + r
    _accumulate_bbox(
        acc_ref, wslab_ref, bp, key, ymin, ymax, xmin, xmax,
        bs=bs, ext=ext, r=r, side=side, cur=cur, cost=cost, ci=ci, cj=cj,
    )

    # rival bbox: empty on smooth tiles (no own-excluded candidate)
    bound_r = (key_r >= 0) & (present != 0)
    rymin = jnp.min(jnp.where(bound_r, rdy, _I32_BIG)) + r2
    rymax = jnp.max(jnp.where(bound_r, rdy, -_I32_BIG)) + r2
    rxmin = jnp.min(jnp.where(bound_r, rdx, _I32_BIG)) + r2
    rxmax = jnp.max(jnp.where(bound_r, rdx, -_I32_BIG)) + r2
    _accumulate_bbox(
        acc_ref, rwslab_ref, bp, key_r, rymin, rymax, rxmin, rxmax,
        bs=bs, ext=r2, r=r2, side=side2, cur=cur, cost=cost, ci=ci, cj=cj,
    )
    costs = acc_ref[...]

    tx = ox_ref[0][None, None] + cx
    ty = oy_ref[0][None] + cy
    in_img = (
        (tx >= 0) & (tx <= full_w - cur) & (ty >= 0) & (ty <= full_h - cur)
    )
    _finish_step(
        cx, cy, costs, present, rank, lam, in_window | in_rival, in_img,
        out_ref,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "bs", "ext", "r", "cur", "cost", "full_h", "full_w", "interpret"
    ),
)
def windowed_color_step_pm_fused(
    scalars: jnp.ndarray,         # (4,) i32 [color, ci, cj, row0_b]
    lam_mult: jnp.ndarray,        # f32 scalar
    patches_pl: jnp.ndarray,      # (4, bs, bs//4, nPp) i16 parity planes
    wslab: jnp.ndarray,           # (win, cols, nPp) i16 window slab
    cands_pm: jnp.ndarray,        # (9, 2, s2, s2, nPp) i32
    pm_lane: jnp.ndarray,         # (2, nPp) i32
    present_pm: jnp.ndarray,      # (4, 9, s2, s2, nPp) i32
    rank_pm: jnp.ndarray,         # (4, 9, s2, s2, nPp) i32
    oy_cell: jnp.ndarray,         # (4, s2, 1, nPp) i32
    ox_cell: jnp.ndarray,         # (4, s2, nPp) i32
    bs: int,
    ext: int,
    r: int,
    cur: int,
    cost: str,
    full_h: int,
    full_w: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """(2, s2, s2, nPp) i32 winner MVs; no cost volume exists anywhere."""
    s2 = (bs // cur) // 2
    npp = pm_lane.shape[-1]
    win, cols = wslab.shape[0], wslab.shape[1]
    q4 = bs // 4
    grid = (npp // 128,)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, sc: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((4, bs, q4, 128), lambda i, sc: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((win, cols, 128), lambda i, sc: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, 2, s2, s2, 128), lambda i, sc: (0, 0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 128), lambda i, sc: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9, s2, s2, 128),
                         lambda i, sc: (sc[0], 0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9, s2, s2, 128),
                         lambda i, sc: (sc[0], 0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s2, 1, 128), lambda i, sc: (sc[0], 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s2, 128), lambda i, sc: (sc[0], 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (2, s2, s2, 128), lambda i, sc: (0, 0, 0, i),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((9, s2, s2, 128), jnp.int32)],
    )
    return pl.pallas_call(
        functools.partial(
            _kernel_pm_fused, bs=bs, ext=ext, r=r, cur=cur, cost=cost,
            full_h=full_h, full_w=full_w,
        ),
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((2, s2, s2, npp), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(scalars, jnp.reshape(lam_mult.astype(jnp.float32), (1, 1)),
      patches_pl, wslab, cands_pm, pm_lane, present_pm, rank_pm, oy_cell,
      ox_cell)


@functools.partial(
    jax.jit,
    static_argnames=(
        "bs", "ext", "r", "r2", "cur", "cost", "full_h", "full_w", "interpret"
    ),
)
def windowed_color_step_pm_fused_rival(
    scalars: jnp.ndarray,
    lam_mult: jnp.ndarray,
    patches_pl: jnp.ndarray,      # (4, bs, bs//4, nPp) i16
    wslab: jnp.ndarray,           # (win, cols, nPp) i16
    rwslab: jnp.ndarray,          # (rwin, rcols, nPp) i16 rival slab
    cands_pm: jnp.ndarray,
    pm_lane: jnp.ndarray,
    rpm_lane: jnp.ndarray,        # (2, nPp) i32 rival centers
    present_pm: jnp.ndarray,
    rank_pm: jnp.ndarray,
    oy_cell: jnp.ndarray,
    ox_cell: jnp.ndarray,
    bs: int,
    ext: int,
    r: int,
    r2: int,
    cur: int,
    cost: str,
    full_h: int,
    full_w: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Rival-mode fused color step (both slabs VMEM-resident)."""
    s2 = (bs // cur) // 2
    npp = pm_lane.shape[-1]
    win, cols = wslab.shape[0], wslab.shape[1]
    rwin, rcols = rwslab.shape[0], rwslab.shape[1]
    q4 = bs // 4
    grid = (npp // 128,)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, sc: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((4, bs, q4, 128), lambda i, sc: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((win, cols, 128), lambda i, sc: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rwin, rcols, 128), lambda i, sc: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, 2, s2, s2, 128), lambda i, sc: (0, 0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 128), lambda i, sc: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 128), lambda i, sc: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9, s2, s2, 128),
                         lambda i, sc: (sc[0], 0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9, s2, s2, 128),
                         lambda i, sc: (sc[0], 0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s2, 1, 128), lambda i, sc: (sc[0], 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s2, 128), lambda i, sc: (sc[0], 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (2, s2, s2, 128), lambda i, sc: (0, 0, 0, i),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((9, s2, s2, 128), jnp.int32)],
    )
    return pl.pallas_call(
        functools.partial(
            _kernel_pm_fused_rival, bs=bs, ext=ext, r=r, r2=r2, cur=cur,
            cost=cost, full_h=full_h, full_w=full_w,
        ),
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((2, s2, s2, npp), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(scalars, jnp.reshape(lam_mult.astype(jnp.float32), (1, 1)),
      patches_pl, wslab, rwslab, cands_pm, pm_lane, rpm_lane, present_pm,
      rank_pm, oy_cell, ox_cell)

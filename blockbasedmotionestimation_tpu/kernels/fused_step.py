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

# perf-diagnosis ablations (results are WRONG when set):
#   BBME_FUSED_NOLOOP=1  skip the bbox cost loops (isolates fixed overhead)
#   BBME_FUSED_ABLATE=nofinish  noloop + skip _finish_step's energy tail
#   BBME_FUSED_ABLATE=bare      nofinish + skip key/bbox scalar prologue
import os as _os
_ABLATE = _os.environ.get("BBME_FUSED_ABLATE", "")
_SKIP_BBOX = _os.environ.get("BBME_FUSED_NOLOOP") == "1" or _ABLATE in (
    "nofinish", "bare"
)
if _SKIP_BBOX:  # a stray env var must never silently corrupt results
    import warnings as _warnings

    _warnings.warn(
        "BBME_FUSED_NOLOOP/BBME_FUSED_ABLATE is set: fused color-step "
        "kernels will SKIP their cost loops and return WRONG flow.  These "
        "ablations exist only for perf diagnosis (DESIGN.md section 7c).",
        stacklevel=2,
    )
    print(
        "[bbme] WARNING: fused-step ablation env var active - results are "
        "intentionally WRONG (perf diagnosis only)",
        flush=True,
    )


def prep_slabs(
    patches_t: jnp.ndarray,  # (bs, bs, nP) i16
    windows_t: jnp.ndarray,  # (win, win, nP) i16
    bs: int,
    ext: int,
    r: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """CHUNK-MAJOR kernel inputs: (nch, 4, bs, bs//4, 128) frame-1 parity
    planes and the (nch, win, cols, 128) frame-2 window slab (columns
    cropped/padded to the 8-aligned group loads' reach, mirroring the CV
    build kernels).

    The chunk dim leads so one color-step tile's slab is a CONTIGUOUS HBM
    run (these slabs are re-fetched EVERY color step; same lesson as r2's
    chunk-major CV), and both arrive pre-split into x-parity planes so the
    kernel's per-delta diffs use only STATIC plane/offset indexing (the
    ``_diff_kernel_static`` structure - an earlier dynamically-sliced
    variant cost ~9 us per 8-delta group and made fused rounds slower than
    the dense streaming they replace)."""
    cb = 128
    n_p = patches_t.shape[-1]
    npad = -n_p % cb
    if npad:
        patches_t = jnp.pad(patches_t, ((0, 0), (0, 0), (0, npad)))
        windows_t = jnp.pad(windows_t, ((0, 0), (0, 0), (0, npad)))
    n = n_p + npad
    nch = n // cb
    side = 2 * r + 1
    ngroups = (side + 7) // 8
    cols = 8 * ngroups + bs
    wslab = windows_t[:, ext - r :, :]
    pad_c = cols - wslab.shape[1]
    if pad_c > 0:
        wslab = jnp.pad(wslab, ((0, 0), (0, pad_c), (0, 0)))
    else:
        wslab = wslab[:, :cols, :]
    win = wslab.shape[0]
    wplanes = (
        wslab.reshape(win, cols // 4, 4, nch, cb).transpose(3, 2, 0, 1, 4)
    )
    patches_pl = (
        patches_t.reshape(bs, bs // 4, 4, nch, cb).transpose(3, 2, 0, 1, 4)
    )
    return patches_pl, wplanes


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


def _group_row_bounds(key, side):
    """Per-4-column-group row bounds of the valid (key >= 0) candidates.

    One rectangle over the whole chunk (the r3/r4 form) pays for its
    OUTLIERS: the 128-parent lane chunks span full parent rows, so a
    single frame-border junk candidate at a far corner made every visit
    loop walk the full rectangle between it and the main cluster -
    measured 3.0 ms/field of the production bench's 32.4 (ablation ladder
    BBME_FUSED_NOLOOP, r5).  Bounding the delta ROWS separately per
    4-wide column group visits scattered candidates in near-constant
    work: an empty group costs one pl.when branch, an outlier costs its
    own 1-row group visit instead of inflating the cluster's.

    Returns [(g, gymin, gymax), ...] for the static group unroll.
    """
    kd = key >= 0
    dyi = key // side
    dxi = key - dyi * side
    ngroups4 = (side + 3) // 4
    out = []
    for g in range(ngroups4):
        in_g = kd & (dxi >= 4 * g) & (dxi < 4 * (g + 1))
        gymin = jnp.min(jnp.where(in_g, dyi, _I32_BIG))
        gymax = jnp.max(jnp.where(in_g, dyi, -_I32_BIG))
        out.append((g, gymin, gymax))
    return out


def _accumulate_bbox(
    acc_ref, wslab_ref, bp, key,
    *, bs: int, ext: int, r: int, side: int, cur: int, cost: str, ci, cj,
):
    """Visit the valid candidates of ``key`` (CV-index coords dy*side+dx,
    -1 = skip): compute pooled color-cell costs from the VMEM window
    planes and one-hot accumulate them into the 9-candidate acc wherever
    ``key`` matches.

    Structure: a STATIC unroll over 4-wide column groups, each gated ONCE
    by ``pl.when`` on the group's OWN row bounds (``_group_row_bounds``:
    fine rounds' candidates are typically a tight cluster plus scattered
    border junk, so most groups skip entirely and no group walks the
    cluster-to-outlier rectangle); inside an active group, ONE dynamic
    fori_loop over that group's delta rows with the 9-candidate acc as
    the loop carry (kept resident across rows - no per-row
    read-modify-write).  Every memory slice is static except the row
    offset (dim 2, above the tiled (sublane, lane) pair, so no alignment
    proof is needed); the pre-split x-parity planes give static plane
    indices ((p + j) % 4 with j static) and static sublane offsets.
    Earlier variants paid dearly elsewhere: a per-delta predicated form
    RMW'd the acc through VMEM per delta (~5x slower end to end); a
    lane-minor 8-delta-group form paid ~9 us per group in reshape
    relayouts; a dynamic sublane-offset group load is rejected by Mosaic
    (offsets in the sublane dim must be provably 8-aligned); a
    row-at-a-time static unroll of all ``side`` columns wasted ~4x the
    compute on out-of-bbox deltas and paid the 9 branch checks per row
    instead of once.
    """
    q4 = bs // 4
    s2h = bs // 2
    cb = bp[0].shape[-1]
    if _SKIP_BBOX:
        return

    for g, gymin, gymax in _group_row_bounds(key, side):

        @pl.when(gymax >= gymin)
        def _(g=g, gymin=gymin, gymax=gymax):
            def rowg_body(dyi, acc):
                wq = [
                    wslab_ref[
                        0, c, pl.ds(ext - r + dyi, bs), g : g + q4 + 1, :
                    ].astype(jnp.int32)
                    for c in range(4)
                ]
                rbase = dyi * side
                for j in range(4):
                    dx = 4 * g + j
                    if dx >= side:
                        continue
                    halves = []
                    for bx in range(2):
                        accp = None
                        for p in (2 * bx, 2 * bx + 1):
                            c = (p + j) % 4
                            soff = (p + j) // 4
                            d = bp[p] - wq[c][:, soff : soff + q4, :]
                            d = jnp.abs(d) if cost == "sad" else d * d
                            accp = d if accp is None else accp + d
                        halves.append(
                            accp.reshape(s2h, 2, q4, cb).sum(axis=1)
                        )
                    h = _pool_select_color(halves, bs, cur, ci, cj)
                    acc = jnp.where(key == rbase + dx, h[None], acc)
                return acc

            acc_ref[...] = jax.lax.fori_loop(
                gymin, gymax + 1, rowg_body, acc_ref[...]
            )


def _pick_grouped(acc_ref, key, side, read_v):
    """Dense-CV one-hot pick over the valid candidates of ``key``, visited
    with the same per-column-group row bounds as ``_accumulate_bbox``
    (one whole-chunk rectangle walked cluster-to-outlier before, r5).
    ``read_v(dyi, dxi)`` returns the CV value vector at index coords."""
    if _SKIP_BBOX:
        return
    for g, gymin, gymax in _group_row_bounds(key, side):

        @pl.when(gymax >= gymin)
        def _(g=g, gymin=gymin, gymax=gymax):
            def row_body(dyi, acc):
                for j in range(4):
                    dxi = 4 * g + j
                    if dxi >= side:
                        continue
                    v = read_v(dyi, dxi)
                    acc = jnp.where(key == dyi * side + dxi, v[None], acc)
                return acc

            acc_ref[...] = jax.lax.fori_loop(
                gymin, gymax + 1, row_body, acc_ref[...]
            )


def _kernel_pm_fused(
    sc_ref,        # (4,) i32 prefetch: [color, ci, cj, row0_b]
    lam_ref,       # (1, 1) f32 SMEM
    patches_ref,   # (1, 4, bs, bs//4, 128) i16 x-parity planes (chunk-major)
    wslab_ref,     # (1, 4, win, cols//4, 128) i16 window parity planes
    cands_ref,     # (1, 9, 2, s2, s2, 128) i32 (chunk-major)
    pm_ref,        # (1, 2, 128) i32 window-center MVs
    present_ref,   # (1, 1, 9, s2, s2, 128) i32
    rank_ref,      # (1, 1, 9, s2, s2, 128) i32
    oy_ref,        # (1, 1, s2, 1, 128) i32
    ox_ref,        # (1, 1, s2, 128) i32
    out_ref,       # (1, 2, s2, s2, 128) i32 (chunk-major)
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
    cands = cands_ref[0]
    cx, cy = cands[:, 0], cands[:, 1]          # (9, s2, s2, 128)
    pm = pm_ref[0]
    present = present_ref[0, 0]
    rank = rank_ref[0, 0]
    lam = lam_ref[0, 0]

    if _ABLATE == "bare":
        out_ref[0, 0] = cx[0] + patches_ref[0, 0, 0, 0].astype(jnp.int32)
        out_ref[0, 1] = cy[0] + wslab_ref[0, 0, 0, 0].astype(jnp.int32)
        return

    ddx = cx - pm[0][None, None, None]
    ddy = cy - pm[1][None, None, None]
    in_window = (ddx >= -r) & (ddx <= r) & (ddy >= -r) & (ddy <= r)
    key = jnp.where(in_window, (ddy + r) * side + (ddx + r), -1)

    acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.int32)
    bp = [patches_ref[0, p].astype(jnp.int32) for p in range(4)]
    _accumulate_bbox(
        acc_ref, wslab_ref, bp, jnp.where(present != 0, key, -1),
        bs=bs, ext=ext, r=r, side=side, cur=cur, cost=cost, ci=ci, cj=cj,
    )
    costs = acc_ref[...]

    if _ABLATE == "nofinish":
        out_ref[0, 0] = cx[0] + costs[0]
        out_ref[0, 1] = cy[0] + key[0]
        return

    tx = ox_ref[0, 0][None, None] + cx
    ty = oy_ref[0, 0][None] + cy
    in_img = (
        (tx >= 0) & (tx <= full_w - cur) & (ty >= 0) & (ty <= full_h - cur)
    )
    nx, ny = _finish_step(cx, cy, costs, present, rank, lam, in_window, in_img)
    out_ref[0, 0] = nx
    out_ref[0, 1] = ny


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
    cands = cands_ref[0]
    cx, cy = cands[:, 0], cands[:, 1]
    pm = pm_ref[0]
    rpm = rpm_ref[0]
    present = present_ref[0, 0]
    rank = rank_ref[0, 0]
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
    bp = [patches_ref[0, p].astype(jnp.int32) for p in range(4)]

    _accumulate_bbox(
        acc_ref, wslab_ref, bp, jnp.where(present != 0, key, -1),
        bs=bs, ext=ext, r=r, side=side, cur=cur, cost=cost, ci=ci, cj=cj,
    )

    # rival visits: empty on smooth tiles (no own-excluded candidate)
    _accumulate_bbox(
        acc_ref, rwslab_ref, bp, jnp.where(present != 0, key_r, -1),
        bs=bs, ext=r2, r=r2, side=side2, cur=cur, cost=cost, ci=ci, cj=cj,
    )
    costs = acc_ref[...]

    tx = ox_ref[0, 0][None, None] + cx
    ty = oy_ref[0, 0][None] + cy
    in_img = (
        (tx >= 0) & (tx <= full_w - cur) & (ty >= 0) & (ty <= full_h - cur)
    )
    nx, ny = _finish_step(
        cx, cy, costs, present, rank, lam, in_window | in_rival, in_img
    )
    out_ref[0, 0] = nx
    out_ref[0, 1] = ny


@functools.partial(
    jax.jit,
    static_argnames=(
        "bs", "ext", "r", "cur", "cost", "full_h", "full_w", "interpret"
    ),
)
def windowed_color_step_pm_fused(
    scalars: jnp.ndarray,         # (4,) i32 [color, ci, cj, row0_b]
    lam_mult: jnp.ndarray,        # f32 scalar
    patches_pl: jnp.ndarray,      # (nch, 4, bs, bs//4, 128) i16 parity planes
    wslab: jnp.ndarray,           # (nch, 4, win, cols//4, 128) i16 slab
    cands_pm: jnp.ndarray,        # (nch, 9, 2, s2, s2, 128) i32
    pm_lane: jnp.ndarray,         # (nch, 2, 128) i32
    present_pm: jnp.ndarray,      # (4, nch, 9, s2, s2, 128) i32
    rank_pm: jnp.ndarray,         # (4, nch, 9, s2, s2, 128) i32
    oy_cell: jnp.ndarray,         # (4, nch, s2, 1, 128) i32
    ox_cell: jnp.ndarray,         # (4, nch, s2, 128) i32
    bs: int,
    ext: int,
    r: int,
    cur: int,
    cost: str,
    full_h: int,
    full_w: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """(nch, 2, s2, s2, 128) i32 winner MVs; no cost volume exists anywhere.

    ALL operands are chunk-major (parent-chunk dim leading) so every
    per-tile block is one contiguous HBM run - see the dense wrapper's
    docstring for the lane-minor DMA-descriptor pathology this avoids.
    """
    s2 = (bs // cur) // 2
    npp = pm_lane.shape[0] * 128
    win, cols4 = wslab.shape[2], wslab.shape[3]
    q4 = bs // 4
    grid = (npp // 128,)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, sc: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4, bs, q4, 128), lambda i, sc: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, win, cols4, 128),
                         lambda i, sc: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9, 2, s2, s2, 128),
                         lambda i, sc: (i, 0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 128), lambda i, sc: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 9, s2, s2, 128),
                         lambda i, sc: (sc[0], i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 9, s2, s2, 128),
                         lambda i, sc: (sc[0], i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s2, 1, 128), lambda i, sc: (sc[0], i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s2, 128), lambda i, sc: (sc[0], i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 2, s2, s2, 128), lambda i, sc: (i, 0, 0, 0, 0),
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
        out_shape=jax.ShapeDtypeStruct((npp // 128, 2, s2, s2, 128), jnp.int32),
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
    patches_pl: jnp.ndarray,      # (nch, 4, bs, bs//4, 128) i16
    wslab: jnp.ndarray,           # (nch, 4, win, cols//4, 128) i16
    rwslab: jnp.ndarray,          # (nch, 4, rwin, rcols//4, 128) i16 rival
    cands_pm: jnp.ndarray,
    pm_lane: jnp.ndarray,
    rpm_lane: jnp.ndarray,        # (nch, 2, 128) i32 rival centers
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
    """Rival-mode fused color step (both slabs VMEM-resident), chunk-major."""
    s2 = (bs // cur) // 2
    npp = pm_lane.shape[0] * 128
    win, cols4 = wslab.shape[2], wslab.shape[3]
    rwin, rcols4 = rwslab.shape[2], rwslab.shape[3]
    q4 = bs // 4
    grid = (npp // 128,)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, sc: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4, bs, q4, 128), lambda i, sc: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, win, cols4, 128),
                         lambda i, sc: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, rwin, rcols4, 128),
                         lambda i, sc: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9, 2, s2, s2, 128),
                         lambda i, sc: (i, 0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 128), lambda i, sc: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 128), lambda i, sc: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 9, s2, s2, 128),
                         lambda i, sc: (sc[0], i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 9, s2, s2, 128),
                         lambda i, sc: (sc[0], i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s2, 1, 128), lambda i, sc: (sc[0], i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s2, 128), lambda i, sc: (sc[0], i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 2, s2, s2, 128), lambda i, sc: (i, 0, 0, 0, 0),
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
        out_shape=jax.ShapeDtypeStruct((npp // 128, 2, s2, s2, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(scalars, jnp.reshape(lam_mult.astype(jnp.float32), (1, 1)),
      patches_pl, wslab, rwslab, cands_pm, pm_lane, rpm_lane, present_pm,
      rank_pm, oy_cell, ox_cell)


# ------------------------------------------------------------- hybrid rival
# Dense main window + slab-recomputed rival: the production rival mode.  The
# main window's costs come from the dense pooled CV exactly like
# ``reg_step._kernel_pm`` (full streaming speed); only the rare own-excluded
# candidates that land in the rival window are recomputed against the
# VMEM-resident rival slab.  This removes the SECOND dense cost volume that
# rival mode otherwise builds (reference analogue: the unrestricted candidate
# re-evaluation of ``motion_framework.cpp:594-602``), which was both ~30% of
# the CV build time and the HBM transient that kept rival from batching at
# B=8 (DESIGN.md section 3b).


def _kernel_pm_hybrid(
    sc_ref,        # (4,) i32 prefetch: [color, ci, cj, row0_b]
    lam_ref,       # (1, 1) f32 SMEM
    cv_ref,        # (s2, 1, 1, 1, side, side, s2, 128): color CV (whole chunk)
    patches_ref,   # (1, 4, bs, bs//4, 128) i16 x-parity planes
    rwslab_ref,    # (1, 4, rwin, rcols//4, 128) i16 rival window planes
    cands_ref,     # (1, 9, 2, s2, s2, 128) i32
    pm_ref,        # (1, 2, 128) i32 window-center MVs
    rpm_ref,       # (1, 2, 128) i32 rival-center MVs
    present_ref,   # (1, 1, 9, s2, s2, 128) i32
    rank_ref,      # (1, 1, 9, s2, s2, 128) i32
    oy_ref,        # (1, 1, s2, 1, 128) i32
    ox_ref,        # (1, 1, s2, 128) i32
    out_ref,       # (1, 2, s2, s2, 128) i32
    acc_ref,       # scratch (9, s2, s2, 128) i32
    *,
    side: int,
    r: int,
    bs: int,
    r2: int,
    cur: int,
    cost: str,
    full_h: int,
    full_w: int,
):
    side2 = 2 * r2 + 1
    ci = sc_ref[1]
    cj = sc_ref[2]
    cands = cands_ref[0]
    cx, cy = cands[:, 0], cands[:, 1]
    pm = pm_ref[0]
    rpm = rpm_ref[0]
    present = present_ref[0, 0]
    rank = rank_ref[0, 0]
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

    # main window: dense CV one-hot pick over the per-group candidate rows
    acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.int32)
    _pick_grouped(
        acc_ref, jnp.where(present != 0, key, -1), side,
        lambda dyi, dxi: cv_ref[:, 0, 0, 0, dyi, dxi].astype(jnp.int32),
    )

    # rival window: slab recompute, empty visits on smooth tiles
    bp = [patches_ref[0, p].astype(jnp.int32) for p in range(4)]
    _accumulate_bbox(
        acc_ref, rwslab_ref, bp, jnp.where(present != 0, key_r, -1),
        bs=bs, ext=r2, r=r2, side=side2, cur=cur, cost=cost, ci=ci, cj=cj,
    )
    costs = acc_ref[...]

    tx = ox_ref[0, 0][None, None] + cx
    ty = oy_ref[0, 0][None] + cy
    in_img = (
        (tx >= 0) & (tx <= full_w - cur) & (ty >= 0) & (ty <= full_h - cur)
    )
    nx, ny = _finish_step(
        cx, cy, costs, present, rank, lam, in_window | in_rival, in_img
    )
    out_ref[0, 0] = nx
    out_ref[0, 1] = ny


def _kernel_pm_hybrid_tail(
    sc_ref,        # (4,) i32 prefetch: [color, ci, cj, row0_b]
    lam_ref,       # (1, 1) f32 SMEM
    cv_ref,        # (s2, 1, 1, 1, side, side_st, s2, 128): dx-RESTRICTED CV
    patches_ref,   # (1, 4, bs, bs//4, 128) i16 x-parity planes
    wslab_ref,     # (1, 4, win, cols//4, 128) i16 MAIN window planes
    rwslab_ref,    # (1, 4, rwin, rcols//4, 128) i16 rival window planes
    cands_ref,     # (1, 9, 2, s2, s2, 128) i32
    pm_ref,        # (1, 2, 128) i32 window-center MVs
    rpm_ref,       # (1, 2, 128) i32 rival-center MVs
    present_ref,   # (1, 1, 9, s2, s2, 128) i32
    rank_ref,      # (1, 1, 9, s2, s2, 128) i32
    oy_ref,        # (1, 1, s2, 1, 128) i32
    ox_ref,        # (1, 1, s2, 128) i32
    out_ref,       # (1, 2, s2, s2, 128) i32
    acc_ref,       # scratch (9, s2, s2, 128) i32
    *,
    r_st: int,     # stored-CV radius (cv holds only |delta| <= r_st)
    r: int,        # full window radius (candidates evaluable to here)
    bs: int,
    ext: int,
    r2: int,
    cur: int,
    cost: str,
    full_h: int,
    full_w: int,
):
    """r_store step: dense pick from the dx-RESTRICTED cur=2 volume + slab
    recompute for BOTH the stored-band tail (in-window candidates with
    |dx-delta| beyond r_st, against the main window slab) and the rival
    window.

    The cur=2 volume is the pipeline's HBM dominator (~1.2 GB/field
    written + streamed twice); storing only |dx-delta| <= r_st keeps
    (2*r_st+1) / (2*r+1) of it while staying BIT-EXACT: out-of-band
    candidates are recomputed from the same window pixels the volume was
    built from (usually an empty bbox - after the search, candidate
    deltas cluster well inside r_st except at motion discontinuities).
    Only the COLUMN delta is restricted: the build kernel's dy is a grid
    dim, and a dy-restricted store needs a clamped output index_map,
    which hangs this backend's compiler (r4 probe).
    """
    side_st = 2 * r_st + 1
    side_full = 2 * r + 1
    side2 = 2 * r2 + 1
    ci = sc_ref[1]
    cj = sc_ref[2]
    cands = cands_ref[0]
    cx, cy = cands[:, 0], cands[:, 1]
    pm = pm_ref[0]
    rpm = rpm_ref[0]
    present = present_ref[0, 0]
    rank = rank_ref[0, 0]
    lam = lam_ref[0, 0]

    ddx = cx - pm[0][None, None, None]
    ddy = cy - pm[1][None, None, None]
    in_window = (ddx >= -r) & (ddx <= r) & (ddy >= -r) & (ddy <= r)
    in_stored = in_window & (ddx >= -r_st) & (ddx <= r_st)
    key_s = jnp.where(in_stored, (ddy + r) * side_st + (ddx + r_st), -1)
    key_t = jnp.where(
        in_window & ~in_stored, (ddy + r) * side_full + (ddx + r), -1
    )
    rdx = cx - rpm[0][None, None, None]
    rdy = cy - rpm[1][None, None, None]
    in_rival = (rdx >= -r2) & (rdx <= r2) & (rdy >= -r2) & (rdy <= r2)
    key_r = jnp.where(
        in_rival & ~in_window, (rdy + r2) * side2 + (rdx + r2), -1
    )

    # stored band: dense CV one-hot pick over the per-group candidate rows
    acc_ref[...] = jnp.zeros(acc_ref.shape, jnp.int32)
    _pick_grouped(
        acc_ref, jnp.where(present != 0, key_s, -1), side_st,
        lambda dyi, dxi: cv_ref[:, 0, 0, 0, dyi, dxi].astype(jnp.int32),
    )

    bp = [patches_ref[0, p].astype(jnp.int32) for p in range(4)]

    # stored-band tail: main-window candidates beyond r_st, recomputed
    # against the MAIN slab (empty visits on smooth tiles)
    _accumulate_bbox(
        acc_ref, wslab_ref, bp, jnp.where(present != 0, key_t, -1),
        bs=bs, ext=ext, r=r, side=side_full, cur=cur, cost=cost,
        ci=ci, cj=cj,
    )

    # rival window: slab recompute, empty visits on smooth tiles
    _accumulate_bbox(
        acc_ref, rwslab_ref, bp, jnp.where(present != 0, key_r, -1),
        bs=bs, ext=r2, r=r2, side=side2, cur=cur, cost=cost, ci=ci, cj=cj,
    )
    costs = acc_ref[...]

    tx = ox_ref[0, 0][None, None] + cx
    ty = oy_ref[0, 0][None] + cy
    in_img = (
        (tx >= 0) & (tx <= full_w - cur) & (ty >= 0) & (ty <= full_h - cur)
    )
    nx, ny = _finish_step(
        cx, cy, costs, present, rank, lam, in_window | in_rival, in_img
    )
    out_ref[0, 0] = nx
    out_ref[0, 1] = ny


@functools.partial(
    jax.jit,
    static_argnames=(
        "r_st", "r", "bs", "ext", "r2", "cur", "cost", "full_h", "full_w",
        "interpret",
    ),
)
def windowed_color_step_pm_hybrid_tail(
    scalars: jnp.ndarray,         # (4,) i32 [color, ci, cj, row0_b]
    lam_mult: jnp.ndarray,        # f32 scalar
    cv_pm: jnp.ndarray,           # (f//2, 2, 2, nch, side, side_st, s2, 128)
    patches_pl: jnp.ndarray,      # (nch, 4, bs, bs//4, 128) i16
    wslab: jnp.ndarray,           # (nch, 4, win, cols//4, 128) i16 MAIN slab
    rwslab: jnp.ndarray,          # (nch, 4, rwin, rcols//4, 128) i16
    cands_pm: jnp.ndarray,        # (nch, 9, 2, s2, s2, 128) i32
    pm_lane: jnp.ndarray,         # (nch, 2, 128) i32
    rpm_lane: jnp.ndarray,        # (nch, 2, 128) i32
    present_pm: jnp.ndarray,      # (4, nch, 9, s2, s2, 128) i32
    rank_pm: jnp.ndarray,         # (4, nch, 9, s2, s2, 128) i32
    oy_cell: jnp.ndarray,         # (4, nch, s2, 1, 128) i32
    ox_cell: jnp.ndarray,         # (4, nch, s2, 128) i32
    r_st: int,
    r: int,
    bs: int,
    ext: int,
    r2: int,
    cur: int,
    cost: str,
    full_h: int,
    full_w: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """(nch, 2, s2, s2, 128) i32 winners: dx-restricted dense CV +
    main-tail and rival slab recomputes (the r_store traffic mode)."""
    side = 2 * r + 1
    side_st = 2 * r_st + 1
    s2, npp = cv_pm.shape[6], cv_pm.shape[3] * 128
    win, cols4 = wslab.shape[2], wslab.shape[3]
    rwin, rcols4 = rwslab.shape[2], rwslab.shape[3]
    q4 = bs // 4
    grid = (npp // 128,)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, sc: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((s2, 1, 1, 1, side, side_st, s2, 128),
                         lambda i, sc: (0, sc[1], sc[2], i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, bs, q4, 128), lambda i, sc: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, win, cols4, 128),
                         lambda i, sc: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, rwin, rcols4, 128),
                         lambda i, sc: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9, 2, s2, s2, 128),
                         lambda i, sc: (i, 0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 128), lambda i, sc: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 128), lambda i, sc: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 9, s2, s2, 128),
                         lambda i, sc: (sc[0], i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 9, s2, s2, 128),
                         lambda i, sc: (sc[0], i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s2, 1, 128), lambda i, sc: (sc[0], i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s2, 128), lambda i, sc: (sc[0], i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 2, s2, s2, 128), lambda i, sc: (i, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((9, s2, s2, 128), jnp.int32)],
    )
    return pl.pallas_call(
        functools.partial(
            _kernel_pm_hybrid_tail, r_st=r_st, r=r, bs=bs, ext=ext, r2=r2,
            cur=cur, cost=cost, full_h=full_h, full_w=full_w,
        ),
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((npp // 128, 2, s2, s2, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(scalars, jnp.reshape(lam_mult.astype(jnp.float32), (1, 1)), cv_pm,
      patches_pl, wslab, rwslab, cands_pm, pm_lane, rpm_lane, present_pm,
      rank_pm, oy_cell, ox_cell)


@functools.partial(
    jax.jit,
    static_argnames=(
        "side", "r", "bs", "r2", "cur", "cost", "full_h", "full_w", "interpret"
    ),
)
def windowed_color_step_pm_hybrid(
    scalars: jnp.ndarray,         # (4,) i32 [color, ci, cj, row0_b]
    lam_mult: jnp.ndarray,        # f32 scalar
    cv_pm: jnp.ndarray,           # (f//2, 2, 2, nch, side, side, s2, 128)
    patches_pl: jnp.ndarray,      # (nch, 4, bs, bs//4, 128) i16
    rwslab: jnp.ndarray,          # (nch, 4, rwin, rcols//4, 128) i16
    cands_pm: jnp.ndarray,        # (nch, 9, 2, s2, s2, 128) i32
    pm_lane: jnp.ndarray,         # (nch, 2, 128) i32
    rpm_lane: jnp.ndarray,        # (nch, 2, 128) i32
    present_pm: jnp.ndarray,      # (4, nch, 9, s2, s2, 128) i32
    rank_pm: jnp.ndarray,         # (4, nch, 9, s2, s2, 128) i32
    oy_cell: jnp.ndarray,         # (4, nch, s2, 1, 128) i32
    ox_cell: jnp.ndarray,         # (4, nch, s2, 128) i32
    side: int,
    r: int,
    bs: int,
    r2: int,
    cur: int,
    cost: str,
    full_h: int,
    full_w: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """(nch, 2, s2, s2, 128) i32 winners: dense main CV + slab rival."""
    s2, npp = cv_pm.shape[6], cv_pm.shape[3] * 128
    rwin, rcols4 = rwslab.shape[2], rwslab.shape[3]
    q4 = bs // 4
    grid = (npp // 128,)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, sc: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((s2, 1, 1, 1, side, side, s2, 128),
                         lambda i, sc: (0, sc[1], sc[2], i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, bs, q4, 128), lambda i, sc: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, rwin, rcols4, 128),
                         lambda i, sc: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9, 2, s2, s2, 128),
                         lambda i, sc: (i, 0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 128), lambda i, sc: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 128), lambda i, sc: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 9, s2, s2, 128),
                         lambda i, sc: (sc[0], i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 9, s2, s2, 128),
                         lambda i, sc: (sc[0], i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s2, 1, 128), lambda i, sc: (sc[0], i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s2, 128), lambda i, sc: (sc[0], i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 2, s2, s2, 128), lambda i, sc: (i, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((9, s2, s2, 128), jnp.int32)],
    )
    return pl.pallas_call(
        functools.partial(
            _kernel_pm_hybrid, side=side, r=r, bs=bs, r2=r2, cur=cur,
            cost=cost, full_h=full_h, full_w=full_w,
        ),
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((npp // 128, 2, s2, s2, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(scalars, jnp.reshape(lam_mult.astype(jnp.float32), (1, 1)), cv_pm,
      patches_pl, rwslab, cands_pm, pm_lane, rpm_lane, present_pm, rank_pm,
      oy_cell, ox_cell)

"""Fused Pallas kernel for one windowed-regularizer color step.

One color step of the windowed schedule (``ops.windowed``) evaluates, for
every block of one four-color slab, the 9 candidate MVs of the reference's
8-connected sweep (``motion_framework.cpp:424-530``): candidate cost looked
up in the per-round cost volume, L1 smoothness over present candidates,
energy = cost + lambda*mult*smoothness (``:607``), winner = lexicographic
(energy, case-rank) minimum (``:646-662``).

The XLA formulation spends most of its time materializing color slabs of the
cost volume and running a scan of one-hot masked reductions.  This kernel
fuses the whole step: the color's CV plane is selected by a prefetched
scalar in the index_map (no slab materialization), and the candidate-cost
pick, smoothness, energy, and winner all happen on VMEM-resident tiles.

Cost pick = one-hot select over the side^2 delta axis, as a fori_loop over
delta rows with the delta columns unrolled (Mosaic reuses the loop-body
stack; dynamic loads from refs index only non-lane dims).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32_MAX = np.float32(np.finfo(np.float32).max)
_BIG_RANK = np.int32(127)


def _kernel(
    sc_ref,        # (5,) i32 prefetch: [color, lci, lcj, row0_b, col0_b]
    lam_ref,       # (1, 1) f32 SMEM: lambda * lambda_multiplier
    cv_ref,        # (1, side^2, mt, nt) u16/i32: this color's CV tile
    cands_ref,     # (9, 2, mt, nt) i32 candidate MVs (x, y)
    pm_ref,        # (1, 2, mt, nt) i32 parent search MVs
    present_ref,   # (1, 9, mt, nt) i32 0/1
    rank_ref,      # (1, 9, mt, nt) i32 case ranks
    out_ref,       # (2, mt, nt) i32 winner MVs
    *,
    side: int,
    r: int,
    cur: int,
    full_h: int,
    full_w: int,
):
    mt, nt = out_ref.shape[1], out_ref.shape[2]
    ci = sc_ref[1]
    cj = sc_ref[2]
    row0_b = sc_ref[3]
    col0_b = sc_ref[4]
    i0 = pl.program_id(0) * mt
    j0 = pl.program_id(1) * nt

    cands = cands_ref[...].astype(jnp.int32)   # (9, 2, mt, nt)
    cx, cy = cands[:, 0], cands[:, 1]          # (9, mt, nt)
    pm = pm_ref[0]                             # (2, mt, nt)
    present = present_ref[0]                   # (9, mt, nt) i32
    rank = rank_ref[0]
    lam = lam_ref[0, 0]

    # candidate deltas from the parent search MV; flat key into the CV
    ddx = cx - pm[0][None]
    ddy = cy - pm[1][None]
    in_window = (
        (ddx >= -r) & (ddx <= r) & (ddy >= -r) & (ddy <= r)
    )
    key = jnp.where(in_window, (ddy + r) * side + (ddx + r), -1)  # (9, mt, nt)

    # one-hot cost pick over the side^2 delta axis
    def pick_row(dy, acc):
        strip = cv_ref[0, pl.ds(dy * side, side)]  # (side, mt, nt)
        for dx in range(side):
            v = strip[dx].astype(jnp.int32)        # (mt, nt)
            acc = jnp.where(key == dy * side + dx, v[None], acc)
        return acc

    costs = jax.lax.fori_loop(
        0, side, pick_row, jnp.zeros((9, mt, nt), jnp.int32)
    )

    # global in-image bounds of the candidate target block (:578-582)
    ii = jax.lax.broadcasted_iota(jnp.int32, (mt, nt), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (mt, nt), 1)
    gi = row0_b + ci + 2 * (i0 + ii)
    gj = col0_b + cj + 2 * (j0 + jj)
    tx = (gj * cur)[None] + cx
    ty = (gi * cur)[None] + cy
    in_img = (
        (tx >= 0) & (tx <= full_w - cur) & (ty >= 0) & (ty <= full_h - cur)
    )
    nx, ny = _finish_step(cx, cy, costs, present, rank, lam, in_window, in_img)
    out_ref[0] = nx
    out_ref[1] = ny


def _finish_step(cx, cy, costs, present, rank, lam, evaluable, in_img):
    """Common tail: smoothness + energy + lexicographic winner.

    cx/cy/costs/present/rank: (9, ...) candidate-major tiles; evaluable is
    the window-coverage mask (own window, or either window in rival mode).
    Returns (new_x, new_y); callers write them into their out layout.
    """
    smooth = jnp.zeros(cx.shape, jnp.int32)
    for j in range(9):
        d = jnp.abs(cx - cx[j][None]) + jnp.abs(cy - cy[j][None])
        smooth = smooth + jnp.where(present[j][None] != 0, d, 0)

    valid = (present != 0) & evaluable & in_img
    energy = jnp.where(
        valid,
        costs.astype(jnp.float32) + lam * smooth.astype(jnp.float32),
        _F32_MAX,
    )

    e_min = energy[0]
    for k in range(1, 9):
        e_min = jnp.minimum(e_min, energy[k])
    rank_sel = jnp.where(energy == e_min[None], rank, _BIG_RANK)
    best_r = rank_sel[0]
    win = jnp.zeros(cx.shape[1:], jnp.int32)
    for k in range(1, 9):
        better = rank_sel[k] < best_r
        best_r = jnp.where(better, rank_sel[k], best_r)
        win = jnp.where(better, k, win)

    new_x = cx[0]
    new_y = cy[0]
    for k in range(1, 9):
        new_x = jnp.where(win == k, cx[k], new_x)
        new_y = jnp.where(win == k, cy[k], new_y)
    return new_x, new_y


def _kernel_pm(
    sc_ref,        # (4,) i32 prefetch: [color, ci, cj, row0_b] (unused here)
    lam_ref,       # (1, 1) f32 SMEM
    cv_ref,        # (R, 1, 1, 1, side, side, s2, 128): color CV, R sy rows
    cands_ref,     # (1, 9, 2, R, s2, 128) i32 (chunk-major: dim 0 = chunk)
    pm_ref,        # (1, 2, 128) i32 parent search MVs
    present_ref,   # (1, 1, 9, R, s2, 128) i32 (color, chunk, ...)
    rank_ref,      # (1, 1, 9, R, s2, 128) i32
    oy_ref,        # (1, 1, R, 1, 128) i32: cur * global block row per row
    ox_ref,        # (1, 1, s2, 128) i32: cur * global block col per col
    out_ref,       # (1, 2, R, s2, 128) i32 (chunk-major)
    acc_ref,       # scratch (9, R, s2, 128) i32
    *,
    side: int,
    r: int,
    cur: int,
    full_h: int,
    full_w: int,
):
    rr, s2, nt = out_ref.shape[2], out_ref.shape[3], out_ref.shape[4]
    cands = cands_ref[0]                       # (9, 2, R, s2, nt)
    cx, cy = cands[:, 0], cands[:, 1]          # (9, R, s2, nt)
    pm = pm_ref[0]                             # (2, nt)
    present = present_ref[0, 0]                # (9, R, s2, nt)
    rank = rank_ref[0, 0]
    lam = lam_ref[0, 0]

    ddx = cx - pm[0][None, None, None]
    ddy = cy - pm[1][None, None, None]
    in_window = (ddx >= -r) & (ddx <= r) & (ddy >= -r) & (ddy <= r)
    key = jnp.where(in_window, (ddy + r) * side + (ddx + r), -1)

    # one-hot cost pick over ONLY the delta bounding box the tile's valid
    # candidates span: four reductions give the box, then dynamic-bound
    # loops visit (ymax-ymin+1)*(xmax-xmin+1) deltas.  On smooth flow the
    # box is a few cells (vs side^2 = the full window); the fully-random
    # worst case matches the exhaustive sweep.
    big = jnp.int32(1 << 20)
    # bound over candidates that can actually win: non-present slots (incl.
    # wrap artifacts of the cell-layout lane rolls) must not widen the box
    bound_on = in_window & (present != 0)
    ymin = jnp.min(jnp.where(bound_on, ddy, big))
    ymax = jnp.max(jnp.where(bound_on, ddy, -big))
    xmin = jnp.min(jnp.where(bound_on, ddx, big))
    xmax = jnp.max(jnp.where(bound_on, ddx, -big))
    acc_ref[...] = jnp.zeros((9, rr, s2, nt), jnp.int32)

    def pick_row(dy, _):
        def pick_col(dx, __):
            s = (dy + r) * side + (dx + r)
            v = cv_ref[:, 0, 0, 0, dy + r, dx + r].astype(jnp.int32)
            acc_ref[...] = jnp.where(key == s, v[None], acc_ref[...])
            return 0

        jax.lax.fori_loop(xmin, xmax + 1, pick_col, 0)
        return 0

    jax.lax.fori_loop(ymin, ymax + 1, pick_row, 0)
    costs = acc_ref[...]

    tx = ox_ref[0, 0][None, None] + cx         # (9, R, s2, nt)
    ty = oy_ref[0, 0][None] + cy               # (1,R,1,nt)+(9,R,s2,nt)
    in_img = (
        (tx >= 0) & (tx <= full_w - cur) & (ty >= 0) & (ty <= full_h - cur)
    )
    nx, ny = _finish_step(cx, cy, costs, present, rank, lam, in_window, in_img)
    out_ref[0, 0] = nx
    out_ref[0, 1] = ny


@functools.partial(
    jax.jit,
    static_argnames=("side", "r", "cur", "full_h", "full_w", "interpret"),
)
def windowed_color_step_pm(
    scalars: jnp.ndarray,         # (4,) i32 [color, ci, cj, row0_b]
    lam_mult: jnp.ndarray,        # f32 scalar
    cv_pm: jnp.ndarray,           # (f//2, 2, 2, nPp//128, side, side, s2, 128)
    cands_pm: jnp.ndarray,        # (nch, 9, 2, s2, s2, 128) i32
    pm_lane: jnp.ndarray,         # (nch, 2, 128) i32
    present_pm: jnp.ndarray,      # (4, nch, 9, s2, s2, 128) i32
    rank_pm: jnp.ndarray,         # (4, nch, 9, s2, s2, 128) i32
    oy_cell: jnp.ndarray,         # (4, nch, s2, 1, 128) i32
    ox_cell: jnp.ndarray,         # (4, nch, s2, 128) i32
    side: int,
    r: int,
    cur: int,
    full_h: int,
    full_w: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """(nch, 2, s2, s2, 128) i32 winner MVs, chunk-major cell layout.

    EVERY operand (not just the CV) is CHUNK-MAJOR: the parent-chunk dim
    leads, so a tile's block of each operand is one contiguous HBM run.
    Lane-minor (..., nPp) layouts sliced at 128*i made every block a
    spray of 512-byte strided transfers - thousands of DMA descriptors
    per tile that dominated the whole color step (~150 us/tile of pure
    descriptor overhead at the L0 bench shape, vs ~10 us of compute).
    The color's CV cells are chosen entirely in the index_map (sy-row
    parity plane ci, X plane cj), so no XLA-side color slicing of the CV
    exists at all.  Tiles take R consecutive sy rows at once - the fixed
    per-tile cost dominated single-row tiles at the finer rounds.
    """
    s2, npp = cv_pm.shape[6], cv_pm.shape[3] * 128
    syq = cv_pm.shape[0]
    cv_row_bytes = side * side * s2 * 128 * cv_pm.dtype.itemsize
    rows = syq
    while rows > 1 and rows * cv_row_bytes > 10 * 1024 * 1024:
        rows //= 2
    grid = (syq // rows, npp // 128)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda j, i, sc: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((rows, 1, 1, 1, side, side, s2, 128),
                         lambda j, i, sc: (j, sc[1], sc[2], i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9, 2, rows, s2, 128),
                         lambda j, i, sc: (i, 0, 0, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 128), lambda j, i, sc: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 9, rows, s2, 128),
                         lambda j, i, sc: (sc[0], i, 0, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 9, rows, s2, 128),
                         lambda j, i, sc: (sc[0], i, 0, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rows, 1, 128),
                         lambda j, i, sc: (sc[0], i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s2, 128), lambda j, i, sc: (sc[0], i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 2, rows, s2, 128), lambda j, i, sc: (i, 0, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((9, rows, s2, 128), jnp.int32)],
    )
    return pl.pallas_call(
        functools.partial(
            _kernel_pm, side=side, r=r, cur=cur, full_h=full_h, full_w=full_w
        ),
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((npp // 128, 2, s2, s2, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(scalars, jnp.reshape(lam_mult.astype(jnp.float32), (1, 1)), cv_pm,
      cands_pm, pm_lane, present_pm, rank_pm, oy_cell, ox_cell)


@functools.partial(
    jax.jit,
    static_argnames=(
        "side", "r", "cur", "full_h", "full_w", "m_tile", "n_tile", "interpret"
    ),
)
def windowed_color_step(
    scalars: jnp.ndarray,         # (5,) i32 [color, lci, lcj, row0_b, col0_b]
    lam_mult: jnp.ndarray,        # f32 scalar
    cv_colors: jnp.ndarray,       # (4, side^2, M2, N2) u16/i32
    cands: jnp.ndarray,           # (9, 2, M2, N2) i32
    pm_colors: jnp.ndarray,       # (4, 2, M2, N2) i32
    present_colors: jnp.ndarray,  # (4, 9, M2, N2) i32
    rank_colors: jnp.ndarray,     # (4, 9, M2, N2) i32
    side: int,
    r: int,
    cur: int,
    full_h: int,
    full_w: int,
    m_tile: int = 8,
    n_tile: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """(2, M2, N2) i32 winner MVs for the scalars-selected color slab.

    M2/N2 must be multiples of (m_tile, n_tile); padded blocks have
    present == 0 everywhere and produce garbage winners the caller slices
    off.
    """
    m2, n2 = cv_colors.shape[2:]
    grid = (m2 // m_tile, n2 // n_tile)
    lam_smem = jnp.reshape(lam_mult.astype(jnp.float32), (1, 1))

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j, sc: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, side * side, m_tile, n_tile),
                lambda i, j, sc: (sc[0], 0, i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((9, 2, m_tile, n_tile), lambda i, j, sc: (0, 0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, m_tile, n_tile),
                         lambda i, j, sc: (sc[0], 0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9, m_tile, n_tile),
                         lambda i, j, sc: (sc[0], 0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9, m_tile, n_tile),
                         lambda i, j, sc: (sc[0], 0, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (2, m_tile, n_tile), lambda i, j, sc: (0, i, j),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        functools.partial(
            _kernel, side=side, r=r, cur=cur, full_h=full_h, full_w=full_w
        ),
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((2, m2, n2), jnp.int32),
        interpret=interpret,
    )(scalars, lam_smem, cv_colors, cands, pm_colors, present_colors,
      rank_colors)


# -------------------------------------------------------------- compact CV
# K-slot compact-table variant of the pm color step (ops.compact): per
# chunk, only the K distinct deltas the level's rounds can ever evaluate are
# stored; a candidate's cost is picked by a K-way unrolled compare against
# the chunk's SMEM slot list, and a candidate matching no slot is excluded
# (the windowed family's exclusion semantics - exact whenever the slot list
# covered every distinct delta).


def _kernel_pm_compact(
    sc_ref,        # (4,) i32 prefetch: [color, ci, cj, row0_b]
    dv_ref,        # (nch*K*2,) i32 prefetch: FLAT CV-index slot deltas (a
                   # 2-D+ SMEM prefetch pads trailing dims to 128 lanes)
    lam_ref,       # (1, 1) f32 SMEM
    cv_ref,        # (rows, 1, 1, 1, K, s2, 128): color's compact table tile
    cands_ref,     # (1, 9, 2, rows, s2, 128) i32 (chunk-major)
    pm_ref,        # (1, 2, 128) i32 window-center MVs
    present_ref,   # (1, 1, 9, rows, s2, 128) i32
    rank_ref,      # (1, 1, 9, rows, s2, 128) i32
    oy_ref,        # (1, 1, rows, 1, 128) i32
    ox_ref,        # (1, 1, s2, 128) i32
    out_ref,       # (1, 2, rows, s2, 128) i32
    *,
    k_slots: int,
    r: int,
    cur: int,
    full_h: int,
    full_w: int,
):
    ch = pl.program_id(1)
    cands = cands_ref[0]
    cx, cy = cands[:, 0], cands[:, 1]
    pm = pm_ref[0]
    present = present_ref[0, 0]
    rank = rank_ref[0, 0]
    lam = lam_ref[0, 0]

    kdy = cy - pm[1][None, None, None] + r  # CV-index coords
    kdx = cx - pm[0][None, None, None] + r

    costs = jnp.zeros(cx.shape, jnp.int32)
    covered = jnp.zeros(cx.shape, bool)
    for k in range(k_slots):
        sdy = dv_ref[(ch * k_slots + k) * 2]
        sdx = dv_ref[(ch * k_slots + k) * 2 + 1]

        # the (sdy >= 0) guard keeps unused slots (-1) from matching a
        # far-out-of-window candidate whose CV index is also -1
        match = (kdy == sdy) & (kdx == sdx) & (sdy >= 0)
        v = cv_ref[:, 0, 0, 0, k].astype(jnp.int32)  # (rows, s2, 128)
        costs = jnp.where(match, v[None], costs)
        covered = covered | match

    tx = ox_ref[0, 0][None, None] + cx
    ty = oy_ref[0, 0][None] + cy
    in_img = (
        (tx >= 0) & (tx <= full_w - cur) & (ty >= 0) & (ty <= full_h - cur)
    )
    # incumbent-safety guard: if the cell's OWN current MV missed the slot
    # list (K overflow), adopting any covered neighbor would be a blind
    # update against an unevaluated incumbent - keep the incumbent instead
    # (all-invalid energies tie at FLT_MAX and rank 0 wins)
    covered = covered & covered[0][None]
    nx, ny = _finish_step(cx, cy, costs, present, rank, lam, covered, in_img)
    out_ref[0, 0] = nx
    out_ref[0, 1] = ny


@functools.partial(
    jax.jit,
    static_argnames=("k_slots", "r", "cur", "full_h", "full_w", "interpret"),
)
def windowed_color_step_pm_compact(
    scalars: jnp.ndarray,         # (4,) i32 [color, ci, cj, row0_b]
    dv: jnp.ndarray,              # (nch, K, 2) i32 slot deltas (flattened
                                  # before prefetch - see _kernel_pm_compact)
    lam_mult: jnp.ndarray,        # f32 scalar
    cv_pm: jnp.ndarray,           # (f//2, 2, 2, nch, K, s2, 128) compact table
    cands_pm: jnp.ndarray,        # (nch, 9, 2, s2, s2, 128) i32
    pm_lane: jnp.ndarray,         # (nch, 2, 128) i32
    present_pm: jnp.ndarray,      # (4, nch, 9, s2, s2, 128) i32
    rank_pm: jnp.ndarray,         # (4, nch, 9, s2, s2, 128) i32
    oy_cell: jnp.ndarray,         # (4, nch, s2, 1, 128) i32
    ox_cell: jnp.ndarray,         # (4, nch, s2, 128) i32
    k_slots: int,
    r: int,
    cur: int,
    full_h: int,
    full_w: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Compact-table ``windowed_color_step_pm`` (see the dense wrapper)."""
    s2, npp = cv_pm.shape[5], cv_pm.shape[3] * 128
    syq = cv_pm.shape[0]
    row_bytes = k_slots * s2 * 128 * cv_pm.dtype.itemsize
    rows = syq
    while rows > 1 and rows * row_bytes > 10 * 1024 * 1024:
        rows //= 2
    grid = (syq // rows, npp // 128)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda j, i, sc, dv: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((rows, 1, 1, 1, k_slots, s2, 128),
                         lambda j, i, sc, dv: (j, sc[1], sc[2], i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9, 2, rows, s2, 128),
                         lambda j, i, sc, dv: (i, 0, 0, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 128), lambda j, i, sc, dv: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 9, rows, s2, 128),
                         lambda j, i, sc, dv: (sc[0], i, 0, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 9, rows, s2, 128),
                         lambda j, i, sc, dv: (sc[0], i, 0, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rows, 1, 128),
                         lambda j, i, sc, dv: (sc[0], i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s2, 128), lambda j, i, sc, dv: (sc[0], i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 2, rows, s2, 128), lambda j, i, sc, dv: (i, 0, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        functools.partial(
            _kernel_pm_compact, k_slots=k_slots, r=r, cur=cur,
            full_h=full_h, full_w=full_w,
        ),
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((npp // 128, 2, s2, s2, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(scalars, dv.reshape(-1), jnp.reshape(lam_mult.astype(jnp.float32), (1, 1)),
      cv_pm, cands_pm, pm_lane, present_pm, rank_pm, oy_cell, ox_cell)


# --------------------------------------------------------------- rival mode
# Superset kernels for rival windows (ops.windowed module docstring): a
# candidate outside the primary window is looked up in a SECOND cost volume
# built around the parent's rival center.  Kept separate so the non-rival
# fast path is untouched.


def _kernel_rival(
    sc_ref, lam_ref, cv_ref, rcv_ref, cands_ref, pm_ref, rpm_ref,
    present_ref, rank_ref, out_ref,
    *,
    side: int, r: int, side2: int, r2: int, cur: int,
    full_h: int, full_w: int,
):
    mt, nt = out_ref.shape[1], out_ref.shape[2]
    ci = sc_ref[1]
    cj = sc_ref[2]
    row0_b = sc_ref[3]
    col0_b = sc_ref[4]
    i0 = pl.program_id(0) * mt
    j0 = pl.program_id(1) * nt

    cands = cands_ref[...].astype(jnp.int32)
    cx, cy = cands[:, 0], cands[:, 1]
    pm = pm_ref[0]
    rpm = rpm_ref[0]
    present = present_ref[0]
    rank = rank_ref[0]
    lam = lam_ref[0, 0]

    ddx = cx - pm[0][None]
    ddy = cy - pm[1][None]
    in_window = (ddx >= -r) & (ddx <= r) & (ddy >= -r) & (ddy <= r)
    key = jnp.where(in_window, (ddy + r) * side + (ddx + r), -1)
    rdx = cx - rpm[0][None]
    rdy = cy - rpm[1][None]
    in_rival = (rdx >= -r2) & (rdx <= r2) & (rdy >= -r2) & (rdy <= r2)
    # own window preferred where both cover (identical absolute pixels ->
    # identical cost); the rival key only fires for own-excluded candidates
    key_r = jnp.where(
        in_rival & ~in_window, (rdy + r2) * side2 + (rdx + r2), -1
    )

    def pick_row(dy, acc):
        strip = cv_ref[0, pl.ds(dy * side, side)]
        for dx in range(side):
            v = strip[dx].astype(jnp.int32)
            acc = jnp.where(key == dy * side + dx, v[None], acc)
        return acc

    costs = jax.lax.fori_loop(
        0, side, pick_row, jnp.zeros((9, mt, nt), jnp.int32)
    )

    def pick_row_r(dy, acc):
        strip = rcv_ref[0, pl.ds(dy * side2, side2)]
        for dx in range(side2):
            v = strip[dx].astype(jnp.int32)
            acc = jnp.where(key_r == dy * side2 + dx, v[None], acc)
        return acc

    costs = jax.lax.fori_loop(0, side2, pick_row_r, costs)

    ii = jax.lax.broadcasted_iota(jnp.int32, (mt, nt), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (mt, nt), 1)
    gi = row0_b + ci + 2 * (i0 + ii)
    gj = col0_b + cj + 2 * (j0 + jj)
    tx = (gj * cur)[None] + cx
    ty = (gi * cur)[None] + cy
    in_img = (
        (tx >= 0) & (tx <= full_w - cur) & (ty >= 0) & (ty <= full_h - cur)
    )
    nx, ny = _finish_step(
        cx, cy, costs, present, rank, lam, in_window | in_rival, in_img
    )
    out_ref[0] = nx
    out_ref[1] = ny


def _kernel_pm_rival(
    sc_ref, lam_ref, cv_ref, rcv_ref, cands_ref, pm_ref, rpm_ref,
    present_ref, rank_ref, oy_ref, ox_ref, out_ref, acc_ref,
    *,
    side: int, r: int, side2: int, r2: int, cur: int,
    full_h: int, full_w: int,
):
    rr, s2, nt = out_ref.shape[2], out_ref.shape[3], out_ref.shape[4]
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

    big = jnp.int32(1 << 20)
    bound_on = in_window & (present != 0)
    ymin = jnp.min(jnp.where(bound_on, ddy, big))
    ymax = jnp.max(jnp.where(bound_on, ddy, -big))
    xmin = jnp.min(jnp.where(bound_on, ddx, big))
    xmax = jnp.max(jnp.where(bound_on, ddx, -big))
    acc_ref[...] = jnp.zeros((9, rr, s2, nt), jnp.int32)

    def pick_row(dy, _):
        def pick_col(dx, __):
            s = (dy + r) * side + (dx + r)
            v = cv_ref[:, 0, 0, 0, dy + r, dx + r].astype(jnp.int32)
            acc_ref[...] = jnp.where(key == s, v[None], acc_ref[...])
            return 0

        jax.lax.fori_loop(xmin, xmax + 1, pick_col, 0)
        return 0

    jax.lax.fori_loop(ymin, ymax + 1, pick_row, 0)

    # rival pick: its own bbox; on smooth tiles no candidate is own-excluded
    # and the loops are empty (only the rival CV tile's DMA remains)
    bound_r = (key_r >= 0) & (present != 0)
    rymin = jnp.min(jnp.where(bound_r, rdy, big))
    rymax = jnp.max(jnp.where(bound_r, rdy, -big))
    rxmin = jnp.min(jnp.where(bound_r, rdx, big))
    rxmax = jnp.max(jnp.where(bound_r, rdx, -big))

    def pick_row_r(dy, _):
        def pick_col_r(dx, __):
            s = (dy + r2) * side2 + (dx + r2)
            v = rcv_ref[:, 0, 0, 0, dy + r2, dx + r2].astype(jnp.int32)
            acc_ref[...] = jnp.where(key_r == s, v[None], acc_ref[...])
            return 0

        jax.lax.fori_loop(rxmin, rxmax + 1, pick_col_r, 0)
        return 0

    jax.lax.fori_loop(rymin, rymax + 1, pick_row_r, 0)
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
        "side", "r", "side2", "r2", "cur", "full_h", "full_w", "interpret"
    ),
)
def windowed_color_step_pm_rival(
    scalars: jnp.ndarray,
    lam_mult: jnp.ndarray,
    cv_pm: jnp.ndarray,           # (f//2, 2, 2, nPp//128, side, side, s2, 128)
    rcv_pm: jnp.ndarray,          # (f//2, 2, 2, nPp//128, side2, side2, s2, 128)
    cands_pm: jnp.ndarray,
    pm_lane: jnp.ndarray,         # (nch, 2, 128) i32
    rpm_lane: jnp.ndarray,        # (nch, 2, 128) i32 rival centers
    present_pm: jnp.ndarray,
    rank_pm: jnp.ndarray,
    oy_cell: jnp.ndarray,
    ox_cell: jnp.ndarray,
    side: int,
    r: int,
    side2: int,
    r2: int,
    cur: int,
    full_h: int,
    full_w: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Rival-mode ``windowed_color_step_pm`` (see the non-rival wrapper)."""
    s2, npp = cv_pm.shape[6], cv_pm.shape[3] * 128
    syq = cv_pm.shape[0]
    cv_row_bytes = (
        side * side * s2 * 128 * cv_pm.dtype.itemsize
        + side2 * side2 * s2 * 128 * rcv_pm.dtype.itemsize
    )
    rows = syq
    while rows > 1 and rows * cv_row_bytes > 10 * 1024 * 1024:
        rows //= 2
    grid = (syq // rows, npp // 128)

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda j, i, sc: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((rows, 1, 1, 1, side, side, s2, 128),
                         lambda j, i, sc: (j, sc[1], sc[2], i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1, 1, 1, side2, side2, s2, 128),
                         lambda j, i, sc: (j, sc[1], sc[2], i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9, 2, rows, s2, 128),
                         lambda j, i, sc: (i, 0, 0, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 128), lambda j, i, sc: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 128), lambda j, i, sc: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 9, rows, s2, 128),
                         lambda j, i, sc: (sc[0], i, 0, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 9, rows, s2, 128),
                         lambda j, i, sc: (sc[0], i, 0, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, rows, 1, 128),
                         lambda j, i, sc: (sc[0], i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s2, 128), lambda j, i, sc: (sc[0], i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 2, rows, s2, 128), lambda j, i, sc: (i, 0, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((9, rows, s2, 128), jnp.int32)],
    )
    return pl.pallas_call(
        functools.partial(
            _kernel_pm_rival, side=side, r=r, side2=side2, r2=r2, cur=cur,
            full_h=full_h, full_w=full_w,
        ),
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((npp // 128, 2, s2, s2, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(scalars, jnp.reshape(lam_mult.astype(jnp.float32), (1, 1)), cv_pm,
      rcv_pm, cands_pm, pm_lane, rpm_lane, present_pm, rank_pm, oy_cell,
      ox_cell)


@functools.partial(
    jax.jit,
    static_argnames=(
        "side", "r", "side2", "r2", "cur", "full_h", "full_w",
        "m_tile", "n_tile", "interpret",
    ),
)
def windowed_color_step_rival(
    scalars: jnp.ndarray,         # (5,) i32 [color, lci, lcj, row0_b, col0_b]
    lam_mult: jnp.ndarray,
    cv_colors: jnp.ndarray,       # (4, side^2, M2, N2)
    rcv_colors: jnp.ndarray,      # (4, side2^2, M2, N2)
    cands: jnp.ndarray,
    pm_colors: jnp.ndarray,
    rpm_colors: jnp.ndarray,      # (4, 2, M2, N2) rival centers
    present_colors: jnp.ndarray,
    rank_colors: jnp.ndarray,
    side: int,
    r: int,
    side2: int,
    r2: int,
    cur: int,
    full_h: int,
    full_w: int,
    m_tile: int = 8,
    n_tile: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Rival-mode ``windowed_color_step`` (see the non-rival wrapper)."""
    m2, n2 = cv_colors.shape[2:]
    grid = (m2 // m_tile, n2 // n_tile)
    lam_smem = jnp.reshape(lam_mult.astype(jnp.float32), (1, 1))

    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j, sc: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, side * side, m_tile, n_tile),
                lambda i, j, sc: (sc[0], 0, i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, side2 * side2, m_tile, n_tile),
                lambda i, j, sc: (sc[0], 0, i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((9, 2, m_tile, n_tile), lambda i, j, sc: (0, 0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, m_tile, n_tile),
                         lambda i, j, sc: (sc[0], 0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, m_tile, n_tile),
                         lambda i, j, sc: (sc[0], 0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9, m_tile, n_tile),
                         lambda i, j, sc: (sc[0], 0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9, m_tile, n_tile),
                         lambda i, j, sc: (sc[0], 0, i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (2, m_tile, n_tile), lambda i, j, sc: (0, i, j),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        functools.partial(
            _kernel_rival, side=side, r=r, side2=side2, r2=r2, cur=cur,
            full_h=full_h, full_w=full_w,
        ),
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((2, m2, n2), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            # two full-delta CV tiles (own + rival), double-buffered, exceed
            # the 16M default scoped-vmem budget at cur == bs
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(scalars, lam_smem, cv_colors, rcv_colors, cands, pm_colors,
      rpm_colors, present_colors, rank_colors)

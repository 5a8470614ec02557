"""Window-reuse regularization schedule: the TPU-native production fast path.

The reference's regularizer fetches an arbitrary (bs, bs) block of frame 2
per candidate (``motion_framework.cpp:594-602``) - a fine-grained gather that
TPUs execute catastrophically slowly (measured ~15M gathered elements/s on
v5e, making one bs=2 sweep of a 1080p frame take seconds).  This module
restructures the whole per-level schedule around data the search already
touches:

  * after the level's block search, ONE (ss, ss) frame-2 window per ORIGINAL
    block is gathered, centered on the block's search MV (the same shape the
    search itself used);
  * every candidate displacement is expressed as a DELTA from the parent
    block's search MV; candidates with |delta| <= R (default: the spiral
    extent S) read their cost from a per-round cost volume
    ``CV[delta, block]`` computed entirely with UNIFORM window slices (a
    lax.scan over the (2R+1)^2 deltas - pure VPU work, no gathers);
  * per color step, each block's 9 candidate costs are selected from CV with
    two 1-hot masked reductions (rows then cols of the delta square) - again
    no gathers - and the winner is the same lexicographic (energy, rank)
    minimum as the exact path.

Deviation from the reference (documented, EPE-validated in tests): a
candidate whose delta exceeds R is excluded (energy FLT_MAX) instead of
evaluated.  Since every update adopts an evaluated candidate, all MVs stay
within parent-MV +- R, so the window always covers every evaluated target.
When no candidate exceeds R the result is bit-identical to ``fourcolor``.

Rival windows (``rival_window=True``): the exclusion bites at motion
discontinuities, where a neighbor's (correct) MV differs from the parent's
window center by more than R and can never be adopted (measured as the
windowed-vs-fourcolor EPE gap on Urban2/Urban3).  Each parent then gathers a
SECOND window centered on its most-different 8-neighbor search MV (the local
"rival" motion mode), and a candidate is evaluable if it lands in either
window; costs agree wherever the windows overlap because both read the same
absolute frame-2 pixels.  At a two-motion discontinuity both modes are
addressable on every parent along it, so adoption waves propagate exactly as
in ``fourcolor``; junctions of 3+ motions degrade to the single-window
behavior.  The adopted-MV invariant becomes: MV in (base +- R) U (rival +- R).
"""

from __future__ import annotations

import os as _os
import jax
import jax.numpy as jnp
import numpy as np

from blockbasedmotionestimation_tpu.ops import regularize as reg
from blockbasedmotionestimation_tpu.ops.search import _gather_windows
from blockbasedmotionestimation_tpu.ops.search import resolve_impl as _resolve_impl
from blockbasedmotionestimation_tpu.ops.spiral import spiral_extent, spiral_offsets

_F32_MAX = np.float32(np.finfo(np.float32).max)
_I32_MAX = np.int32(np.iinfo(np.int32).max)


def _cv_dtype(cur: int, cost: str):
    """Smallest dtype holding a worst-case block cost at sub-block size cur."""
    if cost == "zsad":
        return jnp.float32  # mean-subtracted costs are float-valued
    peak = (255 * 255 if cost == "ssd" else 255) * cur * cur
    return jnp.uint16 if peak < (1 << 16) else jnp.int32


def _pick_rival(
    vals: jnp.ndarray,
    base: jnp.ndarray,
    r: int,
    radius: int = 1,
    row_extend=None,
) -> jnp.ndarray:
    """Each parent's rival window center: the local foreign motion mode.

    vals: (npy, npx, 2) i32 integer search-winner MVs (the values neighbors
    will offer as candidates); base: (npy, npx, 2) i32 window-center MVs the
    primary in-window test rebases against.  Picks, per parent, the neighbor
    winner that COVERS the most neighbors excluded by the primary window
    (excluded: Linf(val_k - base) > r; covered: Linf(val_k - val_j) <= r) -
    i.e. the alternative center rescuing the most otherwise-unevaluable
    candidates.  A plain most-different pick fails when two wrong values
    straddle the base: it picks the wronger one and the true mode stays
    excluded.  Parents with no excluded neighbors keep base (a no-op rival).
    Ties resolve to the first neighbor in raster order.

    row_extend: optional hook adding ``radius`` parent rows of winners above
    and below (the tiled engine's cross-tile exchange, edge-replicated at
    global frame boundaries); default is plain edge replication.
    """
    npy, npx = vals.shape[:2]
    offs = [
        (dy, dx)
        for dy in range(-radius, radius + 1)
        for dx in range(-radius, radius + 1)
        if (dy, dx) != (0, 0)
    ]
    if row_extend is None:
        vp = jnp.pad(
            vals, ((radius, radius), (radius, radius), (0, 0)), mode="edge"
        )
    else:
        # tiled hook: must return vals extended by `radius` on BOTH axes
        # (neighbor-tile winners on tiled axes, edge replication at frame
        # boundaries and untiled axes)
        vp = row_extend(vals)
    neigh = jnp.stack(
        [
            vp[radius + dy : radius + dy + npy, radius + dx : radius + dx + npx]
            for dy, dx in offs
        ]
    )  # (K, npy, npx, 2)
    excl = jnp.abs(neigh - base[None]).max(axis=-1) > r  # (K, npy, npx)
    d = jnp.abs(neigh[:, None] - neigh[None, :]).max(axis=-1)  # (k, j, npy, npx)
    score = ((d <= r) & excl[:, None]).sum(axis=0)  # (j, npy, npx)
    j = jnp.argmax(score, axis=0)
    rival = jnp.take_along_axis(neigh, j[None, ..., None], axis=0)[0]
    return jnp.where((jnp.max(score, axis=0) > 0)[..., None], rival, base)


def _compute_cv(
    patches1: jnp.ndarray,  # (nPy, nPx, bs, bs) i16 frame-1 parent blocks
    windows: jnp.ndarray,   # (nPy, nPx, ss, ss) i16 frame-2 windows
    bs: int,
    cur: int,
    ext: int,
    r: int,
    cost: str,
) -> jnp.ndarray:
    """(side^2, nby, nbx) cost volume over deltas in [-R, R]^2 at size cur."""
    npy, npx = patches1.shape[:2]
    np_tot = npy * npx
    f = bs // cur
    side = 2 * r + 1
    dt = _cv_dtype(cur, cost)

    # lane-major layout: parent blocks on the 128-wide lane dim, one scan
    # step per delta ROW with columns unrolled at static offsets
    wside = windows.shape[3]
    patches_t = patches1.reshape(np_tot, bs, bs).transpose(1, 2, 0)  # (bs, bs, nP)
    windows_t = windows.reshape(np_tot, wside, wside).transpose(1, 2, 0)

    def step(_, off):
        dy, dx = off
        w = jax.lax.dynamic_slice(
            windows_t, (ext + dy - r, ext + dx - r, 0), (bs, bs, np_tot)
        )
        d = patches_t - w
        if cost == "zsad":
            # zero-mean SAD per (cur, cur) sub-block: subtract the block-mean
            # difference before the L1 sum (robust to gain/offset nuisance;
            # see ops.search.block_cost)
            dr = d.astype(jnp.float32).reshape(f, cur, f, cur, np_tot)
            m = jnp.mean(dr, axis=(1, 3), keepdims=True)
            return None, jnp.abs(dr - m).sum(axis=(1, 3)).astype(dt)
        if cost == "sad":
            dmap = jnp.abs(d).astype(jnp.int32)
        else:
            d32 = d.astype(jnp.int32)
            dmap = d32 * d32
        cvr = dmap.reshape(f, cur, f, cur, np_tot).sum(axis=(1, 3))
        return None, cvr.astype(dt)  # (f, f, nP)

    dys = jnp.repeat(jnp.arange(side, dtype=jnp.int32), side)
    dxs = jnp.tile(jnp.arange(side, dtype=jnp.int32), side)
    _, cv = jax.lax.scan(step, None, (dys, dxs))
    # (side^2, f(sub-row), f(sub-col), nP) -> (side^2, nby, nbx)
    cv = cv.reshape(side * side, f, f, npy, npx)
    cv = cv.transpose(0, 3, 1, 4, 2).reshape(side * side, npy * f, npx * f)
    return cv


def _select_costs(
    cv_slab: jnp.ndarray,   # (side^2, m, n) current round's CV, color slab
    ddy: jnp.ndarray,       # (m, n, 9) candidate delta rows, in [-R, R] when valid
    ddx: jnp.ndarray,       # (m, n, 9) candidate delta cols
    r: int,
) -> jnp.ndarray:
    """(m, n, 9) f32 costs via 1-hot masked reductions (no gathers).

    A scan over delta ROWS with an unrolled column pick inside keeps the
    working set at one (9, m, n) accumulator (a wide two-stage formulation
    materialized (9, side, m, n) intermediates ~30x per step and was
    memory-bound on TPU).
    """
    side = 2 * r + 1
    m, n = cv_slab.shape[1:]
    dy_key = jnp.clip(ddy + r, 0, side - 1).transpose(2, 0, 1)  # (9, m, n)
    dx_key = jnp.clip(ddx + r, 0, side - 1).transpose(2, 0, 1)

    def step(acc, dyi):
        rows = jax.lax.dynamic_slice(
            cv_slab, (dyi * side, 0, 0), (side, m, n)
        ).astype(jnp.float32)
        inner = jnp.zeros((9, m, n), dtype=jnp.float32)
        for dxi in range(side):
            inner = inner + jnp.where(dx_key == dxi, rows[dxi][None], 0.0)
        acc = acc + jnp.where(dy_key == dyi, inner, 0.0)
        return acc, None

    sad, _ = jax.lax.scan(
        step,
        jnp.zeros((9, m, n), dtype=jnp.float32),
        jnp.arange(side, dtype=jnp.int32),
    )
    return sad.transpose(1, 2, 0)  # (m, n, 9)


def _all_round_cvs_pallas(
    patches1: jnp.ndarray,  # (nPy, nPx, bs, bs) i16
    windows: jnp.ndarray,   # (nPy, nPx, win, win) i16
    bs: int,
    ext: int,
    r: int,
    cost: str,
    interpret: bool,
    emit_o2: bool = True,
    store_r2: int | None = None,
) -> dict[int, jnp.ndarray]:
    """All subdivision sizes' cost volumes from one Pallas pass.

    Returns ``delta_pooled_cvs``'s dict: cur <= bs/2 in the X-parity
    de-interleaved CHUNK-MAJOR (f//2, 2, 2, nPad//128, side, side, f//2,
    128)
    layout consumed directly by the color-step kernel's index_map;
    cur == bs unsplit.  The raw (bs, bs) diff maps never touch HBM.
    """
    from blockbasedmotionestimation_tpu.kernels.cv_diff import delta_pooled_cvs

    n_p = patches1.shape[0] * patches1.shape[1]
    wside = windows.shape[3]
    patches_t = patches1.reshape(n_p, bs, bs).transpose(1, 2, 0)
    windows_t = windows.reshape(n_p, wside, wside).transpose(1, 2, 0)
    return delta_pooled_cvs(
        patches_t, windows_t, bs, ext, r, cost, interpret=interpret,
        emit_o2=emit_o2, store_r2=store_r2,
    )


_COLORS = ((0, 0), (0, 1), (1, 0), (1, 1))


def _pallas_round_pm(
    grid: jnp.ndarray,        # (nby, nbx, 2) f32 MV grid, nby/nbx even
    cvq: jnp.ndarray,         # (f//2, 2, 2, nch, side, side, f//2, 128) CV
    parent_mv: jnp.ndarray,   # (npy, npx, 2) i32 parent search MVs
    *,
    bs: int,
    cur: int,
    side: int,
    r: int,
    h: int,
    w: int,
    row0_b: jnp.ndarray,
    lam: float,
    sweeps_per_round: int,
    make_gp,
    interp: bool,
    rcvq: jnp.ndarray | None = None,  # rival CV, same layout at side2
    rbase: jnp.ndarray | None = None,  # (npy, npx, 2) i32 rival centers
    r2: int = 0,
    dv_slots: jnp.ndarray | None = None,  # compact mode: (nch, K, 2) slots
    k_slots: int = 0,
    fused_in: dict | None = None,  # chunk-fused mode: VMEM slab inputs
    cell_exchange=None,  # row-tiled: (top_edge, bot_edge) -> ghost rows
    cell_exchange_2d=None,  # 2-D tiled: rows + corner-extended columns
    col0_b: jnp.ndarray | int = 0,  # global block-col offset in cur units
) -> jnp.ndarray:
    """Sub-divided rounds (f >= 2) in PARENT-MAJOR cell layout.

    The cost volume never leaves the pooled kernel's native layout (cells of
    a parent on sub-axes, parents on the minor lane axis); color planes are
    cheap strided slices with the lane dim untouched.  Only the per-step
    candidate tensor (a few MB) is transposed between the grid layout and
    the cell layout.

    Row-tiled strips (``cell_exchange`` set) run this same round per tile:
    neighbor-tile MVs enter ONLY through the per-step candidate rows - the
    closure ppermutes the boundary cell rows (my first real cell row north,
    my last south) and the received ghost rows overwrite the lane-roll
    wrap artifacts of ``shift_y`` at the tile's first/last parent row.  No
    chunk-major operand (CV, slabs, masks) ever re-lays out for ghosts,
    and the exchange runs before every color step, preserving the
    Gauss-Seidel visibility order across tiles - so tiled == untiled stays
    bit-exact (the tiled equality tests cover this path with and without
    ``fused_in``).  Frame-boundary devices receive zero rows; every
    position that could read them is masked by the global-coordinate
    presence masks, exactly like the untiled rolls' wrap artifacts.

    2-D (ty x tx) tiles (``cell_exchange_2d`` set) additionally exchange
    one ghost cell COLUMN per side and per color step: the closure first
    ppermutes the boundary cell rows over the row axis, then ppermutes
    the tiles' edge cell columns EXTENDED with the received ghost rows'
    corner cells over the column axis, so the returned west/east ghost
    columns span global rows [-1, f*npy] and carry the diagonal
    neighbors' corners.  ``_colshift``'s lane-roll wrap at the tile's
    first/last parent column is then overwritten from those ghost
    columns (indexed at the candidate's global row, so row-shifted
    candidates pick the corner cells automatically) - the column
    analogue of the ghost-row patch, preserving cross-tile Gauss-Seidel
    visibility on both axes.  This is what lets the capacity modes
    (``cv_fused`` / ``cv_store_radius``) compose with column tiling -
    the reference's own parallel split is by columns
    (``parallel.h:20-58``) and its memory model has no such cliff
    (``motion_framework.cpp:4-111``).
    """
    from blockbasedmotionestimation_tpu.kernels.fused_step import (
        windowed_color_step_pm_fused,
        windowed_color_step_pm_fused_rival,
        windowed_color_step_pm_hybrid,
        windowed_color_step_pm_hybrid_tail,
    )
    from blockbasedmotionestimation_tpu.kernels.reg_step import (
        windowed_color_step_pm,
        windowed_color_step_pm_compact,
        windowed_color_step_pm_rival,
    )

    f = bs // cur
    s2 = f // 2
    npy, npx = parent_mv.shape[:2]
    n_p = npy * npx
    npp = -(-n_p // 128) * 128
    nby, nbx = grid.shape[:2]
    m2, n2 = nby // 2, nbx // 2
    nby_total = h // cur
    nbx_total = w // cur  # == nbx unless column-tiled (cell_exchange_2d)
    col0_b = jnp.asarray(col0_b, dtype=jnp.int32)

    def padp(x, fill=0):
        pads = [(0, 0)] * (x.ndim - 1) + [(0, npp - n_p)]
        return jnp.pad(x, pads, constant_values=fill)

    def chunk_major(x, pos):
        """(..., npp) -> lane chunks moved to dim ``pos``: the color-step
        kernels consume every operand chunk-major so a grid step's block is
        ONE contiguous HBM run (lane-minor slices at 128*i are a spray of
        512-byte strided transfers whose descriptor overhead dominated the
        whole step kernel).  Minor dim stays 128, so XLA runs this
        transpose near copy speed."""
        nch = x.shape[-1] // 128
        y = x.reshape(*x.shape[:-1], nch, 128)
        return jnp.moveaxis(y, -2, pos)

    rank_table = jnp.asarray(reg._RANK_TABLE)
    cv_in = cvq  # chunk-major layout consumed as-is by the kernel index_map
    present_pm, rank_pm, oy_cell, ox_cell = [], [], [], []
    syy = jnp.arange(s2, dtype=jnp.int32)
    sxx = jnp.arange(s2, dtype=jnp.int32)
    pyy = jnp.arange(npy, dtype=jnp.int32)
    pxx = jnp.arange(npx, dtype=jnp.int32)
    for ci_, cj_ in _COLORS:
        gi_sp = row0_b + 2 * syy[:, None] + ci_ + f * pyy[None, :]  # (s2, npy)
        jj_sp = col0_b + 2 * sxx[:, None] + cj_ + f * pxx[None, :]  # (s2, npx)
        gi4 = gi_sp[:, None, :, None]
        jj4 = jj_sp[None, :, None, :]
        case = reg._border_case(gi4, jj4, nby_total, nbx_total)
        rank = jnp.moveaxis(rank_table[case], -1, 0)       # (9, s2, s2, npy, npx)
        present = rank < reg._BIG_RANK
        for k, (dy, dx) in enumerate(reg.SLOTS):
            ok = (
                (gi4 + dy >= 0) & (gi4 + dy < nby_total)
                & (jj4 + dx >= 0) & (jj4 + dx < nbx_total)
            )
            present = present.at[k].set(present[k] & ok)
        present_pm.append(padp(present.reshape(9, s2, s2, n_p).astype(jnp.int32)))
        rank_pm.append(padp(rank.reshape(9, s2, s2, n_p)))
        oy = jnp.broadcast_to(
            (cur * gi_sp)[:, :, None], (s2, npy, npx)
        ).reshape(s2, n_p)
        ox = jnp.broadcast_to(
            (cur * jj_sp)[:, None, :], (s2, npy, npx)
        ).reshape(s2, n_p)
        oy_cell.append(padp(oy[:, None]))  # (s2, 1, nP): singleton keeps the
        # block's last-two dims (1, 128)-legal for Mosaic
        ox_cell.append(padp(ox))
    present_pm = chunk_major(jnp.stack(present_pm), 1)
    rank_pm = chunk_major(jnp.stack(rank_pm), 1)
    oy_cell = chunk_major(jnp.stack(oy_cell), 1)
    ox_cell = chunk_major(jnp.stack(ox_cell), 1)
    pm_lane = chunk_major(
        padp(parent_mv.transpose(2, 0, 1).reshape(2, n_p).astype(jnp.int32)), 0
    )
    # hybrid = dense main CV + slab-recomputed rival (no "wslab" entry);
    # fused_rival = both windows recomputed from slabs
    hybrid_rival = fused_in is not None and "wslab" not in fused_in
    fused_rival = (
        fused_in is not None and not hybrid_rival and "rwslab" in fused_in
    )
    if rcvq is not None or fused_rival or hybrid_rival:
        rpm_lane = chunk_major(
            padp(rbase.transpose(2, 0, 1).reshape(2, n_p).astype(jnp.int32)), 0
        )

    lam_sweeps = jnp.asarray(
        [lam * (sweep + 1) for sweep in range(sweeps_per_round)],
        dtype=jnp.float32,
    )

    # The whole round runs on FOUR COLOR PLANES, each already in the
    # chunk-major layout the color-step kernels consume and produce:
    # planes[(rc, cc)] = cells at rows rc::2, cols cc::2 as
    # (nch, 2, s2, s2, 128).  Neighbor candidates become plane picks plus
    # small row/column boundary concats with chunk-dim rolls standing in
    # for flattened-lane rolls, so a color step materializes ONLY the
    # stacked candidate tensor — no per-step chunk-major transpose, no
    # padding pass, and the winner write-back is a plain plane
    # replacement instead of a dynamic-update-slice copy of the whole
    # cell grid (these were the dominant share of the ~5.7 ms/field
    # xla_glue term in FLOOR.md).  Out-of-frame / pad-lane wrap
    # artifacts from the rolls are masked by the per-color presence
    # masks, which use global coordinates.
    nch = npp // 128
    gcell = (
        grid.reshape(npy, f, npx, f, 2)
        .transpose(4, 1, 3, 0, 2)
        .reshape(2, f, f, n_p)
        .astype(jnp.int32)
    )
    # reshape-then-index, NOT [rc::2, cc::2]: XLA:TPU miscompiles large
    # double-strided 4-byte slices (DESIGN.md section 8a), and vmap
    # batches this op across the frame batch
    gcell6 = gcell.reshape(2, s2, 2, s2, 2, n_p)
    planes = {
        (rc, cc): chunk_major(padp(gcell6[:, :, rc, :, cc, :]), 0)
        for rc in (0, 1)
        for cc in (0, 1)
    }

    def lane_roll_cm(x, s):
        """roll of the flattened (padded) lane axis of a chunk-major
        tensor by s: a chunk-dim roll plus a static two-piece lane concat
        (minor dim stays 128 throughout)."""
        s = s % npp
        q, t = divmod(s, 128)
        y = jnp.roll(x, q, axis=0) if q else x
        if t:
            yl = jnp.roll(y, 1, axis=0)
            y = jnp.concatenate([yl[..., 128 - t :], y[..., : 128 - t]], axis=-1)
        return y

    def _cm_to_flat(x):
        # (nch, ..., 128) -> (..., npp); minor dim unchanged (copy-speed)
        return jnp.moveaxis(x, 0, -2).reshape(*x.shape[1:-1], npp)

    def _flat_to_cm(x):
        y = x.reshape(*x.shape[:-1], nch, 128)
        return jnp.moveaxis(y, -2, 0)

    def _vsplit(v):
        # cell shift v in {-1, 0, 1, 2} -> (plane color, plane-row shift)
        return v % 2, (-1 if v == -1 else (1 if v == 2 else 0))

    # The scan runs over SWEEPS with the 4 color steps statically unrolled:
    # with ci/cj as Python constants the plane picks below are plain
    # static slices (no lax.switch per candidate: the conds alone measured
    # ~2 ms/field).
    def _rowshift(p, rsh, ghost=None):
        # rows r' = r + rsh of a plane; crossing a parent boundary is a
        # flattened-lane roll by -+npx.  ghost (2, s2, npx): the
        # neighbor-tile boundary cell row overwriting the roll's wrap at
        # the tile's first/last parent row (row-tiled mode).
        if rsh == 0:
            return p
        if rsh == -1:
            row = lane_roll_cm(p[:, :, s2 - 1 : s2], npx)
        else:
            row = lane_roll_cm(p[:, :, 0:1], -npx)
        if ghost is not None:
            rf = _cm_to_flat(row)  # (2, 1, s2, npp)
            at = 0 if rsh == -1 else n_p - npx
            rf = jax.lax.dynamic_update_slice(rf, ghost[:, None], (0, 0, 0, at))
            row = _flat_to_cm(rf)
        if rsh == -1:
            return jnp.concatenate([row, p[:, :, : s2 - 1]], axis=2)
        return jnp.concatenate([p[:, :, 1:], row], axis=2)

    def _colshift(p, csh):
        # cols c' = c + csh; parent crossing is a flattened-lane roll +-1
        if csh == 0:
            return p
        if csh == -1:
            col = lane_roll_cm(p[:, :, :, s2 - 1 : s2], 1)
            return jnp.concatenate([col, p[:, :, :, : s2 - 1]], axis=3)
        col = lane_roll_cm(p[:, :, :, 0:1], -1)
        return jnp.concatenate([p[:, :, :, 1:], col], axis=3)

    def _edge_row(pl, rc, sy, lo, hi):
        # one global cell row (2, f, hi-lo) re-interleaved from the two
        # column-color planes at plane row sy, flat lanes [lo, hi)
        es = [
            _cm_to_flat(pl[(rc, cc)][:, :, sy])[..., lo:hi] for cc in (0, 1)
        ]
        return jnp.stack(es, axis=2).reshape(2, f, hi - lo)

    def _edge_col(pl, cc, sx, lane_col):
        # one global cell column (2, f*npy): plane column sx of column-color
        # cc at parent column lane_col, the two row-color planes
        # re-interleaved (global row in tile = f*parent_row + 2*plane_row
        # + rc)
        es = []
        for rc in (0, 1):
            e = _cm_to_flat(pl[(rc, cc)][:, :, :, sx])  # (2, s2, npp)
            es.append(
                e[..., :n_p].reshape(2, s2, npy, npx)[..., lane_col]
            )
        st = jnp.stack(es, axis=-1)  # (2, s2, npy, rc)
        return st.transpose(0, 2, 1, 3).reshape(2, f * npy)

    def sweep_body(pl, lam_mult):
        for ci, cj in _COLORS:
            from_north = from_south = None
            west_ext = east_ext = None
            if cell_exchange_2d is not None:
                # 2-D tiles: ghost rows over the row axis, then ghost
                # columns (extended with the ghost rows' corner cells)
                # over the column axis - before EVERY color step, so
                # cross-tile Gauss-Seidel visibility holds on both axes
                top_edge = _edge_row(pl, 0, 0, 0, npx)           # (2, f, npx)
                bot_edge = _edge_row(pl, 1, s2 - 1, n_p - npx, n_p)
                west_col = _edge_col(pl, 0, 0, 0)                # (2, f*npy)
                east_col = _edge_col(pl, 1, s2 - 1, npx - 1)
                from_north, from_south, west_ext, east_ext = cell_exchange_2d(
                    top_edge, bot_edge, west_col, east_col
                )
            elif cell_exchange is not None:
                # refresh the cross-tile ghost rows BEFORE this color step:
                # send my first real cell row north / last south, receive
                # the neighbors' boundary rows
                top_edge = _edge_row(pl, 0, 0, 0, npx)           # (2, f, npx)
                bot_edge = _edge_row(pl, 1, s2 - 1, n_p - npx, n_p)
                from_north, from_south = cell_exchange(top_edge, bot_edge)
            ys = {}
            for t in (ci - 1, ci, ci + 1):
                rc, rsh = _vsplit(t)
                # t == -1 reads the parent-above's cell row f-1, t == 2 the
                # parent-below's row 0: in row-tiled mode the received
                # ghost row overwrites the roll's wrap there
                ghost = from_north if t == -1 else (
                    from_south if t == 2 else None
                )
                ys[t] = tuple(
                    _rowshift(
                        pl[(rc, cc)], rsh,
                        None if ghost is None else ghost[:, cc::2, :],
                    )
                    for cc in (0, 1)
                )
            def _colpatch(p, psh, dy):
                # overwrite _colshift's lane-roll wrap at the tile's
                # west/east parent column with the neighbor tile's ghost
                # cell column, indexed at the candidate's global row
                # (ci + dy + cell row), so row-crossing candidates read
                # the diagonal corners the extended columns carry
                ext_c = west_ext if psh == -1 else east_ext  # (2, f*npy+2)
                colx = 0 if psh == -1 else s2 - 1
                lanec = 0 if psh == -1 else npx - 1
                idx = (
                    2 * np.arange(s2)[:, None] + ci + dy + 1
                    + f * np.arange(npy)[None, :]
                )  # (s2, npy) static
                patch = ext_c[:, jnp.asarray(idx)]  # (2, s2, npy)
                colsl = p[:, :, :, colx : colx + 1, :]
                flat = _cm_to_flat(colsl)  # (2, s2, 1, npp)
                body = flat[..., :n_p].reshape(2, s2, 1, npy, npx)
                body = body.at[..., lanec].set(patch[:, :, None])
                flat = jnp.concatenate(
                    [body.reshape(2, s2, 1, n_p), flat[..., n_p:]], axis=-1
                )
                colsl = _flat_to_cm(flat)
                if colx == 0:
                    return jnp.concatenate([colsl, p[:, :, :, 1:, :]], axis=3)
                return jnp.concatenate(
                    [p[:, :, :, : s2 - 1, :], colsl], axis=3
                )

            def _cand(dy, dx):
                pcc, psh = _vsplit(cj + dx)
                out = _colshift(ys[ci + dy][pcc], psh)
                if west_ext is not None and psh != 0:
                    out = _colpatch(out, psh, dy)
                return out

            cands = jnp.stack(
                [_cand(dy, dx) for dy, dx in reg.SLOTS],
                axis=1,
            )  # (nch, 9, 2, s2, s2, 128) — the kernels' native layout
            sc = jnp.stack(
                [
                    jnp.asarray(2 * ci + cj, jnp.int32),
                    jnp.asarray(ci, jnp.int32),
                    jnp.asarray(cj, jnp.int32),
                    jnp.asarray(row0_b, jnp.int32),
                ]
            )
            if fused_in is not None:
                if hybrid_rival and cur == 2 and "wslab_tail" in fused_in:
                    # r_store round: the cur=2 volume holds only
                    # |delta| <= store_r; the tail recomputes from the
                    # main slab (kernels/fused_step._kernel_pm_hybrid_tail)
                    new_mv = windowed_color_step_pm_hybrid_tail(
                        sc, lam_mult, cv_in, fused_in["patches_pl"],
                        fused_in["wslab_tail"], fused_in["rwslab"], cands,
                        pm_lane, rpm_lane, present_pm, rank_pm, oy_cell,
                        ox_cell, fused_in["store_r"], r, bs,
                        fused_in["ext"], r2, cur, fused_in["cost"], h, w,
                        interpret=interp,
                    )
                elif hybrid_rival:
                    new_mv = windowed_color_step_pm_hybrid(
                        sc, lam_mult, cv_in, fused_in["patches_pl"],
                        fused_in["rwslab"], cands, pm_lane, rpm_lane,
                        present_pm, rank_pm, oy_cell, ox_cell, side, r, bs,
                        r2, cur, fused_in["cost"], h, w, interpret=interp,
                    )
                elif fused_rival:
                    new_mv = windowed_color_step_pm_fused_rival(
                        sc, lam_mult, fused_in["patches_pl"],
                        fused_in["wslab"], fused_in["rwslab"], cands,
                        pm_lane, rpm_lane, present_pm, rank_pm, oy_cell,
                        ox_cell, bs, fused_in["ext"], r, r2, cur,
                        fused_in["cost"], h, w, interpret=interp,
                    )
                else:
                    new_mv = windowed_color_step_pm_fused(
                        sc, lam_mult, fused_in["patches_pl"],
                        fused_in["wslab"], cands, pm_lane, present_pm,
                        rank_pm, oy_cell, ox_cell, bs, fused_in["ext"], r,
                        cur, fused_in["cost"], h, w, interpret=interp,
                    )
            elif dv_slots is not None:
                new_mv = windowed_color_step_pm_compact(
                    sc, dv_slots, lam_mult, cv_in, cands, pm_lane,
                    present_pm, rank_pm, oy_cell, ox_cell,
                    k_slots, r, cur, h, w, interpret=interp,
                )
            elif rcvq is not None:
                new_mv = windowed_color_step_pm_rival(
                    sc, lam_mult, cv_in, rcvq, cands, pm_lane, rpm_lane,
                    present_pm, rank_pm, oy_cell, ox_cell,
                    side, r, 2 * r2 + 1, r2, cur, h, w, interpret=interp,
                )
            else:
                new_mv = windowed_color_step_pm(
                    sc, lam_mult, cv_in, cands, pm_lane, present_pm, rank_pm,
                    oy_cell, ox_cell, side, r, cur, h, w, interpret=interp,
                )
            # the kernel's output IS the updated plane — no write-back copy
            pl = dict(pl)
            pl[(ci, cj)] = new_mv
        return pl, None

    planes, _ = jax.lax.scan(sweep_body, planes, lam_sweeps)
    pf = {k: _cm_to_flat(v)[..., :n_p] for k, v in planes.items()}
    g6 = jnp.stack(
        [jnp.stack([pf[(rc, 0)], pf[(rc, 1)]], axis=0) for rc in (0, 1)],
        axis=0,
    )  # (rc, cc, 2, s2, s2, nP)
    return (
        g6.transpose(2, 3, 0, 4, 1, 5)
        .reshape(2, f, f, npy, npx)
        .transpose(3, 1, 4, 2, 0)
        .reshape(nby, nbx, 2)
        .astype(jnp.float32)
    )


def _pallas_round(
    grid: jnp.ndarray,        # (nby, nbx, 2) f32 MV grid at this round
    cvq: jnp.ndarray,         # (side^2, f, f, nP) pooled CV for this round
    parent_mv: jnp.ndarray,   # (npy, npx, 2) i32 parent search MVs
    *,
    bs: int,
    cur: int,
    side: int,
    r: int,
    h: int,
    w: int,
    row0_b: jnp.ndarray,      # global block-row offset in cur units
    lam: float,
    sweeps_per_round: int,
    make_gp,
    interp: bool,
    rcvq: jnp.ndarray | None = None,
    rbase: jnp.ndarray | None = None,
    r2: int = 0,
    col0_b: jnp.ndarray | int = 0,
) -> jnp.ndarray:
    """One subdivision round's sweep x color steps via the fused Pallas
    color-step kernel (``kernels.reg_step``).

    Per-color constants (CV color planes, parent MVs, presence masks, case
    ranks) are computed ONCE per round; each scan step only gathers the
    current candidate MVs and runs the kernel, which picks candidate costs
    and the lexicographic winner on VMEM tiles.
    """
    from blockbasedmotionestimation_tpu.kernels.reg_step import (
        windowed_color_step,
        windowed_color_step_rival,
    )

    f = bs // cur
    npy, npx = parent_mv.shape[:2]
    nby, nbx = grid.shape[:2]
    nby_total = h // cur
    nbx_total = w // cur
    col0_b = jnp.asarray(col0_b, dtype=jnp.int32)

    pad_r, pad_c = nby % 2, nbx % 2
    if pad_r or pad_c:  # only possible at f == 1 (odd parent grid)
        grid = jnp.pad(grid, ((0, pad_r), (0, pad_c), (0, 0)))
        base_gp = make_gp

        def make_gp(g):
            # halo exchange must see only REAL rows (a phantom last row
            # would be ppermute'd to the south neighbor in tiled mode)
            gp0 = base_gp(g[:nby, :nbx])
            return jnp.pad(gp0, ((0, pad_r), (0, pad_c), (0, 0)))

    nby2, nbx2 = grid.shape[:2]
    m2, n2 = nby2 // 2, nbx2 // 2
    m2p = -(-m2 // 8) * 8
    n2p = -(-n2 // 128) * 128

    def pad2(x, fill=0):
        pads = [(0, 0)] * (x.ndim - 2) + [(0, m2p - m2), (0, n2p - n2)]
        return jnp.pad(x, pads, constant_values=fill)

    rank_table = jnp.asarray(reg._RANK_TABLE)

    def cv_to_colors(vol, sd):
        """Chunk-major pooled CV -> (4, sd^2, m2p, n2p) color slabs.

        Color planes are taken by reshape-then-index, NOT double-strided
        slices: XLA:TPU miscompiles a [:, i::2, j::2] slice of a large
        int32 array into a device kernel fault (reproduced standalone on
        a bare (1089, 136, 184) i32 slice - the >=4K-frame f==1 round's
        search volume; u16, single-stride, and this reshape/index form
        all lower correctly.  See DESIGN.md section 8a).
        """
        if f >= 2:
            # pooled CVs arrive parity-de-interleaved and chunk-major
            # (f//2, 2, 2, nch, sd, sd, f//2, 128); restore the plain
            # (sd, sd, sy, sx, nP) order for the slab path
            n_pad = vol.shape[3] * 128
            vol = (
                vol.transpose(4, 5, 0, 1, 6, 2, 3, 7)
                .reshape(sd, sd, f, f, n_pad)[..., : npy * npx]
            )
            if vol.size > 4_000_000:
                volr = vol.reshape(sd * sd, f // 2, 2, f // 2, 2, npy, npx)
                planes = [
                    volr[:, :, ci_, :, cj_] for ci_, cj_ in _COLORS
                ]
            else:
                volr = vol.reshape(sd * sd, f, f, npy, npx)
                planes = [
                    volr[:, ci_::2, cj_::2] for ci_, cj_ in _COLORS
                ]
            out = [
                pad2(p.transpose(0, 3, 1, 4, 2).reshape(sd * sd, m2, n2))
                for p in planes
            ]
        else:
            base = vol.reshape(sd * sd, -1)[:, : npy * npx]
            base = base.reshape(sd * sd, npy, npx)
            base = jnp.pad(base, ((0, 0), (0, pad_r), (0, pad_c)))
            if base.size > 4_000_000:
                nyp, nxp = npy + pad_r, npx + pad_c
                br = base.reshape(sd * sd, nyp // 2, 2, nxp // 2, 2)
                out = [pad2(br[:, :, ci_, :, cj_]) for ci_, cj_ in _COLORS]
            else:
                out = [
                    pad2(base[:, ci_::2, cj_::2]) for ci_, cj_ in _COLORS
                ]
        return jnp.stack(out)

    def mv_to_colors(mv):
        """(npy, npx, 2) parent-grid MVs -> (4, 2, m2p, n2p) color slabs."""
        if f >= 2:  # f even: global sub-row parity == within-parent parity
            f2 = f // 2
            full = jnp.repeat(jnp.repeat(mv, f2, axis=0), f2, axis=1)
            out = [full for _ in _COLORS]
        else:
            base = jnp.pad(mv, ((0, pad_r), (0, pad_c), (0, 0)))
            out = [base[ci_::2, cj_::2] for ci_, cj_ in _COLORS]
        return jnp.stack(
            [pad2(c.transpose(2, 0, 1).astype(jnp.int32)) for c in out]
        )

    cv_colors = cv_to_colors(cvq, side)
    pm_colors = mv_to_colors(parent_mv)
    if rcvq is not None:
        side2 = 2 * r2 + 1
        rcv_colors = cv_to_colors(rcvq, side2)
        rpm_colors = mv_to_colors(rbase)
    present_colors, rank_colors = [], []
    for ci_, cj_ in _COLORS:
        kk = jnp.arange(m2, dtype=jnp.int32)[:, None]
        mm = jnp.arange(n2, dtype=jnp.int32)[None, :]
        gi = row0_b + ci_ + 2 * kk  # ci_/cj_ are LOCAL offsets
        jj = col0_b + cj_ + 2 * mm
        # TRUE global extents (padded nbx2 would misclassify the frame's
        # last real column as interior)
        case = reg._border_case(gi, jj, nby_total, nbx_total)
        rank = rank_table[case]  # (m2, n2, 9)
        present = rank < reg._BIG_RANK
        for k, (dy, dx) in enumerate(reg.SLOTS):
            ok = (
                (gi + dy >= 0) & (gi + dy < nby_total)
                & (jj + dx >= 0) & (jj + dx < nbx_total)
            )
            present = present.at[..., k].set(present[..., k] & ok)
        present_colors.append(pad2(present.transpose(2, 0, 1).astype(jnp.int32)))
        rank_colors.append(pad2(rank.transpose(2, 0, 1)))
    present_colors = jnp.stack(present_colors)
    rank_colors = jnp.stack(rank_colors)

    lam_sweeps = jnp.asarray(
        [lam * (sweep + 1) for sweep in range(sweeps_per_round)],
        dtype=jnp.float32,
    )

    # scan over SWEEPS, colors statically unrolled.  ci/cj are GLOBAL color
    # offsets; a tile whose first block row is odd hosts color row ci at the
    # opposite LOCAL parity, so local slicing/write-back uses
    # lci = (ci + row0_b) % 2 (strips no longer need an even block-row
    # count - the r2 padding tax).  The per-color constant slabs are indexed
    # by LOCAL offset and already carry global-coordinate content.
    def sweep_body(g, lam_mult):
        for ci, cj in _COLORS:
            lci = (jnp.int32(ci) + row0_b) % 2
            lcj = (jnp.int32(cj) + col0_b) % 2
            gp = make_gp(g)
            cands = []
            for dy, dx in reg.SLOTS:
                sub = jax.lax.dynamic_slice(
                    gp, (lci + dy + 1, lcj + dx + 1, 0), (nby2, nbx2, 2)
                )
                # reshape+index, not [::2, ::2] (DESIGN.md section 8a)
                cands.append(
                    sub.reshape(nby2 // 2, 2, nbx2 // 2, 2, 2)[:, 0, :, 0]
                )
            cands = jnp.stack(cands, axis=0).astype(jnp.int32)  # (9, m2, n2, 2)
            cands = pad2(cands.transpose(0, 3, 1, 2))           # (9, 2, m2p, n2p)
            sc = jnp.stack(
                [
                    2 * lci + lcj,
                    lci,
                    lcj,
                    jnp.asarray(row0_b, jnp.int32),
                    jnp.asarray(col0_b, jnp.int32),
                ]
            )
            if rcvq is not None:
                new_mv = windowed_color_step_rival(
                    sc, lam_mult, cv_colors, rcv_colors, cands, pm_colors,
                    rpm_colors, present_colors, rank_colors,
                    side, r, side2, r2, cur, h, w, interpret=interp,
                )
            else:
                new_mv = windowed_color_step(
                    sc, lam_mult, cv_colors, cands, pm_colors,
                    present_colors, rank_colors, side, r, cur, h, w,
                    interpret=interp,
                )
            nm = new_mv[:, :m2, :n2].transpose(1, 2, 0).astype(jnp.float32)
            gr = g.reshape(m2, 2, n2, 2, 2)
            gr = jax.lax.dynamic_update_slice(
                gr, nm[:, None, :, None, :], (0, lci, 0, lcj, 0)
            )
            g = gr.reshape(nby2, nbx2, 2)
        return g, None

    grid, _ = jax.lax.scan(sweep_body, grid, lam_sweeps)
    if pad_r or pad_c:
        grid = grid[:nby, :nbx]
    return grid


def windowed_schedule(
    im1: jnp.ndarray,
    im2: jnp.ndarray,
    grid0: jnp.ndarray,  # (nPy, nPx, 2) the level's search output (integer MVs)
    bs: int,
    ss: int,
    lam0: float,
    sweeps_per_round: int,
    *,
    cost: str = "sad",
    reg_radius: int | None = None,
    full_h: int | None = None,
    row0: jnp.ndarray | int = 0,
    im2_row0: jnp.ndarray | int = 0,
    full_w: int | None = None,
    col0: jnp.ndarray | int = 0,
    im2_col0: jnp.ndarray | int = 0,
    make_gp=None,
    impl: str = "xla",
    rival: bool = False,
    rival_extend=None,
    rival_radius: int | None = None,
    cell_exchange=None,
    cell_exchange_2d=None,
) -> jnp.ndarray:
    """The per-level regularization schedule on window-resident data.

    Same round structure as ``reg.run_schedule`` (sweeps with
    lambda_multiplier = sweep+1, subdivision, lambda doubling) with fourcolor
    ordering, evaluated against per-parent windows.  Returns the stride-1 MV
    grid.
    """
    ht, wt = im1.shape
    h = ht if full_h is None else full_h
    w = wt if full_w is None else full_w
    ext = spiral_extent(ss - bs)
    r = ext if reg_radius is None else min(reg_radius, ext)
    side = 2 * r + 1
    npy, npx = grid0.shape[:2]
    row0 = jnp.asarray(row0, dtype=jnp.int32)
    im2_row0 = jnp.asarray(im2_row0, dtype=jnp.int32)
    col0 = jnp.asarray(col0, dtype=jnp.int32)
    im2_col0 = jnp.asarray(im2_col0, dtype=jnp.int32)
    untiled = make_gp is None
    if make_gp is None:
        def make_gp(g):
            return jnp.pad(g, ((1, 2), (1, 2), (0, 0)))

    # one (ss, ss) window per parent, centered on origin + search MV
    parent_mv = grid0.astype(jnp.int32)  # integer-valued by construction
    oy = row0 + jnp.arange(npy, dtype=jnp.int32)[:, None] * bs
    ox = col0 + jnp.arange(npx, dtype=jnp.int32)[None, :] * bs
    wy = jnp.clip((oy + parent_mv[..., 1]) - im2_row0, 0, im2.shape[0] - bs)
    wx = jnp.clip(
        jnp.clip(ox + parent_mv[..., 0], 0, w - bs) - im2_col0,
        0, im2.shape[1] - bs,
    )
    windows = (
        _gather_windows(im2, wy.reshape(-1), wx.reshape(-1), bs, ext)
        .astype(jnp.int16)
        .reshape(npy, npx, bs + 2 * ext, bs + 2 * ext)
    )
    patches1 = (
        im1.reshape(npy, bs, npx, bs).transpose(0, 2, 1, 3).astype(jnp.int16)
    )

    rwindows = rbase = None
    r2 = r if rival_radius is None else min(rival_radius, r)
    if rival:
        rmv = _pick_rival(parent_mv, parent_mv, r, row_extend=rival_extend)
        rvy = jnp.clip((oy + rmv[..., 1]) - im2_row0, 0, im2.shape[0] - bs)
        rvx = jnp.clip(
            jnp.clip(ox + rmv[..., 0], 0, w - bs) - im2_col0,
            0, im2.shape[1] - bs,
        )
        rwindows = (
            _gather_windows(im2, rvy.reshape(-1), rvx.reshape(-1), bs, r2)
            .astype(jnp.int16)
            .reshape(npy, npx, bs + 2 * r2, bs + 2 * r2)
        )
        rbase = jnp.stack(
            [(rvx + im2_col0) - ox, (rvy + im2_row0) - oy], axis=-1
        )

    impl = _resolve_impl(impl)
    if cost == "zsad":
        impl = "xla"  # float-valued cost; the Pallas kernels implement sad/ssd
    cvs_pallas = rcvs_pallas = None
    if impl in ("pallas", "pallas_interpret"):
        interp = impl == "pallas_interpret"
        cvs_pallas = _all_round_cvs_pallas(
            patches1, windows, bs, ext, r, cost, interpret=interp
        )
        if rival:
            rcvs_pallas = _all_round_cvs_pallas(
                patches1, rwindows, bs, r2, r2, cost, interpret=interp
            )

    return _rounds_loop(
        patches1, windows, grid0, parent_mv, bs, ext, r, cost, h, w, row0,
        make_gp, lam0, sweeps_per_round, impl, untiled, cvs_pallas,
        rwindows=rwindows, rbase=rbase, rcvs_pallas=rcvs_pallas, r2=r2,
        col0=col0, cell_exchange=cell_exchange,
        cell_exchange_2d=cell_exchange_2d,
    )


def _rounds_loop(
    patches1: jnp.ndarray,
    windows: jnp.ndarray,
    grid0: jnp.ndarray,
    parent_mv: jnp.ndarray,  # (npy, npx, 2) i32: the windows' center MVs
    bs: int,
    ext: int,
    r: int,
    cost: str,
    h: int,
    w: int,
    row0: jnp.ndarray,
    make_gp,
    lam0: float,
    sweeps_per_round: int,
    impl: str,
    untiled: bool,
    cvs_pallas: dict[int, jnp.ndarray] | None,
    rwindows: jnp.ndarray | None = None,
    rbase: jnp.ndarray | None = None,
    rcvs_pallas: dict[int, jnp.ndarray] | None = None,
    r2: int = 0,
    compact_cvs: dict[int, jnp.ndarray] | None = None,
    dv_slots: jnp.ndarray | None = None,
    k_slots: int = 0,
    fused_in: dict | None = None,
    fuse_max: int = 0,
    col0: jnp.ndarray | int = 0,
    cell_exchange=None,
    cell_exchange_2d=None,
) -> jnp.ndarray:
    """The subdivision rounds of the windowed schedule (see module docstring).

    Candidate deltas are rebased against ``parent_mv`` - whatever MV the
    windows were centered on (the search winner in ``windowed_schedule``, the
    truncated prediction in ``windowed_level``).  With ``rwindows``/``rbase``
    (rival windows, see module docstring) a candidate outside the primary
    window is evaluated against the rival window when it lands there.
    """
    from blockbasedmotionestimation_tpu.models.engine import subdivide

    side = 2 * r + 1
    npy, npx = parent_mv.shape[:2]
    grid = grid0
    cur, lam = bs, lam0
    rank_table = jnp.asarray(reg._RANK_TABLE)
    while cur > 1:
        f = bs // cur
        nby, nbx = grid.shape[:2]
        if cvs_pallas is not None:
            # fused Pallas color-step path: per-color constants hoisted out
            # of the sweep scan, selection + energy + winner in one kernel.
            # Sub-divided rounds run in parent-major cell layout (no big
            # transposes) when untiled OR tiled with a cell-exchange
            # closure: the per-step ghost ppermutes carry the cross-tile
            # Gauss-Seidel visibility the lane rolls cannot see
            # (cell_exchange: ghost rows, 1-D strips; cell_exchange_2d:
            # ghost rows + corner-extended ghost columns, 2-D ty x tx
            # tiles).  2-D runs WITHOUT the closure keep the slab path,
            # whose make_gp candidate gather exchanges both axes.
            cell_ok = (
                untiled
                or cell_exchange is not None
                or cell_exchange_2d is not None
            )
            round_fn = _pallas_round_pm if (f >= 2 and cell_ok) else _pallas_round
            rkw = {}
            use_fused = (
                fused_in is not None and cur <= fuse_max
                and f >= 2 and cell_ok
            )
            if use_fused:
                # chunk-fused round: the color-step kernel recomputes
                # candidate costs from the VMEM-resident window slabs
                # (kernels.fused_step).  Hybrid-rival rounds (no "wslab")
                # keep the dense MAIN volume and recompute only the rival
                # candidates, so the main CV is still consumed here.
                vol = (
                    cvs_pallas.pop(cur) if "wslab" not in fused_in else None
                )
                rkw = dict(fused_in=fused_in)
                if "rwslab" in fused_in:
                    rkw.update(rbase=rbase, r2=r2)
            elif rcvs_pallas is not None:
                rkw = dict(rcvq=rcvs_pallas.pop(cur), rbase=rbase, r2=r2)
            if compact_cvs is not None and cur in compact_cvs:
                vol = compact_cvs.pop(cur)
                cvs_pallas.pop(cur, None)
                rkw = dict(dv_slots=dv_slots, k_slots=k_slots)
            elif not use_fused:
                vol = cvs_pallas.pop(cur)
            if round_fn is _pallas_round:
                rkw["col0_b"] = col0 // cur
            elif cell_exchange_2d is not None:
                rkw["cell_exchange_2d"] = cell_exchange_2d
                rkw["col0_b"] = col0 // cur
            elif cell_exchange is not None:
                rkw["cell_exchange"] = cell_exchange
            grid = round_fn(
                grid, vol, parent_mv,
                bs=bs, cur=cur, side=side, r=r, h=h, w=w,
                row0_b=row0 // cur, lam=lam,
                sweeps_per_round=sweeps_per_round, make_gp=make_gp,
                interp=(impl == "pallas_interpret"), **rkw,
            )
            grid = subdivide(grid)
            cur >>= 1
            lam *= 2.0
            continue
        cv = _compute_cv(patches1, windows, bs, cur, ext, r, cost)  # (side^2, nby, nbx)
        pm = jnp.repeat(jnp.repeat(parent_mv, f, axis=0), f, axis=1)  # (nby, nbx, 2)
        if rwindows is not None:
            rcv = _compute_cv(patches1, rwindows, bs, cur, r2, r2, cost)
            rpm = jnp.repeat(jnp.repeat(rbase, f, axis=0), f, axis=1)

        pad_r, pad_c = nby % 2, nbx % 2
        step_gp = make_gp
        if pad_r or pad_c:
            grid = jnp.pad(grid, ((0, pad_r), (0, pad_c), (0, 0)))
            cv = jnp.pad(cv, ((0, 0), (0, pad_r), (0, pad_c)))
            pm = jnp.pad(pm, ((0, pad_r), (0, pad_c), (0, 0)))
            if rwindows is not None:
                rcv = jnp.pad(rcv, ((0, 0), (0, pad_r), (0, pad_c)))
                rpm = jnp.pad(rpm, ((0, pad_r), (0, pad_c), (0, 0)))

            def step_gp(g, _nby=nby, _nbx=nbx, _pr=pad_r, _pc=pad_c):
                # halo exchange must see only REAL rows (tiled mode)
                gp0 = make_gp(g[:_nby, :_nbx])
                return jnp.pad(gp0, ((0, _pr), (0, _pc), (0, 0)))

        nby2, nbx2 = grid.shape[:2]
        m2, n2 = nby2 // 2, nbx2 // 2
        nby_total = h // cur
        nbx_total = w // cur
        row0_b = row0 // cur
        col0_b = col0 // cur

        lam_steps, ci_steps, cj_steps = [], [], []
        for sweep in range(sweeps_per_round):
            for ci, cj in ((0, 0), (0, 1), (1, 0), (1, 1)):
                lam_steps.append(lam * (sweep + 1))
                ci_steps.append(ci)
                cj_steps.append(cj)
        xs = (
            jnp.asarray(lam_steps, dtype=jnp.float32),
            jnp.asarray(ci_steps, dtype=jnp.int32),
            jnp.asarray(cj_steps, dtype=jnp.int32),
        )

        if rwindows is None:
            rcv = rpm = None

        def body(g, x, cur=cur, nby2=nby2, nbx2=nbx2, m2=m2, n2=n2,
                 nby_total=nby_total, nbx_total=nbx_total, row0_b=row0_b,
                 col0_b=col0_b, cv=cv, pm=pm, rcv=rcv, rpm=rpm):
            lam_mult, ci, cj = x
            # local offsets of GLOBAL color (ci, cj) (odd-first-row/col tiles)
            lci = (ci + row0_b) % 2
            lcj = (cj + col0_b) % 2
            gp = step_gp(g)

            def slab2(arr, axes):
                # stride-2 view rows lci::2 / cols lcj::2 on the given axes
                sh = list(arr.shape)
                sh[axes[0]] = m2
                sh.insert(axes[0] + 1, 2)
                sh[axes[1] + 1] = n2
                sh.insert(axes[1] + 2, 2)
                rsh = arr.reshape(sh)
                rsh = jax.lax.dynamic_index_in_dim(rsh, lci, axis=axes[0] + 1, keepdims=False)
                return jax.lax.dynamic_index_in_dim(rsh, lcj, axis=axes[1] + 1, keepdims=False)

            cands = []
            for dy, dx in reg.SLOTS:
                sub = jax.lax.dynamic_slice(
                    gp, (lci + dy + 1, lcj + dx + 1, 0), (nby2, nbx2, 2)
                )
                # reshape+index, not [::2, ::2] (DESIGN.md section 8a)
                cands.append(
                    sub.reshape(nby2 // 2, 2, nbx2 // 2, 2, 2)[:, 0, :, 0]
                )
            cands = jnp.stack(cands, axis=2)  # (m2, n2, 9, 2)

            kk = jnp.arange(m2, dtype=jnp.int32)[:, None]
            mm = jnp.arange(n2, dtype=jnp.int32)[None, :]
            gi = row0_b + lci + 2 * kk  # global rows of parity ci
            jj = col0_b + lcj + 2 * mm  # global cols of parity cj
            # TRUE global grid extents (padded local nbx2 would misclassify
            # the frame's last real column as interior)
            case = reg._border_case(gi, jj, nby_total, nbx_total)
            rank = rank_table[case]
            present = rank < reg._BIG_RANK
            for k, (dy, dx) in enumerate(reg.SLOTS):
                okk = (
                    (gi + dy >= 0) & (gi + dy < nby_total)
                    & (jj + dx >= 0) & (jj + dx < nbx_total)
                )
                present = present.at[..., k].set(present[..., k] & okk)

            # candidate deltas from the parent search MV
            ci_int = cands.astype(jnp.int32)  # trunc toward zero
            pm_slab = slab2(pm, (0, 1))  # (m2, n2, 2)
            ddx = ci_int[..., 0] - pm_slab[..., None, 0]  # (m2, n2, 9)
            ddy = ci_int[..., 1] - pm_slab[..., None, 1]
            in_window = (jnp.abs(ddx) <= r) & (jnp.abs(ddy) <= r)
            # global image bounds for the target block (:578-582)
            t_x = (jj * cur)[..., None] + ci_int[..., 0]
            t_y = (gi * cur)[..., None] + ci_int[..., 1]
            in_img = (t_x >= 0) & (t_x <= w - cur) & (t_y >= 0) & (t_y <= h - cur)

            cv_slab = slab2(cv, (1, 2))  # (side^2, m2, n2)
            costs = _select_costs(cv_slab, ddy, ddx, r)  # (m2, n2, 9)
            if rcv is not None:
                # rival-window fallback: same absolute frame-2 pixels, so the
                # cost agrees with the primary window wherever both cover
                rpm_slab = slab2(rpm, (0, 1))
                rddx = ci_int[..., 0] - rpm_slab[..., None, 0]
                rddy = ci_int[..., 1] - rpm_slab[..., None, 1]
                in_rival = (jnp.abs(rddx) <= r2) & (jnp.abs(rddy) <= r2)
                rcosts = _select_costs(slab2(rcv, (1, 2)), rddy, rddx, r2)
                costs = jnp.where(in_window, costs, rcosts)
                in_window = in_window | in_rival

            pmask = present.astype(jnp.float32)
            du = jnp.abs(cands[..., None, 0] - cands[..., None, :, 0])
            dv = jnp.abs(cands[..., None, 1] - cands[..., None, :, 1])
            smooth = jnp.sum((du + dv) * pmask[..., None, :], axis=-1)

            energy = jnp.where(
                present & in_img & in_window, costs + lam_mult * smooth, _F32_MAX
            )
            winner = reg._select_lexicographic(energy, rank)
            new_mv = jnp.take_along_axis(cands, winner[..., None, None], axis=2)[:, :, 0]

            gr = g.reshape(m2, 2, n2, 2, 2)
            gr = jax.lax.dynamic_update_slice(
                gr, new_mv[:, None, :, None, :], (0, lci, 0, lcj, 0)
            )
            return gr.reshape(nby2, nbx2, 2), None

        grid, _ = jax.lax.scan(body, grid, xs)
        if pad_r or pad_c:
            grid = grid[:nby, :nbx]
        grid = subdivide(grid)
        cur >>= 1
        lam *= 2.0
    return grid


def windowed_level(
    im1: jnp.ndarray,
    im2: jnp.ndarray,
    pred: jnp.ndarray,  # (nPy, nPx, 2) f32 predicted MVs at block origins
    bs: int,
    ss: int,
    lam0: float,
    sweeps_per_round: int,
    *,
    cost: str = "sad",
    full_h: int | None = None,
    row0: jnp.ndarray | int = 0,
    im2_row0: jnp.ndarray | int = 0,
    full_w: int | None = None,
    col0: jnp.ndarray | int = 0,
    im2_col0: jnp.ndarray | int = 0,
    make_gp=None,
    impl: str = "xla",
    rival: bool = False,
    rival_extend=None,
    rival_radius: int | None = None,
    compact: int | None = None,
    compact_ring: int = 3,
    fuse: int | None = None,
    cell_exchange=None,
    cell_exchange_2d=None,
    store_radius: int | None = None,
) -> jnp.ndarray:
    """Fused block search + windowed regularization from ONE cost volume.

    ``windowed_schedule`` centers its windows on the search winner, so each
    level pays for two full (2S+1)^2 SAD volumes over near-identical windows:
    one inside the spiral search (``motion_framework.cpp:296-422``), one for
    the regularizer's cost volume.  Centering the windows on the TRUNCATED
    PREDICTION instead - the exact center the spiral search walks around
    (``:233-234``) - lets a single pooled cost-volume pass serve both:

      * the search winner is the lexicographic (cost, spiral-visit-rank)
        minimum of the full-block (cur == bs) volume, masked by the global
        in-image bounds - BIT-IDENTICAL to ``ops.search.block_search_level``
        (same windows, same costs, same tie-break);
      * the regularization rounds read the same pooled volumes with candidate
        deltas rebased against the prediction.

    Deviation from ``windowed_schedule`` (measured, see DESIGN.md): a
    candidate is evaluable iff it lands within the PREDICTION-centered window
    (|cand - trunc(pred)| <= S) rather than within reg_radius of the search
    winner.  Both windows have half-width S and the search winner always lies
    inside the prediction window, so the two sets overlap heavily; updates
    still only ever adopt evaluated candidates.  ``reg_radius`` is not
    supported here (the single shared window fixes the radius at S) - the
    engine falls back to the two-pass path when it is set.

    Returns the stride-1 MV grid, like ``windowed_schedule``.
    """
    ht, wt = im1.shape
    h = ht if full_h is None else full_h
    w = wt if full_w is None else full_w
    shift = ss - bs
    dys_np, dxs_np, ext = spiral_offsets(shift)
    side = 2 * ext + 1
    npy, npx = pred.shape[:2]
    nblk = npy * npx
    row0 = jnp.asarray(row0, dtype=jnp.int32)
    im2_row0 = jnp.asarray(im2_row0, dtype=jnp.int32)
    col0 = jnp.asarray(col0, dtype=jnp.int32)
    im2_col0 = jnp.asarray(im2_col0, dtype=jnp.int32)
    untiled = make_gp is None
    if make_gp is None:
        def make_gp(g):
            return jnp.pad(g, ((1, 2), (1, 2), (0, 0)))

    # the spiral search's center: origin + (int)-truncated prediction, with
    # the zero-MV early-out for centers outside the image (:304-310)
    oy = row0 + jnp.arange(npy, dtype=jnp.int32)[:, None] * bs
    ox = col0 + jnp.arange(npx, dtype=jnp.int32)[None, :] * bs
    cu = pred[..., 0].astype(jnp.int32)
    cv_ = pred[..., 1].astype(jnp.int32)
    cy = oy + cv_
    cx = ox + cu
    center_ok = (cy >= 0) & (cy <= h - bs) & (cx >= 0) & (cx <= w - bs)
    cy_safe = jnp.where(center_ok, cy, jnp.broadcast_to(oy, (npy, npx)))
    cx_safe = jnp.where(center_ok, cx, jnp.broadcast_to(ox, (npy, npx)))

    by = jnp.clip(cy_safe - im2_row0, 0, im2.shape[0] - bs)
    bx = jnp.clip(cx_safe - im2_col0, 0, im2.shape[1] - bs)
    windows = (
        _gather_windows(im2, by.reshape(-1), bx.reshape(-1), bs, ext)
        .astype(jnp.int16)
        .reshape(npy, npx, bs + 2 * ext, bs + 2 * ext)
    )
    patches1 = (
        im1.reshape(npy, bs, npx, bs).transpose(0, 2, 1, 3).astype(jnp.int16)
    )
    # the windows' actual global center MV: deltas downstream rebase on this
    base_mv = jnp.stack(
        [(bx + im2_col0) - ox, (by + im2_row0) - oy], axis=-1
    )

    impl = _resolve_impl(impl)
    if cost == "zsad":
        impl = "xla"  # float-valued cost; the Pallas kernels implement sad/ssd
    eff_store = None
    use_compact = (
        compact is not None
        and impl in ("pallas", "pallas_interpret")
        and untiled
        and not rival
        and bs >= 8
    )
    any_cell_exchange = (
        cell_exchange is not None or cell_exchange_2d is not None
    )
    use_fused_cv = (
        fuse is not None
        and impl in ("pallas", "pallas_interpret")
        and (untiled or any_cell_exchange)
        and not use_compact
        and bs % 8 == 0
    )
    fuse_eff = min(fuse, bs // 2) if use_fused_cv else 0
    fused_in = None
    if impl in ("pallas", "pallas_interpret"):
        if use_compact:
            # compact mode: ONLY the search volume is dense; every
            # sub-block volume becomes a K-slot table after the search
            from blockbasedmotionestimation_tpu.kernels.cv_diff import (
                full_block_volume,
            )

            wside = windows.shape[3]
            patches_tt = patches1.reshape(nblk, bs, bs).transpose(1, 2, 0)
            windows_tt = windows.reshape(nblk, wside, wside).transpose(1, 2, 0)
            cvs_pallas = {
                bs: full_block_volume(
                    patches_tt, windows_tt, bs, ext, ext, cost,
                    interpret=(impl == "pallas_interpret"),
                )
            }
        elif use_fused_cv:
            # chunk-fused mode: only the coarse (cur > fuse_eff) volumes and
            # the search volume are dense; the fine rounds recompute their
            # costs on VMEM-resident window slabs (kernels.fused_step)
            from blockbasedmotionestimation_tpu.kernels.cv_diff import (
                deep_pooled_cvs,
            )
            from blockbasedmotionestimation_tpu.kernels.fused_step import (
                prep_slabs,
            )

            wside = windows.shape[3]
            patches_tt = patches1.reshape(nblk, bs, bs).transpose(1, 2, 0)
            windows_tt = windows.reshape(nblk, wside, wside).transpose(1, 2, 0)
            cvs_pallas = deep_pooled_cvs(
                patches_tt, windows_tt, bs, ext, ext, fuse_eff, cost,
                interpret=(impl == "pallas_interpret"),
            )
            f_patches, f_wslab = prep_slabs(patches_tt, windows_tt, bs, ext, ext)
            fused_in = {
                "patches_pl": f_patches, "wslab": f_wslab,
                "ext": ext, "cost": cost,
            }
        else:
            # r_store (cv_store_radius): store the cur=2 volume - the
            # pipeline's HBM dominator - only for |delta| <= store_radius;
            # out-of-band candidates are recomputed from the main window
            # slab by the hybrid tail kernel.  Bit-exact; only legal when
            # the hybrid rival path will consume it.
            eff_store = store_radius
            if eff_store is not None and not (
                rival
                and bs % 8 == 0
                and bs >= 8
                and (untiled or any_cell_exchange)
                and not use_compact
                and 0 <= eff_store < ext
                and not _os.environ.get("BBME_NO_HYBRID")
            ):
                eff_store = None
            cvs_pallas = _all_round_cvs_pallas(
                patches1, windows, bs, ext, ext, cost,
                interpret=(impl == "pallas_interpret"),
                store_r2=eff_store,
            )
        # cur == bs volume: (side, side, 1, 1, nPad) unsplit layout
        sad_flat = cvs_pallas[bs].reshape(side * side, -1).astype(jnp.int32)
    else:
        cvs_pallas = None
        sad_flat = (
            _compute_cv(patches1, windows, bs, bs, ext, ext, cost)
            .reshape(side * side, nblk)
            .astype(jnp.float32 if cost == "zsad" else jnp.int32)
        )

    # spiral argmin over the volume: strict-< first-visit-wins == two-stage
    # (min cost, then min spiral-visit order among cost ties)
    nlan = sad_flat.shape[1]
    cyf = jnp.pad(cy_safe.reshape(nblk), (0, nlan - nblk))
    cxf = jnp.pad(cx_safe.reshape(nblk), (0, nlan - nblk))
    didx = jnp.arange(side * side, dtype=jnp.int32)
    dy_of = didx // side - ext
    dx_of = didx % side - ext
    ty = cyf[None, :] + dy_of[:, None]
    tx = cxf[None, :] + dx_of[:, None]
    ok = (ty >= 0) & (ty <= h - bs) & (tx >= 0) & (tx <= w - bs)
    sad_m = jnp.where(ok, sad_flat, _I32_MAX)
    order = np.full((side, side), np.iinfo(np.int32).max, dtype=np.int32)
    order[dys_np + ext, dxs_np + ext] = np.arange(side * side, dtype=np.int32)
    best_sad = jnp.min(sad_m, axis=0)
    rank_m = jnp.where(
        sad_m == best_sad[None, :],
        jnp.asarray(order.reshape(-1))[:, None],
        np.iinfo(np.int32).max,
    )
    oi = jnp.min(rank_m, axis=0)  # winning spiral-visit index (center valid)
    best_dy = jnp.asarray(dys_np)[oi][:nblk].reshape(npy, npx)
    best_dx = jnp.asarray(dxs_np)[oi][:nblk].reshape(npy, npx)
    u = jnp.where(center_ok, (cx_safe + best_dx - ox).astype(jnp.float32), 0.0)
    v = jnp.where(center_ok, (cy_safe + best_dy - oy).astype(jnp.float32), 0.0)
    grid0 = jnp.stack([u, v], axis=-1)

    compact_cvs = dv_slots = None
    if use_compact:
        # the rounds' delta universe from the winners (ops.compact): compact
        # K-slot tables replace every dense sub-block volume
        from blockbasedmotionestimation_tpu.kernels.cv_diff import (
            compact_tables,
        )
        from blockbasedmotionestimation_tpu.ops.compact import (
            chunk_delta_slots,
        )

        dv_slots = chunk_delta_slots(
            grid0.astype(jnp.int32), base_mv, ext, compact, compact_ring
        )
        compact_cvs = compact_tables(
            patches_tt, windows_tt, dv_slots, bs, ext, ext, compact, cost,
            interpret=(impl == "pallas_interpret"),
        )

    rwindows = rbase = rcvs_pallas = None
    r2 = ext if rival_radius is None else min(rival_radius, ext)
    if rival:
        # rival centers from the SEARCH WINNERS (not the smooth prediction):
        # at a discontinuity the winner snaps to the true local motion, so
        # the most-different neighbor winner is the foreign motion mode
        rmv = _pick_rival(
            grid0.astype(jnp.int32), base_mv, ext, row_extend=rival_extend
        )
        rvy = jnp.clip((oy + rmv[..., 1]) - im2_row0, 0, im2.shape[0] - bs)
        rvx = jnp.clip(
            jnp.clip(ox + rmv[..., 0], 0, w - bs) - im2_col0,
            0, im2.shape[1] - bs,
        )
        rwindows = (
            _gather_windows(im2, rvy.reshape(-1), rvx.reshape(-1), bs, r2)
            .astype(jnp.int16)
            .reshape(npy, npx, bs + 2 * r2, bs + 2 * r2)
        )
        rbase = jnp.stack(
            [(rvx + im2_col0) - ox, (rvy + im2_row0) - oy], axis=-1
        )
        if fused_in is not None:
            # fused rival: coarse rival volumes dense, fine ones recomputed
            # against the VMEM-resident rival slab
            from blockbasedmotionestimation_tpu.kernels.cv_diff import (
                deep_pooled_cvs,
            )
            from blockbasedmotionestimation_tpu.kernels.fused_step import (
                prep_slabs,
            )

            rwside = rwindows.shape[3]
            rwindows_tt = (
                rwindows.reshape(nblk, rwside, rwside).transpose(1, 2, 0)
            )
            rcvs_pallas = deep_pooled_cvs(
                patches_tt, rwindows_tt, bs, r2, r2, fuse_eff, cost,
                interpret=(impl == "pallas_interpret"),
            )
            fused_in["rwslab"] = prep_slabs(
                patches_tt, rwindows_tt, bs, r2, r2
            )[1]
        elif (
            cvs_pallas is not None
            and (untiled or any_cell_exchange)
            and bs % 8 == 0
            and not use_compact
            and not _os.environ.get("BBME_NO_HYBRID")
        ):
            # HYBRID rival (the production rival mode): main volumes stay
            # dense, coarse rival volumes dense via the deep build, and the
            # fine rounds recompute rival candidates against the
            # VMEM-resident rival slab.  Kills the fine-grained rival
            # volumes entirely - ~30% of CV build time and the HBM
            # transient that blocked rival at B=8 (DESIGN.md section 3b).
            from blockbasedmotionestimation_tpu.kernels.cv_diff import (
                deep_pooled_cvs,
            )
            from blockbasedmotionestimation_tpu.kernels.fused_step import (
                prep_slabs,
            )

            # every sub-block round (cur < bs) runs hybrid: dense main CV +
            # slab-recomputed rival, so the ONLY dense rival volume left is
            # the f=1 round's search-size one
            hyb_fuse = min(16, bs // 2)
            rwside = rwindows.shape[3]
            patches_tt = patches1.reshape(nblk, bs, bs).transpose(1, 2, 0)
            rwindows_tt = (
                rwindows.reshape(nblk, rwside, rwside).transpose(1, 2, 0)
            )
            rcvs_pallas = deep_pooled_cvs(
                patches_tt, rwindows_tt, bs, r2, r2, hyb_fuse, cost,
                interpret=(impl == "pallas_interpret"),
            )
            f_patches, f_rwslab = prep_slabs(
                patches_tt, rwindows_tt, bs, r2, r2
            )
            fused_in = {
                "patches_pl": f_patches, "rwslab": f_rwslab, "cost": cost,
            }
            if eff_store is not None:
                # r_store: the cur=2 rounds also need the MAIN window slab
                # to recompute in-window candidates beyond store_radius
                wside_m = windows.shape[3]
                windows_tt = (
                    windows.reshape(nblk, wside_m, wside_m).transpose(1, 2, 0)
                )
                fused_in["wslab_tail"] = prep_slabs(
                    patches_tt, windows_tt, bs, ext, ext
                )[1]
                fused_in["store_r"] = eff_store
                fused_in["ext"] = ext
            fuse_eff = hyb_fuse
        elif cvs_pallas is not None:
            rcvs_pallas = _all_round_cvs_pallas(
                patches1, rwindows, bs, r2, r2, cost,
                interpret=(impl == "pallas_interpret"),
            )

    return _rounds_loop(
        patches1, windows, grid0, base_mv, bs, ext, ext, cost, h, w, row0,
        make_gp, lam0, sweeps_per_round, impl, untiled, cvs_pallas,
        rwindows=rwindows, rbase=rbase, rcvs_pallas=rcvs_pallas, r2=r2,
        compact_cvs=compact_cvs, dv_slots=dv_slots,
        k_slots=0 if compact is None else compact,
        fused_in=fused_in, fuse_max=fuse_eff, col0=col0,
        cell_exchange=cell_exchange, cell_exchange_2d=cell_exchange_2d,
    )

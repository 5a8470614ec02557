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
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from blockbasedmotionestimation_tpu.ops import regularize as reg
from blockbasedmotionestimation_tpu.ops.search import _gather_windows
from blockbasedmotionestimation_tpu.ops.search import resolve_impl as _resolve_impl
from blockbasedmotionestimation_tpu.ops.spiral import spiral_extent

_F32_MAX = np.float32(np.finfo(np.float32).max)


def _cv_dtype(cur: int, cost: str):
    """Smallest dtype holding a worst-case block cost at sub-block size cur."""
    peak = (255 * 255 if cost == "ssd" else 255) * cur * cur
    return jnp.uint16 if peak < (1 << 16) else jnp.int32


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
) -> dict[int, jnp.ndarray]:
    """All subdivision sizes' cost volumes from one Pallas diff pass.

    Returns {cur: (side^2, f, f, nP)} via hierarchical 2x2 pooling of the
    per-delta |diff| maps (u8 -> u16 -> i32 as sums grow).
    """
    from blockbasedmotionestimation_tpu.kernels.cv_diff import delta_diff_maps

    npy, npx = patches1.shape[:2]
    n_p = npy * npx
    side = 2 * r + 1
    wside = windows.shape[3]
    patches_t = patches1.reshape(n_p, bs, bs).transpose(1, 2, 0)
    windows_t = windows.reshape(n_p, wside, wside).transpose(1, 2, 0)
    base_max = 255 if cost == "sad" else 255 * 255

    # bound the transient diff tensor (side^2 * bs^2 * chunk bytes) to ~1 GB
    # so 4K+ frames fit; chunks stay multiples of the kernel's lane block
    elt = 1 if cost == "sad" else 2
    max_chunk = max(128, int(1.0e9 / (side * side * bs * bs * elt)) // 128 * 128)
    chunks = []
    for p0 in range(0, n_p, max_chunk):
        p1 = min(p0 + max_chunk, n_p)
        diffs = delta_diff_maps(
            patches_t[..., p0:p1], windows_t[..., p0:p1], bs, ext, r, cost,
            interpret=interpret,
        )  # (side, side, bs, bs, chunk)
        pool = diffs.reshape(side * side, bs, bs, p1 - p0)
        per_cur = {}
        cur, s = 1, bs
        while cur < bs:
            peak = base_max * (2 * cur) * (2 * cur)
            dt = jnp.uint16 if peak < (1 << 16) else jnp.int32
            pool = (
                pool.reshape(side * side, s // 2, 2, s // 2, 2, p1 - p0)
                .astype(dt)
                .sum(axis=(2, 4), dtype=dt)
            )
            cur <<= 1
            s >>= 1
            if cur >= 2:
                per_cur[cur] = pool  # (side^2, s, s, chunk)
        chunks.append(per_cur)
    if len(chunks) == 1:
        return chunks[0]
    return {
        cur: jnp.concatenate([c[cur] for c in chunks], axis=-1)
        for cur in chunks[0]
    }


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
    make_gp=None,
    impl: str = "xla",
) -> jnp.ndarray:
    """The per-level regularization schedule on window-resident data.

    Same round structure as ``reg.run_schedule`` (sweeps with
    lambda_multiplier = sweep+1, subdivision, lambda doubling) with fourcolor
    ordering, evaluated against per-parent windows.  Returns the stride-1 MV
    grid.
    """
    from blockbasedmotionestimation_tpu.models.engine import subdivide

    ht, w = im1.shape
    h = ht if full_h is None else full_h
    ext = spiral_extent(ss - bs)
    r = ext if reg_radius is None else min(reg_radius, ext)
    side = 2 * r + 1
    npy, npx = grid0.shape[:2]
    row0 = jnp.asarray(row0, dtype=jnp.int32)
    im2_row0 = jnp.asarray(im2_row0, dtype=jnp.int32)
    if make_gp is None:
        def make_gp(g):
            return jnp.pad(g, ((1, 2), (1, 2), (0, 0)))

    # one (ss, ss) window per parent, centered on origin + search MV
    parent_mv = grid0.astype(jnp.int32)  # integer-valued by construction
    oy = row0 + jnp.arange(npy, dtype=jnp.int32)[:, None] * bs
    ox = jnp.arange(npx, dtype=jnp.int32)[None, :] * bs
    wy = jnp.clip((oy + parent_mv[..., 1]) - im2_row0, 0, im2.shape[0] - bs)
    wx = jnp.clip(ox + parent_mv[..., 0], 0, w - bs)
    windows = (
        _gather_windows(im2, wy.reshape(-1), wx.reshape(-1), bs, ext)
        .astype(jnp.int16)
        .reshape(npy, npx, bs + 2 * ext, bs + 2 * ext)
    )
    patches1 = (
        im1.reshape(npy, bs, npx, bs).transpose(0, 2, 1, 3).astype(jnp.int16)
    )

    impl = _resolve_impl(impl)
    if impl in ("pallas", "pallas_interpret"):
        cvs_pallas = _all_round_cvs_pallas(
            patches1, windows, bs, ext, r, cost,
            interpret=(impl == "pallas_interpret"),
        )
    else:
        cvs_pallas = None

    grid = grid0
    cur, lam = bs, lam0
    rank_table = jnp.asarray(reg._RANK_TABLE)
    while cur > 1:
        f = bs // cur
        nby, nbx = grid.shape[:2]
        if cvs_pallas is not None:
            cvq = cvs_pallas[cur].reshape(side * side, f, f, npy, npx)
            cv = cvq.transpose(0, 3, 1, 4, 2).reshape(side * side, nby, nbx)
        else:
            cv = _compute_cv(patches1, windows, bs, cur, ext, r, cost)  # (side^2, nby, nbx)
        pm = jnp.repeat(jnp.repeat(parent_mv, f, axis=0), f, axis=1)  # (nby, nbx, 2)

        pad_r, pad_c = nby % 2, nbx % 2
        if pad_r or pad_c:
            grid = jnp.pad(grid, ((0, pad_r), (0, pad_c), (0, 0)))
            cv = jnp.pad(cv, ((0, 0), (0, pad_r), (0, pad_c)))
            pm = jnp.pad(pm, ((0, pad_r), (0, pad_c), (0, 0)))
        nby2, nbx2 = grid.shape[:2]
        m2, n2 = nby2 // 2, nbx2 // 2
        nby_total = h // cur
        row0_b = row0 // cur

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

        def body(g, x, cur=cur, nby2=nby2, nbx2=nbx2, m2=m2, n2=n2,
                 nby_total=nby_total, row0_b=row0_b, cv=cv, pm=pm):
            lam_mult, ci, cj = x
            gp = make_gp(g)

            def slab2(arr, axes):
                # stride-2 view rows ci::2 / cols cj::2 on the given two axes
                sh = list(arr.shape)
                sh[axes[0]] = m2
                sh.insert(axes[0] + 1, 2)
                sh[axes[1] + 1] = n2
                sh.insert(axes[1] + 2, 2)
                rsh = arr.reshape(sh)
                rsh = jax.lax.dynamic_index_in_dim(rsh, ci, axis=axes[0] + 1, keepdims=False)
                return jax.lax.dynamic_index_in_dim(rsh, cj, axis=axes[1] + 1, keepdims=False)

            cands = []
            for dy, dx in reg.SLOTS:
                sub = jax.lax.dynamic_slice(
                    gp, (ci + dy + 1, cj + dx + 1, 0), (nby2, nbx2, 2)
                )
                cands.append(sub[::2, ::2])
            cands = jnp.stack(cands, axis=2)  # (m2, n2, 9, 2)

            kk = jnp.arange(m2, dtype=jnp.int32)[:, None]
            mm = jnp.arange(n2, dtype=jnp.int32)[None, :]
            gi = row0_b + ci + 2 * kk
            jj = cj + 2 * mm
            case = reg._border_case(gi, jj, nby_total, nbx2)
            rank = rank_table[case]
            present = rank < reg._BIG_RANK
            for k, (dy, dx) in enumerate(reg.SLOTS):
                okk = (
                    (gi + dy >= 0) & (gi + dy < nby_total)
                    & (jj + dx >= 0) & (jj + dx < nbx2)
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
                gr, new_mv[:, None, :, None, :], (0, ci, 0, cj, 0)
            )
            return gr.reshape(nby2, nbx2, 2), None

        grid, _ = jax.lax.scan(body, grid, xs)
        if pad_r or pad_c:
            grid = grid[:nby, :nbx]
        grid = subdivide(grid)
        cur >>= 1
        lam *= 2.0
    return grid

"""Multi-chip execution: frame tiling with halo exchange + frame-pair batching.

The reference's only intra-frame parallelism is a disabled 2-thread
left/right column split sharing one address space (``parallel.h:20-58``).
The TPU-native design instead shards the frame's ROWS across a mesh axis and
exchanges exactly the data the algorithm needs across tile boundaries:

  * frame-2 pixel halos for the block search: a tile's predicted centers can
    sit at most ``M_(l+1)*2`` rows outside the tile and the spiral reaches
    ``S_l`` further, so the halo per level is the worst-case MV bound
    ``M_l = 2*M_(l+1) + S_l`` (``M`` at the coarsest level = its search
    shift).  Exchanged ONCE per level via ``jax.lax.ppermute`` over ICI.
  * a 1-block-row MV halo for the 8-connected regularizer, refreshed before
    every color step (``jax.lax.ppermute`` again) - the ring-exchange
    analogue of sequence-parallel boundary passing.

Because every bounds check in ops.search / ops.regularize uses GLOBAL
coordinates, the tiled fourcolor/jacobi pipeline is bit-identical to its
untiled counterpart - asserted by tests on a forced-8-device CPU mesh.

Levels whose rows don't split into block-aligned strips, or whose halo
exceeds the strip, run replicated on every device - coarse pyramid levels
are tiny, so this costs nothing.  (Odd local block-row counts shard fine:
color steps use per-tile parity offsets.)

Batching: ``estimate_flow_batch`` vmaps the engine over a leading batch axis
and shards it over the mesh's data axis; combined with row tiling this gives
the (batch x tile) layout for multi-host runs (batch over DCN, halos over
ICI).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from blockbasedmotionestimation_tpu.config import MotionConfig
from blockbasedmotionestimation_tpu.models import engine
from blockbasedmotionestimation_tpu.ops import pad as pad_ops
from blockbasedmotionestimation_tpu.ops import resample
from blockbasedmotionestimation_tpu.ops import regularize as reg
from blockbasedmotionestimation_tpu.ops.search import block_search_level


def mv_bound(cfg: MotionConfig, level: int) -> int:
    """Worst-case |MV| component at `level` after its search: the propagated
    coarse MV doubles per level and each search adds its spiral extent.
    Gather-mode regularization only adopts existing candidates (no growth);
    windowed mode can push an MV up to reg_radius past its parent search MV
    per level, so the bound grows by R_l there.  With ``cfg.mv_cap`` the
    transferred prediction is clamped, so the compounding stops at the cap
    (making the halo small enough to shard 1080p rows 8 ways at the shipped
    config instead of falling back to replicated execution)."""
    from blockbasedmotionestimation_tpu.ops.spiral import spiral_extent

    m = 0  # max |MV| after the coarser level completes
    for l in range(cfg.num_levels - 1, level - 1, -1):
        s = spiral_extent(cfg.shift(l))
        pred = 2 * m  # the transferred prediction at level l
        if cfg.mv_cap is not None:
            pred = min(pred, cfg.mv_cap)
        m = pred + s  # search reach at level l
        if cfg.regularizer == "windowed" and l > level:
            r = s if cfg.reg_radius is None else min(cfg.reg_radius, s)
            m += r
    return m


def im2_halo(cfg: MotionConfig, level: int) -> int:
    """Frame-2 halo rows needed at `level`: the search-window reach, plus the
    regularizer windows' extra spiral-extent reach in windowed mode."""
    from blockbasedmotionestimation_tpu.ops.spiral import spiral_extent

    s = spiral_extent(cfg.shift(level))
    halo = mv_bound(cfg, level)
    if cfg.regularizer == "windowed":
        halo += s
    return halo


def _exchange_rows(x: jnp.ndarray, halo: int, axis: str) -> jnp.ndarray:
    """Concatenate `halo` rows from the north and south neighbors onto x.

    Boundary devices receive zero rows; every position that could read them is
    masked out by the global bounds checks downstream.
    """
    if halo == 0:
        return x
    t = jax.lax.axis_size(axis)
    south_edge = x[-halo:]
    north_edge = x[:halo]
    from_north = jax.lax.ppermute(
        south_edge, axis, [(i, i + 1) for i in range(t - 1)]
    )
    from_south = jax.lax.ppermute(
        north_edge, axis, [(i, i - 1) for i in range(1, t)]
    )
    return jnp.concatenate([from_north, x, from_south], axis=0)


def _exchange_rows_edge(x: jnp.ndarray, axis: str) -> jnp.ndarray:
    """1-row neighbor exchange, edge-REPLICATED at mesh boundaries.

    Matches the untiled engine's ``jnp.pad(..., mode='edge')`` semantics for
    the rival-window pick: interior tile edges come from the neighbor tile,
    the global frame's first/last rows replicate themselves.
    """
    t = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    from_north = jax.lax.ppermute(x[-1:], axis, [(i, i + 1) for i in range(t - 1)])
    from_south = jax.lax.ppermute(x[:1], axis, [(i, i - 1) for i in range(1, t)])
    north = jnp.where(idx == 0, x[:1], from_north)
    south = jnp.where(idx == t - 1, x[-1:], from_south)
    return jnp.concatenate([north, x, south], axis=0)


def _exchange_cols(x: jnp.ndarray, halo: int, axis: str) -> jnp.ndarray:
    """Column analogue of ``_exchange_rows`` (west/east neighbor halos)."""
    if halo == 0:
        return x
    t = jax.lax.axis_size(axis)
    east_edge = x[:, -halo:]
    west_edge = x[:, :halo]
    from_west = jax.lax.ppermute(
        east_edge, axis, [(i, i + 1) for i in range(t - 1)]
    )
    from_east = jax.lax.ppermute(
        west_edge, axis, [(i, i - 1) for i in range(1, t)]
    )
    return jnp.concatenate([from_west, x, from_east], axis=1)


def _exchange_cols_edge(x: jnp.ndarray, axis: str) -> jnp.ndarray:
    """1-column neighbor exchange, edge-replicated at mesh boundaries."""
    t = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    from_west = jax.lax.ppermute(
        x[:, -1:], axis, [(i, i + 1) for i in range(t - 1)]
    )
    from_east = jax.lax.ppermute(
        x[:, :1], axis, [(i, i - 1) for i in range(1, t)]
    )
    west = jnp.where(idx == 0, x[:, :1], from_west)
    east = jnp.where(idx == t - 1, x[:, -1:], from_east)
    return jnp.concatenate([west, x, east], axis=1)


def _tiled_level_fn_2d(
    bs: int, ss: int, cfg: MotionConfig, full_h: int, full_w: int,
    halo: int, axis: str, axis_x: str,
):
    """Per-device level body for 2-D (ty x tx) spatial tiling.

    The reference's own split is by COLUMNS (``parallel.h:20-58``); this
    composes both axes: frame-2 pixel halos and the 1-block MV ring are
    exchanged row-wise then column-wise (the column pass of the row-extended
    buffer carries the corner data from diagonal neighbors).
    """

    def body(im1_t: jnp.ndarray, im2_t: jnp.ndarray, pred_t: jnp.ndarray) -> jnp.ndarray:
        ht, wt = im1_t.shape
        row0 = jax.lax.axis_index(axis).astype(jnp.int32) * ht
        col0 = jax.lax.axis_index(axis_x).astype(jnp.int32) * wt
        im2_buf = _exchange_cols(_exchange_rows(im2_t, halo, axis), halo, axis_x)
        im2_row0 = row0 - halo
        im2_col0 = col0 - halo

        def make_gp(g):
            # 1-block MV ring: rows then columns (corners via composition)
            gh = _exchange_cols(_exchange_rows(g, 1, axis), 1, axis_x)
            return jnp.pad(gh, ((0, 1), (0, 1), (0, 0)))

        def rival_extend(g):
            return _exchange_cols_edge(_exchange_rows_edge(g, axis), axis_x)

        if cfg.uses_fused_windowed:
            from blockbasedmotionestimation_tpu.ops.windowed import windowed_level

            return windowed_level(
                im1_t, im2_buf, pred_t, bs, ss,
                float(bs) * cfg.lambda_scale, cfg.sweeps_per_round,
                cost=cfg.cost, full_h=full_h, row0=row0, im2_row0=im2_row0,
                full_w=full_w, col0=col0, im2_col0=im2_col0,
                make_gp=make_gp, impl=cfg.search_impl,
                rival=cfg.rival_window, rival_extend=rival_extend,
                rival_radius=cfg.rival_radius,
            )

        grid = block_search_level(
            im1_t, im2_buf, pred_t, bs, ss,
            full_h=full_h, row0=row0, im2_row0=im2_row0,
            full_w=full_w, col0=col0, im2_col0=im2_col0,
            impl=cfg.search_impl, order=cfg.search_order, cost=cfg.cost,
        )

        lam0 = float(bs) * cfg.lambda_scale
        if cfg.regularizer == "windowed":
            from blockbasedmotionestimation_tpu.ops.windowed import windowed_schedule

            return windowed_schedule(
                im1_t, im2_buf, grid, bs, ss, lam0, cfg.sweeps_per_round,
                cost=cfg.cost, reg_radius=cfg.reg_radius,
                full_h=full_h, row0=row0, im2_row0=im2_row0,
                full_w=full_w, col0=col0, im2_col0=im2_col0,
                make_gp=make_gp, impl=cfg.search_impl,
                rival=cfg.rival_window, rival_extend=rival_extend,
                rival_radius=cfg.rival_radius,
            )
        return reg.run_schedule(
            im1_t, im2_buf, grid, bs, lam0, cfg.sweeps_per_round, cfg.regularizer,
            full_h=full_h, row0=row0, im2_row0=im2_row0,
            full_w=full_w, col0=col0, im2_col0=im2_col0,
            make_gp=make_gp, cost=cfg.cost,
        )

    return body


def _tiled_level_fn(bs: int, ss: int, cfg: MotionConfig, full_h: int, halo: int, axis: str):
    """Builds the per-device level body (search + regularization schedule)."""

    def body(im1_t: jnp.ndarray, im2_t: jnp.ndarray, pred_t: jnp.ndarray) -> jnp.ndarray:
        ht = im1_t.shape[0]
        row0 = jax.lax.axis_index(axis).astype(jnp.int32) * ht
        im2_buf = _exchange_rows(im2_t, halo, axis)
        im2_row0 = row0 - halo

        def make_gp(g):
            # refresh the 1-block-row MV halo before each color step
            gh = _exchange_rows(g, 1, axis)  # (north, local, south) rows
            return jnp.pad(gh, ((0, 1), (1, 2), (0, 0)))

        def rival_extend(g):
            # rows from neighbor tiles; columns are untiled here -> edge pad
            gr = _exchange_rows_edge(g, axis)
            return jnp.pad(gr, ((0, 0), (1, 1), (0, 0)), mode="edge")

        if cfg.uses_fused_windowed:
            from blockbasedmotionestimation_tpu.ops.windowed import windowed_level

            return windowed_level(
                im1_t, im2_buf, pred_t, bs, ss,
                float(bs) * cfg.lambda_scale, cfg.sweeps_per_round,
                cost=cfg.cost, full_h=full_h, row0=row0, im2_row0=im2_row0,
                make_gp=make_gp, impl=cfg.search_impl,
                rival=cfg.rival_window, rival_extend=rival_extend,
                rival_radius=cfg.rival_radius,
            )

        grid = block_search_level(
            im1_t, im2_buf, pred_t, bs, ss,
            full_h=full_h, row0=row0, im2_row0=im2_row0, impl=cfg.search_impl,
            order=cfg.search_order, cost=cfg.cost,
        )

        lam0 = float(bs) * cfg.lambda_scale
        if cfg.regularizer == "windowed":
            from blockbasedmotionestimation_tpu.ops.windowed import windowed_schedule

            return windowed_schedule(
                im1_t, im2_buf, grid, bs, ss, lam0, cfg.sweeps_per_round,
                cost=cfg.cost, reg_radius=cfg.reg_radius,
                full_h=full_h, row0=row0, im2_row0=im2_row0, make_gp=make_gp,
                impl=cfg.search_impl,
                rival=cfg.rival_window, rival_extend=rival_extend,
                rival_radius=cfg.rival_radius,
            )
        return reg.run_schedule(
            im1_t, im2_buf, grid, bs, lam0, cfg.sweeps_per_round, cfg.regularizer,
            full_h=full_h, row0=row0, im2_row0=im2_row0, make_gp=make_gp,
            cost=cfg.cost,
        )

    return body


def _level_shardable(h: int, w: int, bs: int, t: int) -> bool:
    """Rows must tile evenly into block-aligned strips.

    Odd local block-row counts are fine: the color steps index each tile's
    local rows with a per-tile parity offset ``(ci + row0_b) % 2``, so
    global == local color alignment no longer constrains the strip height
    (r2 required an even count, which padded 1080p/8-way from 1280 to 1536
    rows - a +20% level-0 tax)."""
    return h % (t * bs) == 0


@functools.partial(jax.jit, static_argnames=("cfg", "mesh", "axis", "axis_x"))
def estimate_flow_padded_tiled(
    im1p: jnp.ndarray,
    im2p: jnp.ndarray,
    cfg: MotionConfig,
    mesh: Mesh,
    axis: str = "ty",
    axis_x: str | None = None,
) -> jnp.ndarray:
    """Spatially tiled, halo-exchanged engine on pre-padded frames.

    Rows shard over ``axis``; with ``axis_x`` set, columns also shard over
    that mesh axis (2-D ty x tx tiling - the reference's own parallel split
    is by columns, ``parallel.h:20-58``).  Bit-identical to
    ``engine.estimate_flow_padded`` in fourcolor/jacobi/windowed modes.
    "exact" (whole-frame raster Gauss-Seidel) does not decompose across
    tiles and is rejected explicitly rather than silently degraded.
    Returns the dense (H', W', 2) flow, sharded over the spatial axes.
    """
    if cfg.regularizer == "exact":
        raise ValueError(
            "regularizer='exact' is a whole-frame raster sweep and cannot be "
            "row-tiled; use estimate_flow_padded, or fourcolor/windowed here"
        )
    t = mesh.shape[axis]
    tx = mesh.shape[axis_x] if axis_x is not None else 1
    levels = cfg.num_levels
    pyr1 = resample.build_pyramid(im1p, levels)
    pyr2 = resample.build_pyramid(im2p, levels)

    dense = None
    for level in range(levels - 1, -1, -1):
        im1, im2 = pyr1[level], pyr2[level]
        h, w = im1.shape
        bs, ss = cfg.block_sizes[level], cfg.search_sizes[level]
        if dense is None:
            pred = jnp.zeros((h // bs, w // bs, 2), dtype=jnp.float32)
        else:
            pred = engine.transfer_mvs(dense, cfg.block_sizes[level + 1], bs)
            if cfg.mv_cap is not None:  # identical clamp to the untiled engine
                pred = jnp.clip(pred, -float(cfg.mv_cap), float(cfg.mv_cap))

        halo = im2_halo(cfg, level)
        rows_ok = _level_shardable(h, w, bs, t) and halo < h // t
        cols_ok = (
            axis_x is not None
            and _level_shardable(w, h, bs, tx)
            and halo < w // tx
        )
        if rows_ok and cols_ok:
            sharding = NamedSharding(mesh, P(axis, axis_x))
            im1 = jax.lax.with_sharding_constraint(im1, sharding)
            im2 = jax.lax.with_sharding_constraint(im2, sharding)
            body = _tiled_level_fn_2d(bs, ss, cfg, h, w, halo, axis, axis_x)
            dense = shard_map(
                body,
                mesh=mesh,
                in_specs=(
                    P(axis, axis_x), P(axis, axis_x), P(axis, axis_x, None),
                ),
                out_specs=P(axis, axis_x, None),
                check_vma=False,
            )(im1, im2, pred)
        elif rows_ok:
            row_sharding = NamedSharding(mesh, P(axis, None))
            im1 = jax.lax.with_sharding_constraint(im1, row_sharding)
            im2 = jax.lax.with_sharding_constraint(im2, row_sharding)
            body = _tiled_level_fn(bs, ss, cfg, h, halo, axis)
            dense = shard_map(
                body,
                mesh=mesh,
                in_specs=(P(axis, None), P(axis, None), P(axis, None, None)),
                out_specs=P(axis, None, None),
                check_vma=False,
            )(im1, im2, pred)
        else:
            # level too small to tile: run it replicated (coarse levels are tiny)
            dense = engine._run_level(im1, im2, pred, bs, ss, cfg)
    return dense


@functools.partial(
    jax.jit, static_argnames=("cfg", "mesh", "batch_axis", "axis")
)
def estimate_flow_padded_batch_tiled(
    im1s: jnp.ndarray,
    im2s: jnp.ndarray,
    cfg: MotionConfig,
    mesh: Mesh,
    batch_axis: str = "batch",
    axis: str = "ty",
) -> jnp.ndarray:
    """ONE jitted program sharding BOTH parallel dimensions: frame pairs over
    ``batch_axis`` (DCN across hosts) and rows over ``axis`` (halo exchange
    on ICI) - the layout ``multihost.make_mesh`` builds.  Per device: a local
    batch chunk of local row strips; the per-frame tiled level body is
    vmapped over the chunk, so the ppermute halo exchanges batch together.

    im1s/im2s: (B, H', W') pre-padded uint8, B divisible by the batch axis.
    Returns (B, H', W', 2) flow sharded (batch, rows).
    """
    if cfg.regularizer == "exact":
        raise ValueError(
            "regularizer='exact' is a whole-frame raster sweep and cannot be "
            "row-tiled; use engine.estimate_flow_batched, or fourcolor/"
            "windowed here"
        )
    t = mesh.shape[axis]
    levels = cfg.num_levels
    pyr1 = [im1s]
    pyr2 = [im2s]
    for _ in range(1, levels):
        pyr1.append(jax.vmap(resample.pyrdown_u8)(pyr1[-1]))
        pyr2.append(jax.vmap(resample.pyrdown_u8)(pyr2[-1]))

    bt_sharding = NamedSharding(mesh, P(batch_axis, axis, None))

    dense = None
    for level in range(levels - 1, -1, -1):
        im1, im2 = pyr1[level], pyr2[level]
        h, w = im1.shape[1:]
        bs, ss = cfg.block_sizes[level], cfg.search_sizes[level]
        if dense is None:
            b = im1.shape[0]
            pred = jnp.zeros((b, h // bs, w // bs, 2), dtype=jnp.float32)
        else:
            pred = jax.vmap(
                lambda d: engine.transfer_mvs(d, cfg.block_sizes[level + 1], bs)
            )(dense)
            if cfg.mv_cap is not None:
                pred = jnp.clip(pred, -float(cfg.mv_cap), float(cfg.mv_cap))

        halo = im2_halo(cfg, level)
        if _level_shardable(h, w, bs, t) and halo < h // t:
            im1 = jax.lax.with_sharding_constraint(im1, bt_sharding)
            im2 = jax.lax.with_sharding_constraint(im2, bt_sharding)
            body = _tiled_level_fn(bs, ss, cfg, h, halo, axis)
            dense = shard_map(
                jax.vmap(body),
                mesh=mesh,
                in_specs=(
                    P(batch_axis, axis, None),
                    P(batch_axis, axis, None),
                    P(batch_axis, axis, None, None),
                ),
                out_specs=P(batch_axis, axis, None, None),
                check_vma=False,
            )(im1, im2, pred)
        else:
            # level too small to row-tile: batch-parallel only
            im1 = jax.lax.with_sharding_constraint(
                im1, NamedSharding(mesh, P(batch_axis, None, None))
            )
            dense = jax.vmap(
                lambda a, b, p: engine._run_level(a, b, p, bs, ss, cfg)
            )(im1, im2, pred)
    return dense


def estimate_flow_batch(
    im1s: jnp.ndarray,
    im2s: jnp.ndarray,
    cfg: MotionConfig,
    mesh: Mesh,
    batch_axis: str = "batch",
) -> jnp.ndarray:
    """Data-parallel driver over a batch of frame pairs (B, H, W) uint8.

    Returns (B, H, W, 2) float32 original-resolution flow, batch-sharded.
    """
    sharding = NamedSharding(mesh, P(batch_axis, None, None))
    im1s = jax.device_put(im1s, sharding)
    im2s = jax.device_put(im2s, sharding)

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def run(a, b, cfg):
        return jax.vmap(lambda x, y: engine._driver_jit(x, y, cfg))(a, b)

    return run(im1s, im2s, cfg)

"""Vectorized block search: the reference's spiral walk as a cost-volume argmin.

The reference's hot kernel (``motion_framework.cpp:296-422``) walks a square
spiral around the predicted block position, keeping the first strictly-smaller
SAD.  On TPU we evaluate the full (2S+1)^2 SAD cost volume for every block in
one batched pass and scan the offsets *in spiral-visit order* with a strict-<
argmin update - bit-identical to the sequential walk:

  * out-of-bounds offsets are skipped in the walk but still advance the cursor
    (``:335-336``), so masking them to +INT_MAX preserves semantics;
  * a predicted center that is itself out of bounds short-circuits to the
    source position, i.e. a zero MV (``:304-310``);
  * the strict-< update means min SAD with earliest-visit tie-break, which the
    in-order scan reproduces exactly.

Tiling support: when the frame is row-sharded across a device mesh, each
device calls this with its local im1 tile, an im2 buffer that includes halo
rows from its neighbors, and traced row offsets locating the tile in the
global frame.  All bounds checks use global coordinates, so tiled == untiled
bit-for-bit (given a sufficient halo, see ``parallel/tiled.py``).

This module is the XLA implementation (``search_impl="xla"``); the Pallas
kernel in ``kernels/`` computes the same volume with explicit VMEM residency.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from blockbasedmotionestimation_tpu.ops.spiral import spiral_offsets

_I32_MAX = np.int32(np.iinfo(np.int32).max)


def extract_blocks(image: jnp.ndarray, bs: int) -> jnp.ndarray:
    """(H, W) -> (nby*nbx, bs, bs) row-major block grid."""
    h, w = image.shape
    nby, nbx = h // bs, w // bs
    return (
        image.reshape(nby, bs, nbx, bs).transpose(0, 2, 1, 3).reshape(nby * nbx, bs, bs)
    )


def _gather_windows(
    im2: jnp.ndarray, by: jnp.ndarray, bx: jnp.ndarray, bs: int, ext: int
):
    """Per-block (bs+2S, bs+2S) windows whose top-left is (by, bx) in im2-buffer
    coords; im2 is padded by S so any center inside the buffer slices cleanly."""
    im2p = jnp.pad(im2, ((ext, ext), (ext, ext)), constant_values=0)
    win = bs + 2 * ext

    def one(y, x):
        return jax.lax.dynamic_slice(im2p, (y, x), (win, win))

    return jax.vmap(one)(by, bx)  # (nblk, win, win) uint8


@partial(jax.jit, static_argnames=("bs", "ss", "full_h", "impl"))
def block_search_level(
    im1: jnp.ndarray,
    im2: jnp.ndarray,
    pred: jnp.ndarray,
    bs: int,
    ss: int,
    full_h: int | None = None,
    row0: jnp.ndarray | int = 0,
    im2_row0: jnp.ndarray | int = 0,
    impl: str = "xla",
) -> jnp.ndarray:
    """One ``calcLevelBM`` sweep (``motion_framework.cpp:226-244``).

    Args:
      im1: (Ht, W) uint8 tile of frame 1 (whole frame in the untiled case).
      im2: (Hb, W) uint8 frame-2 buffer covering the tile plus search halo
        (columns always span the full frame width).
      pred: (nby, nbx, 2) float32 predicted MVs (u, v) at block origins.
      bs, ss: block and search sizes; shift = ss - bs.
      full_h: global frame height for bounds checks (None -> im1 is whole).
      row0: global pixel row of im1's first row (traced; device-dependent
        under shard_map).
      im2_row0: global pixel row of the im2 buffer's first row (<= row0 when
        the buffer carries a north halo).

    Returns:
      (nby, nbx, 2) float32 winning MVs (integer-valued).
    """
    ht, w = im1.shape
    h = ht if full_h is None else full_h
    nby, nbx = ht // bs, w // bs
    nblk = nby * nbx
    shift = ss - bs
    dys, dxs, ext = spiral_offsets(shift)

    row0 = jnp.asarray(row0, dtype=jnp.int32)
    im2_row0 = jnp.asarray(im2_row0, dtype=jnp.int32)
    # global block origins
    oy = (row0 + jnp.arange(nby, dtype=jnp.int32) * bs)[:, None]  # (nby, 1)
    ox = (jnp.arange(nbx, dtype=jnp.int32) * bs)[None, :]  # (1, nbx)
    # (int) truncation toward zero of the propagated MV (:233-234)
    cu = pred[..., 0].astype(jnp.int32)
    cv = pred[..., 1].astype(jnp.int32)
    cy = oy + cv  # predicted center rows (global), (nby, nbx)
    cx = ox + cu
    # zero-MV early-out: center block not fully inside the image (:304-310)
    center_ok = (cy >= 0) & (cy <= h - bs) & (cx >= 0) & (cx <= w - bs)
    cy_safe = jnp.where(center_ok, cy, jnp.broadcast_to(oy, (nby, nbx))).reshape(nblk)
    cx_safe = jnp.where(center_ok, cx, jnp.broadcast_to(ox, (nby, nbx))).reshape(nblk)

    blocks = extract_blocks(im1, bs).astype(jnp.int16)  # (nblk, bs, bs)
    # window top-left in im2-buffer coords; clamp so an undersized halo cannot
    # slip out of the buffer (correctness then relies on the halo bound)
    by = jnp.clip(cy_safe - im2_row0, 0, im2.shape[0] - bs)
    windows = _gather_windows(im2, by, cx_safe, bs, ext).astype(jnp.int16)

    if impl in ("pallas", "pallas_interpret"):
        from blockbasedmotionestimation_tpu.kernels.sad_search import sad_spiral_argmin

        best_dy, best_dx = sad_spiral_argmin(
            blocks, windows, cy_safe, cx_safe, bs, ss, h, w,
            interpret=(impl == "pallas_interpret"),
        )
    elif impl == "xla":

        def step(carry, off):
            best_sad, best_dy, best_dx = carry
            dy, dx = off
            win = jax.lax.dynamic_slice(windows, (0, dy, dx), (nblk, bs, bs))
            sad = jnp.sum(
                jnp.abs(blocks - win), axis=(1, 2), dtype=jnp.int32
            )  # cv::norm NORM_L1 (:315)
            ty = cy_safe + (dy - ext)
            tx = cx_safe + (dx - ext)
            ok = (ty >= 0) & (ty <= h - bs) & (tx >= 0) & (tx <= w - bs)
            sad = jnp.where(ok, sad, _I32_MAX)
            better = sad < best_sad  # strict <: first visit wins ties
            return (
                jnp.where(better, sad, best_sad),
                jnp.where(better, dy, best_dy),
                jnp.where(better, dx, best_dx),
            ), None

        init = (
            jnp.full((nblk,), _I32_MAX, dtype=jnp.int32),
            jnp.full((nblk,), ext, dtype=jnp.int32),  # center offset (rank 0)
            jnp.full((nblk,), ext, dtype=jnp.int32),
        )
        offs = (jnp.asarray(dys + ext), jnp.asarray(dxs + ext))
        (_, best_dy, best_dx), _ = jax.lax.scan(step, init, offs)
    else:
        raise ValueError(f"unknown search impl: {impl}")

    win_y = (cy_safe + best_dy - ext).reshape(nby, nbx)
    win_x = (cx_safe + best_dx - ext).reshape(nby, nbx)
    u = (win_x - ox).astype(jnp.float32)
    v = (win_y - oy).astype(jnp.float32)
    u = jnp.where(center_ok, u, 0.0)
    v = jnp.where(center_ok, v, 0.0)
    return jnp.stack([u, v], axis=-1)

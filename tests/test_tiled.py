"""Tiled (multi-device) engine correctness on a forced-8-device CPU mesh.

The key property: row tiling + halo exchange must be NUMERICALLY INVISIBLE -
the tiled fourcolor/jacobi pipeline equals the untiled one bit for bit,
because every bounds check is global and the halos cover the worst-case MV
reach (SURVEY.md section 5, long-context analogue).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from blockbasedmotionestimation_tpu.config import MotionConfig
from blockbasedmotionestimation_tpu.models import engine
from blockbasedmotionestimation_tpu.parallel import tiled


def _mesh(names=("ty",), shape=None):
    devs = np.array(jax.devices())
    if shape is None:
        shape = (len(devs),)
    return Mesh(devs.reshape(shape), names)


def _pair(rng, h, w, dy=2, dx=-3, margin=16):
    base = rng.integers(0, 256, size=(h + 2 * margin, w + 2 * margin), dtype=np.uint8)
    im1 = base[margin : margin + h, margin : margin + w]
    im2 = base[margin + dy : margin + dy + h, margin + dx : margin + dx + w]
    return im1, im2


def test_mv_bound_recursion():
    cfg = MotionConfig()  # 4 levels, shift 32 -> extents 16
    assert tiled.mv_bound(cfg, 3) == 16
    assert tiled.mv_bound(cfg, 2) == 48
    assert tiled.mv_bound(cfg, 1) == 112
    assert tiled.mv_bound(cfg, 0) == 240


@pytest.mark.parametrize("mode", ["fourcolor", "jacobi"])
def test_tiled_equals_untiled(rng, mode):
    # 128 rows over 8 devices = 16-row tiles; bs 4 -> 4 block rows per tile
    # (even, preserving color parity); halo bound = 6 < 16.
    cfg = MotionConfig(
        block_sizes=(4, 4), search_sizes=(6, 6), interp_factor=1, regularizer=mode
    )
    im1, im2 = _pair(rng, 128, 64, dy=1, dx=-1)
    mesh = _mesh()

    want = np.asarray(engine.estimate_flow_padded(im1, im2, cfg))
    got = np.asarray(tiled.estimate_flow_padded_tiled(im1, im2, cfg, mesh))
    np.testing.assert_array_equal(got, want)


def test_tiled_coarse_fallback_equals_untiled(rng):
    # second level is 64 rows / 8 devices = 8 rows = 2 block rows (even) but
    # halo (14) > tile rows (8): the coarse level must fall back to replicated
    # execution and still match.
    cfg = MotionConfig(
        block_sizes=(4, 4), search_sizes=(10, 10), interp_factor=1,
        regularizer="fourcolor",
    )
    im1, im2 = _pair(rng, 128, 64, dy=2, dx=1)
    mesh = _mesh()
    want = np.asarray(engine.estimate_flow_padded(im1, im2, cfg))
    got = np.asarray(tiled.estimate_flow_padded_tiled(im1, im2, cfg, mesh))
    np.testing.assert_array_equal(got, want)


def test_batch_sharded_matches_single(rng):
    cfg = MotionConfig(
        block_sizes=(4,), search_sizes=(8,), interp_factor=1, regularizer="fourcolor"
    )
    mesh = _mesh(("batch",))
    pairs = [_pair(rng, 32, 48, dy=d % 3, dx=-(d % 2)) for d in range(8)]
    im1s = np.stack([p[0] for p in pairs])
    im2s = np.stack([p[1] for p in pairs])

    batched = np.asarray(tiled.estimate_flow_batch(im1s, im2s, cfg, mesh))
    for b in range(8):
        single = np.asarray(engine.estimate_flow_driver(im1s[b], im2s[b], cfg))
        np.testing.assert_array_equal(batched[b], single)

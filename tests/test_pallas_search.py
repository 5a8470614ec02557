"""Pallas SAD search kernel vs the XLA scan (interpret mode on CPU)."""

import numpy as np
import pytest

from blockbasedmotionestimation_tpu.ops.search import block_search_level


def _pair(rng, h, w, dy=2, dx=-3, margin=8):
    base = rng.integers(0, 256, size=(h + 2 * margin, w + 2 * margin), dtype=np.uint8)
    return (
        base[margin : margin + h, margin : margin + w],
        base[margin + dy : margin + dy + h, margin + dx : margin + dx + w],
    )


@pytest.mark.parametrize("bs,ss", [(4, 8), (8, 16), (4, 12)])
def test_pallas_matches_xla(rng, bs, ss):
    h, w = 32, 40
    im1, im2 = _pair(rng, h, w)
    nby, nbx = h // bs, w // bs
    pred = rng.integers(-5, 6, size=(nby, nbx, 2)).astype(np.float32)
    pred[0, 0] = (999.0, 999.0)  # zero-MV early-out path

    want = np.asarray(block_search_level(im1, im2, pred, bs, ss, impl="xla"))
    got = np.asarray(
        block_search_level(im1, im2, pred, bs, ss, impl="pallas_interpret")
    )
    np.testing.assert_array_equal(got, want)


def test_pallas_chunk_padding(rng):
    # nblk not a multiple of the block chunk exercises the pad/unpad path
    h, w = 24, 40  # 6x10 = 60 blocks at bs=4
    im1, im2 = _pair(rng, h, w)
    pred = np.zeros((6, 10, 2), dtype=np.float32)
    want = np.asarray(block_search_level(im1, im2, pred, 4, 8, impl="xla"))
    got = np.asarray(block_search_level(im1, im2, pred, 4, 8, impl="pallas_interpret"))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("win", [8, 16])
def test_gather_windows_dma_interpret(rng, win):
    # the production TPU window gather (8 row-shifted copies + aligned DMA
    # superwindows + MXU one-hot column extract, kernels/gather.py) is
    # unreachable on the CPU suite's XLA path; interpret mode checks its
    # index math against the vmapped dynamic_slice formulation over
    # randomized offsets, including the four extreme corners and offsets
    # straddling the 128-column superwindow boundary
    import jax
    import jax.numpy as jnp
    from blockbasedmotionestimation_tpu.kernels.gather import gather_windows_dma

    h, w, n = 64, 300, 21  # n not a multiple of the 16-window grid step
    im = jnp.asarray(rng.integers(0, 256, size=(h, w), dtype=np.uint8))
    by = rng.integers(0, h - win + 1, size=n).astype(np.int32)
    bx = rng.integers(0, w - win + 1, size=n).astype(np.int32)
    by[0], bx[0] = 0, 0
    by[1], bx[1] = h - win, w - win
    by[2], bx[2] = 0, w - win
    by[3], bx[3] = h - win, 0
    bx[4] = 128 - win // 2  # straddles the first 128-column boundary
    got = np.asarray(
        gather_windows_dma(im, jnp.asarray(by), jnp.asarray(bx), win, interpret=True)
    )
    want = np.asarray(
        jax.vmap(lambda y, x: jax.lax.dynamic_slice(im, (y, x), (win, win)))(
            jnp.asarray(by), jnp.asarray(bx)
        )
    )
    np.testing.assert_array_equal(got, want)

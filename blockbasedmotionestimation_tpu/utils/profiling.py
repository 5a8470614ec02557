"""Tracing and performance accounting.

The reference's entire observability is one wall-clock print
(``main_class.cpp:47-55``).  Here:

  * ``phase`` - a context-manager timer with a device-sync barrier (remote
    async backends do not drain on ``block_until_ready``; only a scalar
    fetch is a true barrier, so the timer takes the arrays to sync on);
  * ``trace`` - jax.profiler wrapper writing a TensorBoard/perfetto trace;
  * ``speed_of_light`` - roofline accounting for the block-search SAD kernel
    (useful-ops vs measured time).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax
import numpy as np


def sync(*arrays) -> None:
    """True execution barrier: scalar device->host fetch per array."""
    for a in arrays:
        np.asarray(jax.numpy.ravel(a)[0])


@dataclass
class PhaseTimes:
    times: dict = field(default_factory=dict)

    def report(self) -> str:
        total = sum(self.times.values())
        lines = [f"{name:<28} {t*1000:9.2f} ms" for name, t in self.times.items()]
        lines.append(f"{'total':<28} {total*1000:9.2f} ms")
        return "\n".join(lines)


@contextlib.contextmanager
def phase(name: str, times: PhaseTimes, *sync_arrays):
    t0 = time.time()
    try:
        yield
    finally:
        if sync_arrays:
            sync(*sync_arrays)
        times.times[name] = times.times.get(name, 0.0) + (time.time() - t0)


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace around a block (view in TensorBoard/perfetto)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def search_sad_ops(h: int, w: int, bs: int, ss: int) -> int:
    """Useful absdiff ops of one level's full spiral search."""
    from blockbasedmotionestimation_tpu.ops.spiral import spiral_extent

    ext = spiral_extent(ss - bs)
    nblk = (h // bs) * (w // bs)
    return nblk * (2 * ext + 1) ** 2 * bs * bs


def speed_of_light(
    h: int, w: int, bs: int, ss: int, seconds: float,
    vpu_ops_per_sec: float = 2.0e12,
) -> dict:
    """Roofline summary for one search level: achieved vs nominal VPU rate."""
    ops = search_sad_ops(h, w, bs, ss)
    achieved = ops / max(seconds, 1e-12)
    return {
        "useful_ops": ops,
        "achieved_ops_per_sec": achieved,
        "fraction_of_nominal": achieved / vpu_ops_per_sec,
    }


def windowed_pipeline_floor(
    cfg,
    padded_h: int,
    padded_w: int,
    vpu_ops_per_sec: float = 2.0e12,
    hbm_bytes_per_sec: float = 8.1e11,
) -> dict:
    """Structural per-field floor of the fused windowed pipeline (seconds).

    Two independent lower bounds, per pyramid level (see DESIGN.md section 7):

    * VPU int-ops: the pooled cost-volume diff pass evaluates every pixel of
      the level against every delta in the (2R+1)^2 square — ~4 int ops per
      (pixel, delta): subtract, |.|, accumulate into the cur=2 cell, plus
      amortized deeper pooling.  This work is irreducible for an exhaustive
      (2R+1)^2 SAD family.
    * HBM traffic: each round's cost volume (entries = (2R+1)^2 blocks at
      that granularity, u16 below the i32 overflow size) is written once by
      the build and read once per regularization sweep by the color steps.

    floor = max(vpu, hbm); both are optimistic (no dispatch, no windows/
    image traffic, perfect overlap), so measured/floor < 1 always.
    """
    from blockbasedmotionestimation_tpu.ops.spiral import spiral_extent

    vpu_ops = 0
    hbm_bytes = 0
    for level in range(cfg.num_levels):
        h = padded_h >> level
        w = padded_w >> level
        bs = cfg.block_sizes[level]
        r = spiral_extent(cfg.search_sizes[level] - bs)
        side2 = (2 * r + 1) ** 2
        vpu_ops += 4 * side2 * h * w
        cur = bs
        while cur >= 2:
            peak = (255 * 255 if cfg.cost == "ssd" else 255) * cur * cur
            nbytes = 2 if peak < (1 << 16) else 4
            entries = side2 * (h // cur) * (w // cur)
            hbm_bytes += entries * nbytes * (1 + cfg.sweeps_per_round)
            cur >>= 1
    vpu_s = vpu_ops / vpu_ops_per_sec
    hbm_s = hbm_bytes / hbm_bytes_per_sec
    return {
        "vpu_ops": vpu_ops,
        "hbm_bytes": hbm_bytes,
        "vpu_s": vpu_s,
        "hbm_s": hbm_s,
        "floor_s": max(vpu_s, hbm_s),
    }

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

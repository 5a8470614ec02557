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


def windowed_pipeline_roofline(
    cfg,
    padded_h: int,
    padded_w: int,
    vpu_ops_per_sec: float = 2.0e12,
    hbm_bytes_per_sec: float = 8.1e11,
) -> dict:
    """PER-COMPONENT structural floor of the fused windowed pipeline.

    ``windowed_pipeline_floor`` bounded only the CV build ops and CV
    read/write traffic; the r3 ablation (DESIGN.md section 7c: cost loops
    skipped, pipeline still at 25.3 ms/field vs the 9.38 ms floor) proved
    ~16 ms/field of color-step/search/gather work lived OUTSIDE that model.
    This itemizes every stage so a per-op trace can be checked term by term
    (``scripts/tpu_roofline_audit.py`` writes the comparison into FLOOR.md).

    Components (all per field; floors assume perfect overlap of VPU and DMA
    within a component, so each term is max(vpu, hbm)):

      pyramid       pyrDown levels: 2 separable 5-tap passes per output px.
      gather        per-level window fetch: u8 window bytes written + the
                    row-shifted staging copies + bf16 column extract
                    (kernels/gather.py); rival adds its second gather.
      cv_build      the pooled diff pass: ~4 VPU int-ops per (pixel, delta)
                    (sub, |.|, acc, amortized pooling) + every volume
                    written once.
      search        lexicographic (cost, spiral-rank) argmin over the
                    cur == bs volume: 2 read passes + 2 ops/entry.
      cv_stream     color steps reading the dense volumes: each sweep's 4
                    colors together stream each round's volume once.
      step_operands color-step slab traffic besides the CV: candidate MVs
                    (9 x 2 i32), present/rank masks, parent MVs, winner
                    write-back, and the XLA-side candidate-slab build
                    (~9 grid reads + slab write per cell per step).
      step_compute  9-candidate energy: smoothness (9x2 L1 terms), energy
                    add, masked lexicographic winner ~ 60 ops/cell.
      rival         rival pick + second window slab streamed per fused
                    color step (hybrid kernel reads patches + rival slab
                    per step; recompute loops are data-dependent, floor 0).
      mv_bookkeeping subdivide/transfer: each round's grid written x2.

    Returns {component: {vpu_s, hbm_s, floor_s}, total_floor_s, ...}.
    """
    from blockbasedmotionestimation_tpu.ops.spiral import spiral_extent

    comp = {}

    def add(name, vpu_ops=0.0, hbm_bytes=0.0):
        c = comp.setdefault(name, {"vpu_ops": 0.0, "hbm_bytes": 0.0})
        c["vpu_ops"] += vpu_ops
        c["hbm_bytes"] += hbm_bytes

    sweeps = cfg.sweeps_per_round
    for level in range(cfg.num_levels):
        h = padded_h >> level
        w = padded_w >> level
        bs = cfg.block_sizes[level]
        ext = spiral_extent(cfg.search_sizes[level] - bs)
        side = 2 * ext + 1
        side2 = side * side
        nblk = (h // bs) * (w // bs)
        win = bs + 2 * ext

        if level + 1 < cfg.num_levels:
            add("pyramid", vpu_ops=20 * (h * w) // 4,
                hbm_bytes=h * w + (h * w) // 4)

        # window gather: staging copies (8 row-shifted u8 images written
        # once) amortize over the level; per window: superwindow DMA write
        # (u8) + bf16 extract read+write
        add(
            "gather",
            hbm_bytes=16 * h * w + nblk * win * win * (1 + 2 + 2),
        )

        # CV build: diff+pool VPU ops + all volumes written once
        add("cv_build", vpu_ops=4 * side2 * h * w)
        store = getattr(cfg, "cv_store_radius", None)
        cur = bs
        while cur >= 2:
            peak = (255 * 255 if cfg.cost == "ssd" else 255) * cur * cur
            nbytes = 2 if peak < (1 << 16) else 4
            entries = side2 * (h // cur) * (w // cur)
            if cur == 2 and store is not None and store < ext:
                # r_store: the cur=2 volume keeps a dx band only
                entries = entries * (2 * store + 1) // side
            add("cv_build", hbm_bytes=entries * nbytes)
            if cur < bs:
                # each sweep's 4 colors stream the round's volume once
                add("cv_stream", hbm_bytes=entries * nbytes * sweeps)
            cur >>= 1

        # search argmin over the cur == bs volume (i32): min + rank-min
        add("search", vpu_ops=2 * side2 * nblk,
            hbm_bytes=2 * side2 * nblk * 4)

        # per-round color-step operands + compute (+ rival slabs)
        rr_lvl = cfg.rival_radius_at(level)
        rr = ext if rr_lvl is None else min(rr_lvl, ext)
        rwin = bs + 2 * rr
        if cfg.rival_window:
            add("rival", hbm_bytes=nblk * rwin * rwin * (1 + 2 + 2))
            # rival CV build (deep_pooled_cvs): pixel-level diffs over all
            # (2*rr+1)^2 rival deltas, same 4-op model as the main build
            # (its own component so the audit can map it onto the trace's
            # deep_pooled group, which lands in cv_build)
            add("rival_build", vpu_ops=4 * (2 * rr + 1) ** 2 * h * w)
        cur = bs
        while cur > 1:
            cells = (h // cur) * (w // cur)  # per color step: cells/4
            steps = 4 * sweeps
            add("step_operands",
                hbm_bytes=steps * (cells // 4) * (136 + 80))
            add("step_compute", vpu_ops=steps * (cells // 4) * 60)
            if cfg.rival_window:
                # hybrid kernel streams patches + rival slab every step
                add("rival",
                    hbm_bytes=steps * nblk * (bs * bs + rwin * rwin) * 2)
            if cur == 2 and store is not None and store < ext:
                # r_store: the cur=2 steps also stream the MAIN window
                # slab for the tail recompute
                add("rival", hbm_bytes=steps * nblk * win * win * 2)
            cur >>= 1
            add("mv_bookkeeping", hbm_bytes=2 * cells * 8)

    out = {}
    total = 0.0
    for name, c in comp.items():
        vpu_s = c["vpu_ops"] / vpu_ops_per_sec
        hbm_s = c["hbm_bytes"] / hbm_bytes_per_sec
        floor_s = max(vpu_s, hbm_s)
        out[name] = {
            "vpu_s": vpu_s, "hbm_s": hbm_s, "floor_s": floor_s,
            "vpu_ops": c["vpu_ops"], "hbm_bytes": c["hbm_bytes"],
        }
        total += floor_s
    return {"components": out, "total_floor_s": total}


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

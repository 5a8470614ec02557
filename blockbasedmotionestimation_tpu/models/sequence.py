"""Multi-frame sequence runner with frame-granular checkpoint/resume.

The reference is a one-pair batch program whose only persistence is the
``.flo`` writer (``rw_flow.cpp:139-200``).  Production runs are sequences:
this runner estimates flow for every consecutive frame pair, writes one
``.flo`` (the checkpoint unit) per pair, skips pairs whose output already
exists (resume after interruption), and emits a structured per-pair report -
the observability the reference lacks (SURVEY.md section 5).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Callable, Sequence

import numpy as np

from blockbasedmotionestimation_tpu.config import MotionConfig
from blockbasedmotionestimation_tpu.models.engine import (
    estimate_flow_driver,
    estimate_flow_driver_batched,
)
from blockbasedmotionestimation_tpu.utils import flowio


@dataclasses.dataclass
class PairResult:
    index: int
    out_path: str
    seconds: float
    skipped: bool  # already present -> resumed past it


def flo_name(index: int) -> str:
    return f"flow{index:05d}.flo"


def run_sequence(
    frames: Sequence[np.ndarray] | Sequence[str],
    out_dir: str | os.PathLike,
    cfg: MotionConfig,
    progress: Callable[[PairResult], None] | None = None,
    write_report: bool = True,
    batch_size: int = 1,
) -> list[PairResult]:
    """Estimate flow for every consecutive pair, checkpointing per pair.

    frames: list of (H, W) uint8 arrays or image paths (read as grayscale).
    Existing outputs in out_dir are trusted and skipped (resume semantics);
    delete them to force recompute.  batch_size > 1 groups pending pairs
    into one vmapped device program (throughput mode; the checkpoint unit
    stays one .flo per pair).
    """
    out_dir = os.fspath(out_dir)
    os.makedirs(out_dir, exist_ok=True)

    def load(i: int) -> np.ndarray:
        f = frames[i]
        return flowio.read_gray(f) if isinstance(f, (str, os.PathLike)) else np.asarray(f)

    def write_checkpoint(i: int, flow: np.ndarray, path: str) -> None:
        tmp = path[: -len(".flo")] + ".tmp.flo"
        flowio.write_flo(tmp, flow)
        os.replace(tmp, path)  # atomic: no torn checkpoints on interrupt

    results: list[PairResult] = []
    pending: list[tuple[int, str]] = []

    def flush_pending() -> None:
        if not pending:
            return
        t0 = time.time()
        if len(pending) == 1:
            i, path = pending[0]
            flows = [np.asarray(estimate_flow_driver(load(i), load(i + 1), cfg))]
        else:
            a = np.stack([load(i) for i, _ in pending])
            b = np.stack([load(i + 1) for i, _ in pending])
            flows = np.asarray(estimate_flow_driver_batched(a, b, cfg))
        per = (time.time() - t0) / len(pending)
        for (i, path), flow in zip(pending, flows):
            write_checkpoint(i, np.asarray(flow), path)
            r = PairResult(index=i, out_path=path, seconds=per, skipped=False)
            results.append(r)
            if progress is not None:
                progress(r)
        pending.clear()

    for i in range(len(frames) - 1):
        path = os.path.join(out_dir, flo_name(i))
        if os.path.exists(path):
            flush_pending()
            r = PairResult(index=i, out_path=path, seconds=0.0, skipped=True)
            results.append(r)
            if progress is not None:
                progress(r)
        else:
            pending.append((i, path))
            if len(pending) >= max(1, batch_size):
                flush_pending()
    flush_pending()
    results.sort(key=lambda r: r.index)

    if write_report:
        done = [r for r in results if not r.skipped]
        report = {
            "pairs": len(results),
            "computed": len(done),
            "resumed": len(results) - len(done),
            "total_seconds": round(sum(r.seconds for r in done), 3),
            "pairs_per_sec": (
                round(len(done) / max(sum(r.seconds for r in done), 1e-9), 4)
                if done else None
            ),
            "config": {
                "block_sizes": list(cfg.block_sizes),
                "search_sizes": list(cfg.search_sizes),
                "interp_factor": cfg.interp_factor,
                "regularizer": cfg.regularizer,
                "cost": cfg.cost,
            },
        }
        with open(os.path.join(out_dir, "report.json"), "w") as f:
            json.dump(report, f, indent=2)
    return results

"""Full shipped-config windowed+rival EPE on TPU -> EVAL_rival_full.json."""

import json
import os
import time

import _cache  # noqa: F401

from blockbasedmotionestimation_tpu.config import MotionConfig
from blockbasedmotionestimation_tpu.models import evaluate

GT_DIR = "/root/reference/middlebury/gt-flow"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "EVAL_rival_full.json")

cfg = MotionConfig(interp_factor=4, regularizer="windowed", rival_window=True,
                   rival_radius=None)  # FULL radius (the default is now a per-level schedule)

results = {}
for seq in evaluate.SEQUENCES:
    t0 = time.time()
    r = evaluate.evaluate_sequence(seq, GT_DIR, cfg)
    results[seq] = {"epe": r.epe, "seconds": time.time() - t0}
    print(f"{seq}: EPE {r.epe:.4f} ({results[seq]['seconds']:.0f}s)", flush=True)
    with open(OUT, "w") as f:
        json.dump({"config": "full windowed+rival (tpu)", "results": results}, f, indent=1)
print("done")

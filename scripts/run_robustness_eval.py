"""Photometric-robustness EPE sweep -> EVAL_robust.md + EVAL_robust.json.

The GT-warp suite idealizes brightness constancy; the reference's only
quantitative record (error.txt) is on REAL frames with photometric nuisance.
This sweep measures how each production schedule degrades when frame 1 gets
a controlled gain/offset/noise/occlusion-fill perturbation
(utils.synth.pair_from_gt_photometric).

Run on the TPU from repo root:  python scripts/run_robustness_eval.py [quick]
(quick: 2-level/16px config on 3 sequences for a fast CPU smoke run).
"""

import json
import os
import sys
import time

import numpy as np

import _cache  # noqa: F401

from blockbasedmotionestimation_tpu.config import MotionConfig
from blockbasedmotionestimation_tpu.models import evaluate

GT_DIR = "/root/reference/middlebury/gt-flow"
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VARIANTS = {
    "clean": {},
    "offset+12": {"offset": 12.0},
    "gain1.10": {"gain": 1.10},
    "noise_s4": {"noise_sigma": 4.0},
    "noise_s8": {"noise_sigma": 8.0},
    "occl_fill": {"occlusion_fill": True},
    "combined": {"gain": 1.06, "offset": 6.0, "noise_sigma": 4.0},
}


def main() -> None:
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"
    if quick:
        seqs = ("Dimetrodon", "Urban2", "Grove3")
        # rival defaults ON since r3: pin per column
        configs = {
            "windowed": MotionConfig(
                block_sizes=(16, 16), search_sizes=(32, 32), interp_factor=1,
                regularizer="windowed", rival_window=False, rival_radius=None,
            ),
        }
        configs["rival_r8"] = configs["windowed"].replace(
            rival_window=True, rival_radius=8
        )
        configs["fourcolor"] = configs["windowed"].replace(
            regularizer="fourcolor"
        )
    else:
        seqs = evaluate.SEQUENCES
        base = MotionConfig(
            interp_factor=4, regularizer="windowed",
            rival_window=False, rival_radius=None,
        )
        configs = {
            "windowed": base,
            "rival_r8": base.replace(rival_window=True, rival_radius=8),
            "fourcolor": base.replace(regularizer="fourcolor"),
        }

    out = {}
    for cname, cfg in configs.items():
        out[cname] = {}
        for vname, kw in VARIANTS.items():
            epes = []
            for seq in seqs:
                t0 = time.time()
                r = evaluate.evaluate_sequence_photometric(
                    seq, GT_DIR, cfg, **kw
                )
                epes.append(r.epe)
                print(
                    f"{cname:10s} {vname:10s} {seq:12s}: EPE {r.epe:.4f} "
                    f"({time.time()-t0:.0f}s)",
                    flush=True,
                )
            out[cname][vname] = {
                "mean": float(np.mean(epes)),
                "per_seq": dict(zip(seqs, [float(e) for e in epes])),
            }
            with open(os.path.join(ROOT, "EVAL_robust.json"), "w") as f:
                json.dump({"sequences": list(seqs), "results": out}, f, indent=1)

    # markdown table
    lines = [
        "# EVAL_robust — photometric-robustness EPE (synth-warp + nuisance)",
        "",
        "Mean EPE over " + ", ".join(seqs) + " (perturbation applied to frame 1;"
        " see `utils.synth.pair_from_gt_photometric`).",
        "",
        "| variant | " + " | ".join(out.keys()) + " |",
        "|---|" + "---|" * len(out),
    ]
    for vname in VARIANTS:
        row = [f"{out[c][vname]['mean']:.4f}" for c in out]
        lines.append(f"| {vname} | " + " | ".join(row) + " |")
    lines.append("")
    for cname in out:
        clean = out[cname]["clean"]["mean"]
        worst = max(out[cname][v]["mean"] for v in VARIANTS)
        lines.append(
            f"- **{cname}**: clean {clean:.4f}, worst variant {worst:.4f} "
            f"(degradation {worst - clean:+.4f})."
        )
    with open(os.path.join(ROOT, "EVAL_robust.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote EVAL_robust.md / EVAL_robust.json")


if __name__ == "__main__":
    main()

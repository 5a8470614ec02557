"""Per-component roofline audit: modeled floor vs measured trace -> FLOOR.md.

Runs one traced execution of the production bench program (windowed + rival
r8, B=8, 1080p), aggregates per-op device durations from the perfetto trace,
maps each op group onto a component of
``utils.profiling.windowed_pipeline_roofline``, and writes the term-by-term
comparison to FLOOR.md.  The r3 floor (max(vpu, hbm) over the CV terms only,
9.38 ms/field) left ~16 ms/field of color-step/search/gather work outside
the model (r3 VERDICT weak #1); this audit is the reconciliation.

Run on the TPU from repo root: python scripts/tpu_roofline_audit.py
"""

import collections
import glob
import gzip
import json
import os
import tempfile

import numpy as np
import jax
import _cache  # noqa: F401
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from blockbasedmotionestimation_tpu.config import MotionConfig
from blockbasedmotionestimation_tpu.models.engine import estimate_flow_batched
from blockbasedmotionestimation_tpu.ops import pad as pad_ops
from blockbasedmotionestimation_tpu.utils import profiling

B, H, W = 8, 1080, 1920
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

cfg = MotionConfig(
    block_sizes=(32,) * 4,
    search_sizes=(64,) * 4,
    interp_factor=1,
    regularizer="windowed",
    rival_window=True,  # rival_radius/cv_store_radius: shipped defaults
)
rng = np.random.default_rng(0)
base = rng.integers(0, 256, size=(B, H + 16, W + 16), dtype=np.uint8)
im1 = jax.device_put(jnp.asarray(base[:, :H, :W]))
im2 = jax.device_put(jnp.asarray(base[:, 5:5 + H, 9:9 + W]))

flow, _ = estimate_flow_batched(im1, im2, cfg)
print("warm", float(np.asarray(flow[0, 0, 0, 0])), flush=True)

logdir = tempfile.mkdtemp(prefix="jaxtrace_")
jax.profiler.start_trace(logdir)
flow, _ = estimate_flow_batched(im1, im2, cfg)
float(np.asarray(flow[0, 0, 0, 0]))
jax.profiler.stop_trace()

(path,) = glob.glob(os.path.join(logdir, "plugins/profile/*/*.trace.json.gz"))
with gzip.open(path) as f:
    d = json.load(f)
ev = d.get("traceEvents", [])
names = {}
for e in ev:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        names[e["pid"]] = e["args"].get("name")
agg, cnt = collections.Counter(), collections.Counter()
dev_total = 0.0
for e in ev:
    if e.get("ph") != "X":
        continue
    pname = names.get(e["pid"], "")
    if "TPU" not in str(pname):
        continue
    n = e.get("name", "")
    agg[n] += e.get("dur", 0)
    cnt[n] += 1
    if n.startswith("jit__batched"):
        dev_total += e.get("dur", 0)

# ---- map op groups onto roofline components ------------------------------
# while.N scan durations INCLUDE nested kernel time; the nested kernels also
# appear as their own entries, so only NON-while entries are attributed.
COMPONENT_PATTERNS = [
    # deep_pooled_cvs = the rival/coarse CV build; both are cv_build work.
    # windowed_color_step_* kernels carry CV streaming + step operands +
    # energy compute + (hybrid) the per-step rival/patches slab reads.
    ("cv_build", ("delta_pooled_cvs", "deep_pooled_cvs", "full_block_volume",
                  "diff_kernel", "tail_kernel")),
    ("color_steps", ("windowed_color_step",)),
    ("gather", ("gather_windows", "dma_kernel", "dot_general", "dot.")),
    ("search", ("reduce", "argmin", "iota", "select")),
    ("pyramid", ("pyrdown", "conv")),
]


def classify(op: str) -> str:
    low = op.lower()
    if op.startswith(("jit__batched", "while")):
        return "_container"
    for comp, pats in COMPONENT_PATTERNS:
        for p in pats:
            if p.lower() in low:
                return comp
    return "other"


meas = collections.Counter()
other_ops = collections.Counter()
for n, v in agg.items():
    c = classify(n)
    if c == "_container":
        continue
    meas[c] += v
    if c == "other":
        other_ops[n] += v

ms = {c: v / 1000.0 / B for c, v in meas.items()}  # per field
total_ms = dev_total / 1000.0 / B

p = pad_ops.compute_padding(H, W, cfg)
roof = profiling.windowed_pipeline_roofline(cfg, p.padded_h, p.padded_w)
fl = {c: v["floor_s"] * 1e3 for c, v in roof["components"].items()}

# model components -> measured groups
MAP = {
    "cv_build": ["cv_build"],
    "color_steps(cv_stream+operands+rival slabs)": ["color_steps"],
    "gather": ["gather"],
    "search": ["search"],
    "pyramid": ["pyramid"],
    "xla_glue(layout copies/fusions)": ["other"],
}
model_merge = {
    "cv_build": fl.get("cv_build", 0) + fl.get("rival_build", 0),
    "color_steps(cv_stream+operands+rival slabs)": fl.get("cv_stream", 0)
    + fl.get("step_operands", 0) + fl.get("step_compute", 0)
    + fl.get("rival", 0),
    "gather": fl.get("gather", 0),
    "search": fl.get("search", 0),
    "pyramid": fl.get("pyramid", 0),
    "xla_glue(layout copies/fusions)": fl.get("mv_bookkeeping", 0),
}

lines = [
    "# FLOOR — per-component roofline vs measured trace (production bench)",
    "",
    f"Config: windowed + rival_radius={cfg.rival_radius}, "
    f"cv_store_radius={cfg.cv_store_radius}, cv_fused={cfg.cv_fused}, "
    f"B={B}, 1080p ({p.padded_h}x{p.padded_w}"
    " padded), 4 levels — the SHIPPED DEFAULT `MotionConfig()` that bench.py"
    " runs (floor and bench must quote the same config)."
    "  Model: `utils.profiling.windowed_pipeline_roofline`"
    " (structural floors: VPU 2e12 int-ops/s, HBM 810 GB/s, perfect overlap"
    " within a component).  Measured: per-op device durations from one"
    " jax.profiler trace, mapped to components by op name"
    " (`scripts/tpu_roofline_audit.py`).",
    "",
    "| component | floor ms/field | measured ms/field | floor/measured |",
    "|---|---|---|---|",
]
mapped_sum = 0.0
for comp, groups in MAP.items():
    m = sum(ms.get(g, 0.0) for g in groups)
    mapped_sum += m
    f = model_merge.get(comp, 0.0)
    ratio = f / m if m > 0 else float("nan")
    lines.append(f"| {comp} | {f:.2f} | {m:.2f} | {ratio:.2f} |")
lines += [
    f"| **total** | **{roof['total_floor_s']*1e3:.2f}** | "
    f"**{total_ms:.2f}** (device) / {mapped_sum:.2f} (mapped) | "
    f"{roof['total_floor_s']*1e3/total_ms:.2f} |",
    "",
    f"Mapped-op coverage: {mapped_sum/total_ms*100:.0f}% of device time"
    " (the remainder is scan/dispatch bookkeeping inside the while bodies).",
    "",
    "## Measured attack ledger (what was tried on each gap; DESIGN.md 7-7f)",
    "",
    "| gap | attack | result |",
    "|---|---|---|",
    "| cv_build | packed-i16 diff math | DEAD: Mosaic cannot legalize abs/max/cmp on i16 vectors (r3) |",
    "| cv_build | MXU-SSD correlation volume | DEAD: -23% e2e, B=8 OOM, grouped-conv backend defect (7e, r4) |",
    "| cv_build | (plane, offset) slice memo in the diff kernels | NEUTRAL in production (12.1 ms/field before/after; -18% on the isolated L0 probe) - kept, values identical (r5) |",
    "| color_steps | bbox-row-only CV DMA | DEAD: Pallas block-start granularity / skipped-step bookkeeping exceeds the saved bandwidth (7, r3) |",
    "| color_steps | ablation ladder attribution | recompute loops 3.0 ms/field, energy tail ~0, scalar prologue ~0 (BBME_FUSED_NOLOOP/-ABLATE, r5) |",
    "| color_steps | per-column-group row bounds for recompute/pick visits | WON: +3.3 fields/s (30.7 -> 34.0; border-junk outliers no longer inflate every chunk rectangle) (r5) |",
    "| xla_glue | color-plane chunk-major rounds | WON: glue 5.7 -> 4.9 ms/field (r4) |",
    "| xla_glue | per-step candidate stack | INTRINSIC: in-kernel candidate build needs (s2+2)-row blocks, Mosaic pads back to 2x traffic (7d) |",
    "| xla_glue | r5 composition audit | DIFFUSE: largest single op 0.19 ms/field; ~2.0 copy + 1.05 fusion + 0.64 reshape + 0.45 pad_add spread over ~40 level-entry staging ops - no single attackable dominator remains |",
    "| gather | runtime-offset Pallas DMA | DEAD: any runtime source offset crashes the remote Mosaic compiler (7, r3) |",
]
print("\n".join(lines))
with open(os.path.join(ROOT, "FLOOR.md"), "w") as f:
    f.write("\n".join(lines) + "\n")

print("\n-- top unmapped ops --")
for n, v in other_ops.most_common(20):
    print(f"{v/1000/B:9.3f} ms/field {cnt[n]:6d}x  {n[:100]}")
print("\n-- all groups (raw) --")
groups = collections.Counter()
for n, v in agg.items():
    if n.startswith("jit__batched"):
        continue
    groups[n.split(".")[0]] += v
for g, v in groups.most_common(25):
    print(f"{v/1000/B:9.3f} ms/field  {g}")

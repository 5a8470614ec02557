"""Per-op trace of the 8K single-chip fused run (r3 VERDICT item 4).

8K runs 0.9 s/field while area-scaling the 1080p dense number predicts
~0.48 s: this attributes the ~1.9x large-frame tax the way 1080p was
profiled (scripts/tpu_roofline_audit.py).

Run on the TPU: python scripts/tpu_8k_trace.py
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
from blockbasedmotionestimation_tpu.models.engine import estimate_flow
from blockbasedmotionestimation_tpu.utils import synth

H, W = 4320, 7680
cfg = MotionConfig(interp_factor=1, regularizer="windowed", cv_fused=4)
rng = np.random.default_rng(0)
m = 32
base = synth.textured_image(H + 2 * m, W + 2 * m, rng)
im1 = jax.device_put(jnp.asarray(base[m : m + H, m : m + W]))
im2 = jax.device_put(jnp.asarray(base[m - 7 : m - 7 + H, m + 11 : m + 11 + W]))

flow, p = estimate_flow(im1, im2, cfg)
print("warm", float(np.asarray(flow[0, 0, 0])), flush=True)

logdir = tempfile.mkdtemp(prefix="jaxtrace8k_")
jax.profiler.start_trace(logdir)
flow, _ = estimate_flow(im1, im2, cfg)
float(np.asarray(flow[0, 0, 0]))
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
    if "TPU" not in str(names.get(e["pid"], "")):
        continue
    n = e.get("name", "")
    agg[n] += e.get("dur", 0)
    cnt[n] += 1
    if n.startswith("jit_"):
        dev_total = max(dev_total, agg[n])

groups = collections.Counter()
for n, v in agg.items():
    if n.startswith("jit_"):
        continue
    groups[n.split(".")[0]] += v
total = sum(v for n, v in agg.items() if not n.startswith(("jit_", "while")))
print(f"\n8K device op total: {total/1e6:.2f} s/field\n")
print("-- by op group (while includes nested kernels) --")
for g, v in groups.most_common(25):
    print(f"{v/1000:9.1f} ms {g}")
print("\n-- top individual ops --")
for n, v in agg.most_common(35):
    if n.startswith(("jit_",)):
        continue
    print(f"{v/1000:9.1f} ms {cnt[n]:5d}x  {n[:110]}")

"""Device-time breakdown of the production bench program via jax.profiler.

Runs one traced execution of estimate_flow_batched at the bench shape and
aggregates per-op device durations from the perfetto trace - the ONLY
reliable per-kernel attribution on the async remote backend (differential
stubbing changes XLA layouts/liveness; wall-clock timing needs the dispatch
floor subtracted and a compile per variant).

Op-name key: vmap_jit_delta_pooled_cvs__.N = pooled CV builds (one per
level, largest N = L0), windowed_color_step_pm.N = fused color-step kernels
(one entry per round; 8 calls = 2 sweeps x 4 colors), while.N = the
sweep/round lax.scans (durations INCLUDE their body kernels).
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

B, H, W = 8, 1080, 1920
cfg = MotionConfig(
    block_sizes=(32,) * 4,
    search_sizes=(64,) * 4,
    interp_factor=1,
    regularizer="windowed", cv_fused=4,
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

print(f"\ndevice total: {dev_total/1000:.1f} ms (B={B},"
      f" {dev_total/1000/B:.2f} ms/field)\n")
groups = collections.Counter()
for n, v in agg.items():
    if n.startswith("jit__batched"):
        continue
    g = n.split(".")[0]
    groups[g] += v
print("-- by op group (while.* includes nested kernels) --")
for g, v in groups.most_common(15):
    print(f"{v/1000:9.2f} ms  {g}")
print("\n-- top ops --")
for n, v in agg.most_common(30):
    print(f"{v/1000:9.2f} ms {cnt[n]:6d}x  {n[:100]}")

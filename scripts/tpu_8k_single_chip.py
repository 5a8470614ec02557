"""Single-chip 8K motion estimation via chunk-fused rounds (VERDICT r2 #3).

At 8K the dense cur=2 cost volume alone is ~19 GB (> HBM) and the compact
K-slot path faulted the worker (r2, DESIGN 7a).  With cv_fused the fine
rounds never materialize their volumes, so the peak transient drops to the
coarse volumes + windows (~2.5 GB) and a single chip runs 8K outright.

Run from repo root: python scripts/tpu_8k_single_chip.py [H W]
"""

import sys
import time

import numpy as np

import _cache  # noqa: F401
import jax
import jax.numpy as jnp

from blockbasedmotionestimation_tpu.config import MotionConfig
from blockbasedmotionestimation_tpu.models.engine import estimate_flow
from blockbasedmotionestimation_tpu.utils import synth

H = int(sys.argv[1]) if len(sys.argv) > 1 else 4320
W = int(sys.argv[2]) if len(sys.argv) > 2 else 7680

cfg = MotionConfig(interp_factor=1, regularizer="windowed", cv_fused=4)
rng = np.random.default_rng(0)
m = 32
base = synth.textured_image(H + 2 * m, W + 2 * m, rng)
im1 = jax.device_put(jnp.asarray(base[m : m + H, m : m + W]))
im2 = jax.device_put(
    jnp.asarray(base[m - 7 : m - 7 + H, m + 11 : m + 11 + W])
)  # true flow = (-11, +7)

t0 = time.time()
flow, p = estimate_flow(im1, im2, cfg)
inner = flow[
    p.pad_y + 256 : p.pad_y + H - 256 : 64,
    p.pad_x + 256 : p.pad_x + W - 256 : 64,
]  # device-side subsample: the full field is 280+ MB over a ~12 MB/s tunnel
inner = np.asarray(inner)
compile_s = time.time() - t0

t0 = time.time()
flow, _ = estimate_flow(im1, im2, cfg)
_ = float(np.asarray(flow[0, 0, 0]))
run_s = time.time() - t0

# the r4 trace (scripts/tpu_8k_trace.py) showed device ops total only
# ~0.40 s/field - the 0.9 s wall is HOST dispatch serialization (a lone 8K
# field has no batch to amortize the per-program dispatch floor over).
# Depth-2 software pipelining: enqueue the next field before syncing the
# previous one, overlapping dispatch with execution.
flows = [estimate_flow(im1, im2, cfg)[0] for _ in range(2)]
t0 = time.time()
n = 4
for k in range(n):
    nxt, _ = estimate_flow(im1, im2, cfg)
    _ = float(np.asarray(flows[k % 2][0, 0, 0]))  # sync the OLDER field
    flows[k % 2] = nxt
pipe_s = (time.time() - t0) / n

frac = ((inner[..., 0] == -11) & (inner[..., 1] == 7)).mean()
print(
    f"8K single-chip (cv_fused=4): {H}x{W} -> padded {p.padded_h}x{p.padded_w}; "
    f"compile+run {compile_s:.0f}s, steady {run_s:.1f}s/field, "
    f"depth-2 pipelined {pipe_s:.2f}s/field, "
    f"interior exact-motion fraction {frac:.4f}"
)
assert frac > 0.99, frac
print("OK")

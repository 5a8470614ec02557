"""r_store radius + cv_fused at the production bench, post-grouped-bounds.

The grouped visit bounds (DESIGN 7f) made the tail/rival recompute loops
near-free, which shifts the r_store optimum toward SMALLER stored bands
(less cur=2 stream, more recompute) and may flip the 1080p cv_fused
negative the way it flipped the 4K one.  Bit-exact either way.

Run on the TPU: python scripts/tpu_rstore_sweep2.py
"""

import time

import numpy as np
import jax
import _cache  # noqa: F401
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from blockbasedmotionestimation_tpu.config import MotionConfig
from blockbasedmotionestimation_tpu.models.engine import estimate_flow_batched

B, H, W = 8, 1080, 1920
rng = np.random.default_rng(0)
base = rng.integers(0, 256, size=(B, H + 16, W + 16), dtype=np.uint8)
im1 = jax.device_put(jnp.asarray(base[:, :H, :W]))
im2 = jax.device_put(jnp.asarray(base[:, 5:5 + H, 9:9 + W]))

CASES = {
    "rstore8 (default)": dict(cv_store_radius=8),
    "rstore4": dict(cv_store_radius=4),
    "rstore2": dict(cv_store_radius=2),
    "rstore0": dict(cv_store_radius=0),
    "fused4": dict(cv_store_radius=None, cv_fused=4),
    "fused4+rstore n/a (fused owns fine rounds)": dict(cv_fused=4),
}

for label, kw in CASES.items():
    cfg = MotionConfig(
        block_sizes=(32,) * 4, search_sizes=(64,) * 4, interp_factor=1,
        regularizer="windowed", rival_window=True, **kw,
    )
    try:
        flow, _ = estimate_flow_batched(im1, im2, cfg)
        float(np.asarray(flow[0, 0, 0, 0]))
    except Exception as e:
        print(f"{label}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
        continue
    t0 = time.time()
    iters = 6
    for _ in range(iters):
        flow, _ = estimate_flow_batched(im1, im2, cfg)
        float(np.asarray(flow[0, 0, 0, 0]))
    rate = iters * B / (time.time() - t0)
    print(f"{label}: {rate:.2f} fields/s", flush=True)

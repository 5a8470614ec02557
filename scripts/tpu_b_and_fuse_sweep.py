"""Cheap throughput experiments on the production config (r4).

(a) batch sizes beyond 8: B=10/12 - the dense rival pipeline fits B=8 with
    ~12 GB transient workspace; how much more does batch amortization buy
    before the HBM cliff?
(b) cv_fused=2: r3 measured cv_fused=4 as a 1080p negative (21.4 vs 33.1
    non-rival) because recomputing cur=4 AND cur=2 costs more than their
    dense streaming; fusing ONLY the cur=2 rounds (the single biggest
    volume, ~1.2 GB/field write + 2 sweeps of reads) was never measured.

Run on the TPU: python scripts/tpu_b_and_fuse_sweep.py
"""

import time

import numpy as np
import jax
import _cache  # noqa: F401
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from blockbasedmotionestimation_tpu.config import MotionConfig
from blockbasedmotionestimation_tpu.models.engine import estimate_flow_batched

H, W = 1080, 1920


def run(B, fused):
    cfg = MotionConfig(
        block_sizes=(32,) * 4, search_sizes=(64,) * 4, interp_factor=1,
        regularizer="windowed", rival_window=True, rival_radius=8,
        cv_fused=fused,
    )
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, size=(B, H + 16, W + 16), dtype=np.uint8)
    im1 = jax.device_put(jnp.asarray(base[:, :H, :W]))
    im2 = jax.device_put(jnp.asarray(base[:, 5:5 + H, 9:9 + W]))
    try:
        flow, _ = estimate_flow_batched(im1, im2, cfg)
        float(np.asarray(flow[0, 0, 0, 0]))
    except Exception as e:
        print(f"B={B} fused={fused}: FAILED ({type(e).__name__}: "
              f"{str(e)[:100]})", flush=True)
        return
    iters = max(2, int(160 / B))
    t0 = time.time()
    for _ in range(iters):
        flow, _ = estimate_flow_batched(im1, im2, cfg)
        float(np.asarray(flow[0, 0, 0, 0]))
    dt = (time.time() - t0) / iters / B
    print(f"B={B} fused={fused}: {dt*1e3:.2f} ms/field = "
          f"{1/dt:.2f} fields/s", flush=True)


if __name__ == "__main__":
    run(8, None)    # baseline
    run(10, None)
    run(12, None)
    run(8, 2)
    run(12, 2)

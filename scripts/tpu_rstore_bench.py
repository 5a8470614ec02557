"""r_store (cv_store_radius) production bench (r4).

The cur=2 volume is the pipeline's HBM dominator; storing only
|delta| <= r_store and recomputing tail candidates from the main window
slab (kernels/fused_step._kernel_pm_hybrid_tail) is BIT-EXACT and should
cut ~5 ms/field of CV write+stream traffic at 1080p B=8.

Run on the TPU: python scripts/tpu_rstore_bench.py
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


def run(store):
    cfg = MotionConfig(
        block_sizes=(32,) * 4, search_sizes=(64,) * 4, interp_factor=1,
        regularizer="windowed", rival_window=True, rival_radius=8,
        cv_store_radius=store,
    )
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, size=(B, H + 16, W + 16), dtype=np.uint8)
    im1 = jax.device_put(jnp.asarray(base[:, :H, :W]))
    im2 = jax.device_put(jnp.asarray(base[:, 5:5 + H, 9:9 + W]))
    try:
        flow, _ = estimate_flow_batched(im1, im2, cfg)
        ref = float(np.asarray(flow[0, 100, 100, 0]))
    except Exception as e:
        print(f"store={store}: FAILED ({type(e).__name__}: {str(e)[:120]})",
              flush=True)
        return None
    iters = 16
    t0 = time.time()
    for _ in range(iters):
        flow, _ = estimate_flow_batched(im1, im2, cfg)
        float(np.asarray(flow[0, 0, 0, 0]))
    dt = (time.time() - t0) / iters / B
    print(f"store={store}: {dt*1e3:.2f} ms/field = {1/dt:.2f} fields/s "
          f"(probe {ref})", flush=True)
    return np.asarray(flow)


if __name__ == "__main__":
    a = run(None)
    b = run(8)
    c = run(4)
    if a is not None and b is not None:
        print("store=8 bit-equal to dense:", bool((a == b).all()))
    if a is not None and c is not None:
        print("store=4 bit-equal to dense:", bool((a == c).all()))

"""4K throughput with cv_fused at B >= 4 (r3 VERDICT item 4).

DESIGN asserted "higher batches need cv_fused" at 4K without measuring it:
dense mode caps at B=2 (HBM), so this measures the fused production config
(windowed + rival r8 + cv_fused=4) at B = 2 / 4 / 8, plus dense B=2 for
reference.

Run on the TPU: python scripts/tpu_4k_fused_batch.py
"""

import time

import numpy as np
import jax
import _cache  # noqa: F401
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from blockbasedmotionestimation_tpu.config import MotionConfig
from blockbasedmotionestimation_tpu.models.engine import estimate_flow_batched

H, W = 2160, 3840


def run(fused, B):
    cfg = MotionConfig(
        interp_factor=1, regularizer="windowed", rival_window=True,
        rival_radius=8, cv_fused=fused,
    )
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, size=(B, H + 16, W + 16), dtype=np.uint8)
    im1 = jax.device_put(jnp.asarray(base[:, :H, :W]))
    im2 = jax.device_put(jnp.asarray(base[:, 5:5 + H, 9:9 + W]))
    try:
        flow, _ = estimate_flow_batched(im1, im2, cfg)
        float(np.asarray(flow[0, 0, 0, 0]))
    except Exception as e:
        print(f"fused={fused} B={B}: FAILED ({type(e).__name__}: "
              f"{str(e)[:120]})", flush=True)
        return
    iters = 4
    t0 = time.time()
    for _ in range(iters):
        flow, _ = estimate_flow_batched(im1, im2, cfg)
        float(np.asarray(flow[0, 0, 0, 0]))
    dt = (time.time() - t0) / iters / B
    print(f"fused={fused} B={B}: {dt*1e3:.1f} ms/field = "
          f"{1/dt:.2f} fields/s", flush=True)


if __name__ == "__main__":
    run(None, 2)   # dense reference (the r3 HBM cap)
    run(4, 2)
    run(4, 4)
    run(4, 8)

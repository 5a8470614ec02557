"""Measure the chunk-fused path at the bench shape (1080p, B=8).

Compares dense vs cv_fused (and rival variants) fields/s on the real chip.
Run from repo root: python scripts/tpu_fused_bench.py [B] [variants...]
"""

import sys
import time

import numpy as np

import _cache  # noqa: F401
import jax
import jax.numpy as jnp

from blockbasedmotionestimation_tpu.config import MotionConfig
from blockbasedmotionestimation_tpu.models.engine import estimate_flow_batched

H, W = 1080, 1920


def run(name: str, cfg: MotionConfig, B: int) -> None:
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, size=(B, H + 16, W + 16), dtype=np.uint8)
    im1 = jax.device_put(jnp.asarray(base[:, :H, :W]))
    im2 = jax.device_put(jnp.asarray(base[:, 5:5 + H, 9:9 + W]))
    t0 = time.time()
    try:
        flow, _ = estimate_flow_batched(im1, im2, cfg)
        _ = float(np.asarray(flow[0][0, 0, 0]))
    except Exception as e:
        print(f"{name:28s} B={B}: FAILED {type(e).__name__}: {str(e)[:120]}")
        return
    compile_s = time.time() - t0
    t0 = time.time()
    flow, _ = estimate_flow_batched(im1, im2, cfg)
    _ = float(np.asarray(flow[0][0, 0, 0]))
    once = time.time() - t0
    iters = max(1, min(10, int(15.0 / max(once, 1e-3))))
    t0 = time.time()
    for _ in range(iters):
        flow, _ = estimate_flow_batched(im1, im2, cfg)
        _ = float(np.asarray(flow[0][0, 0, 0]))
    dt = (time.time() - t0) / iters / B
    print(
        f"{name:28s} B={B}: {1.0/dt:7.2f} fields/s  ({dt*1e3:6.2f} ms/field, "
        f"compile {compile_s:.0f}s)"
    )


def main() -> None:
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    want = sys.argv[2:] or ["dense", "fused", "fused_rival8", "fused_rival"]
    base_cfg = MotionConfig(
        interp_factor=1, regularizer="windowed", rival_window=False
    )
    variants = {
        "dense": base_cfg,
        "fused": base_cfg.replace(cv_fused=4),
        "fused2": base_cfg.replace(cv_fused=2),
        "fused_rival8": base_cfg.replace(
            cv_fused=4, rival_window=True, rival_radius=8
        ),
        "fused_rival": base_cfg.replace(
            cv_fused=4, rival_window=True, rival_radius=None
        ),
        "dense_rival8": base_cfg.replace(rival_window=True, rival_radius=8),
        "dense_rival": base_cfg.replace(
            rival_window=True, rival_radius=None
        ),
        "default": MotionConfig(interp_factor=1),  # the production default
    }
    for name in want:
        run(name, variants[name], B)


if __name__ == "__main__":
    main()

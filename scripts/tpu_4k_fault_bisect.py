"""Bisect the 4K cv_fused B=8 worker fault (r4 negative; r5 VERDICT item 6).

``fused=4 B=8`` at 4K dies with ``INTERNAL: TPU backend error`` while B=4
runs (8.62 fields/s with the r5 grouped bounds).  Each variant runs in its
own process (the driver shell loop below) so a faulted backend cannot
poison the next probe:

  python scripts/tpu_4k_fault_bisect.py <variant>

variants: base (the faulting config), norival, noloop, nodma, b6,
halfw, dense, fused2, fused8, levels2, levels3.

Driver: for v in base norival noloop b6 halfw dense levels2 levels3; do
          timeout 900 python scripts/tpu_4k_fault_bisect.py $v; done
"""

import sys

import numpy as np
import jax
import _cache  # noqa: F401
import jax.numpy as jnp

variant = sys.argv[1] if len(sys.argv) > 1 else "base"

import os
if variant == "noloop":
    os.environ["BBME_FUSED_NOLOOP"] = "1"
elif variant == "nodma":
    os.environ["BBME_NO_DMA_GATHER"] = "1"

from blockbasedmotionestimation_tpu.config import MotionConfig
from blockbasedmotionestimation_tpu.models.engine import estimate_flow_batched

print("backend:", jax.default_backend(), "variant:", variant, flush=True)

H, W, B = 2160, 3840, 8
levels = 4
fused = 4
rival = True
if variant == "norival":
    rival = False
elif variant == "b6":
    B = 6
elif variant == "halfw":
    W = 1920
elif variant == "dense":
    fused = None
elif variant == "fused2":
    fused = 2
elif variant == "fused8":
    fused = 8
elif variant == "levels2":
    levels = 2
elif variant == "levels3":
    levels = 3

cfg = MotionConfig(
    block_sizes=(32,) * levels, search_sizes=(64,) * levels,
    interp_factor=1, regularizer="windowed", rival_window=rival,
    rival_radius=8, cv_fused=fused,
)
rng = np.random.default_rng(0)
base = rng.integers(0, 256, size=(B, H + 16, W + 16), dtype=np.uint8)
im1 = jax.device_put(jnp.asarray(base[:, :H, :W]))
im2 = jax.device_put(jnp.asarray(base[:, 5:5 + H, 9:9 + W]))

try:
    flow, _ = estimate_flow_batched(im1, im2, cfg)
    v = float(np.asarray(flow[0, 0, 0, 0]))
    print(f"{variant}: OK (flow[0,0,0,0]={v})", flush=True)
except Exception as e:
    print(f"{variant}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
    sys.exit(1)

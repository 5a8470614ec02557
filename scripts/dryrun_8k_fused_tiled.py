"""Capacity x scale dryrun: cv_fused rounds INSIDE row-tiled shard_map.

r3 left capacity (cv_fused) and scale (tiling) as an either/or: multi-chip
strips had to run dense cost volumes, so a wider-than-strip frame per chip
(8K on 4 chips) had no supported mode.  r4's cell_exchange path runs the
chunk-fused/hybrid kernels per strip with per-step ghost-row ppermute
(ops/windowed._pallas_round_pm), bit-exact vs untiled
(tests/test_tiled.py::test_tiled_pallas_cell_rounds_equal_untiled).

This dryrun exercises that program shape on a 4-virtual-device CPU mesh with
WIDER-THAN-TALL strips (the 8K-on-4-chips geometry: each chip holds a
1152x7680 strip).  The Pallas kernels must run in interpret mode on CPU, so
the frame is scale-proportioned (strips 64x512, same strips-wider-than-tall
shape, same fused rounds, same halo program); the full-size 8K fused path
runs for real on one TPU chip in scripts/tpu_8k_single_chip.py, and the
full-size dense halo program at 8K runs in scripts/dryrun_8k_tiled.py.
The capacity arithmetic for the real shape is printed at the end.

Run:  python scripts/dryrun_8k_fused_tiled.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DEV = 4

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={N_DEV}"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
from jax.sharding import Mesh

from blockbasedmotionestimation_tpu.config import MotionConfig
from blockbasedmotionestimation_tpu.parallel import tiled

assert len(jax.devices()) == N_DEV, jax.devices()

# strips-wider-than-tall geometry, fused capacity mode, production schedule
cfg = MotionConfig(
    block_sizes=(8, 8), search_sizes=(16, 16), interp_factor=1,
    regularizer="windowed", rival_window=True, rival_radius=8,
    search_impl="pallas_interpret", cv_fused=4,
)
H, W = 256, 512  # 64x512 strips per device: wider than tall, like 8K/4
DY, DX = 3, -2

rng = np.random.default_rng(0)
base = rng.integers(0, 256, size=(H + 16, W + 16), dtype=np.uint8)
im1 = base[8 : 8 + H, 8 : 8 + W]
im2 = base[8 + DY : 8 + DY + H, 8 + DX : 8 + DX + W]

mesh = Mesh(np.array(jax.devices()), ("ty",))
plan = tiled.plan_tiling(cfg, H, W, N_DEV)
print("tiling plan:", [(e["level"], e["rows_ok"], e["halo"], e["strip_h"])
                       for e in plan], flush=True)
assert plan[0]["rows_ok"], "finest level must shard for this dryrun"

flow = np.asarray(tiled.estimate_flow_padded_tiled(im1, im2, cfg, mesh))
interior = flow[64:192, 128:384]
frac = float((interior == np.float32([-DX, -DY])).all(axis=-1).mean())
print(f"planted motion ({-DX}, {-DY}) recovered fraction: {frac:.4f}")
assert frac == 1.0, frac

# capacity arithmetic at the REAL shape (8K on 4 chips, shipped config):
# per 1152x7680 strip, the dense cur=2 volume alone would be
# (2*16+1)^2 * (1152/2 * 7680/2) entries u16 = 4.8 GB + cur=4 1.2 GB +
# transient workspace - the dense-mode HBM cliff; cv_fused materializes
# NEITHER (only the coarse cur>=8 volumes, ~0.4 GB).
side2 = 33 * 33
strip_cells = (1152 // 2) * (7680 // 2)
print(
    f"8K/4-chip real-shape arithmetic: dense cur=2 per strip = "
    f"{side2 * strip_cells * 2 / 2**30:.1f} GiB; fused mode stores 0"
)
print("dryrun_8k_fused_tiled ok")

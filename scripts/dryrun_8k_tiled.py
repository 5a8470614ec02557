"""8K-shape row-tiled dryrun on the 8-virtual-device CPU mesh (BASELINE
config #5's shape).  Requires mv_cap (the uncapped halo exceeds any strip)
and tile-aware padding; prints per-level shardability and runs ONE frame
end to end, asserting the planted translation is recovered.

Run: python scripts/dryrun_8k_tiled.py [height width]
"""

import sys
import time

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blockbasedmotionestimation_tpu.config import MotionConfig
from blockbasedmotionestimation_tpu.ops import pad as pad_ops
from blockbasedmotionestimation_tpu.parallel import tiled
from blockbasedmotionestimation_tpu.utils import synth

H = int(sys.argv[1]) if len(sys.argv) > 1 else 4320
W = int(sys.argv[2]) if len(sys.argv) > 2 else 7680
T = 8

# search 48 (S=8) instead of the shipped 64: XLA CPU hard-codes a 40 s
# collective rendezvous timeout (rendezvous.cc), and a virtual 8-device
# host serializes the per-device compute - at the shipped search size one
# device's between-ppermute work at 8K exceeds it and the run aborts.  The
# GEOMETRY (8K rows over 8 tiles, halos, padding, collectives) is what this
# dryrun validates; real chips run each device's slice in parallel.
cfg = MotionConfig(
    interp_factor=1, regularizer="windowed", mv_cap=64,
    search_sizes=(48, 48, 48, 48),
)
p = pad_ops.compute_padding(H, W, cfg, row_tiles=T)
print(f"8K dryrun: {H}x{W} -> padded {p.padded_h}x{p.padded_w}")
for level in range(cfg.num_levels):
    h = p.padded_h >> level
    w = p.padded_w >> level
    bs = cfg.block_sizes[level]
    halo = tiled.im2_halo(cfg, level)
    ok = tiled._level_shardable(h, w, bs, T) and halo < h // T
    print(f"  L{level}: {h}x{w} halo {halo} strip {h // T} -> "
          f"{'SHARDED' if ok else 'replicated'}")

rng = np.random.default_rng(0)
m = 32
base = synth.textured_image(H + 2 * m, W + 2 * m, rng)
im1 = base[m : m + H, m : m + W]
im2 = base[m - 7 : m - 7 + H, m + 11 : m + 11 + W]  # flow = (-11, +7)

mesh = Mesh(np.array(jax.devices()).reshape(T), ("ty",))
im1p = pad_ops.pad_frame(jnp.asarray(im1), p)
im2p = pad_ops.pad_frame(jnp.asarray(im2), p)

t0 = time.time()
flow = tiled.estimate_flow_padded_tiled(im1p, im2p, cfg, mesh)
flow = np.asarray(flow)
print(f"end-to-end (compile+run, 8-device CPU mesh): {time.time() - t0:.1f}s")
inner = flow[p.pad_y + 256 : p.pad_y + H - 256 : 64,
             p.pad_x + 256 : p.pad_x + W - 256 : 64]
frac = ((inner[..., 0] == -11) & (inner[..., 1] == 7)).mean()
print(f"interior exact-motion fraction: {frac:.4f}")
assert frac > 0.99, frac
print("8K tiled dryrun OK")

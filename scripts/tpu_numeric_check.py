"""TPU numeric sanity for the production bench program.

The CPU suite proves semantics (oracle parity, tiled == untiled), but an
XLA:TPU-specific miscompile (e.g. the DESIGN.md section 8a double-strided
slice defect) would only corrupt values on the chip, where the bench never
inspects them.  This probe runs the EXACT bench program (windowed + rival
r8, B=8, 1080p, ``estimate_flow_batched``) on a planted integer
translation and asserts every field recovers it exactly on the interior —
run it after any change to the TPU compute path.

Run on the TPU from repo root: python scripts/tpu_numeric_check.py
"""

import numpy as np
import jax
import _cache  # noqa: F401  (persistent compile cache)
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from blockbasedmotionestimation_tpu.config import MotionConfig
from blockbasedmotionestimation_tpu.models.engine import estimate_flow_batched

H, W, B = 1080, 1920, 8
DX, DY = 9, 5

cfg = MotionConfig(
    block_sizes=(32,) * 4,
    search_sizes=(64,) * 4,
    interp_factor=1,
    regularizer="windowed",
    rival_window=True,  # rival_radius/cv_store_radius: shipped defaults
)
rng = np.random.default_rng(0)
base = rng.integers(0, 256, size=(B, H + 16, W + 16), dtype=np.uint8)
im1 = jax.device_put(jnp.asarray(base[:, :H, :W]))
im2 = jax.device_put(jnp.asarray(base[:, DY : DY + H, DX : DX + W]))

flow, _ = estimate_flow_batched(im1, im2, cfg)
f = np.asarray(flow)
inner = f[:, 200:-200, 200:-200, :]
u, v = np.unique(inner[..., 0]), np.unique(inner[..., 1])
print("interior u:", u, "v:", v, flush=True)
# the engine's convention maps a +(DX,DY) content shift of frame 2 to
# flow (-DX,-DY) (block at im1(y,x) matches im2(y-DY,x-DX)); asserting the
# exact signed values means a TPU sign-flip miscompile cannot pass
assert u.size == 1 and v.size == 1 and u[0] == -DX and v[0] == -DY, (u, v)
print(f"ok: planted ({DX},{DY}) translation recovered exactly (u={-DX}, v={-DY}) on all {B} fields")

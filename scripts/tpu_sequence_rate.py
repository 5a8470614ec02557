"""End-to-end 4K sequence rate vs the D2H transfer controls (r3 item 8).

The 4K sequence runner was tunnel-bound at ~0.1-0.25 pairs/s: each field
ships 66 MB of f32 flow over a ~12 MB/s remote tunnel while the device
computes ~5 fields/s.  ``run_sequence(out_stride=, transfer_dtype=)`` cuts
the shipped bytes on device (the reference driver itself writes every
interp_factor-th pixel, main_class.cpp:57-70).  This measures pairs/s for
each setting against the pure device rate.

Run on the TPU: python scripts/tpu_sequence_rate.py [n_pairs]
"""

import shutil
import sys
import tempfile
import time

import numpy as np
import jax
import _cache  # noqa: F401
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

from blockbasedmotionestimation_tpu.config import MotionConfig
from blockbasedmotionestimation_tpu.models import sequence
from blockbasedmotionestimation_tpu.models.engine import (
    estimate_flow_driver_batched,
)

H, W = 2160, 3840
N = int(sys.argv[1]) if len(sys.argv) > 1 else 6  # pairs
B = 2

cfg = MotionConfig(interp_factor=1, regularizer="windowed", rival_window=True,
                   rival_radius=8)
rng = np.random.default_rng(0)
base = rng.integers(0, 256, size=(H + 32, W + 32), dtype=np.uint8)
frames = [
    np.ascontiguousarray(base[i : i + H, 2 * i : 2 * i + W])
    for i in range(N + 1)
]

# pure device rate (no transfer): B-batched program, scalar sync only
a = jax.device_put(jnp.stack(frames[:B]))
b = jax.device_put(jnp.stack(frames[1 : B + 1]))
dev = estimate_flow_driver_batched(a, b, cfg)
float(np.asarray(dev[0, 0, 0, 0]))
t0 = time.time()
iters = 3
for _ in range(iters):
    dev = estimate_flow_driver_batched(a, b, cfg)
    float(np.asarray(dev[0, 0, 0, 0]))
dev_rate = iters * B / (time.time() - t0)
print(f"device-only rate: {dev_rate:.2f} fields/s", flush=True)

for stride, dt in ((1, "f32"), (2, "f16"), (4, "f16")):
    # warm-up pass: the per-stride _shrink program costs a remote compile
    # that must not sit inside the timed region
    warm = tempfile.mkdtemp(prefix=f"seq4k_warm{stride}_")
    sequence.run_sequence(
        frames[: B + 1], warm, cfg, batch_size=B, out_stride=stride,
        transfer_dtype=dt, write_report=False,
    )
    shutil.rmtree(warm, ignore_errors=True)
    out = tempfile.mkdtemp(prefix=f"seq4k_s{stride}_")
    t0 = time.time()
    sequence.run_sequence(
        frames, out, cfg, batch_size=B, out_stride=stride, transfer_dtype=dt,
        write_report=False,
    )
    rate = N / (time.time() - t0)
    print(
        f"out_stride={stride} transfer={dt}: {rate:.2f} pairs/s end-to-end "
        f"({rate / dev_rate * 100:.0f}% of device rate)", flush=True,
    )
    shutil.rmtree(out, ignore_errors=True)

"""Standalone repro: XLA:TPU miscompiles large double-strided 4-byte slices.

DESIGN.md section 8a.  On this backend (TPU v5e via the axon tunnel,
jax 0.9.x), slicing BOTH minor dims of a large int32/float32 array crashes
the device ("TPU worker process crashed or restarted"):

    base[:, 0::2, 0::2]        # faults when base is i32/f32 and ~>=20 MB

while the equivalent reshape-then-index form lowers correctly.  The measured
envelope (probe sweeps, r3):

  * dtype: int32 / float32 fault; uint16 is fine (2-byte lanes repack
    differently);
  * BOTH minor dims must be strided; single-dim strides are fine;
  * size: ~>= 20 MB faults, deterministically per (shape, dtype) - data
    values are irrelevant.  The production code switches formulations at a
    4M-element threshold (engine.transfer_mvs, windowed.cv_to_colors):
    comfortably above every 1080p instance (where the plain slice fuses
    better - the unconditional reshape form regressed the B=8 bench into
    HBM OOM) and below every crash-implicated instance (>=4K frames).

Run on the TPU:  python scripts/tpu_strided_slice_repro.py [MB]
Expect: the reshape form prints a checksum; the strided form kills the
device if the bug is present.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 110
    # (K, 136, 184) int32: the shape family the r3 bisection landed on
    k = max(1, (mb * 1024 * 1024) // (136 * 184 * 4))
    base = jnp.arange(k * 136 * 184, dtype=jnp.int32).reshape(k, 136, 184)

    safe = jax.jit(
        lambda x: x.reshape(k, 68, 2, 92, 2)[:, :, 0, :, 0].sum()
    )(base)
    print("reshape-then-index form ok, checksum:", int(safe))

    print("now the double-strided slice (faults the chip if bug present)...")
    out = jax.jit(lambda x: x[:, 0::2, 0::2].sum())(base)
    print("double-strided slice ok, checksum:", int(out))


if __name__ == "__main__":
    main()

"""Standalone repro: XLA:TPU grouped depthwise convs return wrong values.

Found while measuring the MXU-SSD decomposition (DESIGN.md section 7e):
``conv_general_dilated(feature_group_count=nblk)`` computes per-channel
cross-correlations that are EXACT on XLA:CPU but wrong on this TPU backend
even at ``precision=Precision.HIGHEST`` and with inputs that are exact in
bf16 (u8 pixel values).  Observed at nblk=2560 groups (relative error ~2.9
on full-block SSD); this script sweeps the group count to find the
envelope.

Run on the TPU: python scripts/tpu_grouped_conv_repro.py
"""

import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)


def case(nblk: int, bs: int = 8, ext: int = 4) -> None:
    win = bs + 2 * ext
    rng = np.random.default_rng(0)
    w = rng.integers(0, 256, size=(nblk, win, win)).astype(np.float32)
    p = rng.integers(0, 256, size=(nblk, bs, bs)).astype(np.float32)

    out = jax.jit(
        lambda a, b: jax.lax.conv_general_dilated(
            a[None], b[:, None], (1, 1), "VALID",
            feature_group_count=nblk,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )[0]
    )(jnp.asarray(w), jnp.asarray(p))
    got = np.asarray(out)

    side = 2 * ext + 1
    want = np.zeros((nblk, side, side))
    for dy in range(side):
        for dx in range(side):
            want[:, dy, dx] = (p * w[:, dy : dy + bs, dx : dx + bs]).sum(
                axis=(1, 2)
            )
    err = np.abs(got - want).max()
    print(f"groups={nblk:5d}: max |err| = {err:.1f} "
          f"({'OK' if err < 1 else 'WRONG'})", flush=True)


if __name__ == "__main__":
    for n in (8, 64, 256, 512, 1024, 2048, 2560):
        case(n)

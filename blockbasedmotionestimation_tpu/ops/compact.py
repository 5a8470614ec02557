"""Compact cost-volume slot lists: the delta universe of a level's rounds.

The regularization rounds never invent motion vectors - every candidate at
every subdivision round is one of the level's search winners, propagated by
adoption (``motion_framework.cpp:532-621`` picks among existing neighbor
MVs).  So the set of deltas a parent's cost volume is ever asked for is
bounded by {winner_q - base_p} over nearby parents q - typically a handful
of distinct values, while the dense volume stores (2S+1)^2 ~ 1089 deltas.
Storing only the distinct deltas (a per-chunk K-slot table) cuts the
dominant HBM traffic ~30x (DESIGN.md section 7b).

``chunk_delta_slots`` computes, per 128-parent chunk, the first K distinct
in-window deltas (in sorted key order - deterministic) over a
(2*ring+1)^2 parent neighborhood.  A candidate whose delta is not in its
chunk's list is excluded (energy FLT_MAX) - exactly the windowed family's
exclusion semantics; the list is exact (bit-equal to the dense volume)
whenever values travel at most ``ring`` parents and at most K distinct
deltas appear per chunk.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_BIG = np.int32(1 << 30)


def _presence(
    winners: jnp.ndarray, base: jnp.ndarray, r: int, ring: int, chunk: int
) -> jnp.ndarray:
    """(nch, side^2) bool: which CV deltas appear in each chunk's candidate
    universe.  The per-parent stage packs delta keys into 32-bit presence
    WORDS (side^2/32 of them) so the heavy (parents x ring-offsets) stage
    touches ~35 lanes per parent instead of 1089 - both a sort/scatter and a
    direct one-hot formulation measured 20-40 ms at the bench shape; this
    is ~5M VPU ops.  Bits expand to the (nch, side^2) map only per CHUNK."""
    npy, npx = winners.shape[:2]
    n_p = npy * npx
    nch = -(-n_p // chunk)
    side = 2 * r + 1
    nwords = (side * side + 31) // 32
    wp = jnp.pad(winners, ((ring, ring), (ring, ring), (0, 0)), mode="edge")
    warange = jnp.arange(nwords, dtype=jnp.int32)[None, :]
    acc = jnp.zeros((n_p, nwords), jnp.uint32)
    for dy in range(-ring, ring + 1):
        for dx in range(-ring, ring + 1):
            nb = wp[ring + dy : ring + dy + npy, ring + dx : ring + dx + npx]
            d = nb - base  # value rebased on the EVALUATING parent's center
            ky = d[..., 1] + r
            kx = d[..., 0] + r
            ok = (ky >= 0) & (ky < side) & (kx >= 0) & (kx < side)
            key = jnp.where(ok, ky * side + kx, -1).reshape(n_p)
            bit = jnp.left_shift(
                jnp.uint32(1), (key % 32).astype(jnp.uint32)
            )
            acc = acc | jnp.where(
                (key[:, None] >= 0) & (key[:, None] // 32 == warange),
                bit[:, None],
                jnp.uint32(0),
            )
    pad = nch * chunk - n_p
    if pad:
        acc = jnp.pad(acc, ((0, pad), (0, 0)))
    words = jax.lax.reduce(
        acc.reshape(nch, chunk, nwords),
        jnp.uint32(0),
        jax.lax.bitwise_or,
        (1,),
    )  # (nch, nwords)
    idx = jnp.arange(side * side, dtype=jnp.int32)
    expanded = jnp.repeat(words, 32, axis=1)[:, : side * side]
    return (expanded >> (idx % 32).astype(jnp.uint32)[None]) & 1 > 0


def chunk_delta_slots(
    winners: jnp.ndarray,  # (npy, npx, 2) i32 search-winner MVs
    base: jnp.ndarray,     # (npy, npx, 2) i32 window-center MVs
    r: int,
    k_slots: int,
    ring: int = 3,
    chunk: int = 128,
) -> jnp.ndarray:
    """(nch, K, 2) i32 CV-index deltas (dy_idx, dx_idx in [0, 2r]); unused
    slots hold -1 (matching no candidate).  Slots are the first K distinct
    deltas in key order (deterministic)."""
    side = 2 * r + 1
    presence = _presence(winners, base, r, ring, chunk)
    idx = jnp.arange(side * side, dtype=jnp.int32)
    rank = jnp.cumsum(presence.astype(jnp.int32), axis=-1) - 1  # per delta
    take = presence & (rank < k_slots)
    onehot = take[:, :, None] & (
        rank[:, :, None] == jnp.arange(k_slots, dtype=jnp.int32)
    )  # (nch, side^2, K)
    dv_key = jnp.where(
        onehot.any(axis=1),
        (onehot * idx[None, :, None]).sum(axis=1),
        -1,
    ).astype(jnp.int32)
    dy_idx = jnp.where(dv_key >= 0, dv_key // side, -1)
    dx_idx = jnp.where(dv_key >= 0, dv_key % side, -1)
    return jnp.stack([dy_idx, dx_idx], axis=-1)


def overflow_fraction(
    winners: jnp.ndarray, base: jnp.ndarray, r: int, k_slots: int,
    ring: int = 3, chunk: int = 128,
) -> jnp.ndarray:
    """Fraction of chunks whose distinct in-window delta count exceeds K
    (diagnostic: nonzero means the compact tables exclude real deltas)."""
    presence = _presence(winners, base, r, ring, chunk)
    return (presence.sum(axis=-1) > k_slots).mean()

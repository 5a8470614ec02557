"""Pallas kernel feeding the windowed regularizer's cost volumes.

Emits the per-delta absolute-difference (or squared-difference) maps between
each parent block and its search window:

    diffs[(dy, dx), :, :, P] = |patch1[P] - window[P] shifted by (dy-R, dx-R)|

and pools them to every subdivision size inside VMEM (the raw maps never
reach HBM).  Structure: parent blocks on the 128-wide lane dim, the delta
ROW as a grid dimension (windows stay VMEM-resident across it), delta
columns in 8-aligned groups.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def cv_dtype(cur: int, cost: str):
    """Smallest unsigned/int dtype holding a worst-case cost at block size cur."""
    peak = (255 * 255 if cost == "ssd" else 255) * cur * cur
    return jnp.uint16 if peak < (1 << 16) else jnp.int32


def _pooled_kernel(patches_ref, wslab_ref, *out_refs, bs, ext, r, cost):
    """Per-delta diff maps pooled to every subdivision size in one pass.

    Writes out_refs[k] = the (s_k, s_k, CB) cost maps at sub-block size
    cur = 2, 4, ..., bs (ascending k), without ever materializing the raw
    (bs, bs) diff maps in HBM.

    wslab_ref cols are pre-cropped so delta column dx reads cols
    [dx, dx+bs); the dx loop runs as a fori_loop over 8-aligned groups
    (Mosaic: dynamic sublane starts must be multiples of 8) with a static
    8-wide unroll inside, so loop-body stack is reused instead of
    allocating ~side copies of the diff intermediates.
    """
    dy = pl.program_id(1)
    side = 2 * r + 1
    b = patches_ref[...].astype(jnp.int32)  # (bs, bs, CB)
    cb = b.shape[-1]

    def body(g, _):
        wide = wslab_ref[pl.ds(ext - r + dy, bs), pl.ds(8 * g, bs + 8), :]
        for dxr in range(8):
            dx = 8 * g + dxr
            w = wide[:, dxr : dxr + bs, :].astype(jnp.int32)
            pool = jnp.abs(b - w) if cost == "sad" else (b - w) * (b - w)
            s, cur, k = bs, 1, 0

            @pl.when(dx < side)
            def _():
                nonlocal pool, s, cur, k
                while cur < bs:
                    # 2x2 pooling on the two leading (non-lane) axes
                    pool = pool.reshape(s // 2, 2, s // 2, 2, cb).sum(axis=(1, 3))
                    s >>= 1
                    cur <<= 1
                    if cur >= 2:
                        dt = out_refs[k].dtype
                        if cur <= bs // 2:
                            # X-parity de-interleaved layout: the color-step
                            # kernel picks a color plane purely via its
                            # index_map (row 2j+ci, plane cj) - no XLA-side
                            # color slicing of the CV at all
                            ps = pool.reshape(s, s // 2, 2, cb)
                            for bx in range(2):
                                out_refs[k][0, dx, :, bx] = ps[:, :, bx].astype(dt)
                        else:  # cur == bs: f == 1, legacy unsplit layout
                            out_refs[k][0, dx] = pool.astype(dt)
                        k += 1
        return 0

    jax.lax.fori_loop(0, (side + 7) // 8, body, 0)


def _pooled_kernel_planes(patches_ref, wslab_ref, *out_refs, bs, ext, r, cost):
    """Parity-plane variant of ``_pooled_kernel``.

    The 5-D reshape-sum 2x2 pooling dominates the straight kernel (~12 of
    ~21 ms on L0: splitting the x/sublane dim relayouts every element, once
    per delta column).  Here the x-split happens ONCE per 8-dx group on the
    loaded (bs, bs+8) window slab (on i16, before widening), patches arrive
    pre-split from the caller, and per dx the cur=2 cell costs are sums of
    plane-aligned diffs with static sublane offsets ((p+dxr)//4 in {0,1,2}).
    The 2x2 y-pool is a leading-dim pair sum (pure tile addressing), and the
    cur=2 X-parity de-interleaved store layout falls out of the plane
    pairing (cell x-parity == pixel plane pair).  Deeper sizes pool from the
    small cur=4 grid with the old reshape-sums.

    patches_ref: (4, bs, bs//4, CB) i16, plane p holds x = 4k + p.
    """
    dy = pl.program_id(1)
    side = 2 * r + 1
    cb = patches_ref.shape[-1]
    q4 = bs // 4
    s2 = bs // 2
    bp = [patches_ref[p].astype(jnp.int32) for p in range(4)]  # (bs, q4, cb)

    def body(g, _):
        wide = wslab_ref[pl.ds(ext - r + dy, bs), pl.ds(8 * g, bs + 8), :]
        wr = wide.reshape(bs, q4 + 2, 4, cb)
        wq = [wr[:, :, c, :].astype(jnp.int32) for c in range(4)]

        for dxr in range(8):
            dx = 8 * g + dxr
            # cur=2 cells (y-pooled): cell x-parity bx from plane pairs
            # (bx=0 <- pixels x=4k,4k+1; bx=1 <- x=4k+2,4k+3).  Computed
            # unconditionally (plane widths cover the unrolled dx reach;
            # masked iterations only skip the stores).
            halves = []
            for bx in range(2):
                acc = None
                for p in (2 * bx, 2 * bx + 1):
                    c = (p + dxr) % 4
                    off = (p + dxr) // 4
                    d = bp[p] - wq[c][:, off : off + q4, :]
                    d = jnp.abs(d) if cost == "sad" else d * d
                    acc = d if acc is None else acc + d
                halves.append(acc.reshape(s2, 2, q4, cb).sum(axis=1))

            @pl.when(dx < side)
            def _():
                dt0 = out_refs[0].dtype
                for bx in range(2):
                    out_refs[0][0, dx, :, bx] = halves[bx].astype(dt0)
                # cur=4: x-pool = interleaved plane-pair sum (elementwise),
                # y-pool = leading-dim pair sum
                pool = (halves[0] + halves[1]).reshape(
                    bs // 4, 2, q4, cb
                ).sum(axis=1)  # (bs//4, bs//4, cb)
                s, cur, k = bs // 4, 4, 1
                while cur <= bs:
                    dt = out_refs[k].dtype
                    if cur <= bs // 2:
                        ps = pool.reshape(s, s // 2, 2, cb)
                        for bx in range(2):
                            out_refs[k][0, dx, :, bx] = ps[:, :, bx].astype(dt)
                    else:
                        out_refs[k][0, dx] = pool.astype(dt)
                    k += 1
                    cur <<= 1
                    if cur <= bs:
                        pool = pool.reshape(s // 2, 2, s // 2, 2, cb).sum(
                            axis=(1, 3)
                        )
                        s >>= 1
        return 0

    jax.lax.fori_loop(0, (side + 7) // 8, body, 0)


def _diff_kernel_static(patches_ref, wplanes_ref, *out_refs, bs, ext,
                        r, cost, emit_o2=True, store_r2=None):
    """Fully-unrolled parity-plane diff kernel: cur=2 and cur=4, both split.

    Structural changes over ``_pooled_kernel_planes``, measured ~2x faster
    together with ``_tail_kernel_static`` (scripts/tpu_cv_split2.py: ~13-15
    -> ~7 ms on L0 at 1152x1920):

      * the delta-column loop is a STATIC ``range(side)`` - no group
        fori_loop, no ``pl.when`` masking of the 8-wide unroll tail;
      * the window x-parity planes arrive PRE-SPLIT from the caller (one
        cheap XLA transpose) instead of a per-group in-kernel sublane
        relayout of the loaded slab;
      * only cur <= 4 is produced here; deeper sizes pool from the SPLIT
        cur=4 volume in ``_tail_kernel_static``, where the x-pair merge is
        a free (non-sublane) select.

    patches_ref: (4, bs, bs//4, CB) i16, plane p holds x = 4k + p.
    wplanes_ref: (4, win, cols//4, CB) i16, same plane convention.
    """
    dy = pl.program_id(1)
    side = 2 * r + 1
    q4 = bs // 4
    s2 = bs // 2
    cb = patches_ref.shape[-1]
    # int16 arithmetic would halve the VPU op count (i16 vregs pack 2x)
    # and every SAD intermediate fits (<= 4080 at the cur=4 pool), but this
    # Mosaic only legalizes add/sub on packed i16 - abs, max, shifts and
    # selects all fail to lower - so the diff pass stays int32 (measured
    # negative, r3).
    wt = jnp.int32
    bp = [patches_ref[p].astype(wt) for p in range(4)]
    wq = [wplanes_ref[c, pl.ds(ext - r + dy, bs), :, :] for c in range(4)]

    if emit_o2:
        o2_ref, o4_ref = out_refs
        dt2 = o2_ref.dtype
    else:
        (o4_ref,) = out_refs
    dt4 = o4_ref.dtype
    # store_r2: the cur=2 volume keeps only |dx-delta| <= store_r2 (the
    # r_store traffic mode - out-of-band candidates are recomputed from
    # the window slab by the hybrid tail kernel,
    # kernels/fused_step._kernel_pm_hybrid_tail).  Only the COLUMN delta
    # is restricted: dy is the grid dimension, and a dy-restricted store
    # needs a clamped/non-monotonic output index_map, which HANGS this
    # remote Mosaic pipeline outright (measured on a 3-line repro, r4) -
    # the dx restriction is purely static and already halves the volume.
    off2 = 0 if store_r2 is None else r - store_r2
    ss2 = side if store_r2 is None else 2 * store_r2 + 1

    # memoize the (plane, sublane-offset) window slices: the (c, off) pairs
    # repeat ~4x across the (p, dx) loop, and each non-8-aligned slice of
    # the (bs, cols//4, cb) plane is a cross-sublane relayout.  Measured
    # (r5): -18% on the isolated single-output L0 probe
    # (scripts/tpu_cv_split2.py main 5.0 -> 4.1 ms), NEUTRAL in the full
    # production kernel (cv_build 12.14 ms/field before and after - the
    # dual-output store path, not the relayouts, bounds it there).  Kept:
    # values identical, strictly fewer emitted ops.
    _slices = {}

    def shifted(c, off):
        if (c, off) not in _slices:
            _slices[(c, off)] = wq[c][:, off : off + q4, :].astype(wt)
        return _slices[(c, off)]

    for dx in range(side):
        halves = []
        for bx in range(2):
            acc = None
            for p in (2 * bx, 2 * bx + 1):
                c = (p + dx) % 4
                off = (p + dx) // 4
                d = bp[p] - shifted(c, off)
                d = jnp.abs(d) if cost == "sad" else d * d
                acc = d if acc is None else acc + d
            halves.append(acc.reshape(s2, 2, q4, cb).sum(axis=1))
        if emit_o2 and off2 <= dx < off2 + ss2:
            for bx in range(2):
                # y-parity split on the leading dim is free
                hr = halves[bx].reshape(s2 // 2, 2, q4, cb)
                o2_ref[:, :, bx, 0, 0, dx - off2] = hr.astype(dt2)
        pool4 = (halves[0] + halves[1]).reshape(q4, 2, q4, cb).sum(axis=1)
        pr = pool4.reshape(q4 // 2, 2, q4 // 2, 2, cb)
        for bx in range(2):
            o4_ref[:, :, bx, 0, 0, dx] = pr[:, :, :, bx].astype(dt4)


def _tail_kernel_static(cv4_ref, *out_refs, bs):
    """cur >= 8 volumes from the SPLIT cur=4 volume, all deltas at once.

    In split form the 2x2 cell pooling is almost relayout-free: the x-pair
    merge adds the two parity planes (a non-sublane select), the y-pair
    merge reshapes a non-minor dim (register adds); only re-splitting the
    OUTPUT's x parity touches sublanes, on 4x-shrinking data.  Doing this
    against the unsplit volume instead costs a full sublane relayout of
    every element per stage (measured ~2x slower end to end), and doing it
    in XLA over the HBM-resident volume costs 10+ ms in strided slices.
    """
    # block (s//2, 2, 2, 1, 1, side, s//2, cb): (yq, yp, bx, ., ., dx, xq, cb)
    c = cv4_ref[:, :, :, 0, 0].astype(jnp.int32)
    s2h, side, cb = c.shape[0], c.shape[3], c.shape[-1]
    s = 2 * s2h
    cur, k = 4, 0
    while cur < bs:
        a = c[:, :, 0] + c[:, :, 1]     # x-pair merge: (yq, yp, side, xq, cb)
        b = a[:, 0] + a[:, 1]           # y-pair merge: (s//2, side, s//2, cb)
        cur, s = cur * 2, s // 2
        dt = out_refs[k].dtype
        if cur < bs:
            # re-split: y on the leading dims (free), x on sublanes
            xr = b.reshape(s // 2, 2, side, s // 2, 2, cb)
            for bx in range(2):
                out_refs[k][:, :, bx, 0, 0] = xr[:, :, :, :, bx].astype(dt)
            c = jnp.stack(
                [xr[:, :, :, :, 0], xr[:, :, :, :, 1]], axis=2
            )
        else:  # cur == bs: legacy unsplit (side, side, 1, 1, n) layout
            out_refs[k][0] = b.reshape(side, 1, 1, cb).astype(dt)
        k += 1


def _diff_kernel_bs_only(patches_ref, wplanes_ref, obs_ref, *, bs, ext, r,
                         cost):
    """Full-block (cur == bs) costs only: the search volume.

    Same parity-plane diff structure as ``_diff_kernel_static`` but pooled
    all the way down per delta column (the per-dx tail pooling runs on a
    (bs//4)^2 grid - tiny), so the dense o4 volume and the tail kernel's
    HBM round trip disappear entirely in compact mode.
    """
    dy = pl.program_id(1)
    side = 2 * r + 1
    q4 = bs // 4
    cb = patches_ref.shape[-1]
    bp = [patches_ref[p].astype(jnp.int32) for p in range(4)]
    wq = [wplanes_ref[c, pl.ds(ext - r + dy, bs), :, :] for c in range(4)]

    dt = obs_ref.dtype

    # memoized (plane, offset) slices - see _diff_kernel_static
    _slices = {}

    def shifted(c, off):
        if (c, off) not in _slices:
            _slices[(c, off)] = wq[c][:, off : off + q4, :].astype(jnp.int32)
        return _slices[(c, off)]
    for dx in range(side):
        acc = None
        for p in range(4):
            c = (p + dx) % 4
            off = (p + dx) // 4
            d = bp[p] - shifted(c, off)
            d = jnp.abs(d) if cost == "sad" else d * d
            acc = d if acc is None else acc + d
        pool = acc  # (bs, q4, cb)
        s = q4
        while s > 1:
            pool = pool.reshape(pool.shape[0], s // 2, 2, cb).sum(axis=2)
            s >>= 1
        full = pool.sum(axis=0)[0]  # collapse y: (1, cb) -> (cb,)
        obs_ref[0, dx, 0, 0] = full.astype(dt)


def full_block_volume(
    patches_t: jnp.ndarray,  # (bs, bs, nP) i16
    windows_t: jnp.ndarray,  # (win, win, nP) i16
    bs: int,
    ext: int,
    r: int,
    cost: str = "sad",
    interpret: bool = False,
) -> jnp.ndarray:
    """(side, side, 1, 1, nPad) cur == bs cost volume (the legacy unsplit
    layout the fused search argmin consumes), without any deeper volumes."""
    cb = 128
    n_p = patches_t.shape[-1]
    win = windows_t.shape[0]
    side = 2 * r + 1
    npad = -n_p % cb
    if npad:
        patches_t = jnp.pad(patches_t, ((0, 0), (0, 0), (0, npad)))
        windows_t = jnp.pad(windows_t, ((0, 0), (0, 0), (0, npad)))
    n = n_p + npad
    nch = n // cb
    ngroups = (side + 7) // 8
    cols = 8 * ngroups + bs
    wslab = windows_t[:, ext - r :, :]
    pad_c = cols - wslab.shape[1]
    if pad_c > 0:
        wslab = jnp.pad(wslab, ((0, 0), (0, pad_c), (0, 0)))
    else:
        wslab = wslab[:, :cols, :]
    q4 = bs // 4
    patches_in = patches_t.reshape(bs, q4, 4, n).transpose(2, 0, 1, 3)
    wplanes = wslab.reshape(win, cols // 4, 4, n).transpose(2, 0, 1, 3)
    return pl.pallas_call(
        functools.partial(
            _diff_kernel_bs_only, bs=bs, ext=ext, r=r, cost=cost
        ),
        grid=(nch, side),
        in_specs=[
            pl.BlockSpec((4, bs, q4, cb), lambda i, j: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, win, cols // 4, cb), lambda i, j: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, side, 1, 1, cb), lambda i, j: (j, 0, 0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (side, side, 1, 1, n), cv_dtype(bs, cost)
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(patches_in, wplanes)


def _diff_kernel_deep(patches_ref, wplanes_ref, *out_refs, bs, ext, r, cost,
                      emit_curs):
    """Diff pass emitting ONLY the coarse volumes (cur in ``emit_curs``).

    Serves the chunk-fused mode (``kernels.fused_step``): the fine rounds
    (cur <= cv_fused) recompute their candidate costs in the color-step
    kernel itself, so their dense volumes are never materialized - this
    kernel runs the same parity-plane diff pass as ``_diff_kernel_static``
    but pools each delta column straight down to the coarse sizes + the
    cur == bs search volume, writing a tiny fraction of the HBM traffic.

    emit_curs: ascending sub-block sizes to emit; sizes < bs store the split
    chunk-major layout, ``bs`` stores the legacy unsplit search layout.
    """
    dy = pl.program_id(1)
    side = 2 * r + 1
    q4 = bs // 4
    s2 = bs // 2
    cb = patches_ref.shape[-1]
    # int16 arithmetic would halve the VPU op count (i16 vregs pack 2x)
    # and every SAD intermediate fits (<= 4080 at the cur=4 pool), but this
    # Mosaic only legalizes add/sub on packed i16 - abs, max, shifts and
    # selects all fail to lower - so the diff pass stays int32 (measured
    # negative, r3).
    wt = jnp.int32
    bp = [patches_ref[p].astype(wt) for p in range(4)]
    wq = [wplanes_ref[c, pl.ds(ext - r + dy, bs), :, :] for c in range(4)]


    # memoized (plane, offset) slices - see _diff_kernel_static
    _slices = {}

    def shifted(c, off):
        if (c, off) not in _slices:
            _slices[(c, off)] = wq[c][:, off : off + q4, :].astype(wt)
        return _slices[(c, off)]
    for dx in range(side):
        halves = []
        for bx in range(2):
            acc = None
            for p in (2 * bx, 2 * bx + 1):
                c = (p + dx) % 4
                off = (p + dx) // 4
                d = bp[p] - shifted(c, off)
                d = jnp.abs(d) if cost == "sad" else d * d
                acc = d if acc is None else acc + d
            halves.append(acc.reshape(s2, 2, q4, cb).sum(axis=1))
        # cur=4 map; deeper sizes pool on the shrinking cell grid (int32:
        # cur=16 sums exceed int16)
        pool = (halves[0] + halves[1]).reshape(q4, 2, q4, cb).sum(axis=1)
        cur, s, k = 4, q4, 0
        while cur <= bs:
            if cur in emit_curs:
                dt = out_refs[k].dtype
                if cur <= bs // 2:
                    pr = pool.reshape(s // 2, 2, s // 2, 2, cb)
                    for bx in range(2):
                        out_refs[k][:, :, bx, 0, 0, dx] = pr[:, :, :, bx].astype(dt)
                else:  # cur == bs: the search volume, unsplit layout
                    out_refs[k][0, dx, 0, 0] = pool[0, 0].astype(dt)
                k += 1
            cur <<= 1
            if cur <= bs:
                pool = pool.reshape(s // 2, 2, s // 2, 2, cb).sum(axis=(1, 3))
                s >>= 1


@functools.partial(
    jax.jit,
    static_argnames=("bs", "ext", "r", "cost", "fuse_max", "interpret"),
)
def deep_pooled_cvs(
    patches_t: jnp.ndarray,  # (bs, bs, nP) i16
    windows_t: jnp.ndarray,  # (win, win, nP) i16
    bs: int,
    ext: int,
    r: int,
    fuse_max: int,
    cost: str = "sad",
    interpret: bool = False,
) -> dict[int, jnp.ndarray]:
    """Coarse volumes {cur > fuse_max} + the cur == bs search volume only.

    Chunk-fused companion of ``delta_pooled_cvs``: sizes <= fuse_max are
    recomputed inside the fused color-step kernel and never stored.
    """
    cb = 128
    n_p = patches_t.shape[-1]
    win = windows_t.shape[0]
    side = 2 * r + 1
    npad = -n_p % cb
    if npad:
        patches_t = jnp.pad(patches_t, ((0, 0), (0, 0), (0, npad)))
        windows_t = jnp.pad(windows_t, ((0, 0), (0, 0), (0, npad)))
    n = n_p + npad
    nch = n // cb
    ngroups = (side + 7) // 8
    cols = 8 * ngroups + bs
    wslab = windows_t[:, ext - r :, :]
    pad_c = cols - wslab.shape[1]
    if pad_c > 0:
        wslab = jnp.pad(wslab, ((0, 0), (0, pad_c), (0, 0)))
    else:
        wslab = wslab[:, :cols, :]
    q4 = bs // 4
    patches_in = patches_t.reshape(bs, q4, 4, n).transpose(2, 0, 1, 3)
    wplanes = wslab.reshape(win, cols // 4, 4, n).transpose(2, 0, 1, 3)

    emit_curs = tuple(
        c for c in (4, 8, 16, 32, 64, 128) if fuse_max < c < bs
    ) + (bs,)
    out_specs, out_shape = [], []
    for c in emit_curs:
        s = bs // c
        if c <= bs // 2:
            out_specs.append(
                pl.BlockSpec((s // 2, 2, 2, 1, 1, side, s // 2, cb),
                             lambda i, j: (0, 0, 0, i, j, 0, 0, 0),
                             memory_space=pltpu.VMEM)
            )
            out_shape.append(
                jax.ShapeDtypeStruct(
                    (s // 2, 2, 2, nch, side, side, s // 2, cb),
                    cv_dtype(c, cost),
                )
            )
        else:
            out_specs.append(
                pl.BlockSpec((1, side, 1, 1, cb), lambda i, j: (j, 0, 0, 0, i),
                             memory_space=pltpu.VMEM)
            )
            out_shape.append(
                jax.ShapeDtypeStruct((side, side, 1, 1, n), cv_dtype(c, cost))
            )
    outs = pl.pallas_call(
        functools.partial(
            _diff_kernel_deep, bs=bs, ext=ext, r=r, cost=cost,
            emit_curs=emit_curs,
        ),
        grid=(nch, side),
        in_specs=[
            pl.BlockSpec((4, bs, q4, cb), lambda i, j: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, win, cols // 4, cb), lambda i, j: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(patches_in, wplanes)
    if not isinstance(outs, (list, tuple)):
        outs = [outs]
    return dict(zip(emit_curs, outs))


def _compact_kernel(dv_ref, patches_ref, wslab_ref, *out_refs, bs,
                    ext, r, k_slots, cost):
    """Pooled cost tables at ONLY the chunk's K slot deltas, every
    subdivision size cur = 2 .. bs/2 (out_refs ascending cur).

    grid: (nch,).  Slot deltas arrive as SMEM-prefetched CV indices
    (dy_idx, dx_idx in [0, 2r]; -1 = unused).  The delta row slices the
    window slab's leading (untiled) dim - free dynamic start; the column
    start must be 8-aligned on the sublane dim, so it is split into an
    aligned dynamic slice plus an 8-way static-offset branch selected by a
    scalar predicate (Mosaic executes only the matching branch).  K ~ 32
    deltas re-diff ~3% of the dense pass's work while every dense
    sub-block volume disappears.
    """
    ch = pl.program_id(0)
    b = patches_ref[...].astype(jnp.int32)  # (bs, bs, cb)
    cb = b.shape[-1]
    for o in out_refs:
        o[...] = jnp.zeros(o.shape, o.dtype)
    for k in range(k_slots):
        # dv is FLAT (nch*K*2,): SMEM tiles trailing dims to 128 lanes, so a
        # (nch, K, 2) prefetch would pad to 32 KB per chunk and overflow the
        # ~1 MB SMEM at real frame sizes
        dy = dv_ref[(ch * k_slots + k) * 2]
        dx = dv_ref[(ch * k_slots + k) * 2 + 1]
        g8 = jnp.maximum(dx, 0) // 8 * 8
        wide = wslab_ref[pl.ds(ext - r + jnp.maximum(dy, 0), bs),
                         pl.ds(g8, bs + 8), :]
        for j in range(8):

            @pl.when((dx >= 0) & (dx % 8 == j))
            def _(j=j, k=k, wide=wide):
                w = wide[:, j : j + bs, :].astype(jnp.int32)
                pool = jnp.abs(b - w) if cost == "sad" else (b - w) * (b - w)
                s = bs
                for o in out_refs:  # ascending cur = 2, 4, ..., bs/2
                    pool = pool.reshape(s // 2, 2, s // 2, 2, cb).sum(
                        axis=(1, 3)
                    )
                    s >>= 1
                    ps = pool.reshape(s // 2, 2, s // 2, 2, cb)
                    for bx in range(2):
                        o[:, :, bx, 0, k] = ps[:, :, :, bx].astype(o.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("bs", "ext", "r", "k_slots", "cost", "interpret"),
)
def compact_tables(
    patches_t: jnp.ndarray,  # (bs, bs, nP) i16
    windows_t: jnp.ndarray,  # (win, win, nP) i16
    dv: jnp.ndarray,         # (nch, K, 2) i32 CV-index slot deltas
    bs: int,
    ext: int,
    r: int,
    k_slots: int,
    cost: str = "sad",
    interpret: bool = False,
) -> dict[int, jnp.ndarray]:
    """{2, 4, ..., bs/2}: compact per-chunk K-slot tables in the chunk-major
    split layout (s//2, 2, 2, nch, K, s//2, 128) the pm color-step kernel
    tiles."""
    cb = 128
    n_p = patches_t.shape[-1]
    win = windows_t.shape[0]
    side = 2 * r + 1
    npad = -n_p % cb
    if npad:
        patches_t = jnp.pad(patches_t, ((0, 0), (0, 0), (0, npad)))
        windows_t = jnp.pad(windows_t, ((0, 0), (0, 0), (0, npad)))
    n = n_p + npad
    nch = n // cb
    assert dv.shape == (nch, k_slots, 2), (dv.shape, nch, k_slots)
    dv_flat = dv.reshape(-1)

    ngroups = (side + 7) // 8
    cols = 8 * ngroups + bs
    wslab = windows_t[:, ext - r :, :]
    pad_c = cols - wslab.shape[1]
    if pad_c > 0:
        wslab = jnp.pad(wslab, ((0, 0), (0, pad_c), (0, 0)))
    else:
        wslab = wslab[:, :cols, :]

    curs = []
    cur = 2
    while cur <= bs // 2:
        curs.append(cur)
        cur <<= 1
    out_specs, out_shape = [], []
    for cur in curs:
        s = bs // cur
        out_specs.append(
            pl.BlockSpec((s // 2, 2, 2, 1, k_slots, s // 2, cb),
                         lambda i, sc: (0, 0, 0, i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(
            jax.ShapeDtypeStruct(
                (s // 2, 2, 2, nch, k_slots, s // 2, cb), cv_dtype(cur, cost)
            )
        )
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nch,),
        in_specs=[
            pl.BlockSpec((bs, bs, cb), lambda i, sc: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((win, cols, cb), lambda i, sc: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
    )
    outs = pl.pallas_call(
        functools.partial(
            _compact_kernel, bs=bs, ext=ext, r=r, k_slots=k_slots, cost=cost
        ),
        grid_spec=gs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(dv_flat, patches_t, wslab)
    if not isinstance(outs, (list, tuple)):
        outs = [outs]
    return dict(zip(curs, outs))


@functools.partial(
    jax.jit,
    static_argnames=(
        "bs", "ext", "r", "cost", "block_chunk", "interpret", "variant",
        "emit_o2", "store_r2",
    ),
)
def delta_pooled_cvs(
    patches_t: jnp.ndarray,  # (bs, bs, nP) i16 frame-1 parent blocks
    windows_t: jnp.ndarray,  # (win, win, nP) i16 frame-2 windows
    bs: int,
    ext: int,
    r: int,
    cost: str = "sad",
    block_chunk: int = 128,
    interpret: bool = False,
    variant: str = "auto",
    emit_o2: bool = True,
    store_r2: int | None = None,
) -> dict[int, jnp.ndarray]:
    """Pooled cost volumes per sub-block size, s = bs // cur.

    cur <= bs/2: CHUNK-MAJOR split layout
    (s//2, 2, 2, nPad//128, side, side, s//2, 128) = (yq, yp, bx, chunk,
    side, side, xq, lane) with cell y = 2*yq + yp and x = 2*xq + bx - BOTH
    cell parities de-interleaved so a color plane is pure index arithmetic
    downstream AND the color-step kernel can take multiple sy rows per tile
    (consecutive yq), and the parent-chunk dim hoisted ahead of the delta
    dims so one color-step tile's CV block is a CONTIGUOUS HBM run (the old
    nP-minor layout DMA'd every volume in 256-byte strided chunks on both
    the write and the read side);
    cur == bs: (side, side, 1, 1, nPad) unsplit.  nPad = nP rounded up to
    the lane-chunk multiple.

    variant: "static" (fully-unrolled parity-plane kernel + XLA-derived
    deeper sizes, needs bs % 8 == 0), "planes" (grouped parity-plane
    pooling, bs % 8 == 0), "reshape" (per-dx reshape-sum pooling), or
    "auto" (static when legal).
    """
    if variant == "auto":
        variant = "static" if bs % 8 == 0 else "reshape"
    n_p = patches_t.shape[-1]
    side = 2 * r + 1
    win = windows_t.shape[0]
    cb = block_chunk  # always full lane chunks: consumers tile lanes by 128
    npad = -n_p % cb
    if npad:
        patches_t = jnp.pad(patches_t, ((0, 0), (0, 0), (0, npad)))
        windows_t = jnp.pad(windows_t, ((0, 0), (0, 0), (0, npad)))
    n = n_p + npad

    # crop cols so the kernel's delta column dx starts at col dx, padded out
    # to the 8-aligned group loads' reach (8*ngroups + bs)
    ngroups = (side + 7) // 8
    cols = 8 * ngroups + bs
    wslab = windows_t[:, ext - r :, :]
    pad_c = cols - wslab.shape[1]
    if pad_c > 0:
        wslab = jnp.pad(wslab, ((0, 0), (0, pad_c), (0, 0)))
    else:
        wslab = wslab[:, :cols, :]

    curs = []
    cur = 2
    while cur <= bs:
        curs.append(cur)
        cur <<= 1

    if variant == "static":
        q4 = bs // 4
        s2 = bs // 2
        nch = n // cb
        # the whole-delta-row blocks + unrolled temporaries exceed the
        # default 16M scoped-vmem budget; v5e has headroom well past it
        params = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
        patches_in = patches_t.reshape(bs, q4, 4, n).transpose(2, 0, 1, 3)
        wplanes = wslab.reshape(win, cols // 4, 4, n).transpose(2, 0, 1, 3)
        if store_r2 is None:
            o2_side = side
        else:
            # dx-restricted cur=2 store (see _diff_kernel_static: a
            # dy-restricted store needs a clamped output index_map, which
            # hangs this backend's compiler)
            assert 0 <= store_r2 < r, (store_r2, r)
            o2_side = 2 * store_r2 + 1

        out_specs = [
            pl.BlockSpec((s2 // 2, 2, 2, 1, 1, o2_side, s2 // 2, cb),
                         lambda i, j: (0, 0, 0, i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q4 // 2, 2, 2, 1, 1, side, q4 // 2, cb),
                         lambda i, j: (0, 0, 0, i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct(
                (s2 // 2, 2, 2, nch, side, o2_side, s2 // 2, cb),
                cv_dtype(2, cost),
            ),
            jax.ShapeDtypeStruct(
                (q4 // 2, 2, 2, nch, side, side, q4 // 2, cb),
                cv_dtype(4, cost),
            ),
        ]
        if not emit_o2:  # compact mode: dense cur=2 never materializes
            out_specs, out_shape = out_specs[1:], out_shape[1:]
        outs = pl.pallas_call(
            functools.partial(
                _diff_kernel_static, bs=bs, ext=ext, r=r, cost=cost,
                emit_o2=emit_o2, store_r2=store_r2,
            ),
            grid=(nch, side),
            in_specs=[
                pl.BlockSpec((4, bs, q4, cb), lambda i, j: (0, 0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, win, cols // 4, cb),
                             lambda i, j: (0, 0, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=params,
            interpret=interpret,
        )(patches_in, wplanes)
        if emit_o2:
            o2, o4 = outs
            cvs = {2: o2, 4: o4}
        else:
            (o4,) = outs if isinstance(outs, (list, tuple)) else (outs,)
            cvs = {4: o4}
        if bs > 4:
            out_shapes, out_specs = [], []
            for c in curs[2:]:
                s = bs // c
                if c <= bs // 2:
                    out_shapes.append(
                        jax.ShapeDtypeStruct(
                            (s // 2, 2, 2, nch, side, side, s // 2, cb),
                            cv_dtype(c, cost),
                        )
                    )
                    out_specs.append(
                        pl.BlockSpec(
                            (s // 2, 2, 2, 1, 1, side, s // 2, cb),
                            lambda i, j: (0, 0, 0, i, j, 0, 0, 0),
                            memory_space=pltpu.VMEM,
                        )
                    )
                else:
                    out_shapes.append(
                        jax.ShapeDtypeStruct(
                            (side, side, s, s, n), cv_dtype(c, cost)
                        )
                    )
                    out_specs.append(
                        pl.BlockSpec(
                            (1, side, s, s, cb),
                            lambda i, j: (j, 0, 0, 0, i),
                            memory_space=pltpu.VMEM,
                        )
                    )
            deeper = pl.pallas_call(
                functools.partial(_tail_kernel_static, bs=bs),
                grid=(nch, side),
                in_specs=[
                    pl.BlockSpec((q4 // 2, 2, 2, 1, 1, side, q4 // 2, cb),
                                 lambda i, j: (0, 0, 0, i, j, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
                ],
                out_specs=out_specs,
                out_shape=out_shapes,
                compiler_params=params,
                interpret=interpret,
            )(o4)
            if not isinstance(deeper, (list, tuple)):
                deeper = [deeper]
            cvs.update(dict(zip(curs[2:], deeper)))
        return cvs

    out_shapes, out_specs = [], []
    for c in curs:
        s = bs // c
        if c <= bs // 2:  # X-parity de-interleaved (see kernel)
            out_shapes.append(
                jax.ShapeDtypeStruct(
                    (side, side, s, 2, s // 2, n), cv_dtype(c, cost)
                )
            )
            out_specs.append(
                pl.BlockSpec(
                    (1, side, s, 2, s // 2, cb),
                    lambda i, j: (j, 0, 0, 0, 0, i),
                    memory_space=pltpu.VMEM,
                )
            )
        else:  # cur == bs: unsplit legacy layout
            out_shapes.append(
                jax.ShapeDtypeStruct((side, side, s, s, n), cv_dtype(c, cost))
            )
            out_specs.append(
                pl.BlockSpec(
                    (1, side, s, s, cb),
                    lambda i, j: (j, 0, 0, 0, i),
                    memory_space=pltpu.VMEM,
                )
            )
    if variant == "planes":
        kern = _pooled_kernel_planes
        # pre-split patches into x-parity planes: plane p holds x = 4k + p
        patches_in = patches_t.reshape(bs, bs // 4, 4, n).transpose(2, 0, 1, 3)
        patches_spec = pl.BlockSpec(
            (4, bs, bs // 4, cb), lambda i, j: (0, 0, 0, i),
            memory_space=pltpu.VMEM,
        )
    else:
        kern = _pooled_kernel
        patches_in = patches_t
        patches_spec = pl.BlockSpec(
            (bs, bs, cb), lambda i, j: (0, 0, i), memory_space=pltpu.VMEM
        )
    outs = pl.pallas_call(
        functools.partial(kern, bs=bs, ext=ext, r=r, cost=cost),
        grid=(n // cb, side),
        in_specs=[
            patches_spec,
            pl.BlockSpec((win, cols, cb), lambda i, j: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(patches_in, wslab)
    # lane axis stays PADDED to the chunk multiple - slicing it off here
    # would copy the whole volume; consumers mask or slice as needed.
    # Legacy variants emit the old (side, side, s, 2, s//2, n) split layout;
    # convert to the chunk-major contract (one XLA transpose per volume -
    # these variants are compat fallbacks, the static kernel is the fast
    # path and writes chunk-major natively).
    cvs = {}
    for c, out in zip(curs, outs):
        if c <= bs // 2:
            s = bs // c
            out = out.reshape(side, side, s // 2, 2, 2, s // 2, n // cb, cb)
            out = out.transpose(2, 3, 4, 6, 0, 1, 5, 7)
        cvs[c] = out
    return cvs

"""Subprocess worker for heap-isolated heavy interpret-mode parity checks.

The chunk-fused parity scenarios compile the suite's largest interpret-mode
Pallas programs.  XLA:CPU's compiler/executable-serialization intermittently
segfaults or aborts on programs this size LATE in a long test process (the
same scenarios pass reliably in a fresh process; crash sites are inside
``backend_compile_and_load`` / ``put_executable_and_time``, i.e. not in
this package's code).  Running them in a clean subprocess removes the
in-process history the crash depends on.

Run: _isolated_worker.py <scenario>   (exit 0 = parity held)
"""

import os
import sys


def main() -> int:
    scenario = sys.argv[1]

    # virtual CPU devices must be provisioned in-process, before backend
    # init (see tests/conftest.py for why the env-var recipe does not work)
    xla_flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla_flags:
        os.environ["XLA_FLAGS"] = (
            xla_flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir", "/root/.cache/jax_comp_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from blockbasedmotionestimation_tpu.config import MotionConfig
    from blockbasedmotionestimation_tpu.models import engine
    from blockbasedmotionestimation_tpu.utils import flowio, synth

    rng = np.random.default_rng(1234)

    if scenario == "chunk_fused_cv":
        cfg_dense = MotionConfig(
            block_sizes=(8, 16), search_sizes=(24, 32), interp_factor=1,
            regularizer="windowed", search_impl="pallas_interpret",
        )
        cfg_fused = cfg_dense.replace(cv_fused=4)
        base = synth.textured_image(140, 160, rng)
        im1 = base[:96, :128]
        im2 = base[5:101, 3:131]
    elif scenario == "chunk_fused_rival":
        cfg_dense = MotionConfig(
            block_sizes=(8, 8), search_sizes=(24, 24), interp_factor=1,
            regularizer="windowed", search_impl="pallas_interpret",
            rival_window=True, rival_radius=4,
        )
        cfg_fused = cfg_dense.replace(cv_fused=4)
        gt = flowio.read_flo(
            "/root/reference/middlebury/gt-flow/Dimetrodon/flow10.flo"
        )[:64, :96]
        im1, im2 = synth.pair_from_gt(gt, rng)
    elif scenario in ("rival_pallas", "rival_pallas_r8"):
        cfg_dense = MotionConfig(
            block_sizes=(8, 8), search_sizes=(24, 24), interp_factor=1,
            regularizer="windowed", rival_window=True, search_impl="xla",
            rival_radius=8 if scenario.endswith("r8") else None,
        )
        cfg_fused = cfg_dense.replace(search_impl="pallas_interpret")
        h, w, dx = 96, 128, 20
        base = synth.textured_image(h + 64, w + 64, rng)
        im1 = base[32 : 32 + h, 32 : 32 + w]
        im2 = base[32 : 32 + h, 32 - dx : 32 - dx + w]
    elif scenario == "fused_pallas":
        cfg_dense = MotionConfig(
            block_sizes=(8, 8), search_sizes=(24, 24), interp_factor=1,
            regularizer="windowed", search_impl="xla",
        )
        cfg_fused = cfg_dense.replace(search_impl="pallas_interpret")
        assert cfg_dense.uses_fused_windowed
        h, w = 64, 64
        base = synth.textured_image(h + 2 * 16, w + 2 * 16, rng)
        im1 = base[16 : 16 + h, 16 : 16 + w]
        im2 = base[16 + 2 : 16 + 2 + h, 16 + 1 : 16 + 1 + w]
    elif scenario == "rival_pallas_bs16":
        # bs=16 -> the hybrid rival covers the cur=8 middle round too
        cfg_dense = MotionConfig(
            block_sizes=(16,), search_sizes=(48,), interp_factor=1,
            regularizer="windowed", rival_window=True, rival_radius=8,
            search_impl="xla",
        )
        cfg_fused = cfg_dense.replace(search_impl="pallas_interpret")
        base = synth.textured_image(128, 160, rng)
        im1 = base[:96, :128]
        im2 = base[4:100, 3:131]
    elif scenario == "rstore":
        # r4 r_store mode: the cur=2 volume stored only for a reduced
        # column-delta band; tail candidates recomputed from the main
        # window slab (kernels/fused_step._kernel_pm_hybrid_tail).
        # Urban2 GT geometry so motion discontinuities actually push
        # candidates outside the band.
        cfg_dense = MotionConfig(
            block_sizes=(8, 8), search_sizes=(24, 24), interp_factor=1,
            regularizer="windowed", search_impl="pallas_interpret",
            rival_window=True, rival_radius=4,
        )
        cfg_fused = cfg_dense.replace(cv_store_radius=4)
        gt = flowio.read_flo(
            "/root/reference/middlebury/gt-flow/Urban2/flow10.flo"
        )[:64, :96]
        im1, im2 = synth.pair_from_gt(gt, rng)
    elif scenario in (
        "tiled_cell_rounds", "tiled_cell_rounds_fused",
        "tiled_cell_rounds_rstore",
    ):
        # r4: row-tiled strips run the parent-major cell-layout rounds
        # (and, with cv_fused, the chunk-fused/hybrid kernels); neighbor
        # MVs cross tiles only through the per-step ghost-row ppermute
        # (ops.windowed._pallas_round_pm cell_exchange).  Tiled == untiled
        # bit for bit, including hybrid rival.
        from jax.sharding import Mesh

        from blockbasedmotionestimation_tpu.parallel import tiled

        cfg = MotionConfig(
            block_sizes=(8, 8), search_sizes=(16, 16), interp_factor=1,
            regularizer="windowed", rival_window=True,
            search_impl="pallas_interpret",
            cv_fused=4 if scenario.endswith("fused") else None,
            cv_store_radius=2 if scenario.endswith("rstore") else None,
        )
        h, w, t = 256, 64, 8
        assert tiled.im2_halo(cfg, 0) < h // t  # both levels must shard
        assert tiled.im2_halo(cfg, 1) < (h // 2) // t
        base = synth.textured_image(h + 32, w + 32, rng)
        im1 = base[16 : 16 + h, 16 : 16 + w]
        im2 = base[18 : 18 + h, 15 : 15 + w]
        mesh = Mesh(np.array(jax.devices()), ("ty",))
        a = np.asarray(engine.estimate_flow_padded(im1, im2, cfg))
        b = np.asarray(tiled.estimate_flow_padded_tiled(im1, im2, cfg, mesh))
        np.testing.assert_array_equal(a, b)
        print(f"{scenario}: parity ok")
        return 0
    elif scenario == "tiled2d_cell_rounds_urban":
        # 2-D capacity parity on REAL flow geometry: Urban2 GT-warp pairs
        # have motion discontinuities, so rival/tail candidates actually
        # cross tile boundaries and the corner-extended ghost columns
        # carry live data (the translation scenarios exercise mostly
        # border junk).  Bit-exact tiled == untiled.
        from jax.sharding import Mesh

        from blockbasedmotionestimation_tpu.parallel import tiled

        cfg = MotionConfig(
            block_sizes=(8, 8), search_sizes=(16, 16), interp_factor=1,
            regularizer="windowed", rival_window=True,
            search_impl="pallas_interpret", cv_store_radius=2,
        )
        h, w, t, tx = 128, 64, 4, 2
        assert tiled.im2_halo(cfg, 0) < min(h // t, w // tx)
        gt = flowio.read_flo(
            "/root/reference/middlebury/gt-flow/Urban2/flow10.flo"
        )[:h, :w]
        im1, im2 = synth.pair_from_gt(gt, rng)
        mesh = Mesh(np.array(jax.devices()).reshape(t, tx), ("ty", "tx"))
        a = np.asarray(engine.estimate_flow_padded(im1, im2, cfg))
        b = np.asarray(
            tiled.estimate_flow_padded_tiled(im1, im2, cfg, mesh, axis_x="tx")
        )
        np.testing.assert_array_equal(a, b)
        print(f"{scenario}: parity ok")
        return 0
    elif scenario in (
        "tiled2d_cell_rounds", "tiled2d_cell_rounds_fused",
        "tiled2d_cell_rounds_rstore",
    ):
        # r5: the cell-layout rounds (and with cv_fused/cv_store_radius the
        # capacity kernels) run on the 2-D (ty x tx) mesh: neighbor MVs
        # cross tile boundaries through the per-step ghost-row ppermute
        # PLUS corner-extended ghost-column ppermutes
        # (ops.windowed._pallas_round_pm cell_exchange_2d).  Tiled ==
        # untiled bit for bit - the capacity modes compose with COLUMN
        # tiling, closing the r4 configuration cliff (the reference's own
        # split is by columns, parallel.h:20-58).
        from jax.sharding import Mesh

        from blockbasedmotionestimation_tpu.parallel import tiled

        cfg = MotionConfig(
            block_sizes=(8, 8), search_sizes=(16, 16), interp_factor=1,
            regularizer="windowed", rival_window=True,
            search_impl="pallas_interpret",
            cv_fused=4 if scenario.endswith("fused") else None,
            cv_store_radius=2 if scenario.endswith("rstore") else None,
        )
        h, w, t, tx = 128, 64, 4, 2
        assert tiled.im2_halo(cfg, 0) < min(h // t, w // tx)
        assert tiled.im2_halo(cfg, 1) < min((h // 2) // t, (w // 2) // tx)
        base = synth.textured_image(h + 32, w + 32, rng)
        im1 = base[16 : 16 + h, 16 : 16 + w]
        im2 = base[18 : 18 + h, 13 : 13 + w]
        mesh = Mesh(np.array(jax.devices()).reshape(t, tx), ("ty", "tx"))
        a = np.asarray(engine.estimate_flow_padded(im1, im2, cfg))
        b = np.asarray(
            tiled.estimate_flow_padded_tiled(im1, im2, cfg, mesh, axis_x="tx")
        )
        np.testing.assert_array_equal(a, b)
        print(f"{scenario}: parity ok")
        return 0
    else:
        print(f"unknown scenario {scenario}", file=sys.stderr)
        return 2

    a = np.asarray(engine.estimate_flow_driver(im1, im2, cfg_dense))
    b = np.asarray(engine.estimate_flow_driver(im1, im2, cfg_fused))
    np.testing.assert_array_equal(a, b)
    print(f"{scenario}: parity ok")
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Multihost helpers + profiling utilities (single-process approximations)."""

import jax
import numpy as np

from blockbasedmotionestimation_tpu.parallel import multihost
from blockbasedmotionestimation_tpu.utils import profiling


def test_make_mesh_shapes():
    mesh = multihost.make_mesh(batch=2, tiles=4)
    assert mesh.shape == {"batch": 2, "ty": 4}
    mesh = multihost.make_mesh()  # 1 process -> batch 1, all devices tiled
    assert mesh.shape["batch"] * mesh.shape["ty"] == len(jax.devices())


def test_describe_keys():
    d = multihost.describe()
    assert d["process_count"] == 1
    assert d["global_devices"] == len(jax.devices())


def test_phase_timer(rng):
    times = profiling.PhaseTimes()
    x = jax.numpy.asarray(rng.standard_normal((64, 64)).astype(np.float32))
    with profiling.phase("matmul", times, x):
        y = x @ x
    with profiling.phase("matmul", times, y):
        y = y @ x
    assert times.times["matmul"] > 0
    assert "total" in times.report()


def test_speed_of_light_accounting():
    out = profiling.speed_of_light(1088, 1920, 32, 64, seconds=0.01)
    assert out["useful_ops"] == (1088 // 32) * (1920 // 32) * 33 * 33 * 1024
    assert 0 < out["fraction_of_nominal"] < 1e6


def test_windowed_pipeline_floor_model():
    # the bench config's structural floor, checked against hand arithmetic
    from blockbasedmotionestimation_tpu.config import MotionConfig

    cfg = MotionConfig(interp_factor=1, regularizer="windowed")
    out = profiling.windowed_pipeline_floor(cfg, 1280, 2048)
    # VPU: 4 ops x 33^2 deltas x every pixel of every level
    px = sum((1280 >> l) * (2048 >> l) for l in range(4))
    assert out["vpu_ops"] == 4 * 33 * 33 * px
    # HBM: each round's CV entries x bytes x (1 write + sweeps reads)
    b0 = 0
    for cur, nb in ((32, 4), (16, 2), (8, 2), (4, 2), (2, 2)):
        b0 += 33 * 33 * (1280 // cur) * (2048 // cur) * nb * 3
    assert out["hbm_bytes"] == sum(b0 >> (2 * l) for l in range(4))
    # the floor must be a real bound: single-digit-to-tens of ms per field,
    # and the r1 bench measurement (~37 ms/field) sits above it
    assert 0.003 < out["floor_s"] < 0.040, out
    assert out["floor_s"] == max(out["vpu_s"], out["hbm_s"])

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

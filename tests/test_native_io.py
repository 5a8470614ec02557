"""Native C++ I/O runtime vs the pure-Python codecs."""

import numpy as np
import pytest

from blockbasedmotionestimation_tpu.utils import flowio, native_io

pytestmark = pytest.mark.skipif(
    not native_io.available(), reason="native library failed to build"
)


def test_flo_roundtrip_native(tmp_path, rng):
    flow = rng.standard_normal((24, 32, 2)).astype(np.float32)
    p = tmp_path / "x.flo"
    native_io.write_flo(p, flow)
    np.testing.assert_array_equal(native_io.read_flo(p), flow)
    # cross-compat with the Python codec both ways
    np.testing.assert_array_equal(flowio.read_flo(p), flow)
    p2 = tmp_path / "y.flo"
    flowio.write_flo(p2, flow)
    np.testing.assert_array_equal(native_io.read_flo(p2), flow)


def test_flo_batch_read(tmp_path, rng):
    flows = [rng.standard_normal((12, 16, 2)).astype(np.float32) for _ in range(5)]
    paths = []
    for i, f in enumerate(flows):
        p = tmp_path / f"{i}.flo"
        native_io.write_flo(p, f)
        paths.append(p)
    batch = native_io.read_flo_batch(paths, nthreads=3)
    np.testing.assert_array_equal(batch, np.stack(flows))


def test_flo_errors(tmp_path):
    p = tmp_path / "bad.flo"
    p.write_bytes(b"JUNKJUNKJUNK")
    with pytest.raises(native_io.NativeIOError):
        native_io.read_flo(p)
    with pytest.raises(native_io.NativeIOError):
        native_io.read_flo(tmp_path / "missing.flo")


def test_pgm_roundtrip(tmp_path, rng):
    img = rng.integers(0, 256, size=(17, 23), dtype=np.uint8)
    p = tmp_path / "x.pgm"
    native_io.write_pgm(p, img)
    np.testing.assert_array_equal(native_io.read_pgm(p), img)


def test_pgm_ascii_and_comments(tmp_path):
    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    p = tmp_path / "a.pgm"
    body = " ".join(str(v) for v in img.ravel())
    p.write_text(f"P2\n# a comment\n4 3\n255\n{body}\n")
    np.testing.assert_array_equal(native_io.read_pgm(p), img)


def test_native_epe_matches_python(rng):
    gt = rng.standard_normal((20, 30, 2)).astype(np.float32)
    fl = rng.standard_normal((20, 30, 2)).astype(np.float32)
    gt[3, 4] = 1e10  # unknown-flow pixel must be excluded
    want = flowio.average_epe(gt, fl)
    got = native_io.average_epe(gt, fl)
    assert abs(want - got) < 1e-6


def test_reference_gt_files_native():
    import os

    path = "/root/reference/middlebury/gt-flow/Dimetrodon/flow10.flo"
    if not os.path.exists(path):
        pytest.skip("reference gt-flow not mounted")
    a = native_io.read_flo(path)
    b = flowio.read_flo(path)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (388, 584, 2)

import numpy as np
import pytest

from apde_mvs_tpu.io import binmat, cameras, ply, pfm
from apde_mvs_tpu.io.cache import MemoryCache


@pytest.mark.parametrize("dtype,channels", [
    (np.uint8, 1), (np.float32, 1), (np.float32, 3), (np.int32, 1),
    (np.int16, 2), (np.uint8, 3),
])
def test_binmat_roundtrip(tmp_path, dtype, channels):
    rng = np.random.default_rng(0)
    shape = (7, 11) if channels == 1 else (7, 11, channels)
    if np.issubdtype(dtype, np.integer):
        mat = rng.integers(0, 100, size=shape).astype(dtype)
    else:
        mat = rng.normal(size=shape).astype(dtype)
    p = tmp_path / "m.bin"
    binmat.write_bin_mat(p, mat)
    out = binmat.read_bin_mat(p)
    assert out.dtype == mat.dtype and out.shape == mat.shape
    np.testing.assert_array_equal(out, mat)


def test_binmat_header_layout(tmp_path):
    # The on-disk header is the reference ABI: version=1, rows, cols, cv type.
    mat = np.zeros((3, 5), np.float32)
    p = tmp_path / "m.bin"
    binmat.write_bin_mat(p, mat)
    raw = p.read_bytes()
    header = np.frombuffer(raw[:16], np.int32)
    assert list(header) == [1, 3, 5, 5]  # CV_32FC1 == 5
    mat3 = np.zeros((3, 5, 3), np.float32)
    binmat.write_bin_mat(p, mat3)
    assert np.frombuffer(p.read_bytes()[:16], np.int32)[3] == 0x15  # CV_32FC3


def test_camera_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    # random rotation via QR
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    cam = cameras.Camera(
        K=np.array([[500.0, 0, 320], [0, 510.0, 240], [0, 0, 1]]),
        R=q, t=rng.normal(size=3), depth_min=2.5, interval=0.05,
        depth_num=192, depth_max=12.1)
    p = tmp_path / "00000000_cam.txt"
    cameras.write_camera(p, cam)
    out = cameras.read_camera(p)
    np.testing.assert_allclose(out.K, cam.K, rtol=1e-12)
    np.testing.assert_allclose(out.R, cam.R, rtol=1e-12)
    np.testing.assert_allclose(out.t, cam.t, rtol=1e-12)
    assert out.depth_min == pytest.approx(2.5)
    assert out.depth_max == pytest.approx(12.1)
    # world center c = -R^T t
    np.testing.assert_allclose(out.c, -cam.R.T @ cam.t, rtol=1e-6)


def test_camera_missing_depth_tail(tmp_path):
    p = tmp_path / "cam.txt"
    body = ("extrinsic\n1 0 0 0\n0 1 0 0\n0 0 1 0\n0 0 0 1\n\n"
            "intrinsic\n100 0 50\n0 100 40\n0 0 1\n\n2.0 0.05\n")
    p.write_text(body)
    cam = cameras.read_camera(p)
    assert cam.depth_num == 192
    assert cam.depth_max == pytest.approx(0.05 * 192 + 2.0)


def test_pair_roundtrip(tmp_path):
    p = tmp_path / "pair.txt"
    entries = [(0, [(1, 100.0), (2, 50.0), (3, 0.0)]), (1, [(0, 90.0)])]
    cameras.write_pair(p, entries)
    problems = cameras.read_pair(p)
    assert problems == [(0, [1, 2]), (1, [0])]  # score<=0 dropped
    assert cameras.read_pair(p, drop_nonpositive=False) == [(0, [1, 2, 3]), (1, [0])]


def test_ply_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    coords = rng.normal(size=(17, 3)).astype(np.float32)
    colors = rng.integers(0, 255, size=(17, 3)).astype(np.uint8)
    p = tmp_path / "c.ply"
    ply.export_point_cloud(p, coords, colors)
    out_c, out_col = ply.read_ply(p)
    np.testing.assert_array_equal(out_c, coords)
    np.testing.assert_array_equal(out_col, colors)
    ply.export_point_cloud(p, coords, None)
    out_c, out_col = ply.read_ply(p)
    np.testing.assert_array_equal(out_c, coords)
    assert out_col is None


def test_pfm_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    img = rng.normal(size=(5, 9)).astype(np.float32)
    p = tmp_path / "d.pfm"
    pfm.write_pfm(p, img)
    np.testing.assert_array_equal(pfm.read_pfm(p), img)


def test_memory_cache_writeback(tmp_path):
    cache = MemoryCache()
    mat = np.arange(12, dtype=np.float32).reshape(3, 4)
    p = tmp_path / "x.bin"
    binmat.write_bin_mat(p, mat, cache=cache, flush=False)
    assert not p.exists()
    out = binmat.read_bin_mat(p, cache=cache)
    np.testing.assert_array_equal(out, mat)
    cache.flush()
    assert p.exists()
    np.testing.assert_array_equal(binmat.read_bin_mat(p), mat)

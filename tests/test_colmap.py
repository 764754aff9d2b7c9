"""COLMAP->MVSNet converter: end-to-end on a synthetic sparse model."""

import os

import numpy as np
import pytest

from apde_mvs_tpu.datasets import colmap
from apde_mvs_tpu.io.cameras import read_camera, read_pair
from apde_mvs_tpu.testing import synthetic


def _write_colmap_model(scene, root):
    """Materialize a COLMAP text model consistent with the synthetic scene."""
    sparse = root / "sparse"
    sparse.mkdir(parents=True)
    imgdir = root / "images"
    imgdir.mkdir()
    from PIL import Image

    V = scene.num_views
    h, w = scene.images[0].shape
    K = scene.cameras[0].K
    with open(sparse / "cameras.txt", "w") as f:
        f.write("# cameras\n")
        f.write(f"1 PINHOLE {w} {h} {K[0,0]} {K[1,1]} {K[0,2]} {K[1,2]}\n")

    # 3-D points: sample the GT surface of view 0
    rng = np.random.default_rng(0)
    ys = rng.integers(4, h - 4, 120)
    xs = rng.integers(4, w - 4, 120)
    pts3d = []
    cam0 = scene.cameras[0]
    for pid, (x, y) in enumerate(zip(xs, ys), start=1):
        d = scene.depths[0][y, x]
        Xc = np.array([d * (x - K[0, 2]) / K[0, 0],
                       d * (y - K[1, 2]) / K[1, 1], d])
        Xw = cam0.R.T @ Xc + cam0.c
        pts3d.append((pid, Xw))

    def project(cam, Xw):
        Xc = cam.R @ Xw + cam.t
        if Xc[2] <= 0:
            return None
        u = K[0, 0] * Xc[0] / Xc[2] + K[0, 2]
        v = K[1, 1] * Xc[1] / Xc[2] + K[1, 2]
        if not (0 <= u < w and 0 <= v < h):
            return None
        return u, v

    obs = {pid: [] for pid, _ in pts3d}
    img_lines = []
    for vid in range(V):
        cam = scene.cameras[vid]
        # quaternion from R
        q = colmap.rotmat2qvec(cam.R) if hasattr(colmap, "rotmat2qvec") else None
        if q is None:
            # w,x,y,z from rotation matrix
            R = cam.R
            tr = np.trace(R)
            qw = np.sqrt(max(0, 1 + tr)) / 2
            qx = (R[2, 1] - R[1, 2]) / (4 * qw)
            qy = (R[0, 2] - R[2, 0]) / (4 * qw)
            qz = (R[1, 0] - R[0, 1]) / (4 * qw)
            q = (qw, qx, qy, qz)
        pts_line = []
        for pid, Xw in pts3d:
            uv = project(cam, Xw)
            if uv is not None:
                pts_line += [f"{uv[0]:.2f}", f"{uv[1]:.2f}", str(pid)]
                obs[pid].append(vid + 1)
        header = (f"{vid + 1} {q[0]} {q[1]} {q[2]} {q[3]} "
                  f"{cam.t[0]} {cam.t[1]} {cam.t[2]} 1 view{vid}.png")
        img_lines.append((header, " ".join(pts_line)))
        Image.fromarray(scene.images[vid].astype(np.uint8)).save(
            imgdir / f"view{vid}.png")
    # one image with zero observations (regression for the pairing fix)
    far_cam = scene.cameras[0]
    img_lines.append((
        f"{V + 1} 1 0 0 0 1000 1000 1000 1 farview.png", ""))
    Image.fromarray(scene.images[0].astype(np.uint8)).save(
        imgdir / "farview.png")
    with open(sparse / "images.txt", "w") as f:
        f.write("# images\n")
        for header, pts in img_lines:
            f.write(header + "\n")
            f.write(pts + "\n")
    with open(sparse / "points3D.txt", "w") as f:
        f.write("# points\n")
        for pid, Xw in pts3d:
            track = " ".join(f"{iid} 0" for iid in obs[pid])
            f.write(f"{pid} {Xw[0]} {Xw[1]} {Xw[2]} 128 128 128 0.5 {track}\n")


def test_convert_scene_end_to_end(tmp_path):
    scene = synthetic.make_scene(num_views=4, height=48, width=64)
    src_root = tmp_path / "colmap"
    _write_colmap_model(scene, src_root)
    out = tmp_path / "mvsnet"
    colmap.convert_scene(str(src_root), str(out), num_workers=1)

    V = scene.num_views + 1  # incl. the zero-observation image
    pairs = colmap.read_images_text(src_root / "sparse" / "images.txt")
    assert len(pairs) == V
    assert len(pairs[V].point3D_ids) == 0  # the empty image parsed cleanly

    entries = read_pair(out / "pair.txt", drop_nonpositive=False)
    assert len(entries) == V
    # a central view must rank its true neighbors with positive covisibility
    ref1 = dict(
        (sid, True) for sid in read_pair(out / "pair.txt")[1][1])
    assert len(ref1) >= 2

    cam0 = read_camera(out / "cams" / "00000000_cam.txt")
    np.testing.assert_allclose(cam0.K, scene.cameras[0].K, rtol=1e-5)
    np.testing.assert_allclose(cam0.R, scene.cameras[0].R, atol=1e-5)
    np.testing.assert_allclose(cam0.t, scene.cameras[0].t, atol=1e-5)
    gt = scene.depths[0][scene.depths[0] > 0]
    assert cam0.depth_min < gt.min() and cam0.depth_max > gt.max() * 0.99
    # converted images exist, renumbered
    for i in range(V):
        assert (out / "images" / f"{i:08d}.jpg").exists()


def test_sequential_view_selection():
    sel = colmap.sequential_view_selection(6, k=2)
    assert len(sel) == 6
    ids = [s for s, _ in sel[0]]
    assert ids[:2] == [1, 2] or set(ids[:2]) == {1, 2}
    ids3 = [s for s, _ in sel[3]]
    assert set(ids3) == {1, 2, 4, 5}


def test_quaternion_roundtrip():
    rng = np.random.default_rng(5)
    q0, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q0) < 0:
        q0[:, 0] *= -1
    q = colmap.rotmat2qvec(q0)
    R = colmap.qvec2rotmat(q)
    np.testing.assert_allclose(R, q0, atol=1e-8)

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apde_mvs_tpu.core import geometry as geo
from apde_mvs_tpu.ops import cost as cost_ops
from apde_mvs_tpu.testing import synthetic


@pytest.fixture(scope="module")
def scene():
    return synthetic.make_scene(num_views=4, height=96, width=128)


def _cost_data(scene, ref=0, sa_mask=None, src_depths=None):
    cams = geo.CameraArrays.from_cameras(scene.cameras)
    src_ids = [v for v in range(scene.num_views) if v != ref]
    ref_cam = cams.view(ref)
    src_cams = geo.CameraArrays(*[a[np.asarray(src_ids)] for a in cams])
    return cost_ops.CostData.build(
        ref_cam, src_cams, jnp.asarray(scene.images[ref]),
        jnp.asarray(scene.images[src_ids]), sa_mask=sa_mask,
        src_depths=src_depths), src_ids


def _gt_planes(scene, ref, xs, ys):
    """Ground-truth camera-frame plane hypotheses at given pixels."""
    cam = scene.cameras[ref]
    pl = scene.planes[0]
    n_world = pl.normal / np.linalg.norm(pl.normal)
    n_cam = cam.R @ n_world
    # flip toward camera (n . view < 0)
    depths = scene.depths[ref][ys, xs]
    planes = []
    for x, y, d in zip(xs, ys, depths):
        X = np.array([d * (x - cam.K[0, 2]) / cam.K[0, 0],
                      d * (y - cam.K[1, 2]) / cam.K[1, 1], d])
        n = n_cam if n_cam @ X < 0 else -n_cam
        w = -(n @ X)
        planes.append(np.concatenate([n, [w]]))
    return np.asarray(planes, np.float32)


def test_true_plane_has_low_cost(scene):
    data, _ = _cost_data(scene)
    rng = np.random.default_rng(0)
    xs = rng.integers(20, 108, size=40)
    ys = rng.integers(20, 76, size=40)
    planes = jnp.asarray(_gt_planes(scene, 0, xs, ys))
    x = jnp.asarray(xs, jnp.float32)
    y = jnp.asarray(ys, jnp.float32)
    win = cost_ops.precompute_ref_window(data, x, y, 5, 2, use_sa=False)
    costs = np.asarray(cost_ops.ncc_strong(data, x, y, planes, win))
    assert costs.shape == (40, 3)
    # True-plane NCC costs should be essentially zero for consistent views.
    assert np.median(costs) < 0.05

    # A wrong-depth plane must cost much more.
    bad = np.asarray(planes).copy()
    cam0 = geo.CameraArrays.from_cameras(scene.cameras).view(0)
    d_true = np.asarray(geo.depth_from_plane(cam0, jnp.asarray(planes), x, y))
    n = bad[:, :3]
    for i in range(len(bad)):
        X = np.array([(xs[i] - 64.0) / 160.0, (ys[i] - 48.0) / 160.0, 1.0])
        X = X * d_true[i] * 1.3
        bad[i, 3] = -(n[i] @ X)
    bad_costs = np.asarray(cost_ops.ncc_strong(
        data, x, y, jnp.asarray(bad), win))
    assert np.median(bad_costs) > np.median(costs) + 0.3


def test_ncc_matches_numpy_oracle(scene):
    """Check the full NCC pipeline against a direct numpy transliteration of
    the window/warp/NCC math for a handful of pixels."""
    data, src_ids = _cost_data(scene)
    xs = np.array([40, 64, 90])
    ys = np.array([30, 48, 70])
    planes = _gt_planes(scene, 0, xs, ys)
    # perturb so values aren't all ~0 cost
    planes[:, 3] *= 1.01
    x = jnp.asarray(xs, jnp.float32)
    y = jnp.asarray(ys, jnp.float32)
    win = cost_ops.precompute_ref_window(data, x, y, 5, 2, use_sa=False)
    got = np.asarray(cost_ops.ncc_strong(data, x, y, jnp.asarray(planes), win))

    ref_cam = scene.cameras[0]
    ref_img = scene.images[0]
    H_img, W_img = ref_img.shape
    for pi in range(3):
        for si, sv in enumerate(src_ids):
            src_cam = scene.cameras[sv]
            src_img = scene.images[sv]
            n, w = planes[pi, :3], planes[pi, 3]
            R_rel = src_cam.R @ ref_cam.R.T
            t_rel = src_cam.R @ (ref_cam.c - src_cam.c)
            Hom = src_cam.K @ (R_rel - np.outer(t_rel, n) / w) \
                @ np.linalg.inv(ref_cam.K)

            def warp(px, py):
                p = Hom @ np.array([px, py, 1.0])
                return p[0] / p[2], p[1] / p[2]

            def bil(img, px, py):
                px = np.clip(px, 0, W_img - 1)
                py = np.clip(py, 0, H_img - 1)
                x0, y0 = int(np.floor(px)), int(np.floor(py))
                x1, y1 = min(x0 + 1, W_img - 1), min(y0 + 1, H_img - 1)
                fx, fy = px - x0, py - y0
                return (img[y0, x0] * (1 - fx) * (1 - fy)
                        + img[y0, x1] * fx * (1 - fy)
                        + img[y1, x0] * (1 - fx) * fy
                        + img[y1, x1] * fx * fy)

            cx, cy = warp(xs[pi], ys[pi])
            if not (0 <= cx < W_img and 0 <= cy < H_img):
                expected = 2.0
            else:
                sums = np.zeros(5)
                cnt = 0
                for dy in range(-5, 6, 2):
                    for dx in range(-5, 6, 2):
                        rx = int(np.clip(xs[pi] + dx, 0, W_img - 1))
                        ry = int(np.clip(ys[pi] + dy, 0, H_img - 1))
                        rv = ref_img[ry, rx]
                        wx, wy = warp(xs[pi] + dx, ys[pi] + dy)
                        svv = bil(src_img, wx, wy)
                        sums += [rv, rv * rv, svv, svv * svv, rv * svv]
                        cnt += 1
                sums /= cnt
                var_r = sums[1] - sums[0] ** 2
                var_s = sums[3] - sums[2] ** 2
                if var_r < 1e-5 or var_s < 1e-5:
                    expected = 2.0
                else:
                    covar = sums[4] - sums[0] * sums[2]
                    expected = max(0.0, min(2.0, 1 - covar / np.sqrt(var_r * var_s)))
            assert got[pi, si] == pytest.approx(expected, abs=2e-3)


def test_geom_cost_zero_for_consistent_depths(scene):
    data, src_ids = _cost_data(
        scene, src_depths=jnp.asarray(
            scene.depths[[v for v in range(scene.num_views) if v != 0]]))
    rng = np.random.default_rng(1)
    xs = rng.integers(25, 100, size=30)
    ys = rng.integers(25, 70, size=30)
    planes = jnp.asarray(_gt_planes(scene, 0, xs, ys))
    x = jnp.asarray(xs, jnp.float32)
    y = jnp.asarray(ys, jnp.float32)
    g = np.asarray(cost_ops.geom_cost(data, x, y, planes))
    assert g.shape == (30, 3)
    assert np.median(g) < 0.3   # consistent depths reproject onto themselves

    # inconsistent (scaled) depth maps give large cost
    data_bad, _ = _cost_data(
        scene, src_depths=jnp.asarray(
            scene.depths[[v for v in range(scene.num_views) if v != 0]] * 1.3))
    g_bad = np.asarray(cost_ops.geom_cost(data_bad, x, y, planes))
    assert np.median(g_bad) > 1.0


def test_initial_cost_and_selection():
    costs = jnp.asarray([
        [0.1, 0.5, 0.3, 2.0, 0.2],    # 4 valid, top_k=4 -> mean of 4 best
        [2.0, 2.0, 2.0, 2.0, 2.0],    # no valid view
        [0.4, 2.0, 2.0, 2.0, 2.0],    # single valid view
    ])
    mean, sel = cost_ops.initial_cost_and_selection(costs, top_k=4)
    mean = np.asarray(mean)
    sel = np.asarray(sel)
    assert mean[0] == pytest.approx((0.1 + 0.5 + 0.3 + 0.2) / 4)
    np.testing.assert_array_equal(sel[0], [1, 1, 1, 0, 1])
    assert mean[1] == pytest.approx(2.0)
    assert not sel[1].any()
    assert mean[2] == pytest.approx(0.4)
    np.testing.assert_array_equal(sel[2], [1, 0, 0, 0, 0])


def test_sa_star_window_truncation():
    # Build an image with a vertical segment boundary; taps across it must be
    # dropped quadrant-prefix-wise.
    h, w = 32, 32
    sa = np.zeros((h, w), np.int32)
    sa[:, :16] = 1
    sa[:, 16:] = 2
    img = np.random.default_rng(0).normal(size=(h, w)).astype(np.float32)
    cams = geo.CameraArrays(
        K=jnp.asarray(np.eye(3)[None].repeat(2, 0), jnp.float32),
        R=jnp.asarray(np.eye(3)[None].repeat(2, 0), jnp.float32),
        t=jnp.zeros((2, 3)), c=jnp.zeros((2, 3)))
    data = cost_ops.CostData.build(
        cams.view(0), cams, jnp.asarray(img), jnp.asarray(img[None]),
        sa_mask=jnp.asarray(sa))
    x = jnp.asarray([14.0])  # 2 px left of the boundary, inside segment 1
    y = jnp.asarray([16.0])
    win = cost_ops.precompute_ref_window(data, x, y, 5, 2, use_sa=True)
    tw = np.asarray(win.tap_w)[0].reshape(4, 9)
    taps = cost_ops.star_taps().reshape(4, 9, 2)
    # quadrants reaching x+offset >= 16 must truncate from the first such tap
    for q in range(4):
        crossed = False
        for j in range(9):
            tx = 14 + taps[q, j, 0]
            if tx >= 16:
                crossed = True
            assert tw[q, j] == (0.0 if crossed else 1.0)

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apde_mvs_tpu.core import geometry as geo


def _random_camera(rng, fx=600.0, fy=620.0, cx=320.0, cy=240.0):
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    R = q.T
    t = rng.normal(size=3) * 0.5
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    c = -R.T @ t
    return geo.CameraArrays(
        K=jnp.asarray(K, jnp.float32), R=jnp.asarray(R, jnp.float32),
        t=jnp.asarray(t, jnp.float32), c=jnp.asarray(c, jnp.float32))


def _stereo_pair(rng, baseline=0.3):
    """A realistic rig: src is ref translated sideways with a small rotation,
    so test points stay visible and well-conditioned in both views."""
    ref = _random_camera(rng)
    angle = 0.05
    Rz = np.array([[np.cos(angle), -np.sin(angle), 0],
                   [np.sin(angle), np.cos(angle), 0], [0, 0, 1.0]])
    R_src = Rz @ np.asarray(ref.R)
    c_src = np.asarray(ref.c) + np.asarray(ref.R).T @ np.array([baseline, 0, 0])
    t_src = -R_src @ c_src
    src = geo.CameraArrays(
        K=jnp.asarray(np.asarray(ref.K) * np.array([[0.97], [1.02], [1.0]]),
                      jnp.float32),
        R=jnp.asarray(R_src, jnp.float32), t=jnp.asarray(t_src, jnp.float32),
        c=jnp.asarray(c_src, jnp.float32))
    return ref, src


def test_project_backproject_inverse():
    rng = np.random.default_rng(0)
    cam = _random_camera(rng)
    x = jnp.asarray(rng.uniform(0, 640, size=(32,)), jnp.float32)
    y = jnp.asarray(rng.uniform(0, 480, size=(32,)), jnp.float32)
    d = jnp.asarray(rng.uniform(2, 10, size=(32,)), jnp.float32)
    Xw = geo.backproject_world(cam, x, y, d)
    x2, y2, d2 = geo.project(cam, Xw)
    np.testing.assert_allclose(x2, x, atol=1e-2)
    np.testing.assert_allclose(y2, y, atol=1e-2)
    np.testing.assert_allclose(d2, d, rtol=1e-4)


def test_depth_from_plane_consistency():
    # A plane built at (x, y, depth) must induce that same depth at (x, y).
    rng = np.random.default_rng(1)
    cam = _random_camera(rng)
    x = jnp.asarray(rng.uniform(0, 640, size=(16,)), jnp.float32)
    y = jnp.asarray(rng.uniform(0, 480, size=(16,)), jnp.float32)
    d = jnp.asarray(rng.uniform(2, 10, size=(16,)), jnp.float32)
    key = jax.random.PRNGKey(0)
    n = geo.random_unit_normal_facing(key, cam, x, y, d)
    plane = geo.make_plane(cam, x, y, d, n)
    d2 = geo.depth_from_plane(cam, plane, x, y)
    np.testing.assert_allclose(d2, d, rtol=1e-3)


def test_homography_matches_projection():
    # For points ON the plane, warping ref pixels through the plane homography
    # must match explicit backproject->world->project into the src camera.
    rng = np.random.default_rng(2)
    ref, src = _stereo_pair(rng)
    x = jnp.asarray(rng.uniform(100, 500, size=(64,)), jnp.float32)
    y = jnp.asarray(rng.uniform(100, 400, size=(64,)), jnp.float32)
    d0 = jnp.asarray(rng.uniform(4, 6, size=(64,)), jnp.float32)
    n = geo.random_unit_normal_facing(jax.random.PRNGKey(1), ref, x, y, d0)
    plane = geo.make_plane(ref, x, y, d0, n)
    H = geo.homography(ref, src, plane)
    wx, wy = geo.warp(H, x, y)

    # explicit path: the plane's induced depth at (x, y) is d0
    Xw = geo.cam_to_world(ref, geo.backproject(ref, x, y, d0))
    ex, ey, _ = geo.project(src, Xw)
    np.testing.assert_allclose(wx, ex, atol=0.05)
    np.testing.assert_allclose(wy, ey, atol=0.05)


def test_homography_on_plane_offsets():
    # Any other pixel's warp under the same homography must equal projecting
    # the plane-induced 3-D point of that pixel.
    rng = np.random.default_rng(3)
    ref, src = _stereo_pair(rng)
    x = jnp.asarray([320.0])
    y = jnp.asarray([240.0])
    d0 = jnp.asarray([5.0])
    n = geo.random_unit_normal_facing(jax.random.PRNGKey(4), ref, x, y, d0)
    plane = geo.make_plane(ref, x, y, d0, n)
    H = geo.homography(ref, src, plane)
    for dx, dy in [(-5, -5), (3, 1), (10, -7)]:
        px, py = x + dx, y + dy
        d_tap = geo.depth_from_plane(ref, plane, px, py)
        Xw = geo.cam_to_world(ref, geo.backproject(ref, px, py, d_tap))
        ex, ey, _ = geo.project(src, Xw)
        wx, wy = geo.warp(H, px, py)
        np.testing.assert_allclose(wx, ex, atol=0.05)
        np.testing.assert_allclose(wy, ey, atol=0.05)


def test_normal_transforms_roundtrip():
    rng = np.random.default_rng(4)
    cam = _random_camera(rng)
    n4 = jnp.asarray(rng.normal(size=(8, 4)), jnp.float32)
    out = geo.normal_world_to_cam(cam.R, geo.normal_cam_to_world(cam.R, n4))
    np.testing.assert_allclose(out, n4, atol=1e-5)


def test_random_normals_face_camera():
    rng = np.random.default_rng(5)
    cam = _random_camera(rng)
    x = jnp.asarray(rng.uniform(0, 640, size=(256,)), jnp.float32)
    y = jnp.asarray(rng.uniform(0, 480, size=(256,)), jnp.float32)
    d = jnp.full((256,), 5.0, jnp.float32)
    n = geo.random_unit_normal_facing(jax.random.PRNGKey(7), cam, x, y, d)
    vd = geo.view_direction(cam, x, y, d)
    assert np.all(np.sum(np.asarray(n * vd), axis=-1) <= 0)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(n), axis=-1), 1.0,
                               atol=1e-5)


def test_perturbed_normal_unit_and_close():
    rng = np.random.default_rng(6)
    cam = _random_camera(rng)
    x = jnp.full((64,), 320.0)
    y = jnp.full((64,), 240.0)
    d = jnp.full((64,), 5.0)
    n = geo.random_unit_normal_facing(jax.random.PRNGKey(8), cam, x, y, d)
    np_ = geo.perturbed_normal(jax.random.PRNGKey(9), cam, x, y, n,
                               0.02 * np.pi)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(np_), axis=-1), 1.0,
                               atol=1e-5)
    cos = np.sum(np.asarray(n * np_), axis=-1)
    assert np.all(cos > 0.99)  # small perturbation

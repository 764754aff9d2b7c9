import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apde_mvs_tpu.config import STRONG, UNKNOWN, WEAK
from apde_mvs_tpu.core import geometry as geo
from apde_mvs_tpu.ops import anchors as anchor_ops
from apde_mvs_tpu.ops.state import PMState


def test_nearest_strong_jfa_matches_bruteforce():
    rng = np.random.default_rng(0)
    h, w = 40, 48
    weak = np.full((h, w), WEAK, np.int32)
    strong_pts = [(5, 7), (30, 20), (12, 40), (35, 44), (20, 3)]
    for y, x in strong_pts:
        weak[y, x] = STRONG
    conf = np.ones((h, w), np.float32)
    valid = jnp.ones((h, w), bool)
    ns = np.asarray(anchor_ops.nearest_strong_jfa(
        jnp.asarray(weak), jnp.asarray(conf), valid))
    # brute force
    pts = np.asarray([(x, y) for y, x in strong_pts])
    for _ in range(200):
        y = rng.integers(0, h)
        x = rng.integers(0, w)
        d = ((pts[:, 0] - x) ** 2 + (pts[:, 1] - y) ** 2)
        best = d.min()
        got = ns[y, x]
        gd = (got[0] - x) ** 2 + (got[1] - y) ** 2
        assert gd == best, f"({x},{y}): got {got} d={gd}, best={best}"


def test_nearest_strong_confidence_predicate():
    h, w = 16, 16
    weak = np.full((h, w), WEAK, np.int32)
    weak[8, 4] = STRONG   # low confidence, near
    weak[8, 12] = STRONG  # high confidence, far
    conf = np.ones((h, w), np.float32)
    conf[8, 4] = 1.0
    conf[8, 12] = 9.0
    conf[8, 6] = 5.0      # querying pixel has conf 5 -> must skip conf-1 point
    ns = np.asarray(anchor_ops.nearest_strong_jfa(
        jnp.asarray(weak), jnp.asarray(conf), jnp.ones((h, w), bool)))
    assert tuple(ns[8, 6]) == (12, 8)
    # a low-confidence query accepts the nearest
    assert tuple(ns[8, 5]) == (4, 8)


def _flat_scene_state(h, w, depth=4.0, focal=100.0):
    K = jnp.asarray([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1.0]])
    cam = geo.CameraArrays(K=K, R=jnp.eye(3), t=jnp.zeros(3), c=jnp.zeros(3))
    state = PMState.create(h, w, 2)
    planes = np.zeros((h, w, 4), np.float32)
    planes[..., 3] = depth  # stored depth in w (pre-conversion layout)
    planes[..., 2] = -1.0
    state = state.replace(planes=jnp.asarray(planes))
    return cam, state


def test_gen_anchors_on_flat_scene():
    h, w = 64, 64
    cam, state = _flat_scene_state(h, w)

    class Data:
        ref_cam = cam

    weak_map = np.full((h, w), STRONG, np.int32)
    # a weak blob in the middle
    weak_map[28:36, 28:36] = WEAK
    state = state.replace(weak=jnp.asarray(weak_map))
    wy, wx = np.nonzero(weak_map == WEAK)
    ns = anchor_ops.nearest_strong_jfa(state.weak, state.confidence,
                                       state.valid)
    res = anchor_ops.gen_anchors(
        jax.random.PRNGKey(0), Data, state, jnp.asarray(wx), jnp.asarray(wy),
        jnp.ones((len(wx),), bool), rotate_time=4, ransac_threshold=0.01,
        depth_min=2.0, depth_max=6.0, nearest_strong=ns)
    anchors = np.asarray(res.anchors)
    reliable = np.asarray(res.reliable)
    # flat scene, plenty of strong support: anchors should be found
    assert reliable.mean() > 0.9
    ok = reliable.nonzero()[0]
    # anchor 0 is the pixel itself
    np.testing.assert_array_equal(anchors[ok, 0, 0], wx[ok])
    np.testing.assert_array_equal(anchors[ok, 0, 1], wy[ok])
    # the 8 supports are strong pixels
    sup = anchors[ok, 1:]
    valid_sup = sup[..., 0] >= 0
    assert valid_sup.mean() > 0.8
    sx = sup[..., 0][valid_sup]
    sy = sup[..., 1][valid_sup]
    assert (weak_map[sy, sx] == STRONG).all()


def test_ransac_fit_planes_recovers_plane():
    h, w = 32, 32
    cam, state = _flat_scene_state(h, w)
    # camera-frame planes: z = 4 plane has normal (0,0,-1), w = 4
    planes = np.zeros((h, w, 4), np.float32)
    planes[..., 2] = -1.0
    planes[..., 3] = 4.0
    state = state.replace(planes=jnp.asarray(planes))

    class Data:
        ref_cam = cam

    # one weak pixel at center with 8 spread anchors
    wx = jnp.asarray([16])
    wy = jnp.asarray([16])
    anchors = np.full((1, 9, 2), -1, np.int32)
    anchors[0, 0] = (16, 16)
    spread = [(8, 8), (24, 8), (8, 24), (24, 24), (16, 6), (16, 26), (6, 16),
              (26, 16)]
    for i, (x, y) in enumerate(spread):
        anchors[0, i + 1] = (x, y)
    fit = np.asarray(anchor_ops.ransac_fit_planes(
        jax.random.PRNGKey(0), Data, state, wx, wy, jnp.asarray([True]),
        jnp.asarray(anchors)))
    n = fit[0, :3]
    assert np.linalg.norm(n) == pytest.approx(1.0, abs=1e-4)
    assert abs(n[2]) > 0.99          # plane normal along z
    # plane passes through (0, 0, 4): n.X + w = 0 with X=(0,0,4)
    assert fit[0, 2] * 4.0 + fit[0, 3] == pytest.approx(0.0, abs=1e-3)


def test_neighbor_update_demotes():
    h, w = 8, 8
    state = PMState.create(h, w, 2)
    weak = np.full((h, w), WEAK, np.int32)
    state = state.replace(weak=jnp.asarray(weak))
    wx = jnp.asarray([1, 2, 3])
    wy = jnp.asarray([1, 2, 3])
    reliable = jnp.asarray([True, False, True])
    out = anchor_ops.neighbor_update(state, wx, wy,
                                     jnp.asarray([True, True, True]), reliable)
    wm = np.asarray(out.weak)
    assert wm[1, 1] == WEAK
    assert wm[2, 2] == UNKNOWN
    assert wm[3, 3] == WEAK

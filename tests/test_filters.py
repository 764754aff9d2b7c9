import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apde_mvs_tpu.config import STRONG, UNKNOWN, WEAK
from apde_mvs_tpu.core import geometry as geo
from apde_mvs_tpu.ops import filters
from apde_mvs_tpu.ops.cost import CostData
from apde_mvs_tpu.ops.state import PMState
from apde_mvs_tpu.testing import synthetic


def _data(scene, ref=0, with_depths=True):
    cams = geo.CameraArrays.from_cameras(scene.cameras)
    src_ids = [v for v in range(scene.num_views) if v != ref]
    sd = jnp.asarray(scene.depths[src_ids]) if with_depths else None
    return CostData.build(
        cams.view(ref), geo.CameraArrays(*[a[np.asarray(src_ids)] for a in cams]),
        jnp.asarray(scene.images[ref]), jnp.asarray(scene.images[src_ids]),
        src_depths=sd)


def test_plane_depth_normal_roundtrip():
    scene = synthetic.make_scene(num_views=2, height=32, width=48)
    data = _data(scene, with_depths=False)
    key = jax.random.PRNGKey(0)
    h, w = 32, 48
    ys, xs = jnp.mgrid[0:h, 0:w]
    d = jnp.asarray(np.random.default_rng(0).uniform(3, 5, (h, w)), jnp.float32)
    n = geo.random_unit_normal_facing(key, data.ref_cam,
                                      xs.astype(jnp.float32),
                                      ys.astype(jnp.float32), d)
    planes = geo.make_plane(data.ref_cam, xs.astype(jnp.float32),
                            ys.astype(jnp.float32), d, n)
    out = filters.planes_to_depth_normal(data, planes)
    np.testing.assert_allclose(np.asarray(out[..., 3]), np.asarray(d),
                               rtol=1e-3)
    back = filters.depth_normal_to_planes(data, out[..., 3], out[..., :3])
    np.testing.assert_allclose(np.asarray(back), np.asarray(planes),
                               atol=1e-3, rtol=1e-3)


def test_masked_median():
    # tap-major (T, B): each COLUMN is one pixel's candidate list
    vals = jnp.asarray([[3.0, 1.0, 2.0, 9.0], [5.0, 0.0, 0.0, 0.0]]).T
    valid = jnp.asarray([[True, True, True, False],
                         [True, False, False, False]]).T
    med = np.asarray(filters._masked_median(vals, valid))
    assert med[0] == 2.0          # odd count -> middle
    assert med[1] == 5.0          # single value
    vals2 = jnp.asarray([[4.0, 1.0, 3.0, 2.0]]).T
    valid2 = jnp.asarray([[True, True, True, True]]).T
    assert filters._masked_median(vals2, valid2)[0] == pytest.approx(2.5)


def test_median_filter_replaces_outlier():
    scene = synthetic.make_scene(num_views=2, height=32, width=48)
    data = _data(scene, with_depths=False)
    state = PMState.create(32, 48, 1)
    planes = np.zeros((32, 48, 4), np.float32)
    planes[..., 3] = 4.0
    planes[16, 20, 3] = 9.0      # outlier depth
    state = state.replace(planes=jnp.asarray(planes),
                          costs=jnp.full((32, 48), 0.5))
    for color in (0, 1):
        state = filters.median_filter_color(state, color)
    out = np.asarray(state.planes[..., 3])
    assert out[16, 20] == pytest.approx(4.0)
    assert np.allclose(out, 4.0)


def test_confidence_on_consistent_scene():
    scene = synthetic.make_scene(num_views=4, height=48, width=64)
    data = _data(scene)
    state = PMState.create(48, 64, 3)
    planes = np.zeros((48, 64, 4), np.float32)
    planes[..., 3] = scene.depths[0]
    planes[..., :3] = scene.normals[0]
    state = state.replace(planes=jnp.asarray(planes),
                          selected=jnp.ones((48, 64, 3), bool))
    out = filters.compute_confidence(data, state)
    conf = np.asarray(out.confidence)
    inner = conf[8:-8, 8:-8]
    # consistent geometry: 1 + 3 views * (1 exist + 2 reproj + 2 depth) = 16
    assert np.median(inner) == pytest.approx(16.0)
    # zero-depth pixels become UNKNOWN with zero confidence
    planes[10, 10, 3] = 0.0
    state = state.replace(planes=jnp.asarray(planes))
    out2 = filters.compute_confidence(data, state)
    assert np.asarray(out2.confidence)[10, 10] == 0.0
    assert np.asarray(out2.weak)[10, 10] == UNKNOWN


def test_depth_to_weak_classifies_textured_as_strong():
    scene = synthetic.make_scene(num_views=4, height=64, width=80)
    data = _data(scene)
    h, w, S = 64, 80, 3
    state = PMState.create(h, w, S)
    planes = np.zeros((h, w, 4), np.float32)
    planes[..., 3] = scene.depths[0]
    planes[..., :3] = scene.normals[0]
    state = state.replace(planes=jnp.asarray(planes),
                          selected=jnp.ones((h, w, S), bool),
                          view_weights=jnp.full((h, w, S), 5.0))
    ys, xs = np.mgrid[10:54, 10:70]
    x = jnp.asarray(xs.reshape(-1), jnp.int32)
    y = jnp.asarray(ys.reshape(-1), jnp.int32)
    weak, _ = filters.depth_to_weak(
        data, state, x, y, jnp.int32(6), False, False, jnp.float32(0.2),
        jnp.float32(2.0), jnp.float32(8.0))
    frac_strong = (np.asarray(weak) == STRONG).mean()
    assert frac_strong > 0.7  # textured + correct depth -> mostly STRONG

    # far-off depth: the curve minimum moves away from the center -> WEAK
    planes_bad = planes.copy()
    planes_bad[..., 3] *= 1.15
    state_bad = state.replace(planes=jnp.asarray(planes_bad))
    weak_bad, _ = filters.depth_to_weak(
        data, state_bad, x, y, jnp.int32(2), False, False, jnp.float32(0.2),
        jnp.float32(2.0), jnp.float32(8.0))
    assert (np.asarray(weak_bad) == STRONG).mean() < frac_strong * 0.5


def test_sweep_cost_slot_and_all_views_paths_agree(monkeypatch):
    """The two static _sweep_cost strategies (K view slots vs all-S-views
    with zero-weight masking) must produce the same classification curve."""
    from apde_mvs_tpu.ops import cost as cost_ops
    scene = synthetic.make_scene(num_views=5, height=48, width=64)
    data = _data(scene)
    h, w, S = 48, 64, 4
    rng = np.random.default_rng(9)
    state = PMState.create(h, w, S)
    planes = np.zeros((h, w, 4), np.float32)
    planes[..., 3] = scene.depths[0]
    planes[..., :3] = scene.normals[0]
    sel = rng.random((h, w, S)) > 0.4
    sel[..., 0] |= ~sel.any(-1)              # every pixel selects >= 1 view
    vw = np.where(sel, rng.integers(1, 6, (h, w, S)), 0).astype(np.float32)
    state = state.replace(planes=jnp.asarray(planes),
                          selected=jnp.asarray(sel),
                          view_weights=jnp.asarray(vw))
    ys, xs = np.mgrid[10:38, 10:54]
    x = jnp.asarray(xs.reshape(-1), jnp.int32)
    y = jnp.asarray(ys.reshape(-1), jnp.int32)
    curves = {}
    for choice in (True, False):
        monkeypatch.setattr(cost_ops, "prefer_view_slots",
                            lambda data, k, _c=choice: _c)
        weak, curve = filters.depth_to_weak(
            data, state, x, y, jnp.int32(6), False, False, jnp.float32(0.2),
            jnp.float32(2.0), jnp.float32(8.0), return_curve=True)
        curves[choice] = (np.asarray(weak), np.asarray(curve))
    np.testing.assert_allclose(curves[True][1], curves[False][1], atol=1e-4)
    assert (curves[True][0] != curves[False][0]).mean() < 0.01


def test_local_refine_pulls_depth_back():
    scene = synthetic.make_scene(num_views=4, height=48, width=64)
    data = _data(scene)
    h, w, S = 48, 64, 3
    state = PMState.create(h, w, S)
    planes = np.zeros((h, w, 4), np.float32)
    # depth offset by exactly one disparity step (the sweep's resolution),
    # correct normal
    fx = scene.cameras[0].K[0, 0]
    bl = np.mean([np.linalg.norm(scene.cameras[0].c - scene.cameras[v].c)
                  for v in range(1, 4)])
    disp = fx * bl / np.maximum(scene.depths[0], 1e-6)
    planes[..., 3] = fx * bl / np.maximum(disp - 1.0, 1e-6)
    planes[..., :3] = scene.normals[0]
    state = state.replace(planes=jnp.asarray(planes),
                          selected=jnp.ones((h, w, S), bool),
                          view_weights=jnp.full((h, w, S), 5.0))
    ys, xs = np.mgrid[12:36, 12:52]
    x = jnp.asarray(xs.reshape(-1), jnp.int32)
    y = jnp.asarray(ys.reshape(-1), jnp.int32)
    new_depth = np.asarray(filters.local_refine(
        data, state, x, y, False, False, jnp.float32(0.2), jnp.float32(2.0),
        jnp.float32(8.0)))
    gt = scene.depths[0][ys.reshape(-1), xs.reshape(-1)]
    old = planes[ys.reshape(-1), xs.reshape(-1), 3]
    old_err = np.abs(old - gt) / gt
    new_err = np.abs(new_depth - gt) / gt
    assert np.median(new_err) < 0.5 * np.median(old_err)

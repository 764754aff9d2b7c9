"""Native C++ runtime vs numpy fallback equivalence."""

import numpy as np
import pytest

from apde_mvs_tpu.io import native
from apde_mvs_tpu.pipeline import fusion
from apde_mvs_tpu.testing import synthetic

pytestmark = pytest.mark.skipif(not native.native_available(),
                                reason="native library not built")


def _views():
    scene = synthetic.make_scene(num_views=3, height=48, width=64)
    views = []
    for v in range(3):
        views.append(fusion.FusionView(
            image=np.zeros((48, 64, 3), np.uint8),
            camera=scene.cameras[v],
            depth=scene.depths[v],
            normal=scene.normals[v],
            weak=np.zeros((48, 64), np.uint8),
            confidence=np.ones((48, 64), np.uint8),
            skip=np.zeros((48, 64), bool),
            mask=np.zeros((48, 64), bool)))
    return views


def test_native_matches_numpy_geometry():
    views = _views()
    rv, sv = views[0], views[1]
    h, w = rv.depth.shape
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    Xw = fusion._backproject_world(rv.camera, xs, ys, rv.depth)

    nat = native.fusion_neighbor_geometry(rv, sv)
    assert nat is not None
    # numpy path
    import apde_mvs_tpu.io.native as native_mod
    saved = native_mod._LIB
    native_mod._LIB = None
    try:
        ref = fusion._neighbor_geometry(rv, sv, Xw)
    finally:
        native_mod._LIB = saved

    n_us, n_re, n_rd, n_an, n_sr, n_sc = nat
    r_us, r_re, r_rd, r_an, r_sr, r_sc = ref
    both = n_us & r_us
    assert both.mean() > 0.5
    np.testing.assert_allclose(n_re[both], r_re[both], atol=1e-2)
    np.testing.assert_allclose(n_rd[both], r_rd[both], atol=1e-4)
    np.testing.assert_allclose(n_an[both], r_an[both], atol=1e-3)
    np.testing.assert_array_equal(n_sr[both], r_sr[both])
    np.testing.assert_array_equal(n_sc[both], r_sc[both])
    # usable agreement (boundary rounding may differ on rare pixels)
    assert (n_us == r_us).mean() > 0.99


def test_native_weak_vis_runs():
    views = _views()
    rv, sv = views[0], views[1]
    rv.weak[:] = 0  # all WEAK
    rv.depth[:] *= 0.5  # float in front of the true surface -> occluded
    strong = np.zeros(rv.depth.shape, np.int32)
    weak = np.zeros(rv.depth.shape, np.int32)
    sv.weak[:] = 1  # src STRONG
    ok = native.weak_vis_accumulate(rv, sv, 80.0, 0.01, strong, weak)
    assert ok
    assert strong.sum() > 0

"""View-major classify/refine parity: the per-view accumulation programs
(ops.filters.sweep_curve_view + *_from_curve) must reproduce the pixel-major
sweeps (depth_to_weak / local_refine) up to summation order."""

import jax
import jax.numpy as jnp
import numpy as np

from apde_mvs_tpu.config import RELIABLE_CURVE_SAMPLE_NUM
from apde_mvs_tpu.core import geometry as geo
from apde_mvs_tpu.ops import filters
from apde_mvs_tpu.ops.cost import CostData
from apde_mvs_tpu.ops.state import PMState
from apde_mvs_tpu.testing import synthetic


def _scene_state(num_views=5, h=48, w=64, seed=9):
    scene = synthetic.make_scene(num_views=num_views, height=h, width=w)
    cams = geo.CameraArrays.from_cameras(scene.cameras)
    src_ids = list(range(1, num_views))
    data = CostData.build(
        cams.view(0),
        geo.CameraArrays(*[a[np.asarray(src_ids)] for a in cams]),
        jnp.asarray(scene.images[0]), jnp.asarray(scene.images[src_ids]),
        src_depths=jnp.asarray(scene.depths[src_ids]))
    S = num_views - 1
    rng = np.random.default_rng(seed)
    state = PMState.create(h, w, S)
    planes = np.zeros((h, w, 4), np.float32)
    planes[..., 3] = scene.depths[0]
    planes[..., :3] = scene.normals[0]
    sel = rng.random((h, w, S)) > 0.4
    sel[..., 0] |= ~sel.any(-1)
    vw = np.where(sel, rng.integers(1, 6, (h, w, S)), 0).astype(np.float32)
    state = state.replace(planes=jnp.asarray(planes),
                          selected=jnp.asarray(sel),
                          view_weights=jnp.asarray(vw))
    return data, state, sel


def _accumulate(data, state, x, y, ncols, include_now, geom):
    """Reference-style accumulation: every view over all pixels (pos =
    identity); unselected pairs contribute zero via the gated weight."""
    B = x.shape[0]
    acc = jnp.zeros((B, ncols), jnp.float32)
    pos = jnp.arange(B, dtype=jnp.int32)
    for s in range(data.num_src):
        acc = filters.sweep_curve_view(
            data, state, acc, x, y, pos, jnp.int32(s), False, geom,
            jnp.float32(0.2), num_steps=ncols - int(include_now),
            include_now=include_now)
    return acc


def test_view_major_classify_matches_pixel_major():
    data, state, sel = _scene_state()
    ys, xs = np.mgrid[10:38, 10:54]
    x = jnp.asarray(xs.reshape(-1), jnp.int32)
    y = jnp.asarray(ys.reshape(-1), jnp.int32)
    args = (jnp.int32(6), False, False, jnp.float32(0.2),
            jnp.float32(2.0), jnp.float32(8.0))
    weak_ref, curve_ref = filters.depth_to_weak(data, state, x, y, *args,
                                                return_curve=True)
    acc = _accumulate(data, state, x, y,
                      RELIABLE_CURVE_SAMPLE_NUM, False, geom=False)
    weak_vm, curve_vm = filters.classify_from_curve(
        data, state, x, y, acc, jnp.int32(6), jnp.float32(2.0),
        jnp.float32(8.0), return_curve=True)
    np.testing.assert_allclose(np.asarray(curve_vm), np.asarray(curve_ref),
                               atol=1e-4)
    assert (np.asarray(weak_vm) != np.asarray(weak_ref)).mean() < 0.01


def test_view_major_classify_geom_matches():
    data, state, sel = _scene_state(seed=3)
    ys, xs = np.mgrid[12:36, 12:52]
    x = jnp.asarray(xs.reshape(-1), jnp.int32)
    y = jnp.asarray(ys.reshape(-1), jnp.int32)
    _, curve_ref = filters.depth_to_weak(
        data, state, x, y, jnp.int32(6), False, True, jnp.float32(0.2),
        jnp.float32(2.0), jnp.float32(8.0), return_curve=True)
    acc = _accumulate(data, state, x, y,
                      RELIABLE_CURVE_SAMPLE_NUM, False, geom=True)
    _, curve_vm = filters.classify_from_curve(
        data, state, x, y, acc, jnp.int32(6), jnp.float32(2.0),
        jnp.float32(8.0), return_curve=True)
    np.testing.assert_allclose(np.asarray(curve_vm), np.asarray(curve_ref),
                               atol=1e-4)


def test_view_major_refine_matches_local_refine():
    data, state, sel = _scene_state(seed=5)
    # offset depths by ~one disparity step so refine has pulls to make
    # (selection varies per pixel; the mean baseline keeps it near one step)
    planes = np.asarray(state.planes).copy()
    fx = float(np.asarray(data.ref_cam.fx))
    bl = np.linalg.norm(np.asarray(data.ref_cam.c)[None, :]
                        - np.asarray(data.src_cams.c), axis=-1).mean()
    disp = fx * bl / np.maximum(planes[..., 3], 1e-6)
    planes[..., 3] = fx * bl / np.maximum(disp - 1.0, 1e-6)
    state = state.replace(planes=jnp.asarray(planes))
    ys, xs = np.mgrid[12:36, 12:52]
    x = jnp.asarray(xs.reshape(-1), jnp.int32)
    y = jnp.asarray(ys.reshape(-1), jnp.int32)
    d_ref = np.asarray(filters.local_refine(
        data, state, x, y, False, False, jnp.float32(0.2), jnp.float32(2.0),
        jnp.float32(8.0)))
    acc = _accumulate(data, state, x, y, 12, True, geom=False)
    d_vm = np.asarray(filters.refine_from_curve(
        data, state, x, y, acc, jnp.float32(2.0), jnp.float32(8.0)))
    # identical decisions away from floating-point ties
    same = np.isclose(d_vm, d_ref, rtol=1e-5)
    assert same.mean() > 0.99
    # and the refined depths actually moved for a meaningful fraction
    moved = ~np.isclose(d_ref, planes[ys.reshape(-1), xs.reshape(-1), 3])
    assert moved.mean() > 0.2


def test_scatter_padding_drops():
    """Padded scatter rows (pos >= len(acc), distinct) must not contribute."""
    data, state, sel = _scene_state(seed=7)
    ys, xs = np.mgrid[20:24, 20:36]
    x = np.asarray(xs.reshape(-1), np.int32)
    y = np.asarray(ys.reshape(-1), np.int32)
    B = len(x)
    acc0 = _accumulate(data, state, jnp.asarray(x), jnp.asarray(y),
                       RELIABLE_CURVE_SAMPLE_NUM, False, geom=False)
    # same accumulation but split per view into two padded sub-batches
    acc = jnp.zeros((B, RELIABLE_CURVE_SAMPLE_NUM), jnp.float32)
    half = B // 2
    for s in range(data.num_src):
        for lo, hi in ((0, half), (half, B)):
            m = hi - lo
            pad = B - m
            xs_p = np.concatenate([x[lo:hi], np.zeros(pad, np.int32)])
            ys_p = np.concatenate([y[lo:hi], np.zeros(pad, np.int32)])
            ps_p = np.concatenate(
                [np.arange(lo, hi, dtype=np.int32),
                 B + np.arange(pad, dtype=np.int32)])
            acc = filters.sweep_curve_view(
                data, state, acc, jnp.asarray(xs_p), jnp.asarray(ys_p),
                jnp.asarray(ps_p), jnp.int32(s), False, False,
                jnp.float32(0.2))
    np.testing.assert_allclose(np.asarray(acc), np.asarray(acc0), atol=1e-4)


def test_driver_view_major_matches_pixel_major(monkeypatch):
    """_view_major_run (host compaction, sub-batches, finish chunks) must
    reproduce the _chunked pixel-major classify outputs."""
    from apde_mvs_tpu.pipeline import patchmatch as pm
    data, state, sel = _scene_state(seed=11)
    h, w = 48, 64
    mask = np.zeros((h, w), bool)
    mask[10:40, 8:60] = True
    cfg = pm.StaticCfg(
        prop=pm.PropCfg(top_k=4, geom_consistency=False, use_impetus=False,
                        use_sa=False, refine_init=False, strong_radius=5,
                        strong_increment=2, weak_radius=5, weak_increment=2),
        use_apd=False, max_iterations=2, rotate_time=4)
    monkeypatch.setenv("APDE_VIEW_SB", "777")   # force sub-batch splitting
    finish = pm._jit_classify_finish((h, w), data.num_src, cfg, 512, False)
    (vy, vx), vouts = pm._view_major_run(
        data, state, mask, sel, cfg, RELIABLE_CURVE_SAMPLE_NUM, False,
        lambda cx, cy, acc: finish(data, state, cx, cy, acc, jnp.int32(6),
                                   jnp.float32(2.0), jnp.float32(8.0)),
        jnp.float32(0.2), 512)
    weak_vm = np.concatenate([np.asarray(o[0]) for o in vouts])[:len(vx)]
    cyy, cxx = np.nonzero(mask)
    weak_ref, _ = filters.depth_to_weak(
        data, state, jnp.asarray(cxx, jnp.int32), jnp.asarray(cyy, jnp.int32),
        jnp.int32(6), False, False, jnp.float32(0.2), jnp.float32(2.0),
        jnp.float32(8.0))
    assert (weak_vm != np.asarray(weak_ref)).mean() < 0.01

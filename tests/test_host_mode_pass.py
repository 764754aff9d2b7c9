"""Host-dispatched pass driver (large-image mode) vs the fused program.

Above ~1 MP the engine dispatches one device program per pixel chunk
instead of the fused iterations program (the remote TPU worker kills
programs that run for minutes; pipeline/patchmatch.py host-dispatch
section). Forced on at test size, the host driver must reproduce the fused
driver's quality — RNG draw grouping is the only difference.
"""

import jax
import jax.numpy as jnp
import numpy as np

from apde_mvs_tpu import config as cfg_mod
from apde_mvs_tpu.core import geometry as geo
from apde_mvs_tpu.ops.cost import CostData
from apde_mvs_tpu.pipeline import patchmatch as pm
from apde_mvs_tpu.testing import synthetic


def _run_pass(scene, params, monkey_host, prior=None, src_depths=None):
    cams = geo.CameraArrays.from_cameras(scene.cameras)
    V = scene.images.shape[0]
    src_ids = np.arange(1, V)
    data = CostData.build(
        cams.view(0), geo.CameraArrays(*[a[src_ids] for a in cams]),
        jnp.asarray(scene.images[0]), jnp.asarray(scene.images[src_ids]),
        src_depths=src_depths, sampler_u8=True)
    kw = dict(prior or {})
    return pm.run_patchmatch(
        data, params,
        depth_min=scene.cameras[0].depth_min * cfg_mod.DEPTH_MIN_FACTOR,
        depth_max=scene.cameras[0].depth_max * cfg_mod.DEPTH_MAX_FACTOR,
        seed=3, **kw)


def test_host_mode_first_init_matches_fused_quality(monkeypatch):
    scene = synthetic.make_scene(num_views=4, height=64, width=96)
    schedule = cfg_mod.build_schedule(96, "General", use_sa=False, base=96)
    params = schedule[0].params
    assert params.state == "first_init"

    out_fused = _run_pass(scene, params, False)
    monkeypatch.setattr(pm, "_iterations_host_mode",
                        lambda shape, S, cfg, u8=True: True)
    # exercise chunk-boundary padding too: B = 64*96/2 = 3072
    monkeypatch.setattr(pm, "_host_chunks", lambda S, banded=False: (1024, 512))
    out_host = _run_pass(scene, params, True)

    gt = scene.depths[0]
    for out in (out_fused, out_host):
        d = out.depth
        ok = (gt > 0) & (d > 0)
        rel = np.abs(d[ok] - gt[ok]) / gt[ok]
        assert np.median(rel) < 0.01, np.median(rel)
    agree = (out_fused.weak == out_host.weak).mean()
    assert agree > 0.9, agree


def test_host_mode_apd_pass_runs(monkeypatch):
    """The full APD machinery (anchors, fit planes, weak host sweep) through
    the host driver: quality against ground truth on a weak-region scene."""
    scene = synthetic.make_scene(num_views=4, height=64, width=96,
                                 weak_region=(-0.35, 0.35, -0.3, 0.3))
    # base=48 -> 2 pyramid rounds, so the schedule contains a refine_init
    # (use_APD) pass at full resolution
    schedule = cfg_mod.build_schedule(96, "General", use_sa=False, base=48)
    first = schedule[0].params
    refine = next(s.params for s in schedule if s.params.state == "refine_init")

    out_a = _run_pass(scene, first, False)
    monkeypatch.setattr(pm, "_iterations_host_mode",
                        lambda shape, S, cfg, u8=True: True)
    monkeypatch.setattr(pm, "_host_chunks", lambda S, banded=False: (1024, 512))
    # force the chunked anchor-generation path too (weak cap 4096 -> 4
    # chunks of 1024): covers _jit_jfa/_jit_anchor_chunk/_jit_neighbor_update
    monkeypatch.setattr(pm, "_APD_SETUP_CHUNK", 1024)
    src_depths = jnp.asarray(scene.depths[1:])
    out_b = _run_pass(
        scene, refine, True,
        prior=dict(prior_depth=out_a.depth, prior_normal=out_a.normal,
                   prior_weak=out_a.weak, prior_confidence=out_a.confidence),
        src_depths=src_depths)
    gt = scene.depths[0]
    d = out_b.depth
    ok = (gt > 0) & (d > 0)
    rel = np.abs(d[ok] - gt[ok]) / gt[ok]
    assert np.median(rel) < 0.01, np.median(rel)
    assert (d > 0).mean() > 0.8


def test_view_major_pass_matches_pixel_major(monkeypatch):
    """run_patchmatch with the view-major classify/refine dispatch forced on
    must reproduce the pixel-major pass (same sweeps, only classification /
    refine summation order differs)."""
    scene = synthetic.make_scene(num_views=4, height=64, width=96,
                                 weak_region=(-0.35, 0.35, -0.3, 0.3))
    schedule = cfg_mod.build_schedule(96, "General", use_sa=False, base=96)
    params = schedule[0].params

    monkeypatch.setenv("APDE_VIEW_MAJOR", "0")
    out_pm = _run_pass(scene, params, False)
    monkeypatch.setenv("APDE_VIEW_MAJOR", "1")
    monkeypatch.setenv("APDE_VIEW_SB", "1500")   # force sub-batch splits
    out_vm = _run_pass(scene, params, False)

    agree = (out_pm.weak == out_vm.weak).mean()
    assert agree > 0.98, agree
    close = np.isclose(out_pm.depth, out_vm.depth, rtol=1e-4)
    assert close.mean() > 0.98, close.mean()

"""Tile-parallel single-view pass (parallel.tile_pass): correctness on the
virtual CPU mesh — quality pinned against ground truth, mesh-size
consistency, and the driver routing that sends few-views-many-chips scans
through it (VERDICT r2 next-round #3; reference single-view kernel grid
APD.cu:2663-2737)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from apde_mvs_tpu import config as cfg
from apde_mvs_tpu.core import geometry as geo
from apde_mvs_tpu.parallel.tile_pass import TileInputs, build_tile_pass
from apde_mvs_tpu.pipeline.full_pass import PassStatic
from apde_mvs_tpu.testing import synthetic

H, W, V = 64, 96, 4


def _tile_inputs(scene, ref=0):
    cams = geo.CameraArrays.from_cameras(scene.cameras)
    src_ids = [v for v in range(V) if v != ref]
    imgs = np.clip(np.round(scene.images), 0, 255).astype(np.uint8)
    d = scene.depths[ref]
    return TileInputs(
        ref_image=jnp.asarray(imgs[ref]),
        src_images=jnp.asarray(imgs[src_ids]),
        ref_cam=cams.view(ref),
        src_cams=geo.CameraArrays(*[a[np.asarray(src_ids)] for a in cams]),
        sa=jnp.zeros((H, W), jnp.int32),
        src_depths=jnp.zeros((len(src_ids), H, W), jnp.float32),
        prior_depth=jnp.zeros((H, W), jnp.float32),
        prior_normal=jnp.zeros((H, W, 3), jnp.float32),
        prior_weak=jnp.full((H, W), cfg.UNKNOWN, jnp.int32),
        prior_conf=jnp.ones((H, W), jnp.float32),
        valid=jnp.ones((H, W), bool),
        weak_x=jnp.zeros(1, jnp.int32), weak_y=jnp.zeros(1, jnp.int32),
        weak_valid=jnp.zeros(1, bool),
        key=jax.random.PRNGKey(5),
        dmin=jnp.float32(float(d[d > 0].min()) * 0.7),
        dmax=jnp.float32(float(d.max()) * 1.3))


def _run(scene, n_devices):
    mesh = Mesh(np.asarray(jax.devices()[:n_devices]), ("tiles",))
    params = cfg.PatchMatchParams(state="first_init", max_iterations=3,
                                  use_sa=False)
    pcfg = PassStatic.from_params(params, nw_cap=0)
    step = build_tile_pass(mesh, pcfg, V - 1, (H, W), (H, W))
    tp = _tile_inputs(scene)
    depth, normal, weak, conf, cost = step(
        tp, jnp.float32(params.ransac_threshold),
        jnp.int32(params.weak_peak_radius), jnp.float32(0.2))
    return np.asarray(depth), np.asarray(normal), np.asarray(weak)


@pytest.fixture(scope="module")
def scene():
    return synthetic.make_scene(num_views=V, height=H, width=W)


def test_tile_pass_quality_and_mesh_invariance(scene):
    gt = scene.depths[0]
    results = {}
    for n in (1, 4):
        depth, normal, weak = _run(scene, n)
        ok = (depth > 0) & (gt > 0)
        rel = np.abs(depth - gt)[ok] / gt[ok]
        results[n] = (depth, np.median(rel))
        assert np.median(rel) < 0.005, \
            f"{n}-device tile pass depth error {np.median(rel)}"
        dot = np.clip(np.abs((normal * scene.normals[0]).sum(-1)), 0, 1)
        assert np.median(np.degrees(np.arccos(dot))[ok]) < 5.0
    # different tile counts draw different per-device keys, so results are
    # statistically — not bitwise — equivalent: both must agree with each
    # other about as well as with ground truth
    d1, d4 = results[1][0], results[4][0]
    ok = (d1 > 0) & (d4 > 0)
    cross = np.abs(d1 - d4)[ok] / d4[ok]
    assert np.median(cross) < 0.01


def test_run_scan_routes_tiles_when_views_below_devices(tmp_path, capsys):
    """A 2-view scan on the 8-device mesh: run_scan must route photometric
    passes through the tile engine (>1 device per view) and still produce a
    correct reconstruction end-to-end."""
    from apde_mvs_tpu.io import binmat
    from apde_mvs_tpu.pipeline import driver
    scene2 = synthetic.make_scene(num_views=2, height=64, width=96,
                                  baseline=0.4)
    root = tmp_path / "scan"
    synthetic.write_scene_to_disk(scene2, root)
    driver.run_scan(root, dataset="General", use_sa=False, weak_filter=True,
                    export_color=True, seed=0, views_parallel=True)
    outp = capsys.readouterr().out
    assert "TILED over 8 device(s)" in outp, \
        "tile route not taken for a 2-view scan on 8 devices"
    depth = binmat.read_bin_mat(root / "APD" / "00000000" / "depths.bin")
    gt = scene2.depths[0]
    ok = (depth > 0) & (gt > 0)
    rel = np.abs(depth - gt)[ok] / gt[ok]
    assert np.median(rel) < 0.01, f"tiled scan depth error {np.median(rel)}"


def _apd_tile_run(scene, n_devices, cap=2048, seed=5):
    """One refine_init APD pass through the tile engine: priors = noisy
    ground truth, weak list = the scene's low-texture region. Exercises the
    round-5 SHARDED weak machinery (anchors / fit RANSAC / deformable weak
    sweeps split over the mesh; VERDICT r4 #1)."""
    mesh = Mesh(np.asarray(jax.devices()[:n_devices]), ("tiles",))
    params = cfg.PatchMatchParams(state="refine_init", max_iterations=2,
                                  use_sa=False, use_apd=True,
                                  geom_consistency=False, rotate_time=2)
    cams = geo.CameraArrays.from_cameras(scene.cameras)
    src_ids = [v for v in range(V) if v != 0]
    imgs = np.clip(np.round(scene.images), 0, 255).astype(np.uint8)
    gt = scene.depths[0]
    rng = np.random.default_rng(seed)
    prior_depth = (gt * (1 + 0.01 * rng.standard_normal(gt.shape))
                   ).astype(np.float32)
    prior_normal = scene.normals[0].astype(np.float32)
    # weak = the low-texture second plane region (where texture amp ~1.5)
    weak_map = np.full((H, W), cfg.STRONG, np.int32)
    # mark the weak_region rectangle via its distinct (nearer) plane depth
    weak_map[gt < 0.95 * np.median(gt)] = cfg.WEAK
    wy, wx = np.nonzero(weak_map == cfg.WEAK)
    assert 32 < len(wx) < cap, f"weak region size {len(wx)}"
    wxp = np.zeros(cap, np.int32)
    wyp = np.zeros(cap, np.int32)
    wvp = np.zeros(cap, bool)
    wxp[:len(wx)] = wx
    wyp[:len(wy)] = wy
    wvp[:len(wx)] = True
    pcfg = PassStatic.from_params(params, nw_cap=cap)
    step = build_tile_pass(mesh, pcfg, V - 1, (H, W), (H, W))
    tp = TileInputs(
        ref_image=jnp.asarray(imgs[0]),
        src_images=jnp.asarray(imgs[src_ids]),
        ref_cam=cams.view(0),
        src_cams=geo.CameraArrays(*[a[np.asarray(src_ids)] for a in cams]),
        sa=jnp.zeros((H, W), jnp.int32),
        src_depths=jnp.zeros((len(src_ids), H, W), jnp.float32),
        prior_depth=jnp.asarray(prior_depth),
        prior_normal=jnp.asarray(prior_normal),
        prior_weak=jnp.asarray(weak_map),
        prior_conf=jnp.full((H, W), 4.0, jnp.float32),
        valid=jnp.ones((H, W), bool),
        weak_x=jnp.asarray(wxp), weak_y=jnp.asarray(wyp),
        weak_valid=jnp.asarray(wvp),
        key=jax.random.PRNGKey(11),
        dmin=jnp.float32(float(gt[gt > 0].min()) * 0.7),
        dmax=jnp.float32(float(gt.max()) * 1.3))
    depth, normal, weak, conf, cost = step(
        tp, jnp.float32(params.ransac_threshold),
        jnp.int32(params.weak_peak_radius), jnp.float32(0.2))
    return np.asarray(depth), np.asarray(weak), weak_map, gt


@pytest.fixture(scope="module")
def weak_scene():
    return synthetic.make_scene(num_views=V, height=H, width=W,
                                weak_region=(-0.25, 0.25, -0.2, 0.2))


def test_tile_pass_apd_sharded_weak_quality_and_invariance(weak_scene):
    """The sharded weak machinery must (a) reconstruct the weak region on
    any mesh size and (b) agree across mesh sizes as well as it agrees with
    ground truth (per-device keys differ, so statistical equivalence)."""
    gt = weak_scene.depths[0]
    results = {}
    for n in (1, 4):
        depth, weak_out, weak_map, _ = _apd_tile_run(weak_scene, n)
        weak_px = weak_map == cfg.WEAK
        ok = (depth > 0) & (gt > 0)
        rel = np.abs(depth - gt)[ok] / gt[ok]
        assert np.median(rel) < 0.005, f"{n}-device APD tile err {np.median(rel)}"
        relw = (np.abs(depth - gt) / gt)[ok & weak_px]
        assert np.median(relw) < 0.01, \
            f"{n}-device weak-region err {np.median(relw)}"
        results[n] = depth
    ok = (results[1] > 0) & (results[4] > 0)
    cross = np.abs(results[1] - results[4])[ok] / results[4][ok]
    assert np.median(cross) < 0.01


def test_tile_pass_apd_rejects_undivisible_cap(weak_scene):
    with pytest.raises(ValueError, match="divide over"):
        _apd_tile_run(weak_scene, 4, cap=2049)


@pytest.mark.slow
def test_tile_route_consumes_sa_masks(tmp_path):
    """run_pass_tiled must feed sa_masks/<id>.bin into the pass (fidelity
    gap found round 5: the tile route hardwired sa=0). Detection: with
    identical seeds, a tiled scan's output must CHANGE when masks appear —
    if the route ignored them, the two runs would be bitwise identical."""
    from apde_mvs_tpu.io import binmat
    from apde_mvs_tpu.pipeline import driver
    scene2 = synthetic.make_scene(num_views=2, height=64, width=96,
                                  baseline=0.4,
                                  weak_region=(-0.3, 0.3, -0.2, 0.2))
    outs = {}
    for masks in (False, True):
        root = tmp_path / ("scan_sa" if masks else "scan_plain")
        synthetic.write_scene_to_disk(scene2, root)
        if masks:
            (root / "sa_masks").mkdir()
            for v in range(2):
                m = np.where(scene2.depths[v]
                             < scene2.depths[v].mean() * 0.95, 1, 0)
                binmat.write_bin_mat(root / "sa_masks" / f"{v:08d}.bin",
                                     m.astype(np.uint8))
        driver.run_scan(root, dataset="General", use_sa=True,
                        weak_filter=False, seed=0, views_parallel=True,
                        no_fuse=True)
        outs[masks] = binmat.read_bin_mat(
            root / "APD" / "00000000" / "depths.bin")
        gt = scene2.depths[0]
        ok = (outs[masks] > 0) & (gt > 0)
        rel = np.abs(outs[masks] - gt)[ok] / gt[ok]
        assert np.median(rel) < 0.01, f"masks={masks}: {np.median(rel)}"
    assert not np.array_equal(outs[False], outs[True]), \
        "sa masks had no effect on the tiled pass"

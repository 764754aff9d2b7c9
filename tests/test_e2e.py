"""End-to-end reconstruction on a synthetic scene: full driver (multi-scale
schedule, per-view passes, fusion) against analytic ground truth."""

import numpy as np
import pytest

from apde_mvs_tpu.io.ply import read_ply
from apde_mvs_tpu.io import binmat
from apde_mvs_tpu.pipeline import driver
from apde_mvs_tpu.testing import synthetic


def _plane_dist(scene, pts):
    pl = scene.planes[0]
    n = pl.normal / np.linalg.norm(pl.normal)
    return np.abs(pts @ n + pl.w)


@pytest.mark.slow
def test_single_round_scan(tmp_path):
    scene = synthetic.make_scene(num_views=4, height=96, width=128)
    root = tmp_path / "scan"
    synthetic.write_scene_to_disk(scene, root)
    driver.run_scan(root, dataset="General", use_sa=False, weak_filter=True,
                    export_color=True, seed=0)

    # per-view depth maps
    for v in range(scene.num_views):
        depth = binmat.read_bin_mat(root / "APD" / f"{v:08d}" / "depths.bin")
        gt = scene.depths[v]
        ok = (depth > 0) & (gt > 0)
        rel = np.abs(depth - gt)[ok] / gt[ok]
        assert np.median(rel) < 0.01, f"view {v} median depth error {np.median(rel)}"

    pts, cols = read_ply(root / "APD" / "APD.ply")
    assert len(pts) > 10000, "fusion produced too few points"
    assert cols is not None and len(cols) == len(pts)
    d = _plane_dist(scene, pts)
    # points fused from ~4 m away cameras should sit on the plane
    assert np.median(d) < 0.01
    assert (d < 0.05).mean() > 0.9


@pytest.mark.slow
def test_two_round_scan_with_apd(tmp_path):
    """Forces 2 pyramid rounds so REFINE_INIT + the full APD weak machinery
    (anchors, fit planes, deformable NCC) runs on round 1."""
    scene = synthetic.make_scene(
        num_views=4, height=96, width=128,
        weak_region=(-0.35, 0.35, -0.25, 0.25))
    root = tmp_path / "scan"
    synthetic.write_scene_to_disk(scene, root)
    driver.run_scan(root, dataset="General", use_sa=False, weak_filter=True,
                    export_color=True, seed=0, pyramid_base=64)

    depth = binmat.read_bin_mat(root / "APD" / "00000001" / "depths.bin")
    gt = scene.depths[1]
    ok = (depth > 0) & (gt > 0)
    rel = np.abs(depth - gt)[ok] / gt[ok]
    assert np.median(rel) < 0.02
    pts, _ = read_ply(root / "APD" / "APD.ply")
    assert len(pts) > 5000

"""Robustness e2e: occluding foreground geometry and image noise."""

import numpy as np
import pytest

from apde_mvs_tpu.io import binmat
from apde_mvs_tpu.io.ply import read_ply
from apde_mvs_tpu.pipeline import driver
from apde_mvs_tpu.testing import synthetic


@pytest.mark.slow
def test_foreground_occlusion_scene(tmp_path):
    """A floating foreground plane occludes parts of the background: depth
    discontinuities + per-view occlusion must not break reconstruction."""
    scene = synthetic.make_scene(num_views=4, height=96, width=128,
                                 with_foreground=True)
    root = tmp_path / "scan"
    synthetic.write_scene_to_disk(scene, root)
    driver.run_scan(root, dataset="General", use_sa=False, weak_filter=True,
                    export_color=True, seed=0)
    depth = binmat.read_bin_mat(root / "APD" / "00000000" / "depths.bin")
    gt = scene.depths[0]
    ok = (depth > 0) & (gt > 0)
    rel = np.abs(depth - gt)[ok] / gt[ok]
    # discontinuity edges are hard; the bulk must still be right
    assert np.median(rel) < 0.01
    assert (rel < 0.02).mean() > 0.85
    pts, _ = read_ply(root / "APD" / "APD.ply")
    assert len(pts) > 8000
    # both surfaces must be present in the fused cloud
    fg = scene.planes[1]
    n_fg = fg.normal / np.linalg.norm(fg.normal)
    d_fg = np.abs(pts @ n_fg + fg.w)
    assert (d_fg < 0.02).sum() > 300, "foreground plane missing from cloud"


@pytest.mark.slow
def test_noisy_images_scene(tmp_path):
    """Additive sensor noise: NCC matching must stay robust."""
    scene = synthetic.make_scene(num_views=4, height=96, width=128)
    rng = np.random.default_rng(0)
    scene.images[:] = np.clip(
        scene.images + rng.normal(0, 6.0, scene.images.shape), 0, 255)
    root = tmp_path / "scan"
    synthetic.write_scene_to_disk(scene, root)
    driver.run_scan(root, dataset="General", use_sa=False, weak_filter=True,
                    export_color=False, seed=0)
    depth = binmat.read_bin_mat(root / "APD" / "00000000" / "depths.bin")
    gt = scene.depths[0]
    ok = (depth > 0) & (gt > 0)
    rel = np.abs(depth - gt)[ok] / gt[ok]
    assert np.median(rel) < 0.02

"""Driver phase-split modes: only_fuse, no_fuse, memory cache, SA masks."""

import numpy as np
import pytest

from apde_mvs_tpu.config import STRONG
from apde_mvs_tpu.io import MemoryCache, binmat
from apde_mvs_tpu.io.ply import read_ply
from apde_mvs_tpu.pipeline import driver
from apde_mvs_tpu.testing import synthetic


def _write_results(root, scene):
    for v in range(scene.num_views):
        folder = root / "APD" / f"{v:08d}"
        folder.mkdir(parents=True, exist_ok=True)
        binmat.write_bin_mat(folder / "depths.bin", scene.depths[v])
        binmat.write_bin_mat(folder / "normals.bin", scene.normals[v])
        binmat.write_bin_mat(folder / "weak.bin",
                             np.full(scene.depths[v].shape, STRONG, np.uint8))
        binmat.write_bin_mat(folder / "confidence.bin",
                             np.full(scene.depths[v].shape, 10, np.uint8))


def test_only_fuse_mode(tmp_path):
    scene = synthetic.make_scene(num_views=3, height=48, width=64)
    root = tmp_path / "scan"
    synthetic.write_scene_to_disk(scene, root)
    _write_results(root, scene)
    driver.run_scan(root, dataset="General", only_fuse=True,
                    use_memory_cache=False, use_sa=False, weak_filter=False)
    pts, _ = read_ply(root / "APD" / "APD.ply")
    assert len(pts) > 1000


@pytest.mark.slow
def test_no_fuse_then_fuse(tmp_path):
    scene = synthetic.make_scene(num_views=3, height=48, width=64)
    root = tmp_path / "scan"
    synthetic.write_scene_to_disk(scene, root)
    driver.run_scan(root, dataset="General", no_fuse=True, use_sa=False,
                    use_memory_cache=True, flush=True)
    assert not (root / "APD" / "APD.ply").exists()
    assert (root / "APD" / "00000000" / "depths.bin").exists()
    driver.run_scan(root, dataset="General", only_fuse=True, use_sa=False,
                    weak_filter=True)
    assert (root / "APD" / "APD.ply").exists()


@pytest.mark.slow
def test_f32_sampler_oracle_path(tmp_path):
    """The exact f32 quad oracle (--sampler f32) reconstructs end-to-end;
    covers the non-default branch of every sampling dispatch."""
    scene = synthetic.make_scene(num_views=3, height=48, width=64)
    root = tmp_path / "scan"
    synthetic.write_scene_to_disk(scene, root)
    driver.run_scan(root, dataset="General", use_sa=False, weak_filter=True,
                    pyramid_base=32, sampler_u8=False)
    depth = binmat.read_bin_mat(root / "APD" / "00000001" / "depths.bin")
    gt = scene.depths[1]
    ok = (depth > 0) & (gt > 0)
    rel = np.abs(depth - gt)[ok] / gt[ok]
    assert np.median(rel) < 0.05


@pytest.mark.slow
def test_sa_mask_path(tmp_path):
    """Scan with synthetic SA masks: the weak-region plane becomes its own
    segment so the SA-gated NCC windows and anchor gating run e2e."""
    scene = synthetic.make_scene(num_views=3, height=48, width=64,
                                 weak_region=(-0.3, 0.3, -0.2, 0.2))
    root = tmp_path / "scan"
    synthetic.write_scene_to_disk(scene, root)
    (root / "sa_masks").mkdir()
    for v in range(scene.num_views):
        # segment id 1 = the weak plane region (low texture); 0 elsewhere
        mask = np.where(scene.depths[v] < scene.depths[v].mean() * 0.95, 1, 0)
        binmat.write_bin_mat(root / "sa_masks" / f"{v:08d}.bin",
                             mask.astype(np.uint8))
    driver.run_scan(root, dataset="General", use_sa=True, weak_filter=True,
                    pyramid_base=32)
    depth = binmat.read_bin_mat(root / "APD" / "00000001" / "depths.bin")
    gt = scene.depths[1]
    ok = (depth > 0) & (gt > 0)
    rel = np.abs(depth - gt)[ok] / gt[ok]
    assert np.median(rel) < 0.05
    assert (root / "APD" / "APD.ply").exists()


def test_start_iteration_resumes_at_pass_boundary(tmp_path, capsys):
    """--start_iteration skips completed passes and rebuilds state from the
    per-view bins (coarse mid-scan recovery; the file interchange IS the
    checkpoint — SURVEY §5.4). A scan interrupted after its photometric
    pass and resumed at iteration 1 must produce a full-quality result."""
    scene = synthetic.make_scene(num_views=3, height=48, width=64)
    root = tmp_path / "scan"
    synthetic.write_scene_to_disk(scene, root)
    # phase 1: a full no-fuse run leaves per-view bins on disk (stand-in
    # for a scan interrupted after some pass); phase 2 resumes at
    # iteration 1, which must skip pass 0 and rebuild state from the bins
    driver.run_scan(root, dataset="General", no_fuse=True, use_sa=False,
                    use_memory_cache=False, start_iteration=0,
                    pyramid_base=64)
    d0 = binmat.read_bin_mat(root / "APD" / "00000000" / "depths.bin")
    driver.run_scan(root, dataset="General", use_sa=False,
                    use_memory_cache=False, start_iteration=1,
                    pyramid_base=64)
    out = capsys.readouterr().out
    assert "iteration 0 skipped (resume from 1)" in out
    d1 = binmat.read_bin_mat(root / "APD" / "00000000" / "depths.bin")
    gt = scene.depths[0]
    ok = (d1 > 0) & (gt > 0)
    rel = np.abs(d1[ok] - gt[ok]) / gt[ok]
    assert np.median(rel) < 0.01
    assert (root / "APD" / "APD.ply").exists()
    assert d0.shape == d1.shape

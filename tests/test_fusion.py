"""Fusion variants + visibility filter unit tests on synthetic geometry."""

import numpy as np
import pytest

from apde_mvs_tpu.config import FusionParams, STRONG, WEAK
from apde_mvs_tpu.pipeline import driver, fusion
from apde_mvs_tpu.testing import synthetic


@pytest.fixture(scope="module")
def scene_on_disk(tmp_path_factory):
    """A scene with ground-truth depth maps written as if reconstructed."""
    root = tmp_path_factory.mktemp("fuse") / "scan"
    scene = synthetic.make_scene(num_views=4, height=64, width=96)
    synthetic.write_scene_to_disk(scene, root)
    from apde_mvs_tpu.io.binmat import write_bin_mat
    for v in range(4):
        folder = root / "APD" / f"{v:08d}"
        folder.mkdir(parents=True, exist_ok=True)
        write_bin_mat(folder / "depths.bin", scene.depths[v])
        write_bin_mat(folder / "normals.bin", scene.normals[v])
        write_bin_mat(folder / "weak.bin",
                      np.full(scene.depths[v].shape, STRONG, np.uint8))
        write_bin_mat(folder / "confidence.bin",
                      np.full(scene.depths[v].shape, 10, np.uint8))
    return root, scene


def _problems(root):
    return driver.generate_sample_list(root)


@pytest.mark.parametrize("variant", ["general", "tat_i", "tat_a"])
def test_fusion_variants_on_gt_depths(scene_on_disk, variant):
    root, scene = scene_on_disk
    problems = _problems(root)
    params = FusionParams(variant=variant, weak_filter=False)
    ply = fusion.run_fusion(root, problems, f"fused_{variant}.ply", params,
                            export_color=True)
    from apde_mvs_tpu.io.ply import read_ply
    pts, cols = read_ply(ply)
    assert len(pts) > 3000, f"{variant}: too few fused points"
    pl = scene.planes[0]
    n = pl.normal / np.linalg.norm(pl.normal)
    d = np.abs(pts @ n + pl.w)
    assert np.median(d) < 0.01, f"{variant}: points off the GT plane"


def test_fusion_rejects_inconsistent_view(scene_on_disk):
    root, scene = scene_on_disk
    problems = _problems(root)
    # corrupt one view's depths: its pixels should contribute fewer points
    from apde_mvs_tpu.io.binmat import read_bin_mat, write_bin_mat
    p0 = root / "APD" / "00000000" / "depths.bin"
    orig = read_bin_mat(p0)
    write_bin_mat(p0, orig * 1.5)
    try:
        params = FusionParams(variant="general", weak_filter=False)
        ply = fusion.run_fusion(root, problems, "fused_bad.ply", params,
                                export_color=False)
        from apde_mvs_tpu.io.ply import read_ply
        pts_bad, _ = read_ply(ply)
    finally:
        write_bin_mat(p0, orig)
    ply = fusion.run_fusion(root, problems, "fused_good.ply",
                            FusionParams(variant="general", weak_filter=False),
                            export_color=False)
    from apde_mvs_tpu.io.ply import read_ply
    pts_good, _ = read_ply(ply)
    assert len(pts_bad) < len(pts_good)


def test_weak_vis_filter_marks_floaters(scene_on_disk):
    root, scene = scene_on_disk
    problems = _problems(root)
    views = fusion.load_fusion_views(root, problems)
    # make view 0 weak with depths floating in front of the true surface
    views[0].weak[:] = WEAK
    views[0].depth *= 0.6
    for v in views[1:]:
        v.weak[:] = STRONG
    params = FusionParams()
    fusion.weak_vis_filter(views, problems, root, params)
    inner = views[0].skip[8:-8, 8:-8]
    assert inner.mean() > 0.5, "floating weak pixels should be skipped"
    assert not views[1].skip.any()


def test_sharded_fusion_merge(scene_on_disk):
    root, scene = scene_on_disk
    problems = _problems(root)
    params = FusionParams(variant="general", weak_filter=False)
    for i in range(2):
        fusion.run_fusion(root, problems, "sharded.ply", params,
                          export_color=True, shard=(i, 2))
    fusion.merge_fusion_shards(root, "sharded.ply", 2)
    from apde_mvs_tpu.io.ply import read_ply
    pts, cols = read_ply(root / "APD" / "sharded.ply")
    # unsharded baseline with fresh masks
    ply = fusion.run_fusion(root, problems, "unsharded.ply", params,
                            export_color=True)
    base, _ = read_ply(ply)
    # the owner-wins merge restores cross-shard consumption, so the merged
    # cloud sits near the unsharded count instead of duplicating points
    assert abs(len(pts) - len(base)) < 0.05 * len(base)


def test_merge_skips_stale_consume_sidecars(scene_on_disk):
    """Sidecars left over from an earlier run must not be applied to
    regenerated part PLYs of different size (stale-state guard)."""
    import numpy as np

    root, scene = scene_on_disk
    problems = _problems(root)
    params = FusionParams(variant="general", weak_filter=False)
    for i in range(2):
        fusion.run_fusion(root, problems, "stale.ply", params,
                          export_color=True, shard=(i, 2))
    # corrupt one sidecar so its origin count mismatches the part PLY
    side = root / "APD" / "stale.ply.part0of2.consume"
    orig = np.load(side / "origin.npy")
    np.save(side / "origin.npy", orig[: max(1, len(orig) // 2)])
    fusion.merge_fusion_shards(root, "stale.ply", 2)   # must not raise
    from apde_mvs_tpu.io.ply import read_ply
    pts, _ = read_ply(root / "APD" / "stale.ply")
    assert len(pts) > 0

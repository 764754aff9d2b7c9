"""CLI surface tests: flag parity, scheduler mechanics, engine smoke run."""

import os
import subprocess
import sys

import numpy as np
import pytest

from apde_mvs_tpu.cli import apd, prepare_scene, run as run_cli


def test_apd_flag_parity():
    # the reference's 13 runtime flags must all parse (main.cpp:7-41)
    args = apd.build_parser().parse_args([
        "--dense_folder", "/tmp/x", "--gpu_index", "1", "--dataset", "ETH3D",
        "--only_fuse", "false", "--no_fuse", "true", "--memory_cache", "true",
        "--use_sa", "false", "--use_impetus", "true", "--weak_filter", "false",
        "--flush", "true", "--export_anchor", "true", "--export_curve",
        "false", "--export_color", "true"])
    assert args.dataset == "ETH3D"
    assert args.no_fuse and not args.only_fuse
    assert not args.use_sa and args.use_impetus and not args.weak_filter
    assert args.flush and args.export_anchor and not args.export_curve


def test_run_parser_and_presets():
    args = run_cli.build_parser().parse_args(
        ["--data_dir", "/d/ETH3D", "--ETH3D_train", "--gpu_num", "4",
         "--work_num", "2", "--resume"])
    assert args.device_num == 4  # --gpu_num alias
    scans = run_cli.select_scans(args)
    assert len(scans) == 13 and "office" in scans
    args2 = run_cli.build_parser().parse_args(
        ["--data_dir", "/d", "--TaT_advanced"])
    assert "Palace" in run_cli.select_scans(args2)


def test_reservation_parsing():
    assert run_cli.parse_reservation("3h30m10s") == 3 * 3600 + 30 * 60 + 10
    assert run_cli.parse_reservation("90s") == 90
    assert run_cli.parse_reservation("45") == 45
    with pytest.raises(ValueError):
        run_cli.parse_reservation("3x")


def test_prepare_scene_cli(tmp_path):
    scan = tmp_path / "scan1"
    (scan / "undist" / "images").mkdir(parents=True)
    from PIL import Image
    Image.new("RGB", (8, 8)).save(scan / "undist" / "images" / "0.jpg")
    rc = prepare_scene.main(["--scan_dir", str(scan)])
    assert rc == 0
    assert (scan / "images").is_dir()
    assert os.path.samefile(scan / "images", scan / "undist" / "images")


@pytest.mark.slow
def test_engine_cli_smoke(tmp_path):
    """Full engine run through the CLI entry point on a tiny scene."""
    from apde_mvs_tpu.testing import synthetic

    scene = synthetic.make_scene(num_views=3, height=48, width=64)
    root = tmp_path / "scan"
    synthetic.write_scene_to_disk(scene, root)
    rc = apd.main(["--dense_folder", str(root), "--dataset", "General",
                   "--use_sa", "false", "--export_anchor", "true"])
    assert rc == 0
    assert (root / "APD" / "APD.ply").exists()
    assert (root / "APD" / "00000000" / "depths.bin").exists()

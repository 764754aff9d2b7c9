"""Scan layout normalization (datasets/layout.py)."""

import os

import pytest

from apde_mvs_tpu.datasets import layout


def _touch(path):
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(b"x")


def test_find_prefers_candidate_order(tmp_path):
    _touch(tmp_path / "undist" / "images" / "00000000.jpg")
    assert layout.find_image_dir(tmp_path) == tmp_path / "undist" / "images"
    (tmp_path / "images").mkdir()
    assert layout.find_image_dir(tmp_path) == tmp_path / "images"


def test_find_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        layout.find_image_dir(tmp_path)


def test_normalize_creates_symlink(tmp_path):
    _touch(tmp_path / "undist" / "images" / "00000000.jpg")
    canonical = layout.normalize_image_dir(tmp_path)
    assert canonical == tmp_path / "images"
    assert os.path.samefile(canonical, tmp_path / "undist" / "images")
    # idempotent
    assert layout.normalize_image_dir(tmp_path) == canonical


def test_normalize_no_link(tmp_path):
    _touch(tmp_path / "undist" / "images" / "00000000.jpg")
    with pytest.raises(FileNotFoundError):
        layout.normalize_image_dir(tmp_path, link=False)


def test_normalize_non_dir_collision(tmp_path):
    _touch(tmp_path / "undist" / "images" / "00000000.jpg")
    (tmp_path / "images").write_bytes(b"not a dir")
    with pytest.raises(FileExistsError):
        layout.normalize_image_dir(tmp_path)


def test_count_images_filters_suffixes(tmp_path):
    for name in ["a.jpg", "b.JPEG", "c.png", "d.txt", "e"]:
        _touch(tmp_path / "images" / name)
    (tmp_path / "images" / "subdir").mkdir()
    assert layout.count_images(tmp_path) == 3
    assert layout.count_images(tmp_path, suffixes=["png"]) == 1


def test_prepare_scene_cli(tmp_path):
    from apde_mvs_tpu.cli import prepare_scene

    scan = tmp_path / "scan1"
    _touch(scan / "undist" / "images" / "00000000.jpg")
    assert prepare_scene.main(["--scan_dir", str(scan)]) == 0
    assert (scan / "images").is_dir()


def test_normalize_relative_scan_dir(tmp_path, monkeypatch):
    """A relative scan_dir must not produce a dangling symlink (the OS
    resolves relative targets against the link's directory)."""
    scan = tmp_path / "scan"
    (scan / "undist" / "images").mkdir(parents=True)
    (scan / "undist" / "images" / "0.jpg").write_bytes(b"x")
    monkeypatch.chdir(tmp_path)
    out = layout.normalize_image_dir("scan")
    assert out.is_dir()
    assert (out / "0.jpg").exists()

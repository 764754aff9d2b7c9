"""SAM plug-in logic under test with a faked mask generator (VERDICT r3 #8).

segment_anything and its checkpoints are not installable here, so the
model-inference step is faked at the module-import seam; everything else —
mask rasterization order, the bin-mat ABI round-trip, image loading /
max_size resize, per-scan layout — runs for real.  Semantics match
/root/reference/tools/run_SAM.py:43-113 (save_anns area-descending ids,
SAMRunner folder walk).
"""

import os
import sys
import types

import numpy as np
import pytest

from apde_mvs_tpu.datasets import sam as sam_mod
from apde_mvs_tpu.io.binmat import read_bin_mat, write_bin_mat


def test_masks_to_instance_map_area_order_and_overlap():
    """Ids are assigned in DESCENDING area order (largest = 1); later
    (smaller) masks overwrite earlier ones on overlap — exactly the
    reference's save_anns loop (run_SAM.py:46-53)."""
    shape = (6, 8)
    small = np.zeros(shape, bool)
    small[0:2, 0:2] = True                      # area 4
    big = np.zeros(shape, bool)
    big[0:4, 0:6] = True                        # area 24, overlaps small
    mid = np.zeros(shape, bool)
    mid[4:6, 0:4] = True                        # area 8, disjoint
    masks = [                                   # deliberately unsorted
        {"segmentation": small, "area": 4},
        {"segmentation": big, "area": 24},
        {"segmentation": mid, "area": 8},
    ]
    inst = sam_mod.masks_to_instance_map(masks, shape)
    assert inst.dtype == np.uint8
    assert inst[3, 5] == 1                      # big = largest = id 1
    assert inst[5, 1] == 2                      # mid = id 2
    assert inst[0, 0] == 3                      # small overwrites big
    assert inst[5, 7] == 0                      # background


def test_masks_to_instance_map_id_cap():
    """More than 255 masks saturate at 255 instead of wrapping (the
    reference's uint8 assignment silently wraps; we cap — the SA gating only
    tests equality of ids, so a saturated tail merges segments instead of
    aliasing them onto earlier ones)."""
    shape = (16, 32)
    masks = []
    for i in range(300):
        m = np.zeros(shape, bool)
        m[i % 16, (i * 7) % 32] = True
        masks.append({"segmentation": m, "area": 300 - i})
    inst = sam_mod.masks_to_instance_map(masks, shape)
    assert inst.max() == 255


def test_instance_map_bin_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    inst = rng.randint(0, 12, (33, 47)).astype(np.uint8)
    p = str(tmp_path / "m.bin")
    write_bin_mat(p, inst)
    back = read_bin_mat(p)
    assert back.dtype == np.uint8
    np.testing.assert_array_equal(back, inst)


def _fake_segment_anything(monkeypatch, generate_fn):
    """Install a fake segment_anything module: registry returns a dummy
    model, the automatic generator calls `generate_fn(rgb)`."""
    fake = types.ModuleType("segment_anything")

    class _FakeModel:
        def __init__(self, checkpoint):
            assert os.path.exists(checkpoint)

        def to(self, device):
            return self

    class _FakeGen:
        def __init__(self, model):
            pass

        def generate(self, rgb):
            return generate_fn(rgb)

    fake.sam_model_registry = {k: _FakeModel for k in
                               ("vit_h", "vit_l", "vit_b")}
    fake.SamAutomaticMaskGenerator = _FakeGen
    monkeypatch.setitem(sys.modules, "segment_anything", fake)


def test_sam_runner_end_to_end_with_fake_generator(tmp_path, monkeypatch):
    """The full SAMRunner path: checkpoint gate, image load, rasterize,
    bin + png outputs per scan — only model inference is faked."""
    from apde_mvs_tpu.io.images import write_image

    def gen(rgb):
        h, w = rgb.shape[:2]
        a = np.zeros((h, w), bool)
        a[: h // 2] = True
        b = np.zeros((h, w), bool)
        b[h // 2:, : w // 2] = True
        return [{"segmentation": b, "area": int(b.sum())},
                {"segmentation": a, "area": int(a.sum())}]

    _fake_segment_anything(monkeypatch, gen)

    scan = tmp_path / "scan1"
    imgdir = scan / "images"
    imgdir.mkdir(parents=True)
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (20, 30, 3)).astype(np.uint8)
    write_image(str(imgdir / "00000000.jpg"), img)

    ckpt_dir = tmp_path / "ckpts"
    ckpt_dir.mkdir()
    (ckpt_dir / "vit_h.pth").write_bytes(b"fake")

    runner = sam_mod.SAMRunner(str(tmp_path), ["scan1"],
                               checkpoint_dir=str(ckpt_dir))
    runner.run()

    inst = read_bin_mat(str(scan / "sa_masks" / "00000000.bin"))
    assert inst.shape == (20, 30)
    assert inst[0, 0] == 1                     # top half = larger mask
    assert inst[15, 0] == 2                    # bottom-left quarter
    assert inst[15, 29] == 0                   # background
    assert os.path.exists(str(scan / "sa_masks" / "00000000.png"))


def test_sam_runner_max_size_resize(tmp_path, monkeypatch):
    """Images over max_size are downscaled before inference (run_SAM.py:
    108-110); the saved mask is at the RESIZED resolution, like the
    reference's."""
    from apde_mvs_tpu.io.images import write_image
    seen = {}

    def gen(rgb):
        seen["shape"] = rgb.shape
        m = np.ones(rgb.shape[:2], bool)
        return [{"segmentation": m, "area": int(m.sum())}]

    _fake_segment_anything(monkeypatch, gen)

    scan = tmp_path / "s"
    (scan / "images").mkdir(parents=True)
    img = np.zeros((40, 80, 3), np.uint8)
    write_image(str(scan / "images" / "a.jpg"), img)
    ckpt_dir = tmp_path / "ck"
    ckpt_dir.mkdir()
    (ckpt_dir / "vit_h.pth").write_bytes(b"x")

    sam_mod.SAMRunner(str(tmp_path), ["s"], max_size=40,
                      checkpoint_dir=str(ckpt_dir)).run()
    assert seen["shape"][:2] == (20, 40)
    inst = read_bin_mat(str(scan / "sa_masks" / "a.bin"))
    assert inst.shape == (20, 40)


def test_sam_runner_missing_images_raises(tmp_path, monkeypatch):
    _fake_segment_anything(monkeypatch, lambda rgb: [])
    ckpt_dir = tmp_path / "ck"
    ckpt_dir.mkdir()
    (ckpt_dir / "vit_h.pth").write_bytes(b"x")
    (tmp_path / "empty_scan").mkdir()
    with pytest.raises(FileNotFoundError):
        sam_mod.SAMRunner(str(tmp_path), ["empty_scan"],
                          checkpoint_dir=str(ckpt_dir)).run()


def test_prepare_checkpoint_unknown_model():
    with pytest.raises(NotImplementedError):
        sam_mod.prepare_checkpoint("vit_x")

"""Evaluation/collection tool units."""

import numpy as np

from apde_mvs_tpu.tools import collect, eval_eth


def test_parse_result(tmp_path):
    p = tmp_path / "result.txt"
    p.write_text(
        "Some header\n"
        "Tolerances: 0.01 0.02 0.05 0.1 0.2 0.5\n"
        "Completenesses: 0.5 0.6 0.7 0.8 0.9 0.95\n"
        "Accuracies: 0.8 0.85 0.9 0.92 0.95 0.99\n"
        "F1-scores: 0.61 0.7 0.78 0.85 0.92 0.96\n")
    m = eval_eth.parse_result(str(p))
    assert m is not None
    assert m["tolerances"][1] == 0.02
    assert m["f1"][1] == 0.7
    text = eval_eth.show({"office": m, "missing": None})
    assert "office" in text and "0.7000" in text and "AVERAGE" in text
    assert eval_eth.parse_result(str(tmp_path / "nope.txt")) is None


def test_collectors(tmp_path):
    data = tmp_path / "data"
    for scan, n in [("scan9", 9), ("scan24", 24)]:
        d = data / scan / "APD"
        d.mkdir(parents=True)
        (d / "APD.ply").write_bytes(b"ply-bytes")
    out = tmp_path / "dtu"
    collect.collect_dtu(str(data), str(out))
    assert (out / "apd009_l3.ply").read_bytes() == b"ply-bytes"
    assert (out / "apd024_l3.ply").exists()

    data2 = tmp_path / "eth"
    d = data2 / "office" / "APD"
    d.mkdir(parents=True)
    (d / "APD.ply").write_bytes(b"x")
    out2 = tmp_path / "eth_out"
    collect.collect_eth(str(data2), str(out2))
    assert (out2 / "office.ply").exists()
    assert (out2 / "office.txt").exists()

    out3 = tmp_path / "tat_out"
    collect.collect_tat(str(data2), str(out3))
    assert (out3 / "office.ply").exists()
    assert (out3 / "office.log").exists()


def test_anchor_vis_overlay_with_taps(tmp_path):
    """Headless anchor inspection renders the anchor set AND the NCC window
    taps (reference anchor_vis.py:143-181), SA-gated when a mask is given."""
    import numpy as np
    from apde_mvs_tpu.io.binmat import write_bin_mat
    from apde_mvs_tpu.io.images import read_image_color
    from apde_mvs_tpu.tools import anchor_vis

    h, w = 40, 48
    amap = np.full((h, w), -1, np.int32)
    amap[20, 24] = 0
    write_bin_mat(tmp_path / "anchors_map.bin", amap)
    anchors = np.array([[[24, 20], [10, 10], [35, 30], [-1, -1],
                         [-1, -1], [-1, -1], [-1, -1], [-1, -1], [-1, -1]]],
                       np.int16)
    with open(tmp_path / "anchors.bin", "wb") as f:
        np.asarray([1, 9], np.int32).tofile(f)
        anchors.tofile(f)
    sa = np.zeros((h, w), np.int32)
    sa[:, :28] = 3            # center's segment covers x < 28
    write_bin_mat(tmp_path / "sa.bin", sa)

    out = tmp_path / "overlay.png"
    rc = anchor_vis.main(["--result_folder", str(tmp_path),
                          "--point", "24,20", "--out", str(out),
                          "--sa_mask", str(tmp_path / "sa.bin")])
    assert rc == 0 and out.exists()
    img = read_image_color(str(out))
    # center (dark green), center taps (light green), cross-segment taps
    # (blue), in-segment anchor (10,10) marked with its sparse taps; the
    # out-of-segment anchor (35,30) skipped
    assert not (img == np.full(3, 32)).all(), "overlay drew nothing"
    colors = {tuple(c) for c in img.reshape(-1, 3)}
    assert len(colors) >= 4, f"expected >=4 overlay colors, got {colors}"

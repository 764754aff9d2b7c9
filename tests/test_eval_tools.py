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

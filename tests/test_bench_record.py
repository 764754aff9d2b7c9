"""bench.py record plumbing: the driver parses the LAST stdout line of the
round-end bench run, so the full-pass section must always terminate and
always leave that line parseable — including when a regime subprocess dies
or hangs (the tunnel stream-drop failure mode, CLAUDE.md)."""

import json
import subprocess
import sys

import pytest


@pytest.fixture()
def bench(monkeypatch):
    sys.path.insert(0, "/root/repo")
    import bench as b
    return b


def _fake_proc(stdout, rc=0):
    class P:
        returncode = rc
    P.stdout = stdout
    P.stderr = ""
    return P


def test_full_pass_section_parses_and_survives_timeouts(bench, monkeypatch,
                                                        capsys):
    good = ('noise\n'
            '{"pass": "first_init", "wall_s": 85.4, '
            '"median_rel_depth_err_pct": 0.0233, "pct_within_1pct": 95.8, '
            '"mem_gb": {}}\n'
            '{"pass": "refine_init_apd", "wall_s": 81.7, '
            '"median_rel_depth_err_pct": 0.0231, "pct_within_1pct": 96.1, '
            '"mem_gb": {}}\n')
    calls = []

    def fake_run(cmd, **kw):
        calls.append(cmd)
        if len(calls) == 2:
            raise subprocess.TimeoutExpired(cmd, kw.get("timeout"))
        return _fake_proc(good)

    monkeypatch.setattr(subprocess, "run", fake_run)
    res = bench.full_pass_section(timeout_s=1.0)
    assert res["800x608x11"][0]["wall_s"] == 85.4
    assert res["800x608x11"][1]["pass"] == "refine_init_apd"
    assert "error" in res["1280x960x11"][0]
    # the embedding expression used for the final line must not KeyError
    rec = {regime: {p["pass"]: (
        {"wall_s": p["wall_s"],
         "median_rel_depth_err_pct": p["median_rel_depth_err_pct"]}
        if "wall_s" in p else p) for p in passes}
        for regime, passes in res.items()}
    assert json.dumps(rec)  # serializable
    # every regime's JSON lines were streamed to stdout too
    out = capsys.readouterr().out
    assert '"full_pass_regime": "800x608x11"' in out
    assert '"timeout' in out or "timeout" in out


def test_full_pass_section_reports_failed_regime(bench, monkeypatch):
    def fake_run(cmd, **kw):
        return _fake_proc("crash output, no pass lines\n", rc=1)

    monkeypatch.setattr(subprocess, "run", fake_run)
    res = bench.full_pass_section(timeout_s=1.0)
    for regime, passes in res.items():
        assert passes[0]["pass"] == "error"
        assert "rc=1" in passes[0]["error"]

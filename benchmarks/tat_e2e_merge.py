"""Merge TaT-artifact engine logs across harness relaunches into one
report (the round-5 run crossed two tunnel-stream drops and a
mid-compile watchdog kill before the compile-sized timeout landed, so its
passes live in multiple log fragments). Reuses tat_e2e's parser."""

import json
import os
import re
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "benchmarks"))

import numpy as np


def parse_log(path):
    passes = []
    cur = None
    fusion_points = None
    with open(path) as f:
        for line in f:
            m = re.match(r"=+ iteration (\d+) \(round (\d+), scale 1/(\d+), "
                         r"(\w+)\)", line)
            if m:
                if cur:
                    passes.append(cur)
                cur = {"iteration": int(m.group(1)),
                       "state": m.group(4), "scale": int(m.group(3)),
                       "batch_ms": [], "views_ms": []}
            m = re.search(r"Processed (\d+) views iter \d+ on \d+ device\(s\):"
                          r" (\d+) ms \((\d+) ms/view\)", line)
            if m and cur:
                cur["batch_ms"].append(int(m.group(2)))
                cur["views_ms"].append(int(m.group(3)))
            m = re.search(r"Fusion: (\d+) points", line)
            if m:
                fusion_points = int(m.group(1))
    if cur:
        passes.append(cur)
    return passes, fusion_points


def main():
    logs = sys.argv[1:] or ["/tmp/tat_scan/engine_log_attempt1.txt",
                            "/tmp/tat_scan/engine_log.txt"]
    merged = {}
    fusion_points = None
    for path in logs:
        passes, fp = parse_log(path)
        fusion_points = fp or fusion_points
        for p in passes:
            key = p["iteration"]
            if key in merged:
                merged[key]["batch_ms"] += p["batch_ms"]
                merged[key]["views_ms"] += p["views_ms"]
                merged[key]["fragments"] = merged[key].get("fragments", 1) + 1
            else:
                merged[key] = p
    out = []
    for k in sorted(merged):
        p = merged[k]
        p["wall_s"] = round(sum(p.pop("batch_ms")) / 1000, 1)
        vm = p.pop("views_ms")
        p["per_view_ms"] = round(float(np.mean(vm)), 0) if vm else None
        p["batches"] = len(vm)
        out.append(p)
    print(json.dumps({"passes": out, "fusion_points": fusion_points},
                     indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""TaT-shape end-to-end reconstruction artifact on the real chip.

VERDICT r4 missing #4 / next-round #6: round 4 scale-stressed *fusion* at
150 views x 6 MP, but no 100+-view scan had run the *reconstruction* side
(view-batch SPMD programs + ext-row file interchange) at scale on real
hardware. This script builds a synthetic scan with the Tanks-and-Temples
*shape* — ~120 views, 10 sequential neighbors each (the reference's TaT
preset drives scenes of this view count through run.py:173-180 and fuses
with the escalating-k variant, APD.cpp:1229-1431) — at a resolution sized
to finish on one chip, then runs the production CLI end-to-end:

    python -m apde_mvs_tpu.cli.apd --dense_folder <scan> --dataset TaT_i \
        --views_parallel true --view_batch 24 ...

recording per-pass wall clock, per-view ms, and peak RSS of the engine
process. The view-batch cap forces the ext-row interchange (out-of-batch
reference views' prior depths ride the file contract instead of the
in-batch ICI all-gather) exactly as a real TaT scan would on a pod slice.

Usage:
    python benchmarks/tat_e2e.py --views 120 --width 384 --height 288 \
        --view_batch 24 [--scan_dir /tmp/tat_scan] [--keep]
"""

import argparse
import json
import os
import re
import subprocess
import sys
import threading
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np


def build_scan(args) -> dict:
    from apde_mvs_tpu.testing import synthetic

    t0 = time.time()
    scene = synthetic.make_scene(
        num_views=args.views, height=args.height, width=args.width,
        baseline=args.baseline, focal=1.25 * args.width,
        weak_region=(-0.3, 0.3, -0.2, 0.2))
    synthetic.write_scene_to_disk(scene, args.scan_dir,
                                  max_neighbors=args.neighbors)
    # analytic ground truth for the post-run quality check
    np.savez_compressed(os.path.join(args.scan_dir, "gt_depths.npz"),
                        depths=scene.depths.astype(np.float32))
    return {"scene_gen_s": round(time.time() - t0, 1),
            "views": args.views, "size": f"{args.width}x{args.height}",
            "neighbors": args.neighbors}


def run_engine(args) -> dict:
    """Run cli.apd as a subprocess; poll RSS; parse per-pass prints.

    A stall watchdog guards against the remote-worker/tunnel wedge class
    (PERF_NOTES r4: a client can block forever on a response that never
    comes): if the engine log stops growing for --stall_timeout seconds,
    the engine is killed and relaunched with `--start_iteration <last
    pass seen>` — the per-view bins are the checkpoint, so re-entry at a
    pass boundary is the framework's own coarse recovery."""
    base_cmd = [sys.executable, "-m", "apde_mvs_tpu.cli.apd",
                "--dense_folder", args.scan_dir,
                "--dataset", "TaT_i",
                "--use_sa", "false",
                "--views_parallel", "true",
                "--seed", "7"]
    if args.pyramid_base:
        # real TaT images (1920x1080) get a 3-round schedule from the 800 px
        # base (main.cpp:129-146) and run the APD machinery from round 1 on;
        # a downsized artifact must shrink the base proportionally or the
        # single-round schedule would skip APD entirely (use_APD=false for
        # all of round 0, main.cpp:312-346)
        base_cmd += ["--pyramid_base", str(args.pyramid_base)]
    if args.view_batch:
        base_cmd += ["--view_batch", str(args.view_batch)]
    env = dict(os.environ)
    env["APDE_STAGE_TIMING"] = "1"
    log_path = os.path.join(args.scan_dir, "engine_log.txt")
    t0 = time.time()
    peak_rss = [0]
    restarts = []
    start_iter = args.start_iteration
    for attempt in range(4):
        cmd = list(base_cmd)
        if start_iter:
            cmd += ["--start_iteration", str(start_iter)]
        print(f"running: {' '.join(cmd)}\nlog: {log_path}", flush=True)
        mode = "a" if attempt else "w"
        with open(log_path, mode) as log:
            proc = subprocess.Popen(cmd, stdout=log,
                                    stderr=subprocess.STDOUT,
                                    env=env, cwd=_REPO)
            stalled = [False]

            def poll():
                status = f"/proc/{proc.pid}/status"
                while proc.poll() is None:
                    try:
                        with open(status) as f:
                            for line in f:
                                if line.startswith("VmRSS:"):
                                    peak_rss[0] = max(peak_rss[0],
                                                      int(line.split()[1]))
                        if time.time() - os.path.getmtime(log_path) \
                                > args.stall_timeout:
                            stalled[0] = True
                            proc.kill()      # exact PID only
                            return
                    except OSError:
                        pass
                    time.sleep(5.0)

            th = threading.Thread(target=poll, daemon=True)
            th.start()
            rc = proc.wait()
            th.join(timeout=10)
        if not stalled[0]:
            break
        # resume from the last pass the log reached (redo the wedged pass)
        last_iter = 0
        with open(log_path) as f:
            for line in f:
                m = re.match(r"=+ iteration (\d+) \(", line)
                if m:
                    last_iter = int(m.group(1))
        start_iter = last_iter
        restarts.append({"attempt": attempt, "resumed_at": last_iter,
                         "t_s": round(time.time() - t0, 1)})
        print(f"WATCHDOG: engine stalled >{args.stall_timeout}s; "
              f"restarting at iteration {last_iter}", flush=True)
    wall = time.time() - t0

    # per-pass wall: "======== iteration I ..." headers + batch prints
    passes = []
    cur = None
    with open(log_path) as f:
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
            m = re.search(r"Processed view \S+ iter \d+.*?: (\d+) ms", line)
            if m and cur:
                cur["views_ms"].append(int(m.group(1)))
            m = re.search(r"Fusion: (\d+) points", line)
            if m:
                fusion_points = int(m.group(1))
    if cur:
        passes.append(cur)
    # a watchdog restart re-enters the wedged pass: merge fragments of the
    # same iteration (batch times accumulate; the artifact reports total
    # wall including redone work)
    merged = {}
    for p in passes:
        key = p["iteration"]
        if key in merged:
            merged[key]["batch_ms"] += p["batch_ms"]
            merged[key]["views_ms"] += p["views_ms"]
            merged[key]["fragments"] = merged[key].get("fragments", 1) + 1
        else:
            merged[key] = p
    passes = [merged[k] for k in sorted(merged)]
    for p in passes:
        p["wall_s"] = round(sum(p.pop("batch_ms") or p["views_ms"]) / 1000, 1)
        vm = p.pop("views_ms")
        p["per_view_ms"] = round(float(np.mean(vm)), 0) if vm else None
    out = {"rc": rc, "wall_s": round(wall, 1),
           "peak_rss_gb": round(peak_rss[0] / (1 << 20), 2),
           "passes": passes}
    if restarts:
        out["watchdog_restarts"] = restarts
    try:
        out["fusion_points"] = fusion_points
    except NameError:
        pass
    return out


def quality(args) -> dict:
    """Median relative depth error of every view's final map vs analytic GT."""
    from apde_mvs_tpu.io import read_bin_mat

    gt = np.load(os.path.join(args.scan_dir, "gt_depths.npz"))["depths"]
    errs, cov = [], []
    for v in range(args.views):
        d = read_bin_mat(
            os.path.join(args.scan_dir, "APD", f"{v:08d}", "depths.bin"))
        g = gt[v]
        ok = (g > 0) & (d > 0)
        rel = np.abs(d[ok] - g[ok]) / g[ok]
        errs.append(float(np.median(rel)))
        cov.append(float((rel < 0.01).mean()))
    return {"median_rel_depth_err_pct": round(float(np.median(errs)) * 100, 4),
            "worst_view_err_pct": round(float(np.max(errs)) * 100, 4),
            "mean_within_1pct": round(float(np.mean(cov)) * 100, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=120)
    ap.add_argument("--width", type=int, default=384)
    ap.add_argument("--height", type=int, default=288)
    ap.add_argument("--neighbors", type=int, default=10)
    ap.add_argument("--baseline", type=float, default=0.03)
    ap.add_argument("--view_batch", type=int, default=24)
    ap.add_argument("--pyramid_base", type=int, default=None,
                    help="multi-scale base (use ~width/2 to get the real "
                         "TaT 2-round shape with APD rounds)")
    ap.add_argument("--scan_dir", default="/tmp/tat_scan")
    ap.add_argument("--skip_build", action="store_true",
                    help="reuse an existing scan dir")
    ap.add_argument("--start_iteration", type=int, default=0,
                    help="resume the engine at this pass index")
    ap.add_argument("--stall_timeout", type=float, default=900.0,
                    help="watchdog: kill+resume the engine if its log is "
                         "silent this long (tunnel-wedge recovery)")
    args = ap.parse_args()

    report = {"config": vars(args).copy()}
    if not args.skip_build:
        report["build"] = build_scan(args)
        print(json.dumps({"build": report["build"]}), flush=True)
    report["run"] = run_engine(args)
    print(json.dumps({"run": report["run"]}), flush=True)
    if report["run"]["rc"] == 0:
        report["quality"] = quality(args)
        print(json.dumps({"quality": report["quality"]}), flush=True)
    out = os.path.join(_REPO, "benchmarks",
                       f"tat_e2e_{args.views}v_{args.width}x{args.height}.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"report -> {out}", flush=True)
    return report["run"]["rc"]


if __name__ == "__main__":
    sys.exit(main())

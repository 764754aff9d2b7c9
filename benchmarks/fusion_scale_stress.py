"""Fusion scale stress: ~150 views x full-res depth maps (VERDICT r3 #6).

The reference fuses ETH3D/TaT scans of 10-1000+ views on the host
(/root/reference/APD.cpp:1080-1431, ThreadPool at :1040-1048); this repo's
equivalents are pipeline/fusion.py + native/apde_native.cpp (parallel_for)
with a shard-by-ref-view distribution layer (run_fusion(shard=), owner-wins
merge).  Until now those paths were only exercised at <=6 views / <1 MP.
This script measures them at scale on synthetic geometry:

  phase A  generate a 150-view scan at the requested resolution with
           analytic ground-truth depth/normal maps (+2 per-mille depth
           noise), a coherent weak region, and a 10-neighbor pair.txt
  phase B  load + WeakVisFilter timing (the O(V^2) pairwise pass)
  phase C  sharded general fusion, one subprocess per shard (sequential —
           on a fleet each shard is its own host; per-shard wall and peak
           RSS are the honest per-host numbers)
  phase D  owner-wins merge (cross-shard duplicate stats)
  phase E  TaT (escalating-k) variant, unsharded

Each phase runs in a subprocess so peak RSS (ru_maxrss of the child) is
per-phase.  Results go in SCALING.md.

Usage: python benchmarks/fusion_scale_stress.py \
           [--views 150] [--width 3024] [--height 2016] [--shards 4]
"""

import argparse
import json
import os
import resource
import subprocess
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def generate(root, views, height, width):
    import numpy as np

    from apde_mvs_tpu.config import STRONG, WEAK
    from apde_mvs_tpu.io.binmat import write_bin_mat
    from apde_mvs_tpu.io.cameras import write_camera, write_pair
    from apde_mvs_tpu.io.images import write_image
    from apde_mvs_tpu.testing import synthetic

    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "cams"), exist_ok=True)

    # the make_scene primitive set at ETH3D-ish scale: tilted background
    # plane + low-texture (weak) inset plane, cameras on an arc.  Views are
    # rendered one at a time and written immediately (150 x 6 MP of f64
    # ray-cast intermediates must not accumulate in RAM).
    plane_depth = 4.0
    K = np.array([[1.25 * width, 0.0, width / 2.0],
                  [0.0, 1.25 * width, height / 2.0],
                  [0.0, 0.0, 1.0]])
    n = np.array([0.25, -0.15, -1.0])
    n /= np.linalg.norm(n)
    planes = [synthetic.PlanePrimitive(
        normal=n, w=-n @ np.array([0.0, 0.0, plane_depth]),
        texture_amplitude=55.0)]
    weak_bounds = (-0.3, 0.3, -0.2, 0.2)
    nw_ = np.array([0.0, 0.0, -1.0])
    planes.append(synthetic.PlanePrimitive(
        normal=nw_, w=-nw_ @ np.array([0.0, 0.0, plane_depth * 0.82]),
        bounds=weak_bounds, texture_amplitude=1.5, texture_seed=7))

    target = np.array([0.0, 0.0, plane_depth])
    up = np.array([0.0, -1.0, 0.0])
    rng = np.random.RandomState(0)
    baseline = 0.02        # 150 cameras spanning ~3 units
    entries = []
    for v in range(views):
        offset = (v - (views - 1) / 2.0) * baseline
        center = np.array([offset, 0.05 * offset, 0.0])
        cam = synthetic._look_at_camera(center, target, up, K)
        img, dep, nrm = synthetic.render_view(cam, planes, height, width)
        d_valid = dep[dep > 0]
        cam.depth_min = float(d_valid.min() * 0.8)
        cam.depth_max = float(d_valid.max() * 1.2)
        cam.interval = (cam.depth_max - cam.depth_min) / 192.0
        cam.width, cam.height = width, height
        write_image(os.path.join(root, "images", f"{v:08d}.jpg"),
                    np.clip(img, 0, 255).astype(np.uint8))
        write_camera(os.path.join(root, "cams", f"{v:08d}_cam.txt"), cam)

        # simulated reconstruction outputs: GT + 0.2% depth noise; the weak
        # inset marked WEAK (coherent region, as DepthToWeak would)
        folder = os.path.join(root, "APD", f"{v:08d}")
        os.makedirs(folder, exist_ok=True)
        noisy = dep * (1.0 + rng.randn(*dep.shape).astype(np.float32) * 0.002)
        noisy[dep == 0] = 0.0
        write_bin_mat(os.path.join(folder, "depths.bin"),
                      noisy.astype(np.float32))
        write_bin_mat(os.path.join(folder, "normals.bin"),
                      nrm.astype(np.float32))
        ys, xs = np.mgrid[0:height, 0:width].astype(np.float32)
        d_cam = np.stack([(xs - K[0, 2]) / K[0, 0],
                          (ys - K[1, 2]) / K[1, 1], np.ones_like(xs)], -1)
        Xw = (dep[..., None] * d_cam) @ cam.R + cam.c
        weak = ((Xw[..., 0] >= weak_bounds[0]) & (Xw[..., 0] <= weak_bounds[1])
                & (Xw[..., 1] >= weak_bounds[2])
                & (Xw[..., 1] <= weak_bounds[3])
                & (np.abs(Xw[..., 2] - plane_depth * 0.82) < 0.01))
        write_bin_mat(os.path.join(folder, "weak.bin"),
                      np.where(weak, WEAK, STRONG).astype(np.uint8))
        write_bin_mat(os.path.join(folder, "confidence.bin"),
                      rng.randint(5, 250, dep.shape).astype(np.uint8))
        neighbors = [(u, float(views - abs(u - v)))
                     for u in range(max(0, v - 5), min(views, v + 6))
                     if u != v]
        neighbors.sort(key=lambda e: -e[1])
        entries.append((v, neighbors))
        if v % 25 == 0:
            print(f"  view {v}/{views}", flush=True)
    write_pair(os.path.join(root, "pair.txt"), entries)


_PHASE = r"""
import json, sys, time, os
sys.path.insert(0, %(root)r)
import numpy as np
from apde_mvs_tpu.config import FusionParams
from apde_mvs_tpu.pipeline import driver, fusion

mode = sys.argv[1]
scan = sys.argv[2]
problems = driver.generate_sample_list(scan)
t0 = time.time()
if mode == "visfilter":
    views = fusion.load_fusion_views(scan, problems)
    t_load = time.time() - t0
    t1 = time.time()
    fusion.weak_vis_filter(views, problems, scan,
                           FusionParams(variant="general"))
    print(json.dumps({"load_s": round(t_load, 1),
                      "visfilter_s": round(time.time() - t1, 1)}))
elif mode.startswith("shard"):
    i, n = map(int, mode[5:].split("of"))
    params = FusionParams(variant="general", weak_filter=False)
    ply = fusion.run_fusion(scan, problems, "stress_general.ply", params,
                            shard=(i, n))
    print(json.dumps({"shard": [i, n], "wall_s": round(time.time() - t0, 1)}))
elif mode == "merge":
    n = int(sys.argv[3])
    ply = fusion.merge_fusion_shards(scan, "stress_general.ply", n)
    from apde_mvs_tpu.io.ply import read_ply
    pts, _ = read_ply(ply)
    print(json.dumps({"merge_s": round(time.time() - t0, 1),
                      "merged_points": len(pts)}))
elif mode == "tat":
    params = FusionParams(variant="tat_i", weak_filter=False)
    ply = fusion.run_fusion(scan, problems, "stress_tat.ply", params)
    print(json.dumps({"tat_wall_s": round(time.time() - t0, 1)}))
"""


def run_phase(mode, scan, *extra):
    t0 = time.time()
    child = subprocess.run(
        [sys.executable, "-c", _PHASE % {"root": _ROOT}, mode, scan, *extra],
        capture_output=True, text=True)
    if child.returncode != 0:
        print(child.stderr[-3000:], flush=True)
        raise RuntimeError(f"phase {mode} failed")
    rss_gb = resource.getrusage(resource.RUSAGE_CHILDREN).ru_maxrss / 2**20
    rec = json.loads(child.stdout.strip().splitlines()[-1])
    rec.update({"phase": mode, "wall_s_total": round(time.time() - t0, 1),
                "peak_rss_gb_cum": round(rss_gb, 1)})
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=150)
    ap.add_argument("--width", type=int, default=3024)
    ap.add_argument("--height", type=int, default=2016)
    ap.add_argument("--shards", type=int, default=4)
    ap.add_argument("--scan_dir", default="/tmp/fusion_stress/scan")
    ap.add_argument("--skip_gen", action="store_true")
    args = ap.parse_args()

    if not args.skip_gen:
        t0 = time.time()
        generate(args.scan_dir, args.views, args.height, args.width)
        print(json.dumps({"phase": "generate",
                          "wall_s": round(time.time() - t0, 1)}), flush=True)

    recs = [run_phase("visfilter", args.scan_dir)]
    for i in range(args.shards):
        recs.append(run_phase(f"shard{i}of{args.shards}", args.scan_dir))
    recs.append(run_phase("merge", args.scan_dir, str(args.shards)))
    recs.append(run_phase("tat", args.scan_dir))
    shard_walls = [r["wall_s"] for r in recs if "shard" in r.get("phase", "")]
    print(json.dumps({
        "summary": {
            "views": args.views,
            "res": f"{args.width}x{args.height}",
            "fleet_wall_model_s": max(shard_walls) if shard_walls else None,
            "serial_general_s": sum(shard_walls),
        }}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

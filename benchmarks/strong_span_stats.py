"""Strong-sweep band-span distribution at full resolution (VERDICT r4 #5).

Round 4 shipped the 2^16 banded strong-chunk cap off a blind A/B (2440 vs
2812 s) with an 11%->28% fit rate; ROADMAP #3's question — what do the
non-fitting chunks' spans actually look like, and would a smaller chunk /
adaptive extent lift them — was never measured. This script collects the
distribution on the full-res protocol's pass-B ENTRY state (pass-A priors
from benchmarks/fullres_stress.py --prior_npz + the production chunked
initial cost), for both checkerboard colors at chunk sizes 2^15/2^16/2^17:

  - per-chunk warped-row span (max over views) for the FULL banded plane
    set (9 possible winners + 2 anchored refinement variants each = 27)
    and for the BASE set alone (9 winners, no refinements) — separating
    "the refinement perturbations blow the band" from "the candidate warps
    do";
  - per-view fit fractions (how much a partial-view banding could recover
    vs the current all-views-must-fit dispatch);
  - fit fractions vs the 260-image-row band budget at each chunk size.

Note the band table itself cannot grow: BAND_ROWS x W x 4 u8 = 3.2 MiB at
this width sits just under the ~3.5 MiB gather-rate cliff the bands exist
to duck (PERF_NOTES "byte bound") — doubling the band would put the sliced
table back on the slow path. The levers are chunk size and variant set.

Usage (real chip, priors saved by a fullres_stress run):
  python benchmarks/strong_span_stats.py \
      --prior_npz /root/logs/fullres_prior_3024.npz
"""

import argparse
import json
import sys
import time

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prior_npz", default="/root/logs/fullres_prior_3024.npz")
    ap.add_argument("--width", type=int, default=3024)
    ap.add_argument("--height", type=int, default=2016)
    ap.add_argument("--views", type=int, default=11)
    ap.add_argument("--chunk_exps", type=int, nargs="+", default=[15, 16, 17])
    ap.add_argument("--max_chunks", type=int, default=64,
                    help="cap the chunks sampled per (color, size)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    from apde_mvs_tpu.core.platform import enable_compilation_cache
    enable_compilation_cache()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from apde_mvs_tpu import config as cfg_mod
    from apde_mvs_tpu.core import checkerboard as cb
    from apde_mvs_tpu.core import geometry as geo
    from apde_mvs_tpu.core.sampling import BAND_ROWS
    from apde_mvs_tpu.ops import bands, filters
    from apde_mvs_tpu.ops.cost import CostData, initial_cost_and_selection
    from apde_mvs_tpu.ops.init import initial_cost_chunk
    from apde_mvs_tpu.ops.state import PMState
    from apde_mvs_tpu.pipeline import patchmatch as pm
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
    dmin = jnp.float32(scene.cameras[0].depth_min * cfg_mod.DEPTH_MIN_FACTOR)
    dmax = jnp.float32(scene.cameras[0].depth_max * cfg_mod.DEPTH_MAX_FACTOR)
    ref_p = pm.pad_to_multiple(scene.images[0], PAD_H, PAD_W)
    src_imgs = np.stack(
        [pm.pad_to_multiple(scene.images[s], PAD_H, PAD_W) for s in src_ids])
    data = CostData.build(
        cams.view(0), geo.CameraArrays(*[a[src_ids] for a in cams]),
        jnp.asarray(ref_p), jnp.asarray(src_imgs),
        real_width=W, real_height=H, sampler_u8=True)
    ph, pw = ref_p.shape
    band_img_rows = BAND_ROWS // pw
    print(json.dumps({"band_img_rows": int(band_img_rows)}), flush=True)

    pr = np.load(args.prior_npz)
    valid = np.zeros((ph, pw), bool)
    valid[:H, :W] = True
    state = PMState.create(ph, pw, data.num_src, valid=jnp.asarray(valid))
    state = state.replace(
        weak=jnp.where(jnp.asarray(valid),
                       jnp.asarray(pr["weak"], jnp.int32), cfg_mod.UNKNOWN))

    # pass-B entry planes: camera-frame conversion of the prior depth/normal
    @jax.jit
    def make_planes(data, depth, normal):
        return filters.depth_normal_to_planes(data, depth, normal)

    planes = make_planes(data, jnp.asarray(pr["depth"], jnp.float32),
                         jnp.asarray(pr["normal"], jnp.float32))
    state = state.replace(planes=planes)

    # production initial costs (plain path) -> realistic candidate scans
    params = cfg_mod.PatchMatchParams()
    chunk0 = 1 << 17
    n = ph * pw
    ys, xs = np.mgrid[0:ph, 0:pw]
    xf = np.pad(xs.reshape(-1).astype(np.float32), (0, (-n) % chunk0),
                mode="edge")
    yf = np.pad(ys.reshape(-1).astype(np.float32), (0, (-n) % chunk0),
                mode="edge")
    pf = np.asarray(planes.reshape(-1, 4))
    pf = np.concatenate([pf, np.repeat(pf[-1:], (-n) % chunk0, 0)])

    @jax.jit
    def init_chunk(data, p, x, y):
        return initial_cost_chunk(data, p, x, y, params)

    t0 = time.time()
    outs = []
    for ci in range(len(xf) // chunk0):
        sl = slice(ci * chunk0, (ci + 1) * chunk0)
        outs.append(init_chunk(data, jnp.asarray(pf[sl]),
                               jnp.asarray(xf[sl]), jnp.asarray(yf[sl])))
        pm._throttle(outs, site="span-init")
    costs_all = jnp.concatenate(outs, 0)[:n]
    mean_cost, selected = initial_cost_and_selection(costs_all, params.top_k)
    state = state.replace(
        costs=jnp.where(state.valid, mean_cost.reshape(ph, pw), 1e9),
        selected=selected.reshape(ph, pw, -1) & state.valid[..., None])
    print(f"init costs: {time.time() - t0:.1f} s", flush=True)

    from apde_mvs_tpu.ops.bands import strong_bounds, strong_chunk_planes, \
        sweep_extent
    max_extent = sweep_extent(params.strong_radius, False)

    @jax.jit
    def span_chunk(data, state, kr, x, y):
        allp, allv = strong_chunk_planes(data, state, kr, x, y, dmin, dmax)
        xff = x.astype(jnp.float32)
        yff = y.astype(jnp.float32)
        _, (lo_f, hi_f, ok_f) = strong_bounds(
            data, xff, yff, allp, max_extent, union=True, valid=allv,
            with_rows=True)
        # base set alone: the 9 possible winners, refinements excluded
        _, (lo_b, hi_b, ok_b) = strong_bounds(
            data, xff, yff, allp[:, :9], max_extent, union=True,
            valid=allv[:, :9], with_rows=True)
        return lo_f, hi_f, ok_f, lo_b, hi_b, ok_b

    import jax.random as jrandom
    key = jrandom.PRNGKey(7)
    report = {}
    for exp in args.chunk_exps:
        chunk = 1 << exp
        for color in (0, 1):
            xs2, ys2 = cb.color_coords(ph, pw, color)
            x_np = np.asarray(xs2).reshape(-1)
            y_np = np.asarray(ys2).reshape(-1)
            B = x_np.shape[0]
            pad = (-B) % chunk
            xp = np.pad(x_np, (0, pad), mode="edge").astype(np.int32)
            yp = np.pad(y_np, (0, pad), mode="edge").astype(np.int32)
            nc = len(xp) // chunk
            take = np.linspace(0, nc - 1, min(nc, args.max_chunks)
                               ).astype(int)
            spans_f, spans_b, ok_full, fit_f, fit_b, fit_views = \
                [], [], [], [], [], []
            for ci in take:
                sl = slice(ci * chunk, (ci + 1) * chunk)
                # np.asarray is the host readback — it already syncs each
                # chunk before the next dispatch (no throttle needed)
                lo_f, hi_f, ok_f, lo_b, hi_b, ok_b = [
                    np.asarray(v) for v in span_chunk(
                        data, state, jrandom.fold_in(key, int(ci)),
                        jnp.asarray(xp[sl]), jnp.asarray(yp[sl]))]
                span_v = hi_f - np.maximum(lo_f - 1, 0) + 2   # per view
                fit_v = ok_f & (span_v + 32 // pw + 1 <= band_img_rows)
                spans_f.append(int(span_v.max()))
                spans_b.append(int((hi_b - np.maximum(lo_b - 1, 0) + 2
                                    ).max()))
                ok_full.append(bool(ok_f.all()))
                fit_f.append(bool(fit_v.all()))
                fit_b.append(bool((ok_b & (hi_b - np.maximum(lo_b - 1, 0)
                                           + 2 + 1 <= band_img_rows)).all()))
                fit_views.append(float(fit_v.mean()))
            rec = {
                "chunk": chunk, "color": color,
                "chunks_sampled": len(take),
                "span_full_p50": int(np.median(spans_f)),
                "span_full_p90": int(np.percentile(spans_f, 90)),
                "span_full_max": int(np.max(spans_f)),
                "span_base_p50": int(np.median(spans_b)),
                "span_base_p90": int(np.percentile(spans_b, 90)),
                "denom_ok_frac": round(float(np.mean(ok_full)), 3),
                "fit_full_frac": round(float(np.mean(fit_f)), 3),
                "fit_base_frac": round(float(np.mean(fit_b)), 3),
                "fit_view_frac_mean": round(float(np.mean(fit_views)), 3),
            }
            report[f"c{chunk}_col{color}"] = rec
            print(json.dumps(rec), flush=True)
    with open("benchmarks/strong_span_stats.json", "w") as f:
        json.dump(report, f, indent=1)
    print("saved benchmarks/strong_span_stats.json", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

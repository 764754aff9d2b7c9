"""Per-site A/B of the banded big-table gather on the deformable NCC sites.

The full-res stress runs showed the cond-banded gather is a net WIN on
classification (551 -> 334 s) but a net LOSS on the weak/deformable sweeps
(init+sweeps 1965 -> 2566 s, PERF_NOTES "banded cond regression").  The
per-site control (APDE_BAND_SITES) exists to pick the right default; this
probe measures the two deformable sites in isolation, at production chunk
geometry, on the real chip:

  - weak_center: the pixel's own dense window.  A compacted weak chunk is
    raster-contiguous, so its warped span is a narrow row band -> the fast
    branch should hit and pay off.
  - weak_anchor: the 8 distant-anchor sparse windows.  Anchor slots point
    hundreds of px away in arbitrary directions (reference picks nearest
    strong supports, APD.cu:1904-1963), so even per-slot gathers span the
    anchor radius x image width -> the slow branch + cond overhead.

Arms (one jit per arm; core.sampling.set_band_sites retraces):
  none            both sites unbanded (fused (B,8,T) anchor gather)
  center          weak_center banded, anchors fused-unbanded
  center+anchor   both banded (the pre-round-2 "all" behavior: per-slot
                  banded anchor gathers)

Usage (table must exceed BAND_ROWS to engage banding at all):
  python benchmarks/band_site_probe.py --width 3024 --height 2016
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
    ap.add_argument("--width", type=int, default=3024)
    ap.add_argument("--height", type=int, default=2016)
    ap.add_argument("--views", type=int, default=3)
    ap.add_argument("--chunk", type=int, default=32768,
                    help="weak pixels per program (production chunk size)")
    ap.add_argument("--anchor_radius", type=int, default=300,
                    help="anchor distance scale (production: up to ~4096)")
    ap.add_argument("--cands", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (API smoke tests)")
    ap.add_argument("--probe", default="all",
                    choices=["all", "weak", "strong", "classify"])
    args = ap.parse_args()

    from apde_mvs_tpu.core.platform import enable_compilation_cache
    enable_compilation_cache()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from apde_mvs_tpu.core import geometry as geo
    from apde_mvs_tpu.core import sampling
    from apde_mvs_tpu.ops.cost import CostData
    from apde_mvs_tpu.ops.deformable import WeakRefData, ncc_weak
    from apde_mvs_tpu.ops.propagation import PropCfg
    from apde_mvs_tpu.pipeline.driver import PAD_H, PAD_W
    from apde_mvs_tpu.pipeline.patchmatch import pad_to_multiple
    from apde_mvs_tpu.testing import synthetic

    H, W, V, B, C = (args.height, args.width, args.views, args.chunk,
                     args.cands)
    print(f"devices: {jax.devices()}", flush=True)

    t0 = time.time()
    scene = synthetic.make_scene(num_views=V, height=H, width=W,
                                 baseline=0.12, focal=1.25 * W)
    print(f"scene gen: {time.time() - t0:.1f} s", flush=True)

    cams = geo.CameraArrays.from_cameras(scene.cameras)
    src_ids = np.asarray([v for v in range(V) if v != 0])
    ref_p = pad_to_multiple(scene.images[0], PAD_H, PAD_W)
    src_imgs = np.stack(
        [pad_to_multiple(scene.images[s], PAD_H, PAD_W) for s in src_ids])
    data = CostData.build(
        cams.view(0), geo.CameraArrays(*[a[src_ids] for a in cams]),
        jnp.asarray(ref_p), jnp.asarray(src_imgs),
        real_width=W, real_height=H, sampler_u8=True)
    n_rows = int(data.src_quads.shape[1])
    assert n_rows > sampling.BAND_ROWS, \
        f"table {n_rows} rows <= BAND_ROWS — banding never engages"

    # Weak chunk: raster-contiguous pixels around the image center, like the
    # production weak compaction's 32768-pixel chunks.
    rng = np.random.default_rng(0)
    flat0 = (H // 2) * W - B // 2
    xi = (flat0 + np.arange(B)) % W
    yi = (flat0 + np.arange(B)) // W
    xf = jnp.asarray(xi, jnp.float32)
    yf = jnp.asarray(yi, jnp.float32)

    # Anchors: slot 0 = the pixel; slots 1..8 at ~anchor_radius away in
    # arbitrary directions (distance half-normal, direction uniform).
    ang = rng.uniform(0, 2 * np.pi, (B, 8))
    rad = np.abs(rng.normal(0, args.anchor_radius, (B, 8))) + 8.0
    ax = np.clip(xi[:, None] + rad * np.cos(ang), 0, W - 1).astype(np.int32)
    ay = np.clip(yi[:, None] + rad * np.sin(ang), 0, H - 1).astype(np.int32)
    anchors = np.concatenate(
        [np.stack([xi, yi], -1)[:, None].astype(np.int32),
         np.stack([ax, ay], -1)], axis=1)                      # (B, 9, 2)
    selected = rng.random((ref_p.shape[0], ref_p.shape[1], len(src_ids))) < 0.5

    cfg = PropCfg(use_sa=False)
    wref = WeakRefData.build(data, xf, yf, jnp.asarray(anchors),
                             jnp.asarray(selected), cfg)
    wref = jax.block_until_ready(wref)

    # Candidate planes: ground-truth plane at each pixel, depth-jittered per
    # candidate so every (candidate, view) warp is a realistic production one.
    gt_d = jnp.asarray(scene.depths[0][yi, xi])
    gt_n = jnp.asarray(scene.normals[0][yi, xi])
    base = jnp.stack(
        [geo.make_plane(data.ref_cam, xf, yf, gt_d * (1 + 0.002 * (c - C / 2)),
                        gt_n) for c in range(C)], axis=1)      # (B, C, 4)

    taps_center = int(wref.center_win.tap_val.shape[-1])
    taps_anchor = int(wref.tap_val.shape[-1])
    rows_per_call = B * len(src_ids) * C * (taps_center + 8 * taps_anchor)
    print(f"rows/call: {rows_per_call / 1e6:.1f} M "
          f"(center {taps_center} taps, anchor {taps_anchor})", flush=True)

    def run_arms(tag, arms, make_eval, rows, planes0):
        results = {}
        for name, spec in arms.items():
            sampling.set_band_sites(spec)
            eval_all = make_eval()
            tc = time.time()
            prev = float(np.asarray(eval_all(planes0)))        # compile+warm
            compile_s = time.time() - tc
            times = []
            for rep in range(args.reps):
                # fresh chained input: scale the perturbation to the input
                # magnitude and rep index — an ADDITIVE 1e-12*prev can round
                # to nothing in f32 and re-enable the axon memoization the
                # chaining is meant to defeat (CLAUDE.md gotcha)
                planes = planes0 * (1.0 + 1e-6 * (rep + 1 + prev % 1.0))
                assert not np.array_equal(np.asarray(planes),
                                          np.asarray(planes0))
                t = time.time()
                prev = float(np.asarray(eval_all(planes)))
                times.append(time.time() - t)
            med = float(np.median(times))
            results[name] = med
            print(json.dumps({
                "probe": tag, "arm": name, "sites": spec,
                "median_s": round(med, 3),
                "rows_per_s_M": round(rows / med / 1e6, 1),
                "first_call_s": round(compile_s, 1),
                "checksum": prev}), flush=True)
        base_arm = next(iter(arms))
        print(json.dumps({
            "probe": tag, "best_arm": min(results, key=results.get),
            "speedups_vs_first": {k: round(results[base_arm] / v, 3)
                                  for k, v in results.items()}}), flush=True)

    # jit signature keeps data/wref as traced args (closure would fold the
    # image table into the HLO, CLAUDE.md compile pathology)
    def make_weak_eval():
        @jax.jit
        def eval_all(data, wref, planes):
            def body(carry, _):
                c, acc = carry
                cost = ncc_weak(data, wref, planes[:, c], cfg)
                return (c + 1, acc + cost.sum()), None
            (_, acc), _ = jax.lax.scan(body, (jnp.int32(0), jnp.float32(0)),
                                       None, length=C)
            return acc
        return lambda planes: eval_all(data, wref, planes)

    if args.probe in ("all", "weak"):
        run_arms("weak", {"none": "strong,classify",
                          "center": "strong,classify,weak_center",
                          "center+anchor": "all"},
                 make_weak_eval, rows_per_call, base)

    if args.probe in ("all", "strong", "classify"):
        # strong window build + compile only for the probes that use it
        # (a --probe weak run should not pay it)
        from apde_mvs_tpu.ops.cost import _per_view_ncc, ncc_strong, \
            precompute_ref_window
        win = jax.block_until_ready(precompute_ref_window(
            data, xf, yf, cfg.strong_radius, cfg.strong_increment, False))
        taps_strong = int(win.tap_val.shape[-1])

    if args.probe in ("all", "strong"):
        # strong-site probe: the checkerboard sweep's dense-window NCC over
        # the same chunk (candidates from raster neighbors, like propagation)
        rows_strong = B * len(src_ids) * C * taps_strong
        print(f"strong rows/call: {rows_strong / 1e6:.1f} M "
              f"({taps_strong} taps)", flush=True)

        def make_strong_eval():
            @jax.jit
            def eval_all(data, win, planes):
                def body(carry, _):
                    c, acc = carry
                    cost = ncc_strong(data, xf, yf, planes[:, c], win)
                    return (c + 1, acc + cost.sum()), None
                (_, acc), _ = jax.lax.scan(
                    body, (jnp.int32(0), jnp.float32(0)), None, length=C)
                return acc
            return lambda planes: eval_all(data, win, planes)

        run_arms("strong", {"banded": "strong,classify",
                            "unbanded": "classify"},
                 make_strong_eval, rows_strong, base)

    if args.probe in ("all", "classify"):
        # classify-site probe: the view-major DepthToWeak shape — ONE view,
        # a 61-step depth sweep over the chunk (filters.sweep_curve_view's
        # inner loop; each step's gather is (B, 36) rows at site "classify")
        steps = 61
        rows_cls = B * steps * taps_strong
        print(f"classify rows/call: {rows_cls / 1e6:.1f} M "
              f"({steps} steps)", flush=True)
        dstep = jnp.linspace(0.98, 1.02, steps)

        def make_classify_eval():
            @jax.jit
            def eval_all(data, win, planes):
                p0 = planes[:, 0]

                def body(carry, _):
                    i, acc = carry
                    plane = p0.at[:, 3].mul(dstep[i])
                    cost = _per_view_ncc(data, 0, xf, yf, plane, win,
                                         site="classify")
                    return (i + 1, acc + cost.sum()), None
                (_, acc), _ = jax.lax.scan(
                    body, (jnp.int32(0), jnp.float32(0)), None, length=steps)
                return acc
            return lambda planes: eval_all(data, win, planes)

        run_arms("classify", {"banded": "strong,classify",
                              "unbanded": "strong"},
                 make_classify_eval, rows_cls, base)
    return 0


if __name__ == "__main__":
    sys.exit(main())

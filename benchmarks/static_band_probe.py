"""A/B of the STATIC-band gather (host/pre-pass-computed origins, no cond,
no in-program min/max) against the plain full-table gather, at production
chunk geometry on a >BAND_ROWS table.

This is the round-3 follow-up to band_site_probe.py: that probe killed the
cond-banded gather (per-gather min/max + lax.cond + slice lose more to
fusion breakage than the fast gather returns, PERF_NOTES "banded cond
regression: closed"). Here the origins come in as plain traced scalars
(ops.bands pre-pass), so the NCC body keeps ONE dynamic-slice per
(candidate, view) — or per view, with origins unioned over candidates —
and zero index reductions.

Arms (each its own jit):
  plain             full-table gathers (the production default today)
  static/cand       one band slice per (candidate, view) — (C, S) origins
  static/view       one band slice per view, origins unioned over cands
  classify-plain    view-major 61-step sweep, full table
  classify-static   same, ONE band per view covering the whole depth sweep

Checksums must match bitwise between plain and static arms (the pre-pass
asserts `fits` first).

Usage: python benchmarks/static_band_probe.py --width 3024 --height 2016
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
    ap.add_argument("--chunk", type=int, default=32768)
    ap.add_argument("--cands", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--probe", default="all",
                    choices=["all", "strong", "classify"])
    args = ap.parse_args()

    from apde_mvs_tpu.core.platform import enable_compilation_cache
    enable_compilation_cache()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from apde_mvs_tpu.core import geometry as geo
    from apde_mvs_tpu.core import sampling
    from apde_mvs_tpu.ops import bands
    from apde_mvs_tpu.ops.cost import CostData, _per_view_ncc, ncc_strong, \
        precompute_ref_window
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
    S = data.num_src
    n_rows = int(data.src_quads.shape[1])
    assert n_rows > sampling.BAND_ROWS

    flat0 = (H // 2) * W - B // 2
    xi = (flat0 + np.arange(B)) % W
    yi = (flat0 + np.arange(B)) // W
    xf = jnp.asarray(xi, jnp.float32)
    yf = jnp.asarray(yi, jnp.float32)

    gt_d = jnp.asarray(scene.depths[0][yi, xi])
    gt_n = jnp.asarray(scene.normals[0][yi, xi])
    base = jnp.stack(
        [geo.make_plane(data.ref_cam, xf, yf, gt_d * (1 + 0.002 * (c - C / 2)),
                        gt_n) for c in range(C)], axis=1)      # (B, C, 4)

    win = jax.block_until_ready(
        precompute_ref_window(data, xf, yf, 5, 2, False))
    taps = int(win.tap_val.shape[-1])

    # the bounds pre-pass — timed so its overhead is on the record
    bounds_fn = jax.jit(bands.strong_bounds, static_argnames="max_extent")
    tb = time.time()
    bb = jax.block_until_ready(bounds_fn(data, xf, yf, base, max_extent=5))
    print(f"bounds pre-pass first call: {time.time() - tb:.1f} s", flush=True)
    tb = time.time()
    bb = jax.block_until_ready(
        bounds_fn(data, xf, yf, base * (1 + 1e-7), max_extent=5))
    bounds_s = time.time() - tb
    fits = np.asarray(bb.fits)
    print(f"bounds pre-pass warm: {bounds_s * 1000:.1f} ms, fits="
          f"{fits.all(axis=-1).tolist()}", flush=True)
    assert fits.all(), "probe planes must fit (gt-coherent)"
    org_cand = jnp.asarray(np.asarray(bb.origin))              # (C, S)
    # per-view union band: [min origin, max end) must fit BAND_ROWS
    o = np.asarray(bb.origin)
    lo_v = o.min(axis=0)
    hi_v = o.max(axis=0) + sampling.BAND_ROWS
    assert ((hi_v - lo_v) <= sampling.BAND_ROWS + W * 8).all(), \
        "union spans ~candidate span + band; coherent cands must fit"
    org_view = jnp.asarray(np.minimum(lo_v, n_rows - sampling.BAND_ROWS))

    rows = B * S * C * taps

    # elementwise bitwise verification (scalar checksums reassociate
    # differently per program and CANNOT be compared across arms)
    def verify_equal(a, b, tag):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=tag)
        print(f"bitwise-equal: {tag}", flush=True)

    def run(tag, make_eval, rows_call, planes0, expect=None):
        eval_all = make_eval()
        tc = time.time()
        prev = float(np.asarray(eval_all(planes0)))
        compile_s = time.time() - tc
        times = []
        for rep in range(args.reps):
            planes = planes0 * (1.0 + 1e-6 * (rep + 1 + prev % 1.0))
            t = time.time()
            prev = float(np.asarray(eval_all(planes)))
            times.append(time.time() - t)
        med = float(np.median(times))
        print(json.dumps({
            "probe": tag, "median_s": round(med, 3),
            "rows_per_s_M": round(rows_call / med / 1e6, 1),
            "first_call_s": round(compile_s, 1),
            "checksum": prev}), flush=True)
        return med, prev

    if args.probe in ("all", "strong"):
        print(f"strong rows/call: {rows / 1e6:.1f} M", flush=True)

        def make_plain():
            @jax.jit
            def eval_all(data, win, planes):
                def body(carry, _):
                    c, acc = carry
                    cost = ncc_strong(data, xf, yf, planes[:, c], win)
                    return (c + 1, acc + cost.sum()), None
                (_, acc), _ = jax.lax.scan(
                    body, (jnp.int32(0), jnp.float32(0)), None, length=C)
                return acc
            return lambda p: eval_all(data, win, p)

        def make_static_cand():
            @jax.jit
            def eval_all(data, win, planes, origins):
                def body(carry, org):
                    c, acc = carry
                    cost = ncc_strong(data, xf, yf, planes[:, c], win,
                                      origins=org)
                    return (c + 1, acc + cost.sum()), None
                (_, acc), _ = jax.lax.scan(
                    body, (jnp.int32(0), jnp.float32(0)), origins)
                return acc
            return lambda p: eval_all(data, win, p, org_cand)

        def make_static_view():
            @jax.jit
            def eval_all(data, win, planes, origins):
                def body(carry, _):
                    c, acc = carry
                    cost = ncc_strong(data, xf, yf, planes[:, c], win,
                                      origins=origins)
                    return (c + 1, acc + cost.sum()), None
                (_, acc), _ = jax.lax.scan(
                    body, (jnp.int32(0), jnp.float32(0)), None, length=C)
                return acc
            return lambda p: eval_all(data, win, p, org_view)

        def make_static_hoisted():
            @jax.jit
            def eval_all(data, win, planes, origins):
                data_b = bands.banded_view_tables(data, origins)

                def body(carry, _):
                    c, acc = carry
                    cost = ncc_strong(data_b, xf, yf, planes[:, c], win,
                                      origins=origins)
                    return (c + 1, acc + cost.sum()), None
                (_, acc), _ = jax.lax.scan(
                    body, (jnp.int32(0), jnp.float32(0)), None, length=C)
                return acc
            return lambda p: eval_all(data, win, p, org_view)

        # one-off elementwise equality on candidate 0 (all arms must agree)
        c0_plain = jax.jit(lambda d, w, p: ncc_strong(d, xf, yf, p[:, 0], w)
                           )(data, win, base)
        c0_cand = jax.jit(lambda d, w, p, o: ncc_strong(
            d, xf, yf, p[:, 0], w, origins=o[0]))(data, win, base, org_cand)
        c0_view = jax.jit(lambda d, w, p, o: ncc_strong(
            d, xf, yf, p[:, 0], w, origins=o))(data, win, base, org_view)
        c0_hoist = jax.jit(lambda d, w, p, o: ncc_strong(
            bands.banded_view_tables(d, o), xf, yf, p[:, 0], w,
            origins=o))(data, win, base, org_view)
        verify_equal(c0_plain, c0_cand, "strong static-cand vs plain")
        verify_equal(c0_plain, c0_view, "strong static-view vs plain")
        verify_equal(c0_plain, c0_hoist, "strong static-hoisted vs plain")

        def make_presliced():
            # bands sliced by a SEPARATE program; the NCC program receives
            # (S, BAND_ROWS, 4) tables as plain inputs — isolates whether
            # the in-program dynamic_slice caps the banded rate
            data_pre = jax.jit(bands.banded_view_tables)(data, org_view)
            data_pre = jax.block_until_ready(data_pre)

            @jax.jit
            def eval_all(data_b, win, planes, origins):
                def body(carry, _):
                    c, acc = carry
                    cost = ncc_strong(data_b, xf, yf, planes[:, c], win,
                                      origins=origins)
                    return (c + 1, acc + cost.sum()), None
                (_, acc), _ = jax.lax.scan(
                    body, (jnp.int32(0), jnp.float32(0)), None, length=C)
                return acc
            return lambda p: eval_all(data_pre, win, p, org_view)

        t_plain, cks = run("strong/plain", make_plain, rows, base)
        t_cand, _ = run("strong/static-cand", make_static_cand, rows, base)
        t_view, _ = run("strong/static-view", make_static_view, rows, base)
        t_hoist, _ = run("strong/static-hoisted", make_static_hoisted,
                         rows, base)
        t_pre, _ = run("strong/pre-sliced", make_presliced, rows, base)
        print(json.dumps({
            "probe": "strong/summary",
            "speedup_cand": round(t_plain / t_cand, 3),
            "speedup_view": round(t_plain / t_view, 3),
            "speedup_hoisted": round(t_plain / t_hoist, 3),
            "speedup_presliced": round(t_plain / t_pre, 3),
            "bounds_overhead_pct": round(100 * bounds_s / t_plain, 1)}),
            flush=True)

    if args.probe in ("all", "classify"):
        steps = 61
        rows_cls = B * steps * taps
        print(f"classify rows/call: {rows_cls / 1e6:.1f} M", flush=True)
        dstep = jnp.linspace(0.98, 1.02, steps)
        p0 = base[:, 0]
        # union band over the whole depth sweep for view 0: bounds at the
        # two depth extremes (warp is monotone in depth along epipolar)
        pe = jnp.stack([p0.at[:, 3].mul(0.98), p0.at[:, 3].mul(1.02),
                        p0], axis=1)
        bbc = jax.block_until_ready(
            bounds_fn(data, xf, yf, pe, max_extent=5))
        assert np.asarray(bbc.fits).all()
        oc = np.asarray(bbc.origin)
        lo = oc.min(axis=0)
        span_ok = (oc.max(axis=0) + sampling.BAND_ROWS - lo
                   <= sampling.BAND_ROWS + 64 * W)
        assert span_ok.all()
        org_cls = jnp.asarray(np.minimum(lo, n_rows - sampling.BAND_ROWS))

        def make_cls(origin):
            @jax.jit
            def eval_all(data, win, planes, org):
                pp = planes[:, 0]

                def body(carry, _):
                    i, acc = carry
                    plane = pp.at[:, 3].mul(dstep[i])
                    cost = _per_view_ncc(data, 0, xf, yf, plane, win,
                                         origin=org)
                    return (i + 1, acc + cost.sum()), None
                (_, acc), _ = jax.lax.scan(
                    body, (jnp.int32(0), jnp.float32(0)), None, length=steps)
                return acc

            @jax.jit
            def eval_plain(data, win, planes):
                pp = planes[:, 0]

                def body(carry, _):
                    i, acc = carry
                    plane = pp.at[:, 3].mul(dstep[i])
                    cost = _per_view_ncc(data, 0, xf, yf, plane, win)
                    return (i + 1, acc + cost.sum()), None
                (_, acc), _ = jax.lax.scan(
                    body, (jnp.int32(0), jnp.float32(0)), None, length=steps)
                return acc

            if origin is None:
                return lambda p: eval_plain(data, win, p)
            return lambda p: eval_all(data, win, p, origin)

        cls_plain = jax.jit(lambda d, w, p: _per_view_ncc(
            d, 0, xf, yf, p[:, 0].at[:, 3].mul(0.98), w))(data, win, base)
        cls_static = jax.jit(lambda d, w, p, o: _per_view_ncc(
            d, 0, xf, yf, p[:, 0].at[:, 3].mul(0.98), w, origin=o)
            )(data, win, base, org_cls[0])
        verify_equal(cls_plain, cls_static, "classify static vs plain")

        t_plain, cks = run("classify/plain", lambda: make_cls(None),
                           rows_cls, base)
        t_static, _ = run("classify/static", lambda: make_cls(org_cls[0]),
                          rows_cls, base)
        print(json.dumps({
            "probe": "classify/summary",
            "speedup": round(t_plain / t_static, 3)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

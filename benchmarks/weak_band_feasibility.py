"""Can the weak/deformable sweep ride static bands? (VERDICT r3 #4)

The weak sweep is the unbanded majority of a full-res APD pass (65% weak):
its gathers sample warped ANCHOR windows, and anchors scatter across
hundreds of image rows, so the strong sweep's whole-chunk band
(BAND_ROWS/W ≈ 258 image rows at ETH3D half-res) was assumed to never
fit.  This probe replaces the assumption with numbers, on the exact
production anchor population: it reruns the production anchor generation
(JFA + gen_anchors chunks) on the pass-A priors of the full-res protocol
run (benchmarks/fullres_stress.py --prior_npz), then measures, per
candidate dispatch ordering and chunk size, the distribution of per-chunk
anchor-row spans and the fraction of chunks a band would cover:

  orderings   raster (production today) | anchor-centroid sorted
  chunk sizes 2^14 .. 2^17
  variants    all-slot span (whole-chunk band, one slice per view)
              per-slot span (slot-major compaction: sort by slot-k anchor
              row, one band per slot sub-chunk — requires restructuring
              ncc_weak into per-slot programs + combine)

Span accounting: anchor rows + 2*weak tap extent (weak_radius *
weak_increment = 25) + warp slack (the strong probe measured warped spans
~= source spans + ~30 rows at this rig).  fit = span <= BAND_ROWS/W.

Usage (TPU, after a fullres_stress run saved priors):
  python benchmarks/weak_band_feasibility.py \
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
    ap.add_argument("--prior_npz", required=True)
    ap.add_argument("--width", type=int, default=3024)
    ap.add_argument("--height", type=int, default=2016)
    ap.add_argument("--views", type=int, default=11)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    from apde_mvs_tpu.core.platform import enable_compilation_cache
    enable_compilation_cache()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from apde_mvs_tpu import config as cfg_mod
    from apde_mvs_tpu.core import geometry as geo
    from apde_mvs_tpu.core.sampling import BAND_ROWS
    from apde_mvs_tpu.ops.cost import CostData
    from apde_mvs_tpu.ops.state import PMState
    from apde_mvs_tpu.pipeline.driver import PAD_H, PAD_W
    from apde_mvs_tpu.pipeline import patchmatch as pm
    from apde_mvs_tpu.testing import synthetic

    H, W, V = args.height, args.width, args.views
    scene = synthetic.make_scene(
        num_views=V, height=H, width=W, baseline=0.12,
        focal=1.25 * W, weak_region=(-0.3, 0.3, -0.2, 0.2))
    cams = geo.CameraArrays.from_cameras(scene.cameras)
    src_ids = np.asarray([v for v in range(V) if v != 0])
    dmin = scene.cameras[0].depth_min * cfg_mod.DEPTH_MIN_FACTOR
    dmax = scene.cameras[0].depth_max * cfg_mod.DEPTH_MAX_FACTOR
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
                       jnp.asarray(pr["weak"], jnp.int32), cfg_mod.UNKNOWN),
        confidence=jnp.asarray(pr["confidence"], jnp.float32),
        planes=jnp.concatenate(
            [jnp.asarray(pr["normal"], jnp.float32),
             jnp.asarray(pr["depth"], jnp.float32)[..., None]], -1))

    schedule = cfg_mod.build_schedule(
        max(H, W), "General", use_sa=False,
        base=min(cfg_mod.PYRAMID_BASE_MAX_DIM, max(H, W) // 2))
    spec = [s for s in schedule if s.params.state == "refine_init"][-1]
    params = spec.params
    scfg = pm.StaticCfg(
        prop=pm.PropCfg(
            top_k=params.top_k, geom_consistency=bool(params.geom_consistency),
            use_impetus=bool(params.use_impetus), use_sa=False,
            refine_init=True, strong_radius=params.strong_radius,
            strong_increment=params.strong_increment,
            weak_radius=params.weak_radius,
            weak_increment=params.weak_increment),
        use_apd=True, max_iterations=params.max_iterations,
        rotate_time=params.rotate_time)

    # production anchor generation (mirrors run_patchmatch's APD setup)
    weak_np = np.asarray(state.weak)
    wy, wx = np.nonzero(weak_np == cfg_mod.WEAK)
    nw = len(wx)
    cap = pm._bucket(nw)
    print(json.dumps({"n_weak": int(nw), "bucket": int(cap)}), flush=True)
    weak_x = jnp.asarray(np.pad(wx, (0, cap - nw)), jnp.int32)
    weak_y = jnp.asarray(np.pad(wy, (0, cap - nw)), jnp.int32)
    weak_valid = jnp.asarray(np.arange(cap) < nw)
    key = jax.random.PRNGKey(7)
    t0 = time.time()
    ns = pm._jit_jfa((ph, pw))(state)
    gen = pm._jit_anchor_chunk((ph, pw), data.num_src, scfg,
                               pm._APD_SETUP_CHUNK, 25)
    parts = []
    for ci in range(cap // pm._APD_SETUP_CHUNK):
        sl = slice(ci * pm._APD_SETUP_CHUNK, (ci + 1) * pm._APD_SETUP_CHUNK)
        parts.append(gen(jax.random.fold_in(key, ci), data, state,
                         weak_x[sl], weak_y[sl], weak_valid[sl], ns,
                         jnp.float32(params.ransac_threshold),
                         jnp.float32(dmin), jnp.float32(dmax)))
        pm._throttle(parts, site="probe-anchors")
    anchors = np.asarray(jnp.concatenate([p[0] for p in parts], 0))[:nw]
    print(json.dumps({"anchor_gen_s": round(time.time() - t0, 1)}),
          flush=True)
    np.savez_compressed("/root/logs/weak_anchors_3024.npz",
                        anchors=anchors, wx=wx, wy=wy)

    a_y = anchors[:, 1:, 1]                      # (Nw, 8) anchor rows
    exists = (anchors[:, 1:, 0] >= 0) & (a_y >= 0)
    tap_extent = params.weak_radius * params.weak_increment
    warp_slack = 30
    margin = 2 * tap_extent + warp_slack

    def span_stats(order, label):
        ys_pix = wy[order]
        ay = np.where(exists[order], a_y[order], ys_pix[:, None])
        lo_all = np.minimum(ay.min(1), ys_pix)
        hi_all = np.maximum(ay.max(1), ys_pix)
        for log2c in (14, 15, 16, 17):
            c = 1 << log2c
            nch = (nw + c - 1) // c
            spans = np.array([
                hi_all[i * c:(i + 1) * c].max()
                - lo_all[i * c:(i + 1) * c].min()
                for i in range(nch)])
            eff = spans + margin
            print(json.dumps({
                "probe": "all-slot", "order": label, "chunk": c,
                "span_p50": int(np.median(spans)),
                "span_p90": int(np.percentile(spans, 90)),
                "span_max": int(spans.max()),
                "fit_frac": round(float((eff <= band_img_rows).mean()), 3),
            }), flush=True)

    raster = np.arange(nw)
    centroid = np.argsort(np.where(exists, a_y, wy[:, None]).mean(1),
                          kind="stable")
    span_stats(raster, "raster")
    span_stats(centroid, "centroid-sorted")

    # per-slot compaction: sort by slot-k anchor row, span of THAT slot only
    for k in range(8):
        ok = exists[:, k]
        order = np.argsort(np.where(ok, a_y[:, k], wy), kind="stable")
        rows = np.where(ok, a_y[:, k], wy)[order]
        for log2c in (15, 16):
            c = 1 << log2c
            nch = (nw + c - 1) // c
            spans = np.array([rows[i * c:(i + 1) * c].max()
                              - rows[i * c:(i + 1) * c].min()
                              for i in range(nch)])
            eff = spans + margin
            if k < 2 or k == 7:     # slots behave alike; print a sample
                print(json.dumps({
                    "probe": "per-slot", "slot": k, "chunk": c,
                    "span_p50": int(np.median(spans)),
                    "span_p90": int(np.percentile(spans, 90)),
                    "fit_frac": round(float((eff <= band_img_rows).mean()),
                                      3)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

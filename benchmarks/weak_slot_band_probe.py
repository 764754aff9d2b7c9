"""Slot-major banded weak-sweep gathers: decisive rate A/B (VERDICT r4 #2).

The weak-band feasibility probe (round 4) established the only banded
formulation of the deformable sweep: per-SLOT gather programs over pixels
sorted by that slot's anchor row (spans fit the band with 6-10x margin),
partial NCC sums realigned per pixel. Projected payoff was ~1.17x on the
weak sweep from the 159->230 M rows/s banded rate on the anchor taps (44%
of weak-sweep rows). Before committing to the kernel restructure (per-slot
chunk programs + online-softmax combine + per-slot pre-passes + scatters),
this probe measures the actual rates of the pieces on the REAL anchor
population (the full-res protocol's 3.96M weak pixels, anchors saved by
benchmarks/weak_band_feasibility.py):

  pixel-major        production layout: (B, 8, 9) fused anchor-tap gather,
                     full table (the thing to beat)
  slot-major plain   8x (B, 1, 9) programs over slot-sorted order, full
                     table (isolates the layout/dispatch cost)
  slot-major banded  same, but each (cand, view) gather rides a
                     static-band dynamic-slice at a host-computed origin
                     (isolates the band win)
  + realign          one permutation-gather of each slot's (B, C, S) cost
                     block back to original order (the combine's input)

All arms compute the same per-(pixel, slot, cand, view) anchor NCC costs;
checksums are permutation-invariant sums compared across arms. Verdict
rule (PERF_NOTES spec): build production only if banded slot-major beats
pixel-major by >= ~1.15x net of realign on the anchor-tap rows; otherwise
record the kill with these numbers.

Usage (real chip):
  python benchmarks/weak_slot_band_probe.py \
      --anchors_npz /root/logs/weak_anchors_3024.npz
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
    ap.add_argument("--anchors_npz", default="/root/logs/weak_anchors_3024.npz")
    ap.add_argument("--width", type=int, default=3024)
    ap.add_argument("--height", type=int, default=2016)
    ap.add_argument("--views", type=int, default=3)
    ap.add_argument("--chunk", type=int, default=1 << 16)
    ap.add_argument("--cands", type=int, default=10)
    ap.add_argument("--chunks_probed", type=int, default=4,
                    help="how many chunks of the population to time")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    from apde_mvs_tpu.core.platform import enable_compilation_cache
    enable_compilation_cache()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from apde_mvs_tpu.core import geometry as geo
    from apde_mvs_tpu.core import sampling
    from apde_mvs_tpu.ops import cost as cost_ops
    from apde_mvs_tpu.ops.cost import CostData
    from apde_mvs_tpu.pipeline.driver import PAD_H, PAD_W
    from apde_mvs_tpu.pipeline.patchmatch import pad_to_multiple
    from apde_mvs_tpu.testing import synthetic

    H, W, V = args.height, args.width, args.views
    B, C = args.chunk, args.cands
    t0 = time.time()
    scene = synthetic.make_scene(num_views=V, height=H, width=W,
                                 baseline=0.12, focal=1.25 * W,
                                 weak_region=(-0.3, 0.3, -0.2, 0.2))
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
    ph, pw = ref_p.shape
    n_rows = int(data.src_quads.shape[1])
    assert n_rows > sampling.BAND_ROWS
    band_img_rows = sampling.BAND_ROWS // pw

    an = np.load(args.anchors_npz)
    anchors, wx, wy = an["anchors"], an["wx"], an["wy"]
    nw = len(wx)
    print(json.dumps({"n_weak": int(nw),
                      "band_img_rows": int(band_img_rows)}), flush=True)
    a_x = anchors[:, 1:, 0]
    a_y = anchors[:, 1:, 1]
    exists = (a_x >= 0) & (a_y >= 0)

    # candidate planes: per-pixel prior-ish planes, depth-jittered per cand
    # (the real weak sweep evaluates the 8 anchors' hypotheses + current +
    # fit; all are converged-prior-scale warps)
    gt_d = scene.depths[0][wy, wx]
    gt_n = scene.normals[0][wy, wx]

    wk = np.asarray(cost_ops.square_taps(5, 5), np.float32)     # (9, 2)
    T = wk.shape[0]
    rows_chunk = B * V * C * 8 * T

    # ---- kernels ---------------------------------------------------------
    def anchor_cost_sums(data, ax_f, ay_f, tap_val, tap_w, sum_ref, sum_rr,
                         wsum, planes, origins):
        """Anchor NCC costs for anchors at (ax_f, ay_f) (B, A) against all
        C planes and S views. origins: None or (S,) static band origins.
        Returns scalar checksum of the (B, A, C, S) costs."""
        def per_cand(c, acc):
            plane = planes[:, c]

            def per_view(s, acc2):
                src_cam = data.src_cams.view(s)
                Hm = geo.homography(data.ref_cam, src_cam, plane)
                tx = ax_f[..., None] + wk[None, None, :, 0]
                ty = ay_f[..., None] + wk[None, None, :, 1]
                wxp_, wyp_ = geo.warp(Hm[..., None, None, :, :], tx, ty)
                org = None if origins is None else origins[s]
                sv = cost_ops.sample_src_view(data, s, wxp_, wyp_,
                                              band=False, origin=org)
                s_src = (tap_w * sv).sum(-1)
                s_ss = (tap_w * sv * sv).sum(-1)
                s_rs = (tap_w * tap_val * sv).sum(-1)
                cost = cost_ops.ncc_from_sums(sum_ref, sum_rr, s_src, s_ss,
                                              s_rs, wsum)
                return s + 1, acc2 + cost.sum()

            acc = jax.lax.fori_loop(
                0, V, lambda s, a: per_view(s, a)[1], acc)
            return c + 1, acc

        return jax.lax.fori_loop(
            0, C, lambda c, a: per_cand(c, a)[1], jnp.float32(0.0))

    @jax.jit
    def ref_window(data, ax, ay):
        """tap_val/tap_w/sums for anchor windows (B, A)."""
        tx = ax[..., None] + wk[None, None, :, 0].astype(jnp.int32)
        ty = ay[..., None] + wk[None, None, :, 1].astype(jnp.int32)
        val = cost_ops._clamped_fetch(data.ref_image, tx, ty)
        w_ = jnp.ones((1, 1, 1), jnp.float32)
        wsum = jnp.full(val.shape[:-1], float(T), jnp.float32)
        return val, w_, (val).sum(-1), (val * val).sum(-1), wsum

    pm_eval = jax.jit(lambda d, ax, ay, tv, tw, sr, srr, ws, p:
                      anchor_cost_sums(d, ax, ay, tv, tw, sr, srr, ws, p,
                                       None))
    sm_eval = jax.jit(lambda d, ax, ay, tv, tw, sr, srr, ws, p, o:
                      anchor_cost_sums(d, ax, ay, tv, tw, sr, srr, ws, p, o))

    @jax.jit
    def realign(block, perm):
        """(B, C*S) slot-cost block gathered back to original order."""
        return jnp.take(block, perm, axis=0).sum()

    # ---- chunk construction ---------------------------------------------
    rng = np.random.default_rng(0)
    starts = rng.choice(nw - B, size=args.chunks_probed, replace=False)

    def planes_for(idx):
        d = gt_d[idx]
        nrm = gt_n[idx]
        xf = jnp.asarray(wx[idx], jnp.float32)
        yf = jnp.asarray(wy[idx], jnp.float32)
        return jnp.stack(
            [geo.make_plane(data.ref_cam, xf, yf,
                            jnp.asarray(d * (1 + 0.002 * (c - C / 2)),
                                        jnp.float32), jnp.asarray(nrm))
             for c in range(C)], axis=1)

    def timed(fn, *arglists):
        """median over reps; each rep uses the NEXT chunk's inputs (fresh
        chained data defeats the axon memoization; CLAUDE.md)."""
        outs = []
        times = []
        for rep in range(args.reps):
            argl = arglists[rep % len(arglists)]
            t = time.time()
            acc = 0.0
            for a in argl:
                acc += float(np.asarray(fn(*a)))
            times.append(time.time() - t)
            outs.append(acc)
        return float(np.median(times)), outs[0]

    # pixel-major arm: raster chunk
    pm_args = []
    for st in starts:
        idx = np.arange(st, st + B)
        axc = np.where(exists[idx], a_x[idx], wx[idx][:, None])
        ayc = np.where(exists[idx], a_y[idx], wy[idx][:, None])
        ax_f = jnp.asarray(axc, jnp.float32)
        ay_f = jnp.asarray(ayc, jnp.float32)
        tv, tw, sr, srr, ws = ref_window(data, jnp.asarray(axc),
                                         jnp.asarray(ayc))
        pm_args.append((data, ax_f, ay_f, tv, tw, sr, srr, ws,
                        planes_for(idx)))
    med, chk = timed(pm_eval, *[[a] for a in pm_args])
    print(json.dumps({"arm": "pixel-major", "median_s": round(med, 3),
                      "rows_per_s_M": round(rows_chunk / med / 1e6, 1),
                      "checksum": chk}), flush=True)
    base_t = med

    # slot-major arms: chunks of the GLOBALLY slot-sorted pixel order (the
    # feasibility probe's layout — each chunk then covers a narrow anchor-
    # row range), 8 per-slot programs per chunk position (+ host-computed
    # band origins for the banded arm). Chunks differ from the pixel-major
    # arm's raster chunks, so rates compare equal-sized work, and banded
    # correctness is pinned by bitwise checksum equality against the plain
    # arm on IDENTICAL chunks.
    slot_orders = []
    slot_rows = []
    for k in range(8):
        rowk = np.where(exists[:, k], a_y[:, k], wy)
        order = np.argsort(rowk, kind="stable")
        slot_orders.append(order)
        slot_rows.append(rowk[order])
    chunk_pos = rng.choice(nw - B, size=args.chunks_probed, replace=False)
    plain_chk = []
    banded_chk = []
    for banded in (False, True):
        tag = "slot-major-banded" if banded else "slot-major-plain"
        all_args = []
        fits_all = []
        for st in chunk_pos:
            slot_args = []
            for k in range(8):
                sidx = slot_orders[k][st:st + B]
                rows_k = slot_rows[k][st:st + B]
                axk = np.where(exists[sidx, k], a_x[sidx, k], wx[sidx])
                ayk = np.where(exists[sidx, k], a_y[sidx, k], wy[sidx])
                tv, tw, sr, srr, ws = ref_window(
                    data, jnp.asarray(axk[:, None]), jnp.asarray(ayk[:, None]))
                pk = planes_for(sidx)
                if banded:
                    lo, hi = int(rows_k.min()), int(rows_k.max())
                    # warp slack 30 + tap extent 25 each side (feasibility
                    # margin accounting)
                    span = (hi - lo) + 2 * 25 + 30
                    fits_all.append(span <= band_img_rows)
                    org = min(max(lo - 25 - 15, 0) * pw,
                              n_rows - sampling.BAND_ROWS)
                    org -= org % 32
                    origins = jnp.full((V,), org, jnp.int32)
                    slot_args.append((data, jnp.asarray(axk[:, None],
                                                        jnp.float32),
                                      jnp.asarray(ayk[:, None], jnp.float32),
                                      tv, tw, sr, srr, ws, pk, origins))
                else:
                    slot_args.append((data, jnp.asarray(axk[:, None],
                                                        jnp.float32),
                                      jnp.asarray(ayk[:, None], jnp.float32),
                                      tv, tw, sr, srr, ws, pk))
            all_args.append(slot_args)
        fn = sm_eval if banded else pm_eval
        med, chk = timed(fn, *all_args)
        (banded_chk if banded else plain_chk).append(chk)
        out = {"arm": tag, "median_s": round(med, 3),
               "rows_per_s_M": round(rows_chunk / med / 1e6, 1),
               "vs_pixel_major": round(base_t / med, 3),
               "checksum": chk}
        if banded:
            out["band_fit_frac"] = round(float(np.mean(fits_all)), 3)
            out["banded_eq_plain"] = bool(
                abs(chk - plain_chk[0]) < 1e-3 * max(abs(chk), 1.0))
        print(json.dumps(out), flush=True)

    # realign overhead: 8 permutation gathers of (B, C*S) f32 per chunk
    perm = jnp.asarray(np.argsort(rng.permutation(B)), jnp.int32)
    blocks = [jnp.asarray(rng.standard_normal((B, C * V)), jnp.float32)
              for _ in range(2)]
    t_re, _ = timed(realign, [(blocks[0], perm)], [(blocks[1], perm)])
    print(json.dumps({"arm": "realign-per-slot-block",
                      "median_s_one": round(t_re, 4),
                      "per_chunk_8slots_s": round(8 * t_re, 3)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

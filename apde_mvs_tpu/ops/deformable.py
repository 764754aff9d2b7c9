"""Deformable (anchor-based) NCC for weak-texture pixels.

TPU formulation of the reference's ComputeBilateralNCCNew (APD.cu:448-593):
a weak pixel's cost against a source view aggregates NCC over up to 9
anchors — anchor 0 is the pixel itself with the dense strong window, anchors
1..8 are distant strong supports with sparse windows — all warped by the
*candidate plane's* homography, combined with a focal softmax weighting so
bad anchors dominate, then blended 0.25*center + 0.75*strong.

All reference-side quantities (anchor positions, tap values, SA gating,
window sums) depend only on the pixel, so `WeakRefData.build` hoists them out
of the per-candidate/per-view loops.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import geometry as geo
from ..core.sampling import fetch
from . import cost as cost_ops
from ..core.sampling import BAND_ROWS, site_banded
from .cost import COST_MAX, CostData, MIN_VAR, RefWindow, sample_src_view


class WeakRefData(NamedTuple):
    """Pixel-batch precomputation for deformable NCC (B weak pixels)."""

    x: jnp.ndarray            # (B,) f32 pixel coords
    y: jnp.ndarray
    center_win: RefWindow     # strong square window at the pixel (SA-gated taps)
    anchor_x: jnp.ndarray     # (B, 8) f32, -1 where invalid
    anchor_y: jnp.ndarray     # (B, 8)
    anchor_valid: jnp.ndarray  # (B, 8) bool (exists + same SA segment)
    anchor_sel: jnp.ndarray   # (B, 8, S) bool: selected_views at the anchor
    tap_val: jnp.ndarray      # (B, 8, T) ref values around anchors
    tap_w: jnp.ndarray        # (B, 8, T) SA-gated weights
    sum_ref: jnp.ndarray      # (B, 8)
    sum_rr: jnp.ndarray       # (B, 8)
    wsum: jnp.ndarray         # (B, 8)

    @staticmethod
    def build(data: CostData, x, y, anchors, selected, params) -> "WeakRefData":
        """anchors: (B, 9, 2) int32 (x, y), -1 invalid; anchors[:, 0] is the
        pixel itself. selected: (H, W, S) bool selected-views state."""
        use_sa = bool(params.use_sa)
        xi = x.astype(jnp.int32)
        yi = y.astype(jnp.int32)

        # center window: strong square taps with SA per-tap skip (no star,
        # no truncation — NCC-New `continue` semantics, APD.cu:523-541)
        sq = jnp.asarray(cost_ops.square_taps(params.strong_radius,
                                              params.strong_increment))
        cdx = sq[None, :, 0]          # (1, T) — broadcasts, never folded big
        cdy = sq[None, :, 1]
        center_sa = fetch(data.sa_mask, xi, yi)
        in_seg = (center_sa > 0) if use_sa else jnp.zeros_like(center_sa, bool)

        def sa_weights(tx, ty):
            if not use_sa:
                # shared scalar weight — avoids a (B, T) folded constant
                return jnp.ones((1,) * tx.ndim, jnp.float32)
            tap_sa = fetch(data.sa_mask, tx, ty)
            keep = ~in_seg.reshape(in_seg.shape + (1,) * (tx.ndim - 1)) \
                | (tap_sa == center_sa.reshape(
                    center_sa.shape + (1,) * (tx.ndim - 1)))
            return keep.astype(jnp.float32)

        ctx = xi[..., None] + cdx
        cty = yi[..., None] + cdy
        cw = sa_weights(ctx, cty)
        cval = cost_ops._clamped_fetch(data.ref_image, ctx, cty)
        c_wsum = cw.sum(-1) if use_sa else jnp.float32(sq.shape[0])
        center_win = RefWindow(
            cdx.astype(jnp.float32), cdy.astype(jnp.float32), cval, cw,
            (cw * cval).sum(-1), (cw * cval * cval).sum(-1), c_wsum)

        ax = anchors[..., 1:, 0]
        ay = anchors[..., 1:, 1]
        exists = (ax >= 0) & (ay >= 0)
        axc = jnp.maximum(ax, 0)
        ayc = jnp.maximum(ay, 0)
        if use_sa:
            a_sa = fetch(data.sa_mask, axc, ayc)
            sa_ok = ~in_seg[..., None] | (a_sa == center_sa[..., None])
        else:
            sa_ok = jnp.ones_like(exists)
        valid = exists & sa_ok

        sel = fetch(selected, axc, ayc)          # (B, 8, S)

        wk = jnp.asarray(cost_ops.square_taps(params.weak_radius,
                                              params.weak_increment))
        tx = axc[..., None] + wk[None, None, :, 0]
        ty = ayc[..., None] + wk[None, None, :, 1]
        tw = sa_weights(tx, ty)
        tval = cost_ops._clamped_fetch(data.ref_image, tx, ty)
        t_wsum = tw.sum(-1) if use_sa else \
            jnp.full(tval.shape[:-1], float(wk.shape[0]), jnp.float32)
        return WeakRefData(
            x=x, y=y, center_win=center_win,
            anchor_x=ax.astype(jnp.float32), anchor_y=ay.astype(jnp.float32),
            anchor_valid=valid, anchor_sel=sel,
            tap_val=tval, tap_w=tw,
            sum_ref=(tw * tval).sum(-1), sum_rr=(tw * tval * tval).sum(-1),
            wsum=t_wsum)


def _softmax_weighted(costs, mask):
    """Focal weighting: softmax over contributing anchor costs times the costs
    (reference: Softmax + weighted sum, APD.cu:431-446, 576-585)."""
    neg = jnp.where(mask, costs, -jnp.inf)
    m = jnp.max(neg, axis=-1, keepdims=True)
    e = jnp.where(mask, jnp.exp(costs - m), 0.0)
    denom = e.sum(-1)
    strong_cost = jnp.where(denom > 0, (e * costs).sum(-1) / jnp.maximum(denom, 1e-30), 0.0)
    return jnp.minimum(strong_cost, COST_MAX)


def _per_view_ncc_weak(data: CostData, src_index, wref: WeakRefData, plane,
                       params):
    """Deformable NCC of one plane per pixel against one source view. (B,)"""
    src_cam = data.src_cams.view(src_index)
    H = geo.homography(data.ref_cam, src_cam, plane)
    x, y = wref.x, wref.y
    cx, cy = geo.warp(H, x, y)
    center_oob = (cx < 0) | (cx >= data.img_w) | (cy < 0) | (cy >= data.img_h)

    # anchor 0 (the pixel) with the strong window — batched (B, T) taps
    win = wref.center_win
    ctx = x[..., None] + win.tap_dx
    cty = y[..., None] + win.tap_dy
    cwx, cwy = geo.warp(H[..., None, :, :], ctx, cty)
    csv = sample_src_view(data, src_index, cwx, cwy, site="weak_center")
    ctw = win.tap_w
    center_cost = cost_ops.ncc_from_sums(
        win.sum_ref, win.sum_rr, (ctw * csv).sum(-1),
        (ctw * csv * csv).sum(-1), (ctw * win.tap_val * csv).sum(-1),
        win.wsum)

    # anchors 1..8 with sparse windows — one vectorized (B, 8, T') gather pass
    awx, awy = geo.warp(H[..., None, :, :], wref.anchor_x, wref.anchor_y)
    a_oob = (awx < 0) | (awx >= data.img_w) | (awy < 0) | (awy >= data.img_h)
    wk = jnp.asarray(cost_ops.square_taps(params.weak_radius,
                                          params.weak_increment))
    tx = wref.anchor_x[..., None] + wk[None, None, :, 0]
    ty = wref.anchor_y[..., None] + wk[None, None, :, 1]
    wx, wy = geo.warp(H[..., None, None, :, :], tx, ty)
    if data.src_quads.shape[1] > BAND_ROWS and site_banded("weak_anchor"):
        # Banded big-table gathers need a narrow index span per gather.
        # Anchor slots are ordered by fit quality (reference sorts inliers
        # by plane distance, APD.cu:2060-2080), so even one slot's anchors
        # point in arbitrary directions across a chunk — per-slot gathers
        # are this path's best coherence, and the controlled A/B still
        # measured a 1.68x net regression for banding the deformable sites
        # (benchmarks/band_site_probe.py; PERF_NOTES "banded cond
        # regression: closed"). The site is band-disabled by default and
        # this branch exists for re-measurement via APDE_BAND_SITES.
        sv = jnp.stack([sample_src_view(data, src_index, wx[:, a], wy[:, a],
                                        site="weak_anchor")
                        for a in range(wx.shape[1])], axis=1)
    else:
        sv = sample_src_view(data, src_index, wx, wy, band=False)
    tw = wref.tap_w
    s_src_a = (tw * sv).sum(-1)
    s_ss_a = (tw * sv * sv).sum(-1)
    s_rs_a = (tw * wref.tap_val * sv).sum(-1)
    a_cost = cost_ops.ncc_from_sums(
        wref.sum_ref, wref.sum_rr, s_src_a, s_ss_a, s_rs_a, wref.wsum)

    # contribution rules (APD.cu:488-571): invalid anchors skip; anchors whose
    # warp leaves the image contribute cost_max iff that anchor selected this
    # src view; degenerate windows (wsum == 0) skip.
    sel_here = wref.anchor_sel[..., src_index]
    computable = wref.anchor_valid & ~a_oob & (wref.wsum > 0)
    oob_counted = wref.anchor_valid & a_oob & sel_here
    contrib = computable | oob_counted
    vals = jnp.where(computable, a_cost, COST_MAX)
    strong_weight = contrib.sum(-1)
    strong_cost = _softmax_weighted(vals, contrib)
    cost = jnp.where(strong_weight > 0,
                     0.25 * center_cost + 0.75 * strong_cost, center_cost)
    return jnp.where(center_oob, COST_MAX, cost)


def ncc_weak(data: CostData, wref: WeakRefData, plane, params) -> jnp.ndarray:
    """Multi-view deformable NCC cost vector (B, S) for one plane per pixel
    (reference: ComputeMultiViewCostVectorNew, APD.cu:809-818)."""

    def body(s, _):
        return s + 1, _per_view_ncc_weak(data, s, wref, plane, params)

    _, costs = jax.lax.scan(body, 0, None, length=data.num_src)
    return jnp.moveaxis(costs, 0, -1)


def ncc_weak_selected(data: CostData, wref: WeakRefData, plane, params,
                      sel_idx, sel_valid) -> jnp.ndarray:
    """Deformable NCC against a per-pixel view subset (B, K slots).

    The weak-sweep analog of `cost.ncc_selected`: refinement/fit hypotheses
    are weighted sums over the Monte-Carlo-voted views only (the reference's
    sums skip zero-weight views, APD.cu:988-996), so for large source sets
    the voted views are compacted into K slots and only those are sampled.
    Returns (B, K) costs, COST_MAX on invalid slots."""
    B, K = sel_idx.shape
    hw = data.src_h * data.width
    src_cams = cost_ops._gather_cams(data.src_cams, sel_idx)   # (B, K, ...)
    flat_tab = cost_ops.flat_src_table(data)
    wk = jnp.asarray(cost_ops.square_taps(params.weak_radius,
                                          params.weak_increment))
    x, y = wref.x, wref.y
    win = wref.center_win

    def slot(k, _):
        cam_k = geo.CameraArrays(*[a[:, k] for a in src_cams])
        H = geo.homography(data.ref_cam, cam_k, plane)
        cx, cy = geo.warp(H, x, y)
        center_oob = (cx < 0) | (cx >= data.img_w) | (cy < 0) \
            | (cy >= data.img_h)
        base = sel_idx[:, k, None] * hw                        # (B, 1)

        ctx = x[..., None] + win.tap_dx
        cty = y[..., None] + win.tap_dy
        cwx, cwy = geo.warp(H[..., None, :, :], ctx, cty)
        csv = cost_ops.sample_src_flat(data, flat_tab, base, cwx, cwy)
        ctw = win.tap_w
        center_cost = cost_ops.ncc_from_sums(
            win.sum_ref, win.sum_rr, (ctw * csv).sum(-1),
            (ctw * csv * csv).sum(-1), (ctw * win.tap_val * csv).sum(-1),
            win.wsum)

        awx, awy = geo.warp(H[..., None, :, :], wref.anchor_x, wref.anchor_y)
        a_oob = (awx < 0) | (awx >= data.img_w) | (awy < 0) \
            | (awy >= data.img_h)
        tx = wref.anchor_x[..., None] + wk[None, None, :, 0]
        ty = wref.anchor_y[..., None] + wk[None, None, :, 1]
        wx, wy = geo.warp(H[..., None, None, :, :], tx, ty)
        sv = cost_ops.sample_src_flat(data, flat_tab, base[..., None],
                                      wx, wy)
        tw = wref.tap_w
        a_cost = cost_ops.ncc_from_sums(
            wref.sum_ref, wref.sum_rr, (tw * sv).sum(-1),
            (tw * sv * sv).sum(-1), (tw * wref.tap_val * sv).sum(-1),
            wref.wsum)

        sel_here = jnp.take_along_axis(
            wref.anchor_sel,
            jnp.broadcast_to(sel_idx[:, k, None, None], (B, 8, 1)),
            axis=-1)[..., 0]
        computable = wref.anchor_valid & ~a_oob & (wref.wsum > 0)
        oob_counted = wref.anchor_valid & a_oob & sel_here
        contrib = computable | oob_counted
        vals = jnp.where(computable, a_cost, COST_MAX)
        strong_weight = contrib.sum(-1)
        strong_cost = _softmax_weighted(vals, contrib)
        cost = jnp.where(strong_weight > 0,
                         0.25 * center_cost + 0.75 * strong_cost, center_cost)
        return k + 1, jnp.where(center_oob, COST_MAX, cost)

    _, costs = jax.lax.scan(slot, 0, None, length=K)
    costs = jnp.moveaxis(costs, 0, -1)
    return jnp.where(sel_valid, costs, COST_MAX)

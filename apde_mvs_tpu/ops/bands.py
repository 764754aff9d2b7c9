"""Static-band gather bounds — the pre-pass behind the big-table fast path.

XLA:TPU's u8 row-gather emitter is bimodal in TABLE BYTES (~405 M rows/s
below ~3.5 MiB, ~175 M above; PERF_NOTES "byte bound"), so full-resolution
quad tables pay ~2.3x per sampled row. The round-2 cond-banded gather
(core.sampling.banded_take) lost its isolated win to fusion breakage at
every production call site; the surviving design (VERDICT r2 next-round #1)
computes band ORIGINS outside the NCC program — this module — and passes
them in as plain traced scalars, so the NCC body does one dynamic-slice per
(candidate, view) and zero conds / index reductions.

Correctness contract: a band origin may be used only when EVERY gather index
of that (candidate, view) pair falls inside [origin, origin + _sampling.BAND_ROWS).
The bound is exact by construction:

- gather indices are floor(clip(wy)) * W + floor(clip(wx)) with wx, wy the
  homography-warped window taps (core.sampling.quad_coords), so full-row
  bands only need the warped-Y range;
- the homography denominator H20*x + H21*y + H22 is AFFINE in the tap
  coordinates: if it is strictly positive at the 4 corners of the tap
  bounding square it is positive on the whole square, the projective map is
  horizon-free there, the image of the (convex) square is a convex quad and
  the Y extremes are attained at the corners. clip() is monotone, so
  clipped extremes = clipped corner extremes.
- any corner with a non-positive or non-finite denominator makes the pair
  unbandable (warps can clamp anywhere in the table); the driver then
  dispatches the plain full-table program for the chunk.

The refinement hypotheses are generated in-body from the sweep winner, which
the pre-pass cannot know; it bounds them by applying the SAME raw draws
(geometry.unit_normal_facing_from_gaussian / perturbed_normal_from_angles
split for this purpose) to EVERY possible winner and taking the union.

Reference parity target: the NCC hot loop this accelerates is
ComputeBilateralNCC* (reference APD.cu:596-721) at ETH3D-scale tables.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import geometry as geo
from ..core import sampling as _sampling
from .cost import CostData


class BandBounds(NamedTuple):
    """Per-(plane-set, view) banded-gather decision."""

    origin: jnp.ndarray   # (..., S) int32 table-row origins (clamped)
    fits: jnp.ndarray     # (..., S) bool — every index provably in band


def _corner_taps(max_extent: int) -> np.ndarray:
    """Bounding-square corners covering every window tap: the square window
    (±radius) and the SA star (max offset 5) both fit ±max_extent."""
    e = float(max_extent)
    return np.array([[-e, -e], [e, -e], [-e, e], [e, e]], np.float32)


# dynamic_slice starts snap DOWN to the u8 (32, 128)-tile row quantum (cheap
# insurance; measured neutral on-chip, benchmarks/static_band_probe.py)
_ALIGN_ROWS = 32

# Denominator positivity threshold for the corner-hull argument. The bounds
# pre-pass computes homography rows COMPONENT-WISE (materializing (B*C, 3, 3)
# homographies pads 3x3 onto (8,128) tiles — measured 0.49 s/chunk, the
# known tiny-minor-dim pathology), so its rounding differs from the body's
# by ~ulps; 1e-6 absolute (homography rows are O(1) in normalized pixel
# scale) keeps a sign the body could disagree with out of the banded set.
_DENOM_EPS = 1e-6


def _h_rows(ref: geo.CameraArrays, src: geo.CameraArrays, n0, n1, n2, w):
    """Rows 1 and 2 of the plane-induced homography, component-wise.

    Same math as geometry.homography (reference: ComputeHomography,
    APD.cu:334-394) restricted to the rows the Y-bounds need; all outputs
    broadcast over the plane component shapes. Returns
    (h10, h11, h12, h20, h21, h22)."""
    R_rel, t_rel = geo.relative_pose(ref, src)

    def m(i, j, nj):
        return R_rel[..., i, j] - t_rel[..., i] * nj

    nw0, nw1, nw2 = n0 / w, n1 / w, n2 / w
    fx_r, fy_r = ref.fx, ref.fy
    cx_r, cy_r = ref.cx, ref.cy
    # MKinv rows 1, 2 (columns 0..2); col2 = M[:,2] - col0*cx - col1*cy
    c0_1 = m(1, 0, nw0) / fx_r
    c1_1 = m(1, 1, nw1) / fy_r
    c2_1 = m(1, 2, nw2) - c0_1 * cx_r - c1_1 * cy_r
    c0_2 = m(2, 0, nw0) / fx_r
    c1_2 = m(2, 1, nw1) / fy_r
    c2_2 = m(2, 2, nw2) - c0_2 * cx_r - c1_2 * cy_r
    fy_s, cy_s = src.fy, src.cy
    h10 = fy_s * c0_1 + cy_s * c0_2
    h11 = fy_s * c1_1 + cy_s * c1_2
    h12 = fy_s * c2_1 + cy_s * c2_2
    return h10, h11, h12, c0_2, c1_2, c2_2


def _corner_wy(data: CostData, src_cam, x, y, n0, n1, n2, w,
               max_extent: int):
    """Clipped warped-Y at the 4 corner taps + per-corner hull validity.

    x, y broadcast against the plane components; returns (wy, ok) with a
    LEADING corner axis of 4 (keeps the pixel batch on the minor dim)."""
    h10, h11, h12, h20, h21, h22 = _h_rows(data.ref_cam, src_cam,
                                           n0, n1, n2, w)
    corners = _corner_taps(max_extent)
    wys, oks = [], []
    for k in range(4):
        tx = x + float(corners[k, 0])
        ty = y + float(corners[k, 1])
        den = h20 * tx + h21 * ty + h22
        wy = (h10 * tx + h11 * ty + h12) / den
        wyc = jnp.clip(wy, 0.0, data.src_h - 1.0)
        oks.append(jnp.isfinite(den) & (den > _DENOM_EPS)
                   & jnp.isfinite(wyc))
        wys.append(wyc)
    return jnp.stack(wys, axis=0), jnp.stack(oks, axis=0)


def _rows_to_bounds(data: CostData, lo_row, hi_row, ok) -> BandBounds:
    """(image-row lo/hi, ok) -> aligned clamped origin + direct coverage
    test. Shapes pass through."""
    n_rows = data.src_quads.shape[1]
    lo = jnp.maximum(lo_row - 1, 0)          # ±1-row float-safety margin
    hi = jnp.minimum(hi_row + 1, data.src_h - 1)
    origin = jnp.clip(lo * data.width, 0, n_rows - _sampling.BAND_ROWS)
    origin = origin - origin % _ALIGN_ROWS
    # every gathered index is < (hi + 1) * W and >= lo * W >= origin
    fits = ok & ((hi + 1) * data.width <= origin + _sampling.BAND_ROWS)
    return BandBounds(origin=origin, fits=fits)


def strong_bounds(data: CostData, x, y, planes, max_extent: int,
                  union: bool = False, valid=None,
                  with_rows: bool = False):
    """Band decisions for a (B, C, 4) candidate-plane set.

    Returns (C, S) origin/fits, or with ``union=True`` a single per-view
    band covering ALL C plane sets — (S,) origin/fits (the production chunk
    bodies use one band per view; measured equal to per-candidate bands,
    benchmarks/static_band_probe.py).

    ``with_rows=True`` additionally returns the raw (lo, hi, ok) image-row
    extents (same shapes as origin) — diagnostics for the span-distribution
    stats (benchmarks/strong_span_stats.py), not a production path.

    `valid` (B, C) excludes entries from the bound. ONLY entries whose body
    result is provably gather-independent may be excluded: checkerboard
    candidates with a False region flag (the body zeroes their cost rows —
    the C-aggregate-init quirk — so their garbage warps never surface) and
    refinement variants of unreachable winners. The current plane and its
    reachable refinements must always be bounded."""
    # layout: candidate-major (C, B) so the MINOR dim is the pixel batch —
    # (B, C=36) tensors pad 36 lanes to 128 on TPU (tiny-minor-dim tile
    # pathology; measured on the first full-res run, PERF_NOTES r3)
    pT = jnp.moveaxis(planes, 1, 0)                        # (C, B, 4)
    n0, n1, n2, w = (pT[..., 0], pT[..., 1], pT[..., 2], pT[..., 3])
    xb = x[None, :]
    yb = y[None, :]
    if valid is None:
        valid = jnp.ones(planes.shape[:2], bool)
    validT = jnp.moveaxis(valid, 1, 0)                     # (C, B)
    v3 = validT[None, :, :]                                # (1, C, B)

    def one_view(cam_leaves):
        src_cam = geo.CameraArrays(*cam_leaves)
        wy, okc = _corner_wy(data, src_cam, xb, yb, n0, n1, n2, w,
                             max_extent)                   # (4, C, B)
        ok = jnp.all(okc | ~v3, axis=(0, 2))               # (C,)
        any_valid = jnp.any(validT, axis=1)
        lo = jnp.floor(jnp.min(jnp.where(v3, wy, jnp.inf),
                               axis=(0, 2)))
        hi = jnp.floor(jnp.max(jnp.where(v3, wy, -jnp.inf),
                               axis=(0, 2)))
        if union:
            anyv = jnp.any(any_valid)
            lo_u = jnp.where(anyv, jnp.min(jnp.where(any_valid, lo, jnp.inf)),
                             0.0)
            hi_u = jnp.where(anyv, jnp.max(jnp.where(any_valid, hi,
                                                     -jnp.inf)), 0.0)
            return (jnp.all(ok) & anyv, lo_u.astype(jnp.int32),
                    hi_u.astype(jnp.int32))
        lo = jnp.where(any_valid, lo, 0.0).astype(jnp.int32)
        hi = jnp.where(any_valid, hi, 0.0).astype(jnp.int32)
        return (ok & any_valid, lo, hi)

    ok, lo, hi = jax.vmap(one_view)(tuple(data.src_cams))  # (S, [C])
    bb = _rows_to_bounds(data, lo, hi, ok)
    bb = BandBounds(origin=jnp.moveaxis(bb.origin, 0, -1),
                    fits=jnp.moveaxis(bb.fits, 0, -1))
    if with_rows:
        return bb, (jnp.moveaxis(lo, 0, -1), jnp.moveaxis(hi, 0, -1),
                    jnp.moveaxis(ok, 0, -1))
    return bb


def sweep_extent(strong_radius: int, use_sa: bool) -> int:
    """Window tap extent of the strong/classify NCC bodies: the square
    window reaches ±radius; the SA star's farthest tap is ±5."""
    return max(strong_radius, 5) if use_sa else strong_radius


def strong_sweep_bounds(data: CostData, state, k_ref, xs, ys,
                        depth_min, depth_max, max_extent: int,
                        row_bounds=None) -> BandBounds:
    """Per-chunk union band decisions for a whole color sweep in ONE
    program: xs, ys are (nc, chunk) pixel batches in host-dispatch order
    (padding rows must repeat real pixels, not zeros). Returns origins
    (nc, S) and fits (nc,).

    Enumerates exactly the gathers the banded `_strong_body` performs: the
    8 checkerboard candidates + the current plane (9 possible winners), and
    for each possible winner the 2 ANCHORED refinement variants (slots 3/4:
    perturbed normal at current depth, current normal at ±2% depth) built
    from the SAME raw draws the body will use. Slots 0/2 (full-range random
    depth) and 1 (random normal) stay full-table in the body: random depths
    span the epipolar segment, and a random unit normal is near-degenerate
    (denominator ~0 at the window corners) for SOME pixel in any
    chunk-sized batch — measured fit rate 0/24 with ground-truth planes
    when slot 1 was in the union. Per-chunk raw keys fold exactly as
    propagate_strong_host's body dispatch does."""
    from .propagation import checkerboard_candidates, refinement_from_raws, \
        refinement_raws
    from ..core.sampling import fetch
    cam = data.ref_cam

    def per_chunk(ci, inp):
        x, y = inp
        xf = x.astype(jnp.float32)
        yf = y.astype(jnp.float32)
        kr = jax.random.fold_in(k_ref, ci)
        cand_x, cand_y, flags = checkerboard_candidates(state.costs, x, y,
                                                        row_bounds)
        cand_planes = fetch(state.planes, cand_x, cand_y)      # (B, 8, 4)
        cur_plane = fetch(state.planes, x, y)
        base = jnp.concatenate([cand_planes, cur_plane[:, None]], axis=1)
        # flag-masked candidates may be excluded: the body zeroes their
        # cost rows, and `adopt` requires the winner's flag, so neither
        # their gathers nor their refinements can surface
        tr = jnp.ones_like(flags[:, :1])
        base_valid = jnp.concatenate([flags, tr], axis=1)      # (B, 9)
        raws = refinement_raws(kr, x.shape)
        variants = [base]
        valids = [base_valid]
        for wi in range(9):
            pw = base[:, wi]
            dw = geo.depth_from_plane(cam, pw, xf, yf)
            d5, n5 = refinement_from_raws(raws, cam, xf, yf, pw, dw,
                                          depth_min, depth_max)
            variants.append(jnp.stack(
                [geo.make_plane(cam, xf, yf, d5[:, i], n5[:, i])
                 for i in (3, 4)], axis=1))
            valids.append(jnp.repeat(base_valid[:, wi:wi + 1], 2, axis=1))
        allp = jnp.concatenate(variants, axis=1)               # (B, 27, 4)
        allv = jnp.concatenate(valids, axis=1)                 # (B, 27)
        bb = strong_bounds(data, xf, yf, allp, max_extent, union=True,
                           valid=allv)
        return ci + 1, (bb.origin, jnp.all(bb.fits))

    _, (origins, fits) = jax.lax.scan(per_chunk, 0, (xs, ys))
    return BandBounds(origin=origins, fits=fits)


def plane_chunk_bounds(data: CostData, xs, ys, planes,
                       max_extent: int) -> BandBounds:
    """Per-chunk union bands for single-plane-per-pixel evaluations (the
    chunked initial cost): xs, ys (nc, chunk) f32 pixel coords in dispatch
    order, planes (nc, chunk, 4) — padding lanes must repeat real pixels.
    Returns origins (nc, S), fits (nc,)."""

    def per_chunk(_, inp):
        x, y, p = inp
        bb = strong_bounds(data, x, y, p[:, None, :], max_extent,
                           union=True)
        return 0, (bb.origin, jnp.all(bb.fits))

    _, (origins, fits) = jax.lax.scan(per_chunk, 0, (xs, ys, planes))
    return BandBounds(origin=origins, fits=fits)


def view_sweep_bounds(data: CostData, state, xs, ys, view,
                      num_steps: int, include_now: bool,
                      max_extent: int) -> BandBounds:
    """Per-slice union bands for the view-major classify/refine sweeps
    against ONE source view: xs, ys (n_sl, sb) int32 pixels in dispatch
    order (padding lanes must repeat real pixels), `view` a traced view
    index. Returns origins (n_sl,), fits (n_sl,).

    ENDPOINT bound, not per-step evaluation (evaluating all 61 steps made
    the pre-pass cost more than the banded sweep saved — first full-res r3
    run): for a fixed pixel and corner tap, along the disparity sweep the
    probe plane's w is c/(disp+p), so both the warp numerator and
    denominator, h·t = A_t + B_t (disp+p)/c, are AFFINE in the step p.
    Warped-Y is therefore a Möbius function of p: if the (affine)
    denominator is >= eps at BOTH endpoint steps it is >= eps on the whole
    interval (an affine function's minimum over an interval is at an
    endpoint), the Möbius map has no pole inside, is monotone, and its
    extremes are the endpoint values. The body's pole-step guard
    (where(disp+p != 0, ., 1e-20)) lands on the same analytic continuation
    (w huge -> den -> A_t), so no separate |disp| gate is needed. The
    current-depth column of LocalRefine is step p=0 — inside the interval,
    covered."""
    from .filters import _sweep_scalars
    cam = data.ref_cam
    src_cam = data.src_cams.view(view)
    radius = (num_steps - 1) // 2
    ends = jnp.asarray([-radius, radius], jnp.float32)

    def per_slice(_, inp):
        x, y = inp
        xf = x.astype(jnp.float32)
        yf = y.astype(jnp.float32)
        sc = _sweep_scalars(data, state, x, y)
        n = sc.plane_cam[..., :3]                        # (sb, 3)
        los, his, oks = [], [], []
        for e in range(2):
            dn = sc.disp + ends[e]
            dn = jnp.where(dn != 0, dn, 1e-20)
            p_depth = cam.fx * sc.base_line / dn          # (sb,)
            wdist = geo.plane_dist_to_origin(cam, xf, yf, p_depth, n)
            wy, okc = _corner_wy(data, src_cam, xf, yf, n[..., 0],
                                 n[..., 1], n[..., 2], wdist,
                                 max_extent)              # (4, sb)
            oks.append(jnp.all(okc))
            los.append(jnp.min(wy))
            his.append(jnp.max(wy))
        ok = oks[0] & oks[1]
        lo = jnp.floor(jnp.minimum(los[0], los[1])).astype(jnp.int32)
        hi = jnp.floor(jnp.maximum(his[0], his[1])).astype(jnp.int32)
        bb = _rows_to_bounds(data, lo, hi, ok)
        return 0, (bb.origin, bb.fits)

    _, (origins, fits) = jax.lax.scan(per_slice, 0, (xs, ys))
    return BandBounds(origin=origins, fits=fits)


def banded_view_tables(data: CostData, origins) -> CostData:
    """Replace src_quads with per-view BAND_ROWS slices at `origins` (S,).

    ONE dynamic-slice per view per program, hoisted out of the candidate /
    step scans (a slice per (candidate, view) measured ~222 M rows/s vs the
    hoisted classify shape's ~320; benchmarks/static_band_probe.py). The
    sliced CostData is valid ONLY for origin-rebased gathers
    (static_band_take's pre-sliced shortcut) — never hand it to the flat
    (S*H*W, 4) slot paths (ncc_selected / flat_src_table). width/src_h stay
    those of the full image so coordinate clamping is unchanged."""
    c = data.src_quads.shape[-1]

    def slice_one(tab, org):
        return jax.lax.dynamic_slice(
            tab, (org, jnp.int32(0)), (_sampling.BAND_ROWS, c))

    return data.replace(
        src_quads=jax.vmap(slice_one)(data.src_quads,
                                      jnp.broadcast_to(
                                          origins, (data.num_src,))))


import os as _os

# Base-only banding (round 5, default ON after the span-stats measurement):
# the bounds pre-pass covers only the 9 possible winners (8 checkerboard
# candidates + current) and the body runs ALL 5 refinement probes on the
# plain full-table gather. The two anchored refinement variants blow the
# band for a large fraction of chunks (entry-state fit at 2^16 chunks:
# 40-43% base vs 26-30% full — benchmarks/strong_span_stats.json), and
# excluding them also cuts the pre-pass plane set 3x. APDE_BAND_REFINE=1
# restores the round-4 behavior (refine slots 3/4 banded) for A/Bs.
BAND_REFINE_SLOTS = _os.environ.get("APDE_BAND_REFINE", "0") == "1"


def set_band_refine(on: bool) -> None:
    """Runtime override (A/B probes); affects dispatches made after."""
    global BAND_REFINE_SLOTS
    BAND_REFINE_SLOTS = on


def strong_chunk_planes(data: CostData, state, kr, x, y,
                        depth_min, depth_max, row_bounds=None,
                        include_refine: bool = True):
    """The exact plane/validity set the banded `_strong_body` gathers for
    one chunk: 8 checkerboard candidates + current (9 possible winners) +
    (with ``include_refine``) the 2 anchored refinement variants of each
    winner from the SAME raw draws. Returns (planes (B, 27 or 9, 4),
    valid (B, 27 or 9))."""
    from .propagation import checkerboard_candidates, refinement_from_raws, \
        refinement_raws
    from ..core.sampling import fetch
    cam = data.ref_cam
    xf = x.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    cand_x, cand_y, flags = checkerboard_candidates(state.costs, x, y,
                                                    row_bounds)
    cand_planes = fetch(state.planes, cand_x, cand_y)
    cur_plane = fetch(state.planes, x, y)
    base = jnp.concatenate([cand_planes, cur_plane[:, None]], axis=1)
    tr = jnp.ones_like(flags[:, :1])
    base_valid = jnp.concatenate([flags, tr], axis=1)
    if not include_refine:
        return base, base_valid
    raws = refinement_raws(kr, x.shape)
    variants = [base]
    valids = [base_valid]
    for wi in range(9):
        pw = base[:, wi]
        dw = geo.depth_from_plane(cam, pw, xf, yf)
        d5, n5 = refinement_from_raws(raws, cam, xf, yf, pw, dw,
                                      depth_min, depth_max)
        variants.append(jnp.stack(
            [geo.make_plane(cam, xf, yf, d5[:, i], n5[:, i])
             for i in (3, 4)], axis=1))
        valids.append(jnp.repeat(base_valid[:, wi:wi + 1], 2, axis=1))
    return (jnp.concatenate(variants, axis=1),             # (B, 27, 4)
            jnp.concatenate(valids, axis=1))               # (B, 27)


def strong_chunk_bounds(data: CostData, state, kr, x, y,
                        depth_min, depth_max, max_extent: int,
                        row_bounds=None,
                        include_refine: bool = True) -> BandBounds:
    """Single-chunk variant of strong_sweep_bounds (origin (S,), fits
    scalar): the host drivers dispatch one small pre-pass program per chunk
    — a one-program-per-sweep scan over all chunks wedged the remote TPU
    worker mid-pass twice (reproducibly cleared by the bands-off control;
    per-chunk programs are structurally identical to the chunk bodies that
    have run for hours without incident). `kr` is the chunk's already-folded
    refinement key."""
    allp, allv = strong_chunk_planes(data, state, kr, x, y,
                                     depth_min, depth_max, row_bounds,
                                     include_refine=include_refine)
    bb = strong_bounds(data, x.astype(jnp.float32), y.astype(jnp.float32),
                       allp, max_extent, union=True, valid=allv)
    return BandBounds(origin=bb.origin, fits=jnp.all(bb.fits))

"""Post-sweep per-view ops: plane conversion, median filter, reliability
classification, confidence, local refine (reference: APD.cu:1694-2432).

DepthToWeak / LocalRefine evaluate NCC sweeps per pixel; they accept flat
pixel batches so the pipeline can chunk full-resolution images without
materializing (H*W, 61) intermediates.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RELIABLE_CURVE_SAMPLE_NUM, STRONG, UNKNOWN, WEAK
from ..core import checkerboard as cb
from ..core import geometry as geo
from ..core.sampling import fetch, texel_fetch
from .cost import COST_MAX, CostData, RefWindow, geom_cost, ncc_strong, \
    precompute_ref_window
from .state import PMState


def planes_to_depth_normal(data: CostData, planes: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame plane hypotheses -> (world normal, depth-in-w) in place
    (reference: GetDepthandNormal, APD.cu:1694-1709)."""
    h, w, _ = planes.shape
    ys, xs = jnp.mgrid[0:h, 0:w]
    depth = geo.depth_from_plane(data.ref_cam, planes, xs.astype(jnp.float32),
                                 ys.astype(jnp.float32))
    world = geo.normal_cam_to_world(data.ref_cam.R, planes)
    return world.at[..., 3].set(depth)


def depth_normal_to_planes(data: CostData, depth: jnp.ndarray,
                           normal_world: jnp.ndarray) -> jnp.ndarray:
    """Inverse: (world normal, depth) maps -> camera-frame plane hypotheses
    (reference: RandomInitialization REFINE path, APD.cu:939-947)."""
    h, w = depth.shape
    ys, xs = jnp.mgrid[0:h, 0:w]
    n4 = jnp.concatenate([normal_world, depth[..., None]], -1)
    cam_n = geo.normal_world_to_cam(data.ref_cam.R, n4)
    wdist = geo.plane_dist_to_origin(
        data.ref_cam, xs.astype(jnp.float32), ys.astype(jnp.float32), depth,
        cam_n[..., :3])
    return cam_n.at[..., 3].set(wdist)


# Median-filter star neighborhood (reference: CheckerboardFilterStrong,
# APD.cu:1711-1821): center + 20 STRONG-gated neighbors.
_FILTER_OFFSETS = np.asarray([
    (0, -1), (0, -3), (0, -5), (0, 1), (0, 3), (0, 5),
    (-1, 0), (-3, 0), (-5, 0), (1, 0), (3, 0), (5, 0),
    (2, -1), (2, 1), (-2, -1), (-2, 1),
    (-1, -2), (1, -2), (-1, 2), (1, 2),
], np.int32)
_FILTER_Y_GT2 = np.zeros((len(_FILTER_OFFSETS),), bool)
_FILTER_Y_GT2[[16, 17]] = True   # (-1,-2) and (1,-2)


def _masked_median(vals: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Median over the valid entries along axis 0 (even count averages the
    two middles, as in the reference's sort_small + index math).

    Layout note: vals is TAP-MAJOR (T, B). A (B, T) layout puts T=21 on the
    TPU lane dimension, padded to 128 (6x memory); and XLA:TPU's sort
    primitive multiplies padded temps enough to OOM a 6 MP color half EVEN
    tap-major. So the sort is an odd-even transposition network over a
    Python list of (B,) rows — pure fusable min/max, ~T^2/2 compare-swaps
    (T=21), no sort primitive, no padding."""
    T = vals.shape[0]
    rows = [jnp.where(valid[i], vals[i], jnp.inf) for i in range(T)]
    for rnd in range(T):
        for i in range(rnd % 2, T - 1, 2):
            lo = jnp.minimum(rows[i], rows[i + 1])
            hi = jnp.maximum(rows[i], rows[i + 1])
            rows[i], rows[i + 1] = lo, hi
    n = valid.sum(0)
    mid = n // 2
    mid_lo = jnp.maximum(mid - 1, 0)
    lo = jnp.zeros_like(rows[0])
    hi = jnp.zeros_like(rows[0])
    for i in range(T):
        lo = jnp.where(mid_lo == i, rows[i], lo)
        hi = jnp.where(mid == i, rows[i], hi)
    return jnp.where(n % 2 == 0, 0.5 * (lo + hi), hi)


def median_filter_color(state: PMState, color: int) -> PMState:
    """One color's depth median filter. Runs on depth-in-w planes (post
    planes_to_depth_normal). Black then red, sequentially, as the reference
    launches them."""
    h, w = state.costs.shape
    xs2, ys2 = cb.color_coords(h, w, color)
    x = xs2.reshape(-1)
    y = ys2.reshape(-1)
    weak_c = cb.gather_color(state.weak, color).reshape(-1)
    cost_c = cb.gather_color(state.costs, color).reshape(-1)
    valid_c = cb.gather_color(state.valid, color).reshape(-1)
    active = (weak_c != WEAK) & (cost_c >= 0.001) & valid_c

    offs = jnp.asarray(_FILTER_OFFSETS)                 # (T, 2)
    nx = x[None, :] + offs[:, 0][:, None]               # (T, B) tap-major
    ny = y[None, :] + offs[:, 1][:, None]
    inb = (nx >= 0) & (nx < w) & (ny >= 0) & (ny < h)
    # reference quirk: the (-1,-2)/(1,-2) taps additionally require p.y > 2
    # (APD.cu:1798-1804), one row stricter than the bounds check
    strict = jnp.asarray(_FILTER_Y_GT2)[:, None]
    inb = inb & (~strict | (y[None, :] > 2))
    n_state = fetch(state.weak, nx, ny, fill=UNKNOWN)
    n_depth = fetch(state.planes[..., 3], nx, ny)
    ok = inb & (n_state == STRONG)
    center_d = fetch(state.planes[..., 3], x, y)
    vals = jnp.concatenate([center_d[None, :], n_depth], axis=0)
    valid = jnp.concatenate([jnp.ones_like(center_d[None, :], bool), ok],
                            axis=0)
    med = _masked_median(vals, valid)
    new_d = jnp.where(active, med, center_d)
    planes = cb.scatter_color(
        state.planes,
        cb.gather_color(state.planes, color).at[..., 3].set(
            new_d.reshape(h, w // 2)),
        color)
    return state.replace(planes=planes)


def compute_confidence(data: CostData, state: PMState) -> PMState:
    """Cross-view consistency confidence (reference: ConfidenceCompute,
    APD.cu:2282-2344). Runs on depth-in-w planes."""
    h, w = state.costs.shape
    ys, xs = jnp.mgrid[0:h, 0:w]
    xf = xs.astype(jnp.float32).reshape(-1)
    yf = ys.astype(jnp.float32).reshape(-1)
    depth = state.planes[..., 3].reshape(-1)
    sel = state.selected.reshape(-1, data.num_src)
    Xw = geo.backproject_world(data.ref_cam, xf, yf, depth)

    def body(s, _):
        src_cam = data.src_cams.view(s)
        sx, sy, _sd = geo.project(src_cam, Xw)
        src_depth = texel_fetch(data.src_depths[s], sx, sy)
        exist = src_depth > 0.0
        Xs = geo.backproject_world(src_cam, sx, sy, src_depth)
        bx, by, bd = geo.project(data.ref_cam, Xs)
        pix = jnp.sqrt((xf - bx) ** 2 + (yf - by) ** 2)
        rel = jnp.abs(depth - bd) / jnp.maximum(depth, 1e-20)
        score = jnp.where(exist,
                          1.0 + 2.0 * (pix <= 2.0) + 2.0 * (rel <= 0.02), 0.0)
        return s + 1, score

    _, scores = jax.lax.scan(body, 0, None, length=data.num_src)
    conf = 1.0 + jnp.where(sel, jnp.moveaxis(scores, 0, -1), 0.0).sum(-1)
    conf = jnp.minimum(conf, 255.0).reshape(h, w)
    bad = depth.reshape(h, w) <= 0.0
    weak = jnp.where(bad, UNKNOWN, state.weak)
    conf = jnp.where(bad, 0.0, conf)
    return state.replace(confidence=conf, weak=weak)


class _SweepSetup(NamedTuple):
    ok: jnp.ndarray          # (B,) pixels with a usable setup
    plane_cam: jnp.ndarray   # (B, 4) camera-frame plane (w = plane dist)
    depth: jnp.ndarray       # (B,)
    disp: jnp.ndarray        # (B,) current disparity f*B/d
    base_line: jnp.ndarray   # (B,)
    sel_idx: jnp.ndarray     # (B, K) compacted selected-view indices
    sel_valid: jnp.ndarray   # (B, K)
    sel_w: jnp.ndarray       # (B, K) view weights at the slots
    wnorm: jnp.ndarray       # (B,)
    vw_full: jnp.ndarray     # (B, S) selection-gated weights, all views


_MAX_SWEEP_VIEWS = 8


def _sweep_setup(data: CostData, state: PMState, x, y,
                 sweep_k: int = _MAX_SWEEP_VIEWS) -> _SweepSetup:
    """Shared setup of the disparity sweeps (reference: APD.cu:2121-2157,
    2356-2401): the per-pixel scalars from `_sweep_scalars` plus the
    selected views compacted to at most `sweep_k` per-pixel slots, so the
    sweeps only sample views the reference's `isSet(selected_views)` loops
    would touch; the caller may shrink `sweep_k` to the actual max
    per-pixel selection count (the sweep cost is linear in it)."""
    sc = _sweep_scalars(data, state, x, y)
    K = min(data.num_src, sweep_k)
    order = jnp.argsort(~sc.sel, axis=-1, stable=True)[:, :K]
    sel_valid = jnp.take_along_axis(sc.sel, order, -1)
    sel_w = jnp.take_along_axis(sc.vw, order, -1)
    return _SweepSetup(sc.ok, sc.plane_cam, sc.depth, sc.disp, sc.base_line,
                       order.astype(jnp.int32), sel_valid, sel_w, sc.wnorm,
                       sc.vw)


def _sweep_cost(data: CostData, setup: _SweepSetup, win: RefWindow, x, y,
                p_depth, geom: bool, geom_factor, depth_min, depth_max):
    """Weighted sweep cost at a probe depth (keeps the current normal).

    Evaluates either the K compacted view slots or all S views masked by
    the selection-gated weights — a static choice by measured gather
    economics (`cost.prefer_view_slots`); both reproduce the reference's
    selected-views-only weighted sum (APD.cu:2173-2186) provided sweep_k
    covers the max per-pixel selection count (callers guarantee this via
    _sweep_view_bucket). If a pixel ever selects more views than the slots
    hold, the slot path normalizes by the kept slots' weight sum — a
    consistent weighted mean over the kept views, not a biased-low sum."""
    from .cost import geom_cost, geom_selected, ncc_selected, ncc_strong, \
        prefer_view_slots
    xf = x.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    n = setup.plane_cam[..., :3]
    wdist = geo.plane_dist_to_origin(data.ref_cam, xf, yf, p_depth, n)
    plane = jnp.concatenate([n, wdist[..., None]], -1)
    if prefer_view_slots(data, setup.sel_idx.shape[1]):
        cv = ncc_selected(data, xf, yf, plane, win, setup.sel_idx,
                          setup.sel_valid)
        if geom:
            cv = cv + geom_factor * geom_selected(
                data, xf, yf, plane, setup.sel_idx, setup.sel_valid)
        cv = jnp.where(setup.sel_valid, cv, 0.0)
        kept = (setup.sel_w * setup.sel_valid).sum(-1)
        cost = (setup.sel_w * cv).sum(-1) / jnp.maximum(kept, 1e-20)
    else:
        cv = ncc_strong(data, xf, yf, plane, win)
        if geom:
            cv = cv + geom_factor * geom_cost(data, xf, yf, plane)
        cost = (setup.vw_full * cv).sum(-1) / jnp.maximum(setup.wnorm, 1e-20)
    cost = jnp.where(setup.wnorm > 0, cost, COST_MAX)
    in_range = (p_depth >= depth_min) & (p_depth <= depth_max)
    return jnp.where(in_range, cost, COST_MAX)


def depth_to_weak(data: CostData, state: PMState, x, y, weak_peak_radius,
                  use_sa: bool, geom: bool, geom_factor, depth_min, depth_max,
                  strong_radius=5, strong_increment=2,
                  return_curve: bool = False,
                  sweep_k: int = _MAX_SWEEP_VIEWS):
    """Reliability classification for a pixel batch (reference: DepthToWeak,
    APD.cu:2103-2250): sweep 61 one-pixel-disparity steps around the current
    depth, find cost-curve local minima ("peaks"), classify STRONG/WEAK/
    UNKNOWN. Returns (new_weak (B,), curve (B, 61) or None)."""
    xf = x.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    setup = _sweep_setup(data, state, x, y, sweep_k)
    win = precompute_ref_window(data, xf, yf, strong_radius, strong_increment,
                                use_sa)
    radius = (RELIABLE_CURVE_SAMPLE_NUM - 1) // 2

    def step(i, _):
        p_disp = (i - radius).astype(jnp.float32)
        p_depth = data.ref_cam.fx * setup.base_line \
            / jnp.where(setup.disp + p_disp != 0, setup.disp + p_disp, 1e-20)
        c = _sweep_cost(data, setup, win, x, y, p_depth, geom, geom_factor,
                        depth_min, depth_max)
        return i + 1, jnp.minimum(c, COST_MAX)

    _, curve = jax.lax.scan(step, jnp.int32(0), None,
                            length=RELIABLE_CURVE_SAMPLE_NUM)
    curve = jnp.moveaxis(curve, 0, 1)                    # (B, 61)
    new_weak = _classify_peaks(data, state, x, y, curve, weak_peak_radius,
                               setup.ok)
    return new_weak, (curve if return_curve else None)


def _classify_peaks(data: CostData, state: PMState, x, y, curve,
                    weak_peak_radius, setup_ok) -> jnp.ndarray:
    """STRONG/WEAK/UNKNOWN from a (B, 61) sweep cost curve: strict local
    minima ("peaks"), distance/cost/variance rules, margin guards
    (reference: DepthToWeak peak analysis, APD.cu:2188-2249)."""
    radius = (RELIABLE_CURVE_SAMPLE_NUM - 1) // 2
    min_margin = 6
    # peaks: strict local minima over i in [2, 58]
    left = curve[:, 1:-1]
    prev = curve[:, :-2]
    nxt = curve[:, 2:]
    is_peak_inner = (prev > left) & (nxt > left)         # index i-1 -> i in [1, 59]
    idx_inner = jnp.arange(1, RELIABLE_CURVE_SAMPLE_NUM - 1)
    in_range = (idx_inner >= 2) & (idx_inner <= RELIABLE_CURVE_SAMPLE_NUM - 3)
    is_peak = is_peak_inner & in_range[None, :]
    peak_count = is_peak.sum(-1)
    peak_costs = jnp.where(is_peak, left, jnp.inf)
    best_inner = jnp.argmin(peak_costs, -1)
    min_cost = jnp.take_along_axis(peak_costs, best_inner[:, None], 1)[:, 0]
    # reference keeps min_peak=0 when no peak beats the initial 2.0
    has_min = min_cost < 2.0
    min_peak = jnp.where(has_min, best_inner + 1, 0)
    min_cost = jnp.where(has_min, min_cost, 2.0)

    far = (jnp.abs(min_peak - radius) > weak_peak_radius) | (min_cost > 0.5)
    single = peak_count == 1
    single_strong = min_cost <= 0.15
    others = is_peak & (idx_inner[None, :] != min_peak[:, None])
    var = jnp.sqrt(jnp.where(others, (left - min_cost[:, None]) ** 2, 0.0
                             ).sum(-1)) / jnp.maximum(peak_count - 1, 1)
    multi_strong = var > 0.2

    new_weak = jnp.where(
        far, WEAK,
        jnp.where(single, jnp.where(single_strong, STRONG, WEAK),
                  jnp.where(multi_strong, STRONG, WEAK)))
    # guards: margins and degenerate setups -> UNKNOWN
    margin = (x < min_margin) | (y < min_margin) \
        | (x >= data.img_w - min_margin) | (y >= data.img_h - min_margin)
    invalid = margin | ~setup_ok | ~fetch(state.valid, x, y)
    return jnp.where(invalid, UNKNOWN, new_weak).astype(jnp.int32)


# ---------------------------------------------------------------------------
# View-major sweeps: evaluate only the SELECTED (pixel, view) pairs.
#
# The classification/refine sweeps gate every view's cost by the
# selection-gated weight, so unselected views contribute exactly zero — but
# the all-views path still pays their gathers, and the per-pixel slot path
# gathers from the flat (S*H*W, 4) table which never rides the banded fast
# path (indices span views). Restructure: the host compacts the (pixel,
# view) pairs BY VIEW and dispatches one program per source view, which
# accumulates w_s * cost_curve_s into a (B, 61) numerator via scatter-add;
# a final program normalizes and classifies. Per-view gathers hit one
# per-view quad table with one probe depth per step — exactly the banded
# gather's sweet spot. Arithmetic matches _sweep_cost's weighted mean up to
# summation order.
# ---------------------------------------------------------------------------


class _SweepScalars(NamedTuple):
    ok: jnp.ndarray          # (B,)
    plane_cam: jnp.ndarray   # (B, 4)
    depth: jnp.ndarray       # (B,)
    disp: jnp.ndarray        # (B,)
    base_line: jnp.ndarray   # (B,)
    wnorm: jnp.ndarray       # (B,)
    vw: jnp.ndarray          # (B, S) selection-gated weights
    sel: jnp.ndarray         # (B, S) selected-views mask


def _sweep_scalars(data: CostData, state: PMState, x, y) -> _SweepScalars:
    """Per-pixel scalar setup shared by the disparity sweeps (the non-slot
    half of `_sweep_setup`; reference: APD.cu:2121-2157)."""
    plane_world = fetch(state.planes, x, y)
    plane_cam = geo.normal_world_to_cam(data.ref_cam.R, plane_world)
    depth = plane_cam[..., 3]
    sel = fetch(state.selected, x, y)
    vw = jnp.where(sel, fetch(state.view_weights, x, y), 0.0)
    wnorm = vw.sum(-1)
    dists = jnp.linalg.norm(data.ref_cam.c[None, :] - data.src_cams.c, axis=-1)
    valid_src = sel.sum(-1)
    base_line = jnp.where(sel, dists[None, :], 0.0).sum(-1) \
        / jnp.maximum(valid_src, 1)
    disp = data.ref_cam.fx * base_line / jnp.where(depth != 0, depth, 1.0)
    ok = (depth != 0) & (valid_src > 0)
    return _SweepScalars(ok, plane_cam, depth, disp, base_line, wnorm, vw,
                         sel)


def sweep_curve_view(data: CostData, state: PMState, acc, x, y, pos, view,
                     use_sa: bool, geom: bool, geom_factor,
                     strong_radius=5, strong_increment=2,
                     num_steps: int = RELIABLE_CURVE_SAMPLE_NUM,
                     include_now: bool = False, origin=None):
    """Accumulate one source view's weighted sweep-cost curves into `acc`.

    x, y: (Bs,) pixels that selected `view` (a traced view index); pos:
    (Bs,) rows of `acc` to add into (out-of-range rows drop — padding).
    The per-view weight is the selection-gated view weight, so rows whose
    pixel did not select `view` contribute exactly 0 even if the host
    compaction over-includes them. With `include_now` a final extra column
    evaluates the CURRENT depth (LocalRefine's cost_now; acc then has
    num_steps + 1 columns)."""
    from .cost import geom_one_view
    xf = x.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    sc = _sweep_scalars(data, state, x, y)
    w_s = jax.lax.dynamic_index_in_dim(sc.vw, view, axis=1, keepdims=False)
    win = precompute_ref_window(data, xf, yf, strong_radius, strong_increment,
                                use_sa)
    if origin is not None:
        # hoist ONE band slice out of the step scan (src_depths for the
        # geom term stay intact in the banded CostData)
        from .bands import banded_view_tables
        data = banded_view_tables(data, origin)
    radius = (num_steps - 1) // 2
    n = sc.plane_cam[..., :3]

    def step(i, _):
        p_disp = (i - radius).astype(jnp.float32)
        p_depth = data.ref_cam.fx * sc.base_line \
            / jnp.where(sc.disp + p_disp != 0, sc.disp + p_disp, 1e-20)
        if include_now:
            p_depth = jnp.where(i >= num_steps, sc.depth, p_depth)
        wdist = geo.plane_dist_to_origin(data.ref_cam, xf, yf, p_depth, n)
        plane = jnp.concatenate([n, wdist[..., None]], -1)
        c = _ncc_one_view(data, view, xf, yf, plane, win, origin=origin)
        if geom:
            c = c + geom_factor * geom_one_view(data, view, xf, yf, plane)
        return i + 1, c

    _, curves = jax.lax.scan(step, jnp.int32(0), None,
                             length=num_steps + int(include_now))
    contrib = w_s[None, :] * curves                       # (steps, Bs)
    # callers pass `pos` sorted and unique (padding rows >= len(acc) and
    # distinct), letting the scatter-add lower without a sort/dedup pass
    return acc.at[pos].add(jnp.moveaxis(contrib, 0, 1), mode="drop",
                           unique_indices=True, indices_are_sorted=True)


def _ncc_one_view(data: CostData, s, x, y, plane, win, origin=None):
    from . import cost as cost_ops
    return cost_ops._per_view_ncc(data, s, x, y, plane, win, site="classify",
                                  origin=origin)


def _curve_from_num(data: CostData, sc: _SweepScalars, num, num_steps: int,
                    depth_min, depth_max):
    """Shared finisher math of the view-major sweeps: reconstruct
    `sweep_curve_view`'s probe depths bit-for-bit, normalize the
    scatter-accumulated numerator `num` by the selection weight sum, and
    COST_MAX-mask zero-weight pixels and out-of-range probes. Returns
    (p_depth (B, num_steps), masked sweep curve, unmasked normalized
    curve) — the last carries any extra columns of `num` (LocalRefine's
    cost_now), which are never depth-range-masked."""
    radius = (num_steps - 1) // 2
    steps = (jnp.arange(num_steps) - radius).astype(jnp.float32)
    denom = jnp.where(sc.disp[:, None] + steps[None, :] != 0,
                      sc.disp[:, None] + steps[None, :], 1e-20)
    p_depth = data.ref_cam.fx * sc.base_line[:, None] / denom
    mean = num / jnp.maximum(sc.wnorm[:, None], 1e-20)
    c = jnp.where(sc.wnorm[:, None] > 0, mean, COST_MAX)
    in_range = (p_depth >= depth_min) & (p_depth <= depth_max)
    masked = jnp.where(in_range, c[:, :num_steps], COST_MAX)
    return p_depth, masked, c


def classify_from_curve(data: CostData, state: PMState, x, y, num,
                        weak_peak_radius, depth_min, depth_max,
                        return_curve: bool = False,
                        num_steps: int = RELIABLE_CURVE_SAMPLE_NUM):
    """Finish the view-major classification: normalize the accumulated
    numerator `num` (B, 61) by the selection weight sum, apply the same
    wnorm/depth-range/COST_MAX masking as `_sweep_cost` + `depth_to_weak`,
    then run the shared peak classification."""
    sc = _sweep_scalars(data, state, x, y)
    _, masked, _ = _curve_from_num(data, sc, num, num_steps,
                                   depth_min, depth_max)
    curve = jnp.minimum(masked, COST_MAX)
    new_weak = _classify_peaks(data, state, x, y, curve, weak_peak_radius,
                               sc.ok)
    return new_weak, (curve if return_curve else None)


def refine_from_curve(data: CostData, state: PMState, x, y, num,
                      depth_min, depth_max, num_steps: int = 11):
    """Finish the view-major LocalRefine: `num` is the (B, num_steps + 1)
    accumulated numerator (last column = cost at the current depth). Applies
    `local_refine`'s decision rule: replace the depth with the best in-range
    sweep depth when it improves the current cost by > 0.1 and beats the
    COST_MAX init (reference: LocalRefine, APD.cu:2403-2430)."""
    sc = _sweep_scalars(data, state, x, y)
    p_depth, sweep, c = _curve_from_num(data, sc, num, num_steps,
                                        depth_min, depth_max)
    cost_now = c[:, num_steps]                # never depth-range-masked
    # fori parity: the COST_MAX/current-depth init only loses to a STRICTLY
    # cheaper step, and the earliest minimal step wins ties — a leading
    # virtual column + first-min argmin reproduces both
    sweep_ext = jnp.concatenate(
        [jnp.full_like(cost_now[:, None], COST_MAX), sweep], axis=1)
    depth_ext = jnp.concatenate([sc.depth[:, None], p_depth], axis=1)
    best = jnp.argmin(sweep_ext, axis=-1)
    min_cost = jnp.take_along_axis(sweep_ext, best[:, None], 1)[:, 0]
    best_depth = jnp.take_along_axis(depth_ext, best[:, None], 1)[:, 0]
    improve = (cost_now - min_cost) > 0.1
    ok = sc.ok & (sc.wnorm > 0) & fetch(state.valid, x, y)
    return jnp.where(improve & ok, best_depth, sc.depth)


def local_refine(data: CostData, state: PMState, x, y, use_sa: bool,
                 geom: bool, geom_factor, depth_min, depth_max,
                 strong_radius=5, strong_increment=2,
                 sweep_k: int = _MAX_SWEEP_VIEWS):
    """±5 one-pixel-disparity local depth sweep at fixed normal; replaces the
    depth when the cost improves by > 0.1 (reference: LocalRefine,
    APD.cu:2346-2432). Returns new depth values for the batch."""
    xf = x.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    setup = _sweep_setup(data, state, x, y, sweep_k)
    win = precompute_ref_window(data, xf, yf, strong_radius, strong_increment,
                                use_sa)
    cost_now = _sweep_cost(data, setup, win, x, y, setup.depth, geom,
                           geom_factor, -jnp.inf, jnp.inf)

    def step(i, carry):
        best_cost, best_depth = carry
        p_disp = (i - 5).astype(jnp.float32)
        p_depth = data.ref_cam.fx * setup.base_line \
            / jnp.where(setup.disp + p_disp != 0, setup.disp + p_disp, 1e-20)
        c = _sweep_cost(data, setup, win, x, y, p_depth, geom, geom_factor,
                        depth_min, depth_max)
        better = c < best_cost
        return i + 1, (jnp.where(better, c, best_cost),
                       jnp.where(better, p_depth, best_depth))

    init = (jnp.full_like(cost_now, COST_MAX), setup.depth)
    min_cost, best_depth = jax.lax.fori_loop(
        0, 11, lambda i, c: step(i, c)[1], init)
    improve = (cost_now - min_cost) > 0.1
    ok = setup.ok & (setup.wnorm > 0) & fetch(state.valid, x, y)
    return jnp.where(improve & ok, best_depth, setup.depth)

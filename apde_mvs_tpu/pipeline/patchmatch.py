"""Per-view PatchMatch engine — the device-side orchestration of one pass
(reference: APD::RunPatchMatch, APD.cu:2663-2737).

Host-level structure of one pass:

1.  [APD] nearest-strong transform -> anchor generation over the compacted
    weak list -> demote anchorless weak pixels (one jitted stage)
2.  initialization (random planes or loaded depth/normal) + initial cost and
    top-k view selection
3.  max_iterations x { strong sweep (black, red); [APD] fit-plane RANSAC +
    fused weak sweep } — a single jitted core
4.  plane -> (world normal, depth); strong median filter (black, red)
5.  reliability reclassification (DepthToWeak), chunked over pixels
6.  [geom|APD] confidence; local refine, chunked

Jitted stages are cached per (shape, source count, weak bucket, flag set).
The weak-pixel list is compacted on the host once per pass (the weak set is
fixed during a pass's iterations, as in the reference) and padded to bucketed
sizes to bound recompilation.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ANCHOR_NUM, STRONG, UNKNOWN, WEAK, PatchMatchParams
from ..core import geometry as geo
from ..ops import anchors as anchor_ops
from ..ops import filters, init as init_ops
from ..ops.cost import CostData
from ..ops.propagation import PropCfg, propagate_strong, propagate_weak
from ..ops.state import PMState


class StaticCfg(NamedTuple):
    """Hashable jit-static configuration of a pass."""

    prop: PropCfg
    use_apd: bool
    max_iterations: int
    rotate_time: int


def _bucket(n: int, minimum: int = 4096) -> int:
    """Pad a dynamic count to a 4x-growth bucket.

    The weak count differs per view, and every distinct bucket size compiles
    a fresh kernel set (minutes on TPU); coarse buckets mean at most ~5
    distinct sizes ever exist per scan, at the cost of up to 4x masked lanes
    in the (cheap, minority-pixel) weak sweeps."""
    b = minimum
    while b < n:
        b *= 4
    return b


def pad_to_multiple(arr: np.ndarray, mh: int, mw: int, mode="edge"):
    h, w = arr.shape[:2]
    ph = (-h) % mh
    pw = (-w) % mw
    if ph == 0 and pw == 0:
        return arr
    pad = [(0, ph), (0, pw)] + [(0, 0)] * (arr.ndim - 2)
    return np.pad(arr, pad, mode=mode)


class PatchMatchOutputs(NamedTuple):
    depth: np.ndarray        # (H, W) f32
    normal: np.ndarray       # (H, W, 3) world-frame
    weak: np.ndarray         # (H, W) uint8
    confidence: np.ndarray   # (H, W) uint8
    cost: np.ndarray         # (H, W) f32
    anchors: Optional[np.ndarray]       # (Nw, 9, 2) int32 (APD passes)
    anchors_map: Optional[np.ndarray]   # (H, W) int32
    reliable_curve: Optional[np.ndarray]
    nearest_strong: Optional[np.ndarray] = None   # (H, W, 2) int32 debug
    fit_normal: Optional[np.ndarray] = None       # (Nw, 4) debug


@functools.lru_cache(maxsize=64)
def _jit_apd_setup(shape, num_src, cfg: StaticCfg, nw: int,
                   radius_budget: int):
    def f(data, state, weak_x, weak_y, weak_valid, key, ransac_threshold,
          depth_min, depth_max):
        ns = anchor_ops.nearest_strong_jfa(state.weak, state.confidence,
                                           state.valid)
        res = anchor_ops.gen_anchors(
            key, data, state, weak_x, weak_y, weak_valid, cfg.rotate_time,
            ransac_threshold, depth_min, depth_max, ns,
            radius_budget=radius_budget)
        state = anchor_ops.neighbor_update(state, weak_x, weak_y, weak_valid,
                                           res.reliable)
        return state, res.anchors, res.reliable
    return jax.jit(f)


@functools.lru_cache(maxsize=64)
def _jit_init(shape, num_src, cfg: StaticCfg, nw: int, first_init: bool):
    params = PatchMatchParams(
        strong_radius=cfg.prop.strong_radius,
        strong_increment=cfg.prop.strong_increment,
        weak_radius=cfg.prop.weak_radius,
        weak_increment=cfg.prop.weak_increment,
        use_sa=cfg.prop.use_sa, top_k=cfg.prop.top_k)

    def f(data, state, key, depth_min, depth_max, weak_x, weak_y, weak_valid,
          anchors):
        if first_init:
            planes = init_ops.random_planes(key, data, depth_min, depth_max)
        else:
            planes = filters.depth_normal_to_planes(
                data, state.planes[..., 3], state.planes[..., :3])
        state = state.replace(planes=planes)
        h, w = shape
        chunk = (1 << 19) if h * w > (1 << 20) else None
        return init_ops.initial_cost(
            data, state, params, cfg.use_apd and nw > 0,
            weak_x, weak_y, weak_valid, anchors, chunk=chunk)
    return jax.jit(f)


@functools.lru_cache(maxsize=64)
def _jit_iterations(shape, num_src, cfg: StaticCfg, nw: int):
    """The iteration loop as nested lax.scans so every repeated stage (color
    sweeps, iterations) compiles exactly one body — XLA:TPU compile time is
    proportional to the number of distinct NCC bodies, not iterations."""

    def f(data, state, key, weak_x, weak_y, weak_valid, anchors,
          depth_min, depth_max, geom_factor):
        def color_sweep(carry, inp):
            state, it = carry
            color, kc = inp
            state = propagate_strong(data, state, cfg.prop, it, kc, color,
                                     depth_min, depth_max, geom_factor)
            return (state, it), None

        def iter_body(state, inp):
            it, k = inp
            k1, k2, k3 = jax.random.split(k, 3)
            kcs = jax.random.split(k1, 2)
            (state, _), _ = jax.lax.scan(
                color_sweep, (state, it), (jnp.arange(2), kcs))
            if cfg.use_apd and nw > 0:
                fit = anchor_ops.ransac_fit_planes(
                    k2, data, state, weak_x, weak_y, weak_valid, anchors)
                state = propagate_weak(
                    data, state, cfg.prop, it, k3, weak_x, weak_y, weak_valid,
                    anchors, fit, depth_min, depth_max, geom_factor)
            return state, None

        keys = jax.random.split(key, cfg.max_iterations)
        state, _ = jax.lax.scan(
            iter_body, state, (jnp.arange(cfg.max_iterations), keys))
        # plane -> (world normal, depth); median filter both colors in order
        state = state.replace(planes=filters.planes_to_depth_normal(
            data, state.planes))
        state, _ = jax.lax.scan(
            lambda st, color: (filters.median_filter_color(st, color), None),
            state, jnp.arange(2))
        return state
    return jax.jit(f)


@functools.lru_cache(maxsize=64)
def _jit_classify(shape, num_src, cfg: StaticCfg, chunk: int,
                  return_curve: bool, sweep_k: int):
    def f(data, state, x, y, weak_peak_radius, geom_factor, depth_min,
          depth_max):
        return filters.depth_to_weak(
            data, state, x, y, weak_peak_radius, cfg.prop.use_sa,
            cfg.prop.geom_consistency, geom_factor, depth_min, depth_max,
            cfg.prop.strong_radius, cfg.prop.strong_increment,
            return_curve=return_curve, sweep_k=sweep_k)
    return jax.jit(f)


@functools.lru_cache(maxsize=64)
def _jit_local_refine(shape, num_src, cfg: StaticCfg, chunk: int,
                      sweep_k: int):
    def f(data, state, x, y, geom_factor, depth_min, depth_max):
        return filters.local_refine(
            data, state, x, y, cfg.prop.use_sa, cfg.prop.geom_consistency,
            geom_factor, depth_min, depth_max,
            cfg.prop.strong_radius, cfg.prop.strong_increment,
            sweep_k=sweep_k)
    return jax.jit(f)


def _sweep_view_bucket(max_selected: int, num_src: int) -> int:
    """Static slot count for the classify/refine view compaction: the sweeps
    cost linearly in the slot count, and the per-pixel selection rarely
    exceeds top_k (4), so sweeping the historical fixed 8 slots doubled the
    classification cost for nothing. Bucketed so few kernel variants
    compile. The bucket must COVER max_selected: a cap below it would drop
    selected views from the slot numerator while wnorm still counts their
    weights, biasing sweep costs low (and _sweep_cost's slot/all-views
    paths would disagree); pixels can select up to NUM_SAMPLES (15)
    distinct views via Monte-Carlo selection, more on initial-cost ties."""
    for b in (2, 4, 8, 16, 32):
        if max_selected <= b:
            return min(b, max(num_src, 1))
    return max(num_src, 1)


@functools.lru_cache(maxsize=64)
def _jit_confidence(shape, num_src):
    return jax.jit(filters.compute_confidence)


def run_patchmatch(
    data: CostData,
    params: PatchMatchParams,
    *,
    prior_depth: Optional[np.ndarray] = None,
    prior_normal: Optional[np.ndarray] = None,
    prior_weak: Optional[np.ndarray] = None,
    prior_confidence: Optional[np.ndarray] = None,
    valid: Optional[jnp.ndarray] = None,
    depth_min: float,
    depth_max: float,
    seed: int = 0,
    classify_chunk: int = 1 << 16,
    export_curve: bool = False,
    export_debug: bool = False,
    anchor_radius_budget: int = 25,
) -> PatchMatchOutputs:
    """Run one full PatchMatch pass for one reference view.

    `data` carries the (padded) images/cameras/depths; priors are the loaded
    previous-iteration maps at the same padded resolution.
    """
    h, w = data.height, data.width
    S = data.num_src
    shape = (h, w)
    first_init = params.state == "first_init"
    use_apd = bool(params.use_apd) and not first_init
    cfg = StaticCfg(
        prop=PropCfg(
            top_k=params.top_k,
            geom_consistency=bool(params.geom_consistency),
            use_impetus=bool(params.use_impetus),
            use_sa=bool(params.use_sa),
            refine_init=(params.state == "refine_init"),
            strong_radius=params.strong_radius,
            strong_increment=params.strong_increment,
            weak_radius=params.weak_radius,
            weak_increment=params.weak_increment),
        use_apd=use_apd,
        max_iterations=params.max_iterations,
        rotate_time=params.rotate_time)

    if valid is None:
        valid = jnp.ones((h, w), bool)
    state = PMState.create(h, w, S, valid=valid)
    if prior_weak is not None and use_apd:
        weak_dev = jnp.where(valid, jnp.asarray(prior_weak, jnp.int32), UNKNOWN)
        state = state.replace(weak=weak_dev)
    if prior_confidence is not None:
        state = state.replace(
            confidence=jnp.asarray(prior_confidence, jnp.float32))
    if prior_depth is not None:
        planes = jnp.concatenate(
            [jnp.asarray(prior_normal, jnp.float32),
             jnp.asarray(prior_depth, jnp.float32)[..., None]], axis=-1)
        state = state.replace(planes=planes)

    dmin = jnp.float32(depth_min)
    dmax = jnp.float32(depth_max)
    gf = jnp.float32(params.geom_factor)
    key = jax.random.PRNGKey(seed)

    # ---- weak-pixel compaction (host; the weak set is fixed for the pass) --
    anchors = jnp.zeros((1, ANCHOR_NUM, 2), jnp.int32) - 1
    weak_x = jnp.zeros((1,), jnp.int32)
    weak_y = jnp.zeros((1,), jnp.int32)
    weak_valid = jnp.zeros((1,), bool)
    nw = 0
    anchors_map_np = None
    if use_apd:
        weak_np = np.asarray(state.weak)
        wy, wx = np.nonzero(weak_np == WEAK)
        nw = len(wx)
        if nw > 0:
            cap = _bucket(nw)
            weak_x = jnp.asarray(np.pad(wx, (0, cap - nw)), jnp.int32)
            weak_y = jnp.asarray(np.pad(wy, (0, cap - nw)), jnp.int32)
            weak_valid = jnp.asarray(
                np.arange(cap) < nw)
            anchors_map_np = np.full((h, w), -1, np.int32)
            anchors_map_np[wy, wx] = np.arange(nw)
            key, k_anchor = jax.random.split(key)
            setup = _jit_apd_setup(shape, S, cfg, cap, anchor_radius_budget)
            state, anchors, _rel = setup(
                data, state, weak_x, weak_y, weak_valid, k_anchor,
                jnp.float32(params.ransac_threshold), dmin, dmax)

    # optional per-stage wall-clock (APDE_STAGE_TIMING=1): forces a device
    # sync per stage, so only enable when measuring
    import os as _os
    import time as _time
    _timing = _os.environ.get("APDE_STAGE_TIMING") == "1"
    _marks = [("start", _time.time())]

    def _mark(name, *sync):
        if _timing:
            for a in sync:
                jax.block_until_ready(a)
            _marks.append((name, _time.time()))

    # ---- init + iterations ------------------------------------------------
    key, k_init, k_iter = jax.random.split(key, 3)
    nw_cap = int(weak_x.shape[0]) if nw > 0 else 0
    _mark("apd_setup", state.weak)
    state = _jit_init(shape, S, cfg, nw_cap, first_init)(
        data, state, k_init, dmin, dmax, weak_x, weak_y, weak_valid, anchors)
    state = _jit_iterations(shape, S, cfg, nw_cap)(
        data, state, k_iter, weak_x, weak_y, weak_valid, anchors,
        dmin, dmax, gf)
    _mark("init+sweeps", state.costs)

    # ---- reliability classification (compacted + chunked) -----------------
    # Pixels the sweep would classify UNKNOWN without sampling anything
    # (margins, padding, zero depth, empty selection — the guard conditions
    # of DepthToWeak, APD.cu:2107-2119) are skipped on the host, and the
    # sweeps' per-pixel view slots shrink to the actual max selection count:
    # both cut the dominant 61-step sweep cost without changing any output.
    total = h * w
    sel_count_map = np.asarray(state.selected.sum(-1))
    depth_map = np.asarray(state.planes[..., 3])
    valid_np = np.asarray(state.valid)
    sweep_k = _sweep_view_bucket(int(sel_count_map.max()), S)
    min_margin = 6
    ys_g, xs_g = np.mgrid[0:h, 0:w]
    margin_np = (xs_g < min_margin) | (ys_g < min_margin) \
        | (xs_g >= data.img_w - min_margin) | (ys_g >= data.img_h - min_margin)
    sweepable = valid_np & (depth_map != 0.0) & (sel_count_map > 0)
    chunk = min(classify_chunk, total)

    def _chunked(fn, mask):
        """Run a flat-pixel-batch jit over mask's pixels in fixed chunks;
        yields ((rows, cols), flat results)."""
        cyy, cxx = np.nonzero(mask)
        n = len(cxx)
        if n == 0:
            return (cyy, cxx), []
        pad = (-n) % chunk
        cx_p = np.pad(cxx, (0, pad)).astype(np.int32)
        cy_p = np.pad(cyy, (0, pad)).astype(np.int32)
        outs = [fn(jnp.asarray(cx_p[s * chunk:(s + 1) * chunk]),
                   jnp.asarray(cy_p[s * chunk:(s + 1) * chunk]))
                for s in range(len(cx_p) // chunk)]
        return (cyy, cxx), outs

    classify = _jit_classify(shape, S, cfg, chunk, export_curve, sweep_k)
    # curve export is a debug mode: sweep everything so the exported curve
    # covers every pixel, as the reference's exporter does
    cls_mask = np.ones((h, w), bool) if export_curve \
        else (sweepable & ~margin_np)
    (cls_y, cls_x), outs = _chunked(
        lambda cx, cy: classify(data, state, cx, cy,
                                jnp.int32(params.weak_peak_radius), gf,
                                dmin, dmax), cls_mask)
    weak_map = np.full((h, w), UNKNOWN, np.int32)
    reliable_curve = None
    if outs:
        weak_map[cls_y, cls_x] = np.concatenate(
            [np.asarray(o[0]) for o in outs])[:len(cls_x)]
        if export_curve:
            reliable_curve = np.zeros(
                (h, w, np.asarray(outs[0][1]).shape[-1]), np.float32)
            reliable_curve[cls_y, cls_x] = np.concatenate(
                [np.asarray(o[1]) for o in outs])[:len(cls_x)]
    state = state.replace(weak=jnp.asarray(weak_map, jnp.int32))
    _mark("classify", state.weak)

    # ---- confidence + local refine ----------------------------------------
    if params.geom_consistency or use_apd:
        state = _jit_confidence(shape, S)(data, state)
    _mark("confidence", state.confidence)
    refine = _jit_local_refine(shape, S, cfg, chunk, sweep_k)
    (ref_y, ref_x), outs = _chunked(
        lambda cx, cy: refine(data, state, cx, cy, gf, dmin, dmax), sweepable)
    depth_map = depth_map.copy()
    if outs:
        depth_map[ref_y, ref_x] = np.concatenate(
            [np.asarray(o) for o in outs])[:len(ref_x)]
    state = state.replace(
        planes=state.planes.at[..., 3].set(jnp.asarray(depth_map)))
    _mark("local_refine", state.planes)
    if _timing:
        spans = [f"{n} {(_marks[i + 1][1] - _marks[i][1]) * 1000:.0f}ms"
                 for i, (n, _) in enumerate(_marks[1:])]
        print("  stage timing: " + ", ".join(spans), flush=True)

    nearest_strong_np = fit_normal_np = None
    if export_debug and use_apd and nw > 0:
        # debug capabilities mirroring the reference's (unused) exporters
        # ExportNearestStrong / ExportFitNormal (APD.cu:2600-2649)
        ns = anchor_ops.nearest_strong_jfa(state.weak, state.confidence,
                                           state.valid)
        nearest_strong_np = np.asarray(ns)
        cam_planes = filters.depth_normal_to_planes(
            data, state.planes[..., 3], state.planes[..., :3])
        fit = anchor_ops.ransac_fit_planes(
            jax.random.PRNGKey(seed ^ 0x5F17), data,
            state.replace(planes=cam_planes), weak_x, weak_y, weak_valid,
            anchors)
        fit_normal_np = np.asarray(fit)[:nw]

    planes_np = np.asarray(state.planes)
    return PatchMatchOutputs(
        depth=planes_np[..., 3].copy(),
        normal=planes_np[..., :3].copy(),
        weak=np.asarray(state.weak).astype(np.uint8),
        confidence=np.clip(np.asarray(state.confidence), 0, 255
                           ).astype(np.uint8),
        cost=np.asarray(state.costs),
        anchors=(np.asarray(anchors)[:nw] if use_apd and nw > 0 else None),
        anchors_map=anchors_map_np,
        reliable_curve=reliable_curve,
        nearest_strong=nearest_strong_np,
        fit_normal=fit_normal_np,
    )

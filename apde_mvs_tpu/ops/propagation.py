"""Checkerboard PatchMatch propagation sweeps.

The reference's red-black kernels (CheckerboardPropagationStrong/Weak,
APD.cu:1098-1692) become two batched evaluations per iteration:

- the *strong* sweep runs per color on the checkerboard-compacted half grid
  (candidates live on the opposite color, so black-then-red preserves the
  reference's intra-sweep data flow exactly);
- the *weak* sweep runs once over a compacted weak-pixel list — weak pixels
  read only strong pixels' state (their anchors) and never each other, so the
  reference's black/red split of the weak kernels is a no-op we drop.

Semantic notes carried over deliberately:
- invalid candidate regions contribute ~0 cost rows (the reference's C
  aggregate initialization `float cost_array[8][32] = {2.0f}` zero-fills all
  but the first element, APD.cu:1120/1464), and FindMinCostIndex's `<=` makes
  the *last* minimum win; both quirks shape which pixels adopt candidates and
  are reproduced.
- pixels whose Monte-Carlo view selection comes back empty (zero probability
  mass) hit a 0/0 in the reference; we define that case as "no update".
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import STRONG, WEAK
from ..core import checkerboard as cb
from ..core import geometry as geo
from ..core.sampling import fetch
from . import selection
from .cost import COST_MAX, CostData, GEOM_COST_MAX, geom_cost, \
    geom_selected, ncc_selected, ncc_strong, precompute_ref_window, \
    prefer_view_slots
from .deformable import WeakRefData, ncc_weak, ncc_weak_selected
from .state import PMState


class PropCfg(NamedTuple):
    """Jit-static propagation configuration."""

    top_k: int = 4
    geom_consistency: bool = False
    use_impetus: bool = True
    use_sa: bool = False
    refine_init: bool = False     # REFINE_INIT accept rule (improve > 0.1)
    strong_radius: int = 5
    strong_increment: int = 2
    weak_radius: int = 5
    weak_increment: int = 5


# ---------------------------------------------------------------------------
# Adaptive checkerboard candidate regions (reference: APD.cu:1119-1316).
# Region order matches the reference cost_array indexing:
# 0 up_near, 1 up_far, 2 down_near, 3 down_far,
# 4 left_near, 5 left_far, 6 right_near, 7 right_far.
# ---------------------------------------------------------------------------

def _near_offsets(axis: str, sign: int):
    if axis == "y":
        offs = [(0, sign)]
        for i in range(3):
            offs.append((-(i + 1), sign * (2 + i)))
            offs.append((+(i + 1), sign * (2 + i)))
    else:
        offs = [(sign, 0)]
        for i in range(3):
            offs.append((sign * (2 + i), -(i + 1)))
            offs.append((sign * (2 + i), +(i + 1)))
    return offs


def _far_offsets(axis: str, sign: int):
    if axis == "y":
        return [(0, sign * (3 + 2 * i)) for i in range(11)]
    return [(sign * (3 + 2 * i), 0) for i in range(11)]


_REGIONS = [
    _near_offsets("y", -1), _far_offsets("y", -1),
    _near_offsets("y", +1), _far_offsets("y", +1),
    _near_offsets("x", -1), _far_offsets("x", -1),
    _near_offsets("x", +1), _far_offsets("x", +1),
]


def checkerboard_candidates(costs: jnp.ndarray, x, y, row_bounds=None
                            ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Min-cost candidate position per region.

    costs: (H, W); x, y: (B,) int32. Returns (cand_x, cand_y (B, 8),
    flags (B, 8)). A region is valid iff its base offset is in-bounds; within
    a region the first position achieving the minimal cost wins (the
    reference's strict `<` scan order).

    `row_bounds=(lo, hi)` restricts valid rows to [lo, hi] — used by the
    halo-exchanged tile sweep, where the local array extends past the global
    image rows and the out-of-image halo must invalidate regions exactly as
    array bounds do in the unsharded sweep.

    Layout note: regions are evaluated one at a time in REGION-MAJOR (M, B)
    shape. A fused (B, 8, M) formulation puts (8, 11) on the tiled minor
    dims, which XLA:TPU lays out as T(8,128) — 11 lanes padded to 128 and
    every region's gather output live at once: 25 GB of temp at 6 MP
    (measured; an OOM at full ETH3D resolution). Region-major keeps B on
    the lane dim (no padding) and one region's gather live at a time:
    2.4 GB temp at the same size."""
    h, w = costs.shape
    cxs, cys, fls = [], [], []
    for r in range(8):
        offs = np.asarray(_REGIONS[r], np.int32)    # (M_r, 2), exact length
        px = x[None, :] + jnp.asarray(offs[:, 0])[:, None]   # (M, B)
        py = y[None, :] + jnp.asarray(offs[:, 1])[:, None]
        inb = (px >= 0) & (px < w) & (py >= 0) & (py < h)
        if row_bounds is not None:
            inb &= (py >= row_bounds[0]) & (py <= row_bounds[1])
        c = fetch(costs, px, py, fill=0.0)
        c = jnp.where(inb, c, jnp.inf)
        best = jnp.argmin(c, axis=0)                # first min (strict <)
        cxs.append(jnp.take_along_axis(px, best[None, :], 0)[0])
        cys.append(jnp.take_along_axis(py, best[None, :], 0)[0])
        fls.append(inb[0])                          # base position validity
    return jnp.stack(cxs, -1), jnp.stack(cys, -1), jnp.stack(fls, -1)


def last_min_index(vals: jnp.ndarray) -> jnp.ndarray:
    """Index of the last minimum along -1 (reference FindMinCostIndex's `<=`,
    APD.cu:60-71)."""
    n = vals.shape[-1]
    return n - 1 - jnp.argmin(vals[..., ::-1], axis=-1)


# ---------------------------------------------------------------------------
# Plane refinement hypotheses (reference: PlaneHypothesisRefinement*,
# APD.cu:950-1096).
# ---------------------------------------------------------------------------

class RefineRaws(NamedTuple):
    """Raw random draws of one refinement step, split from the deterministic
    tail so the static-band bounds pre-pass (ops.bands) can apply ONE shared
    draw to every possible sweep winner bitwise-identically."""

    u_rand: jnp.ndarray    # (B,) uniform [0,1) -> full-range random depth
    g: jnp.ndarray         # (B, 3) gaussian -> random facing normal
    u_pert: jnp.ndarray    # (B,) uniform [0,1) -> ±2% depth perturbation
    angles: jnp.ndarray    # (B, 3) scaled Euler angles -> normal perturbation


def refinement_raws(key, shape) -> RefineRaws:
    """Draws in the exact key-split order of the historical fused sampler
    (jax.random.uniform(k, ..., a, b) == max(a, u01*(b-a)+a) bitwise, with
    u01 the minval=0/maxval=1 draw — verified against jax._src.random)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return RefineRaws(
        u_rand=jax.random.uniform(k1, shape, jnp.float32),
        g=jax.random.normal(k2, shape + (3,), dtype=jnp.float32),
        u_pert=jax.random.uniform(k3, shape, jnp.float32),
        angles=(jax.random.uniform(k4, shape + (3,), dtype=jnp.float32)
                - 0.5) * (0.02 * jnp.pi))


def refinement_from_raws(raws: RefineRaws, cam: geo.CameraArrays, x, y,
                         cur_plane, cur_depth, depth_min, depth_max):
    """Deterministic tail of `refinement_hypotheses` given the raw draws."""
    d_rand = jax.lax.max(jnp.asarray(depth_min, jnp.float32),
                         raws.u_rand * (depth_max - depth_min) + depth_min)
    n_rand = geo.unit_normal_facing_from_gaussian(raws.g, cam, x, y,
                                                  cur_depth)
    lo = 0.98 * cur_depth
    d_pert = jax.lax.max(lo, raws.u_pert * (1.02 * cur_depth - lo) + lo)
    n_cur = cur_plane[..., :3]
    n_pert = geo.perturbed_normal_from_angles(raws.angles, cam, x, y, n_cur)
    depths = jnp.stack([d_rand, cur_depth, d_rand, cur_depth, d_pert], -1)
    normals = jnp.stack([n_cur, n_rand, n_rand, n_pert, n_cur], -2)
    return depths, normals


def refinement_hypotheses(key, cam: geo.CameraArrays, x, y, cur_plane,
                          cur_depth, depth_min, depth_max):
    """The 5 (depth, normal) refinement combos. Returns (depths (B, 5),
    normals (B, 5, 3)). The reference's do-while depth-perturbation loop has a
    condition that can never hold (`< depth_min && > depth_max`), i.e. it
    samples exactly once; so do we."""
    return refinement_from_raws(refinement_raws(key, x.shape), cam, x, y,
                                cur_plane, cur_depth, depth_min, depth_max)


# ---------------------------------------------------------------------------
# Pixel-chunked sweep execution.
#
# A sweep body materializes (B, hyp, S) cost tensors and (B, taps) window
# intermediates; at full ETH3D resolution (6048x4032 -> B = 12.2M per color)
# the unchunked working set exceeds v5e HBM. Same-color checkerboard pixels
# never read each other's state (all candidate/neighbor offsets have odd
# parity), so the sweep splits into fixed-size pixel chunks under lax.scan
# with identical semantics. Below the threshold the body runs unchunked and
# bitwise-matches the historical single-batch behavior (all test scenes and
# the bench run unchunked; per-chunk PRNG keys fold in the chunk index, so
# chunked draws differ from unchunked ones statistically-equivalently).
# ---------------------------------------------------------------------------

_SWEEP_CHUNK = int(os.environ.get("APDE_SWEEP_CHUNK", 1 << 19))
# the deformable sweep carries (B, anchors=8, taps=36) windows — ~10x the
# strong sweep's per-pixel footprint — so its chunk is 4x smaller
_WEAK_SWEEP_CHUNK = int(os.environ.get("APDE_WEAK_SWEEP_CHUNK", 1 << 17))


def _run_chunked(body, k_sel, k_ref, arrays, n, chunk=None):
    """Run `body(k_sel, k_ref, *per_pixel_slices)` over the length-n leading
    axis of `arrays`, in chunks when n exceeds the sweep-chunk threshold.
    Returns the body's output tuple, reassembled to length n."""
    chunk = chunk or _SWEEP_CHUNK
    if n <= chunk:
        return body(k_sel, k_ref, *arrays)
    pad = (-n) % chunk
    nc = (n + pad) // chunk
    stacked = [jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))
               .reshape((nc, chunk) + a.shape[1:]) for a in arrays]

    def step(ci, slices):
        outs = body(jax.random.fold_in(k_sel, ci),
                    jax.random.fold_in(k_ref, ci), *slices)
        return ci + 1, outs

    _, outs = jax.lax.scan(step, 0, tuple(stacked))
    return tuple(o.reshape((nc * chunk,) + o.shape[2:])[:n] for o in outs)


# ---------------------------------------------------------------------------
# Strong sweep (one checkerboard color)
# ---------------------------------------------------------------------------

def _strong_body(data: CostData, state: PMState, cfg: PropCfg, iteration,
                 k_sel, k_ref, x, y, depth_min, depth_max, geom_factor,
                 row_bounds, view_origins=None, band_refine: bool = True):
    """Candidate evaluation + view selection + refinement for one flat batch
    of same-color pixels. Returns (planes_out, costs_out, sel_new, vw).

    `view_origins`: optional (S,) static band origins covering every
    candidate / current / non-random-depth refinement gather of this batch
    (ops.bands.strong_sweep_bounds; the host driver dispatches this banded
    variant only for chunks whose pre-pass said every bound fits). The two
    full-range random-depth refinement slots always gather the full table —
    their per-pixel depths span the whole range, so their bounds are
    rig-dependent; keeping them plain makes banding rig-independent."""
    S = data.num_src
    xf = x.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    cam = data.ref_cam

    cand_x, cand_y, flags = checkerboard_candidates(state.costs, x, y,
                                                    row_bounds)
    cand_planes = fetch(state.planes, cand_x, cand_y)          # (B, 8, 4)
    cur_plane = fetch(state.planes, x, y)

    win = precompute_ref_window(data, xf, yf, cfg.strong_radius,
                                cfg.strong_increment, cfg.use_sa)

    if view_origins is None:
        data_band = data
    else:
        # hoist ONE band slice per view out of all candidate/refine scans
        from .bands import banded_view_tables
        data_band = banded_view_tables(data, view_origins)

    def cand_cost(c, _):
        costs_c = ncc_strong(data_band, xf, yf, cand_planes[:, c], win,
                             origins=view_origins)             # (B, S)
        return c + 1, costs_c

    _, cost_array = jax.lax.scan(cand_cost, 0, None, length=8)
    cost_array = jnp.moveaxis(cost_array, 0, 1)                # (B, 8, S)
    # invalid regions keep ~zero rows (C aggregate-init quirk, see module
    # doc) EXCEPT element [0][0]: `float cost_array[8][32] = {2.0f}`
    # (APD.cu:1120) leaves 2.0 in the very first slot, so an invalid region
    # 0 contributes cost 2.0 to view 0 — it counts toward that view's
    # count_false (2.0 > 1.2) and adds vw[0]*2.0 to final_costs[0]
    cost_array = jnp.where(flags[..., None], cost_array, 0.0)
    cost_array = cost_array.at[:, 0, 0].set(
        jnp.where(flags[:, 0], cost_array[:, 0, 0], 2.0))

    # view selection
    nb_x = jnp.stack([x, x, x - 1, x + 1], -1)
    nb_y = jnp.stack([y - 1, y + 1, y, y], -1)
    nb_sel = fetch(state.selected, nb_x, nb_y)                 # (B, 4, S)
    nb_valid = flags[:, jnp.asarray([0, 2, 4, 6])]
    priors = selection.view_selection_priors(nb_sel, nb_valid)
    probs = selection.sampling_probabilities(cost_array, priors, iteration)
    vw, temp_sel, wnorm = selection.monte_carlo_view_weights(k_sel, probs)
    has_views = wnorm > 0
    inv_norm = jnp.where(has_views, 1.0 / jnp.maximum(wnorm, 1e-20), 0.0)

    final_costs = (vw[:, None, :] * cost_array).sum(-1) * inv_norm[:, None]

    # current plane + refinement hypotheses are weighted sums over the
    # Monte-Carlo-selected views only; views with zero weight contribute
    # nothing in the reference's sums (APD.cu:1405-1412, 988-996). For large
    # source sets the voted views are compacted into per-pixel slots;
    # otherwise the direct all-views path samples cheaper (static choice by
    # measured gather economics, cost.prefer_view_slots). Capacity must
    # cover every possible distinct vote (NUM_SAMPLES draws) — a smaller cap
    # would drop views from the numerator while inv_norm still counts their
    # votes, biasing slot-path costs low vs the all-views sums.
    K = min(S, selection.NUM_SAMPLES)
    use_compact = prefer_view_slots(data, K)
    if use_compact:
        voted = vw > 0
        slot_idx = jnp.argsort(~voted, axis=-1,
                               stable=True)[:, :K].astype(jnp.int32)
        slot_valid = jnp.take_along_axis(voted, slot_idx, -1)
        slot_w = jnp.take_along_axis(vw, slot_idx, -1)

        # normalize by the KEPT slots' weight sum: equal to wnorm whenever
        # every voted view fits (guaranteed by K = NUM_SAMPLES), and a
        # consistent weighted mean rather than a biased-low sum otherwise
        kept = (slot_w * slot_valid).sum(-1)
        inv_kept = jnp.where(kept > 0, 1.0 / jnp.maximum(kept, 1e-20), 0.0)

        def weighted_cost(plane, origins=None):
            cv = ncc_selected(data, xf, yf, plane, win, slot_idx, slot_valid)
            if cfg.geom_consistency and cfg.use_impetus:
                cv = cv + geom_factor * geom_selected(data, xf, yf, plane,
                                                      slot_idx, slot_valid)
            cv = jnp.where(slot_valid, cv, 0.0)
            return (slot_w * cv).sum(-1) * inv_kept
    else:
        def weighted_cost(plane, origins=None):
            # data_band is only valid for rebased gathers; geom reads
            # src_depths, which banding leaves intact
            d_ = data if origins is None else data_band
            cv = ncc_strong(d_, xf, yf, plane, win, origins=origins)
            if cfg.geom_consistency and cfg.use_impetus:
                cv = cv + geom_factor * geom_cost(data, xf, yf, plane)
            return (vw * cv).sum(-1) * inv_norm

    cost_now = weighted_cost(cur_plane, origins=view_origins)
    cost_recomputed = jnp.where(has_views, cost_now, COST_MAX)

    # adopt best candidate (last-min wins ties)
    best = last_min_index(final_costs)
    best_plane = jnp.take_along_axis(
        cand_planes, best[:, None, None].repeat(4, -1), 1)[:, 0]
    best_cost = jnp.take_along_axis(final_costs, best[:, None], 1)[:, 0]
    best_flag = jnp.take_along_axis(flags, best[:, None], 1)[:, 0]
    depth_before = geo.depth_from_plane(cam, best_plane, xf, yf)
    adopt = best_flag & (depth_before >= depth_min) & (depth_before <= depth_max) \
        & (best_cost < cost_recomputed) & has_views
    plane_cur = jnp.where(adopt[:, None], best_plane, cur_plane)
    cost_cur = jnp.where(adopt, best_cost, cost_recomputed)
    sel_new = jnp.where(adopt[:, None], temp_sel, fetch(state.selected, x, y))

    # refinement (5 hypotheses; geom only under impetus gating)
    depth_cur = geo.depth_from_plane(cam, plane_cur, xf, yf)
    r_depths, r_normals = refinement_hypotheses(
        k_ref, cam, xf, yf, plane_cur, depth_cur, depth_min, depth_max)

    if view_origins is None or not band_refine:
        # plain path — and the base-only-banded path (bands.BAND_REFINE_SLOTS
        # off): every refinement probe gathers the full table; the bounds
        # pre-pass then only had to cover candidates + current, which fits
        # far more chunks (benchmarks/strong_span_stats.json)
        def refine_cost(i, _):
            plane_i = geo.make_plane(cam, xf, yf, r_depths[:, i],
                                     r_normals[:, i])
            ci = weighted_cost(plane_i)
            d_i = geo.depth_from_plane(cam, plane_i, xf, yf)
            ok = (d_i >= depth_min) & (d_i <= depth_max) & has_views
            return i + 1, (jnp.where(ok, ci, jnp.inf), plane_i)

        _, (r_costs, r_planes) = jax.lax.scan(refine_cost, 0, None, length=5)
        r_costs = jnp.moveaxis(r_costs, 0, 1)                  # (B, 5)
        r_planes = jnp.moveaxis(r_planes, 0, 1)                # (B, 5, 4)
    else:
        # banded variant: the anchored slots (3: perturbed normal at the
        # current depth, 4: current normal at ±2% depth) ride the band; the
        # full-range random-depth slots (0, 2) AND the random-normal slot
        # (1) keep the plain full-table gather (a random unit normal is
        # near-degenerate for some pixel in any chunk-sized batch — 0% fit
        # measured with slot 1 in the union). Costs and slot order are
        # bitwise those of the single-scan path.
        def refine_one(i, origins):
            plane_i = geo.make_plane(cam, xf, yf, r_depths[:, i],
                                     r_normals[:, i])
            ci = weighted_cost(plane_i, origins=origins)
            d_i = geo.depth_from_plane(cam, plane_i, xf, yf)
            ok = (d_i >= depth_min) & (d_i <= depth_max) & has_views
            return jnp.where(ok, ci, jnp.inf), plane_i

        def banded_scan(i, _):
            slot = jnp.asarray([3, 4], jnp.int32)[i]
            out = refine_one(slot, view_origins)
            return i + 1, out

        def plain_scan(i, _):
            slot = jnp.asarray([0, 1, 2], jnp.int32)[i]
            out = refine_one(slot, None)
            return i + 1, out

        _, (cb_, pb_) = jax.lax.scan(banded_scan, 0, None, length=2)
        _, (cp_, pp_) = jax.lax.scan(plain_scan, 0, None, length=3)
        # reassemble in slot order 0..4
        r_costs = jnp.stack([cp_[0], cp_[1], cp_[2], cb_[0], cb_[1]], axis=1)
        r_planes = jnp.stack([pp_[0], pp_[1], pp_[2], pb_[0], pb_[1]], axis=1)
    r_best = jnp.argmin(r_costs, -1)
    r_cost = jnp.take_along_axis(r_costs, r_best[:, None], 1)[:, 0]
    r_plane = jnp.take_along_axis(
        r_planes, r_best[:, None, None].repeat(4, -1), 1)[:, 0]
    take_ref = r_cost < cost_cur
    plane_cur = jnp.where(take_ref[:, None], r_plane, plane_cur)
    cost_cur = jnp.where(take_ref, r_cost, cost_cur)

    # commit (REFINE_INIT needs a 0.1 improvement; reference APD.cu:1430-1439)
    if cfg.refine_init:
        commit = cost_cur < cost_recomputed - 0.1
        planes_out = jnp.where(commit[:, None], plane_cur, cur_plane)
        costs_out = jnp.where(commit, cost_cur, cost_recomputed)
    else:
        planes_out = plane_cur
        costs_out = cost_cur
    return planes_out, costs_out, sel_new, vw


def propagate_strong(data: CostData, state: PMState, cfg: PropCfg,
                     iteration, key, color: int, depth_min, depth_max,
                     geom_factor, row_bounds=None) -> PMState:
    h, w = state.costs.shape
    xs2, ys2 = cb.color_coords(h, w, color)
    x = xs2.reshape(-1)
    y = ys2.reshape(-1)
    B = x.shape[0]

    weak_c = cb.gather_color(state.weak, color).reshape(-1)
    valid_c = cb.gather_color(state.valid, color).reshape(-1)
    active = (weak_c != WEAK) & valid_c

    key, k_sel = jax.random.split(key)
    key, k_ref = jax.random.split(key)

    def body(ks, kr, xc, yc):
        return _strong_body(data, state, cfg, iteration, ks, kr, xc, yc,
                            depth_min, depth_max, geom_factor, row_bounds)

    planes_out, costs_out, sel_new, vw = _run_chunked(
        body, k_sel, k_ref, (x, y), B)

    # scatter back (only active pixels change)
    def put(full, vals_flat, old_flat):
        vals = jnp.where(
            active.reshape(active.shape + (1,) * (vals_flat.ndim - 1)),
            vals_flat, old_flat)
        return cb.scatter_color(full, vals.reshape((h, w // 2) + vals.shape[1:]),
                                color)

    old_planes = fetch(state.planes, x, y)
    old_costs = fetch(state.costs, x, y)
    old_sel = fetch(state.selected, x, y)
    old_vw = fetch(state.view_weights, x, y)
    return state.replace(
        planes=put(state.planes, planes_out, old_planes),
        costs=put(state.costs, costs_out, old_costs),
        selected=put(state.selected, sel_new, old_sel),
        view_weights=put(state.view_weights, vw, old_vw),
    )


# ---------------------------------------------------------------------------
# Host-dispatched sweeps for very large images.
#
# One XLA program that runs a whole iteration loop (or even one full-image
# color sweep) at ETH3D-native scale executes for minutes; the remote TPU
# worker kills such programs (observed: a ~25 s sweep program runs, a ~80 s
# one crashes the worker — benchmarks/sweep_size_probe.py). The host-mode
# drivers dispatch the SAME chunk body as the in-program path, one program
# per chunk (~15 s each), and commit with a single scatter program. Chunk
# semantics are identical (same-color pixels are independent); only PRNG
# draw grouping differs, and the mode is a static function of the shapes.
# ---------------------------------------------------------------------------

import functools as _functools


# banded vs plain chunk dispatch counts per site (diagnostics / tests):
# site -> [banded, plain]
BAND_DISPATCH_STATS = {"strong": [0, 0], "init": [0, 0], "view_major": [0, 0]}


_QUEUE_WINDOW = int(os.environ.get("APDE_QUEUE_WINDOW", "2"))
_DISPATCH_LOG = os.environ.get("APDE_DISPATCH_LOG") == "1"
# a single chunk program should finish in ~15 s; a sync that takes minutes
# means the worker wedged — always warn so production logs localize it
_STALL_WARN_S = float(os.environ.get("APDE_STALL_WARN_S", "120"))


def _throttle(outs, window: int = None, site: str = "?"):
    """Bound the device execution queue during host-dispatched chunk loops.

    Dispatch is async and XLA allocates each queued program's outputs and
    temp arena at enqueue: an unthrottled loop enqueues a whole iteration's
    worth of ~GB workspaces at once (observed RESOURCE_EXHAUSTED at 6 MP).
    A tiny HOST READBACK of a finished chunk is the only reliable sync
    through the remote tunnel (block_until_ready can return early —
    CLAUDE.md), so sync chunk i-window before dispatching chunk i+1.
    APDE_QUEUE_WINDOW overrides the default depth of 2 (1 = fully serial:
    the mid-pass worker-wedge investigation, PERF_NOTES r3).

    Diagnostics: APDE_DISPATCH_LOG=1 prints one timestamped line per sync
    (site label + chunk index); independently, any single sync exceeding
    APDE_STALL_WARN_S (default 120 s) prints a loud WEDGE warning so a hung
    run localizes itself to a site and chunk in the log."""
    import time as _t
    if window is None:
        window = _QUEUE_WINDOW
    if len(outs) >= window:
        t0 = _t.perf_counter()
        np.asarray(jax.tree_util.tree_leaves(outs[-window])[0].reshape(-1)[:1])
        dt = _t.perf_counter() - t0
        if _DISPATCH_LOG:
            print(f"[dispatch {_t.strftime('%H:%M:%S')}] {site} "
                  f"chunk {len(outs) - window} synced in {dt:.1f}s",
                  flush=True)
        if dt > _STALL_WARN_S:
            print(f"WEDGE WARNING: {site} chunk {len(outs) - window} sync "
                  f"took {dt:.0f}s (> {_STALL_WARN_S:.0f}s) — remote worker "
                  f"stall suspected", flush=True)


@_functools.lru_cache(maxsize=32)
def _strong_chunk_jit(cfg: PropCfg):
    def f(data, state, iteration, ks, kr, xc, yc, depth_min, depth_max,
          geom_factor):
        return _strong_body(data, state, cfg, iteration, ks, kr, xc, yc,
                            depth_min, depth_max, geom_factor, None)
    return jax.jit(f)


@_functools.lru_cache(maxsize=32)
def _strong_chunk_banded_jit(cfg: PropCfg, band_refine: bool = True):
    def f(data, state, iteration, ks, kr, xc, yc, origins, depth_min,
          depth_max, geom_factor):
        return _strong_body(data, state, cfg, iteration, ks, kr, xc, yc,
                            depth_min, depth_max, geom_factor, None,
                            view_origins=origins, band_refine=band_refine)
    return jax.jit(f)


@_functools.lru_cache(maxsize=32)
def _strong_prepass_jit(cfg: PropCfg, max_extent: int,
                        include_refine: bool = True):
    """ONE chunk's band bounds per program (a one-program-per-sweep scan
    over all chunks wedged the remote worker mid-pass; see
    bands.strong_chunk_bounds)."""
    def f(data, state, kr, x, y, depth_min, depth_max):
        from .bands import strong_chunk_bounds
        return strong_chunk_bounds(data, state, kr, x, y,
                                   depth_min, depth_max, max_extent,
                                   include_refine=include_refine)
    return jax.jit(f)


@_functools.lru_cache(maxsize=32)
def _strong_commit_jit(cfg: PropCfg):
    def f(state, color, planes_out, costs_out, sel_new, vw):
        h, w = state.costs.shape
        xs2, ys2 = cb.color_coords(h, w, color)
        x = xs2.reshape(-1)
        y = ys2.reshape(-1)
        B = x.shape[0]
        weak_c = cb.gather_color(state.weak, color).reshape(-1)
        valid_c = cb.gather_color(state.valid, color).reshape(-1)
        active = (weak_c != WEAK) & valid_c

        def put(full, vals_flat, old_flat):
            vals = jnp.where(
                active.reshape(active.shape + (1,) * (vals_flat.ndim - 1)),
                vals_flat[:B], old_flat)
            return cb.scatter_color(
                full, vals.reshape((h, w // 2) + vals.shape[1:]), color)

        return state.replace(
            planes=put(state.planes, planes_out, fetch(state.planes, x, y)),
            costs=put(state.costs, costs_out, fetch(state.costs, x, y)),
            selected=put(state.selected, sel_new,
                         fetch(state.selected, x, y)),
            view_weights=put(state.view_weights, vw,
                             fetch(state.view_weights, x, y)),
        )
    # donate the state: at 6 MP+ each un-donated commit allocates ~0.5 GB of
    # fresh state arrays per sweep and the allocator churn/fragmentation
    # eventually fails a large contiguous request (observed wandering
    # RESOURCE_EXHAUSTED at full-res)
    return jax.jit(f, static_argnames=("color",), donate_argnums=(0,))


def propagate_strong_host(data: CostData, state: PMState, cfg: PropCfg,
                          iteration, key, color: int, depth_min, depth_max,
                          geom_factor, chunk=None,
                          enable_bands: bool = True) -> PMState:
    """propagate_strong with one device program per pixel chunk (large
    images). Not usable inside a trace; pipeline code selects it statically
    by image size. `enable_bands=False` skips the static-band pre-pass —
    the caller knows the plane population cannot band (first_init's
    full-range random planes measured a 0% chunk fit rate, so the pre-pass
    would be pure overhead)."""
    chunk = chunk or _SWEEP_CHUNK
    h, w = state.costs.shape
    # chunk inputs in cb.color_coords order so the commit's (h, w//2)
    # reshape sees the exact layout the in-program path scatters
    xs2, ys2 = cb.color_coords(h, w, color)
    x_np = np.asarray(xs2).reshape(-1)
    y_np = np.asarray(ys2).reshape(-1)
    B = x_np.shape[0]
    key, k_sel = jax.random.split(key)
    key, k_ref = jax.random.split(key)
    pad = (-B) % chunk
    # edge-pad: padding lanes must repeat a REAL pixel so the band bounds
    # pre-pass covers exactly what the body gathers (padded outputs are
    # discarded by the commit's [:B])
    xp = np.pad(x_np, (0, pad), mode="edge").astype(np.int32)
    yp = np.pad(y_np, (0, pad), mode="edge").astype(np.int32)
    nc = len(xp) // chunk
    body = _strong_chunk_jit(cfg)

    from ..core.sampling import static_bands_enabled
    fits_np = None
    if enable_bands and static_bands_enabled(data.src_quads):
        from .bands import BAND_REFINE_SLOTS, sweep_extent
        prepass = _strong_prepass_jit(
            cfg, sweep_extent(cfg.strong_radius, cfg.use_sa),
            include_refine=BAND_REFINE_SLOTS)
        bbs = []
        for ci in range(nc):
            sl = slice(ci * chunk, (ci + 1) * chunk)
            bbs.append(prepass(data, state, jax.random.fold_in(k_ref, ci),
                               jnp.asarray(xp[sl]), jnp.asarray(yp[sl]),
                               depth_min, depth_max))
            _throttle(bbs, site="strong-prepass")
        fits_np = np.asarray(jnp.stack([b.fits for b in bbs]))
        origins = jnp.stack([b.origin for b in bbs])
        banded_body = _strong_chunk_banded_jit(
            cfg, band_refine=BAND_REFINE_SLOTS)
        BAND_DISPATCH_STATS["strong"][0] += int(fits_np.sum())
        BAND_DISPATCH_STATS["strong"][1] += int(nc - fits_np.sum())

    outs = []
    for ci in range(nc):
        sl = slice(ci * chunk, (ci + 1) * chunk)
        args = (data, state, jnp.asarray(iteration, jnp.int32),
                jax.random.fold_in(k_sel, ci),
                jax.random.fold_in(k_ref, ci),
                jnp.asarray(xp[sl]), jnp.asarray(yp[sl]))
        if fits_np is not None and fits_np[ci]:
            outs.append(banded_body(*args, origins[ci], depth_min,
                                    depth_max, geom_factor))
        else:
            outs.append(body(*args, depth_min, depth_max, geom_factor))
        _throttle(outs, site="strong-sweep")
    cat = [jnp.concatenate([o[i] for o in outs], axis=0) for i in range(4)]
    return _strong_commit_jit(cfg)(state, color, *cat)


@_functools.lru_cache(maxsize=32)
def _weak_chunk_jit(cfg: PropCfg):
    def f(data, state, iteration, ks, kr, xc, yc, anc, fpl, depth_min,
          depth_max, geom_factor):
        return _weak_body(data, state, cfg, iteration, ks, kr, xc, yc,
                          anc, fpl, depth_min, depth_max, geom_factor)
    return jax.jit(f)


@_functools.lru_cache(maxsize=32)
def _weak_commit_jit():
    def f(state, weak_x, weak_y, weak_valid, planes_out, costs_out,
          sel_new, vw):
        h, w = state.costs.shape
        x, y = weak_x, weak_y
        upd = weak_valid & (fetch(state.weak, x, y) == WEAK)
        flat_idx = jnp.where(weak_valid, y * w + x, h * w)

        def put_flat(full, vals, old):
            sel = upd.reshape(upd.shape + (1,) * (vals.ndim - 1))
            merged = jnp.where(sel, vals, old)
            flat = full.reshape((h * w,) + full.shape[2:])
            flat = flat.at[flat_idx].set(merged, mode="drop")
            return flat.reshape(full.shape)

        n = x.shape[0]
        return state.replace(
            planes=put_flat(state.planes, planes_out[:n],
                            fetch(state.planes, x, y)),
            costs=put_flat(state.costs, costs_out[:n],
                           fetch(state.costs, x, y)),
            selected=put_flat(state.selected, sel_new[:n],
                              fetch(state.selected, x, y)),
            view_weights=put_flat(state.view_weights, vw[:n],
                                  fetch(state.view_weights, x, y)),
        )
    return jax.jit(f, donate_argnums=(0,))   # see _strong_commit_jit note


def propagate_weak_host(data: CostData, state: PMState, cfg: PropCfg,
                        iteration, key, weak_x, weak_y, weak_valid,
                        anchors, fit_planes, depth_min, depth_max,
                        geom_factor, chunk=None) -> PMState:
    """propagate_weak with one device program per weak-pixel chunk (large
    weak lists at full resolution)."""
    chunk = chunk or _WEAK_SWEEP_CHUNK
    Nw = int(weak_x.shape[0])
    key, k_sel = jax.random.split(key)
    key, k_ref = jax.random.split(key)
    pad = (-Nw) % chunk
    xp = jnp.pad(weak_x, (0, pad))
    yp = jnp.pad(weak_y, (0, pad))
    ap = jnp.pad(anchors, ((0, pad), (0, 0), (0, 0)))
    fp = jnp.pad(fit_planes, ((0, pad), (0, 0)))
    body = _weak_chunk_jit(cfg)
    outs = []
    for ci in range(int(xp.shape[0]) // chunk):
        sl = slice(ci * chunk, (ci + 1) * chunk)
        outs.append(body(data, state, jnp.asarray(iteration, jnp.int32),
                         jax.random.fold_in(k_sel, ci),
                         jax.random.fold_in(k_ref, ci),
                         xp[sl], yp[sl], ap[sl], fp[sl],
                         depth_min, depth_max, geom_factor))
        _throttle(outs, site="weak-sweep")
    cat = [jnp.concatenate([o[i] for o in outs], axis=0) for i in range(4)]
    return _weak_commit_jit()(state, weak_x, weak_y, weak_valid, *cat)


# ---------------------------------------------------------------------------
# Weak sweep (single fused pass over the compacted weak-pixel list)
# ---------------------------------------------------------------------------

def _weak_body(data: CostData, state: PMState, cfg: PropCfg, iteration,
               k_sel, k_ref, x, y, anchors, fit_planes, depth_min,
               depth_max, geom_factor):
    """Anchor-candidate evaluation + fit-plane test + refinement for one flat
    batch of weak pixels. Returns (planes_out, costs_out, sel_new, vw)."""
    S = data.num_src
    xf = x.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    cam = data.ref_cam

    wref = WeakRefData.build(data, xf, yf, anchors, state.selected, cfg)

    a_x = anchors[:, 1:, 0]
    a_y = anchors[:, 1:, 1]
    exists = (a_x >= 0) & (a_y >= 0)
    a_state = fetch(state.weak, jnp.maximum(a_x, 0), jnp.maximum(a_y, 0))
    flags = exists & (a_state == STRONG)
    cand_planes = fetch(state.planes, jnp.maximum(a_x, 0), jnp.maximum(a_y, 0))
    cur_plane = fetch(state.planes, x, y)

    # one scan body evaluates candidates + current + fit plane (compile-time:
    # one deformable-NCC kernel instead of three)
    all_planes = jnp.concatenate(
        [cand_planes, cur_plane[:, None], fit_planes[:, None]], axis=1)

    def cand_cost(c, _):
        costs_c = ncc_weak(data, wref, all_planes[:, c], cfg)
        return c + 1, costs_c

    _, all_costs = jax.lax.scan(cand_cost, 0, None, length=10)
    all_costs = jnp.moveaxis(all_costs, 0, 1)                 # (Nw, 10, S)
    cost_array = jnp.where(flags[..., None], all_costs[:, :8], 0.0)
    # C aggregate-init quirk (APD.cu:1464): a missing/non-strong anchor 0
    # leaves cost_array[0][0] = 2.0 (see the strong body for the rationale);
    # anchor slots go missing far more often than image borders, so this
    # reference behavior matters for weak view selection
    cost_array = cost_array.at[:, 0, 0].set(
        jnp.where(flags[:, 0], cost_array[:, 0, 0], 2.0))

    # priors from all existing anchors (reference gates only on -1 here)
    nb_sel = wref.anchor_sel
    priors = selection.view_selection_priors(nb_sel, exists)
    probs = selection.sampling_probabilities(cost_array, priors, iteration)
    vw, temp_sel, wnorm = selection.monte_carlo_view_weights(k_sel, probs)
    has_views = wnorm > 0
    inv_norm = jnp.where(has_views, 1.0 / jnp.maximum(wnorm, 1e-20), 0.0)

    if cfg.geom_consistency:
        def all_geom(c, _):
            return c + 1, geom_cost(data, xf, yf, all_planes[:, c])
        _, gcosts = jax.lax.scan(all_geom, 0, None, length=10)
        gcosts = jnp.moveaxis(gcosts, 0, 1)                    # (Nw, 10, S)
        gc_cand = jnp.where(flags[..., None], gcosts[:, :8], GEOM_COST_MAX)
        total = cost_array + geom_factor * gc_cand
    else:
        gcosts = None
        total = cost_array
    final_costs = (vw[:, None, :] * total).sum(-1) * inv_norm[:, None]

    cost_now_vec = all_costs[:, 8]
    if cfg.geom_consistency:
        cost_now_vec = cost_now_vec + geom_factor * gcosts[:, 8]
    cost_now = (vw * cost_now_vec).sum(-1) * inv_norm
    cost_recomputed = jnp.where(has_views, cost_now, COST_MAX)

    best = last_min_index(final_costs)
    best_plane = jnp.take_along_axis(
        cand_planes, best[:, None, None].repeat(4, -1), 1)[:, 0]
    best_cost = jnp.take_along_axis(final_costs, best[:, None], 1)[:, 0]
    best_flag = jnp.take_along_axis(flags, best[:, None], 1)[:, 0]
    depth_before = geo.depth_from_plane(cam, best_plane, xf, yf)
    adopt = best_flag & (depth_before >= depth_min) & (depth_before <= depth_max) \
        & (best_cost < cost_recomputed) & has_views
    plane_cur = jnp.where(adopt[:, None], best_plane, cur_plane)
    cost_cur = jnp.where(adopt, best_cost, cost_recomputed)
    sel_new = jnp.where(adopt[:, None], temp_sel, fetch(state.selected, x, y))

    # fit-plane test (reference: PlaneHypothesisRefinementWeak, APD.cu:1026-1052)
    fit_ok = jnp.any(fit_planes[:, :3] != 0.0, axis=-1)

    # refinement hypotheses are weighted sums over the Monte-Carlo-voted
    # views only (APD.cu:988-996); for large source sets compact the voted
    # views into slots (same scheme + gate as the strong sweep; capacity
    # NUM_SAMPLES so every possible distinct vote fits — see the strong
    # sweep's comment on the numerator/denominator mismatch otherwise)
    K = min(data.num_src, selection.NUM_SAMPLES)
    if prefer_view_slots(data, K):
        voted = vw > 0
        slot_idx = jnp.argsort(~voted, axis=-1,
                               stable=True)[:, :K].astype(jnp.int32)
        slot_valid = jnp.take_along_axis(voted, slot_idx, -1)
        slot_w = jnp.take_along_axis(vw, slot_idx, -1)

        kept = (slot_w * slot_valid).sum(-1)
        inv_kept = jnp.where(kept > 0, 1.0 / jnp.maximum(kept, 1e-20), 0.0)

        def eval_plane(plane_i):
            cv = ncc_weak_selected(data, wref, plane_i, cfg, slot_idx,
                                   slot_valid)
            if cfg.geom_consistency:
                cv = cv + geom_factor * geom_selected(data, xf, yf, plane_i,
                                                      slot_idx, slot_valid)
            cv = jnp.where(slot_valid, cv, 0.0)
            return (slot_w * cv).sum(-1) * inv_kept
    else:
        def eval_plane(plane_i):
            cv = ncc_weak(data, wref, plane_i, cfg)
            if cfg.geom_consistency:
                cv = cv + geom_factor * geom_cost(data, xf, yf, plane_i)
            return (vw * cv).sum(-1) * inv_norm

    fit_cost_vec = all_costs[:, 9]
    if cfg.geom_consistency:
        fit_cost_vec = fit_cost_vec + geom_factor * gcosts[:, 9]
    fit_cost = (vw * fit_cost_vec).sum(-1) * inv_norm
    fit_depth = geo.depth_from_plane(cam, fit_planes, xf, yf)
    take_fit = fit_ok & (fit_depth >= depth_min) & (fit_depth <= depth_max) \
        & (fit_cost < cost_cur) & has_views
    plane_cur = jnp.where(take_fit[:, None], fit_planes, plane_cur)
    cost_cur = jnp.where(take_fit, fit_cost, cost_cur)

    # random refinement
    depth_cur = geo.depth_from_plane(cam, plane_cur, xf, yf)
    r_depths, r_normals = refinement_hypotheses(
        k_ref, cam, xf, yf, plane_cur, depth_cur, depth_min, depth_max)

    def refine_cost(i, _):
        plane_i = geo.make_plane(cam, xf, yf, r_depths[:, i], r_normals[:, i])
        ci = eval_plane(plane_i)
        d_i = geo.depth_from_plane(cam, plane_i, xf, yf)
        ok = (d_i >= depth_min) & (d_i <= depth_max) & has_views
        return i + 1, (jnp.where(ok, ci, jnp.inf), plane_i)

    _, (r_costs, r_planes) = jax.lax.scan(refine_cost, 0, None, length=5)
    r_costs = jnp.moveaxis(r_costs, 0, 1)
    r_planes = jnp.moveaxis(r_planes, 0, 1)
    r_best = jnp.argmin(r_costs, -1)
    r_cost = jnp.take_along_axis(r_costs, r_best[:, None], 1)[:, 0]
    r_plane = jnp.take_along_axis(
        r_planes, r_best[:, None, None].repeat(4, -1), 1)[:, 0]
    # PlaneHypothesisRefinementWeak returns EARLY when the fit plane is all
    # zeros (APD.cu:1029-1032) — a weak pixel without a RANSAC fit gets
    # neither the fit test NOR random refinement in the reference
    take_ref = (r_cost < cost_cur) & fit_ok
    plane_cur = jnp.where(take_ref[:, None], r_plane, plane_cur)
    cost_cur = jnp.where(take_ref, r_cost, cost_cur)

    if cfg.refine_init:
        commit = cost_cur < cost_recomputed - 0.1
        planes_out = jnp.where(commit[:, None], plane_cur, cur_plane)
        costs_out = jnp.where(commit, cost_cur, cost_recomputed)
    else:
        planes_out = plane_cur
        costs_out = cost_cur
    return planes_out, costs_out, sel_new, vw


def propagate_weak(data: CostData, state: PMState, cfg: PropCfg,
                   iteration, key, weak_x, weak_y, weak_valid,
                   anchors, fit_planes, depth_min, depth_max,
                   geom_factor) -> PMState:
    """One weak-pixel sweep.

    weak_x/weak_y: (Nw,) int32 coords (padded entries arbitrary);
    weak_valid: (Nw,) bool; anchors: (Nw, 9, 2) int32; fit_planes: (Nw, 4)
    from the per-iteration RANSAC fit (zeros when absent).
    """
    h, w = state.costs.shape
    x, y = weak_x, weak_y
    Nw = x.shape[0]

    key, k_sel = jax.random.split(key)
    key, k_ref = jax.random.split(key)

    def body(ks, kr, xc, yc, anc, fpl):
        return _weak_body(data, state, cfg, iteration, ks, kr, xc, yc,
                          anc, fpl, depth_min, depth_max, geom_factor)

    planes_out, costs_out, sel_new, vw = _run_chunked(
        body, k_sel, k_ref, (x, y, anchors, fit_planes), Nw,
        chunk=_WEAK_SWEEP_CHUNK)

    # scatter into the dense state at the weak-list coordinates; padded
    # entries scatter to an out-of-range index and are dropped so they can
    # never race with a real pixel's write
    upd = weak_valid & (fetch(state.weak, x, y) == WEAK)
    flat_idx = jnp.where(weak_valid, y * w + x, h * w)

    def put_flat(full, vals, old):
        sel = upd.reshape(upd.shape + (1,) * (vals.ndim - 1))
        merged = jnp.where(sel, vals, old)
        flat = full.reshape((h * w,) + full.shape[2:])
        flat = flat.at[flat_idx].set(merged, mode="drop")
        return flat.reshape(full.shape)

    return state.replace(
        planes=put_flat(state.planes, planes_out, fetch(state.planes, x, y)),
        costs=put_flat(state.costs, costs_out, fetch(state.costs, x, y)),
        selected=put_flat(state.selected, sel_new, fetch(state.selected, x, y)),
        view_weights=put_flat(state.view_weights, vw,
                              fetch(state.view_weights, x, y)),
    )

"""Independent NumPy oracle for checkerboard propagation DECISION semantics.

This module is a standalone scalar/NumPy transcription of the reference's
CheckerboardPropagationStrong / CheckerboardPropagationWeak control flow
(/root/reference/APD.cu:1098-1439 and :1441-1615, plus the refinement
ladders PlaneHypothesisRefinementStrong/Weak at :950-1096).  It exists so
that the single most intricate behavior in the engine — candidate-region
min-cost scans, the 0.9/0.1 view priors, the 0.8*exp(-iter^2/90) quality
threshold, the 15-sample Monte-Carlo view weights, impetus gating, the
refinement ladder and the REFINE_INIT 0.1 commit margin — is encoded TWICE:
once in ops/propagation.py (vectorized JAX) and once here (per-pixel Python
mirroring the CUDA kernel's loops).  tests/test_prop_oracle.py asserts the
two agree exactly on discrete choices (candidate index, view weights,
selected views, which hypothesis won) and to float tolerance on costs.

NCC / geometric-consistency cost evaluation is injected as batched
black-box callables — those kernels have their own independent oracles
(tests/test_cost.py, test_geometry.py); this oracle isolates the decision
logic that consumes them, which previously existed in the repo only once.

RNG is injected as raw draws (the 15 selection uniforms and the refinement
RefineRaws), computed from the exact keys the production sweep splits, so
both sides consume identical randomness.

Deliberate, documented deviations from the CUDA reference (both inherited
from ops/propagation.py; see its module docstring):
- a pixel whose Monte-Carlo view selection returns zero probability mass
  hits 0/0 = NaN in the reference; both implementations define it as "no
  adoption, cost_recomputed = COST_MAX";
- the clock-seeded curand stream is replaced by key-split draws; the
  random-normal recipe uses a normalized Gaussian instead of Marsaglia
  rejection (identical distribution), so raw draws are shared, not
  re-derived.
"""

from __future__ import annotations

import numpy as np

COST_MAX = np.float32(2.0)
GEOM_COST_MAX = np.float32(3.0)
NUM_SAMPLES = 15

f32 = np.float32


# ---------------------------------------------------------------------------
# Camera formula transcriptions (independent of core/geometry.py).
# ---------------------------------------------------------------------------

def depth_from_plane(cam, plane, x, y):
    """ComputeDepthfromPlaneHypothesis (APD.cu:237-240):
    -w*K[0] / ((x-K[2])*nx + (K[0]/K[4])*(y-K[5])*ny + K[0]*nz)."""
    nx, ny, nz, w = (f32(plane[0]), f32(plane[1]), f32(plane[2]),
                     f32(plane[3]))
    denom = (f32(x) - f32(cam["cx"])) * nx \
        + (f32(cam["fx"]) / f32(cam["fy"])) * (f32(y) - f32(cam["cy"])) * ny \
        + f32(cam["fx"]) * nz
    return f32(-w * f32(cam["fx"]) / denom)


def _backproject(cam, x, y, depth):
    """Get3DPoint (APD.cu:190-202)."""
    X = f32(depth) * (f32(x) - f32(cam["cx"])) / f32(cam["fx"])
    Y = f32(depth) * (f32(y) - f32(cam["cy"])) / f32(cam["fy"])
    return np.array([X, Y, depth], f32)


def plane_dist_to_origin(cam, x, y, depth, normal):
    """GetDistance2Origin (APD.cu:218-223): w = -(n . X)."""
    X = _backproject(cam, x, y, depth)
    return f32(-(normal.astype(f32) * X).sum())


def make_plane(cam, x, y, depth, normal):
    w = plane_dist_to_origin(cam, x, y, depth, normal)
    return np.array([normal[0], normal[1], normal[2], w], f32)


def _view_direction(cam, x, y, depth):
    """GetViewDirection (APD.cu:204-216)."""
    X = _backproject(cam, x, y, depth)
    return X / np.linalg.norm(X)


def random_normal_from_gaussian(cam, x, y, g, depth):
    """GenerateRandomNormal's facing rule (APD.cu:242-268) applied to the
    repo's raw Gaussian draw: normalize g, flip when dot(view_dir) > 0."""
    n = g.astype(f32) / f32(max(np.linalg.norm(g.astype(f32)), 1e-12))
    vd = _view_direction(cam, x, y, depth)
    if float((n * vd).sum()) > 0.0:
        n = -n
    return n


def perturbed_normal_from_angles(cam, x, y, normal, angles):
    """GeneratePerturbedNormal (APD.cu:270-305): Euler rotation by the three
    drawn angles; revert to the ORIGINAL normal when the perturbed one faces
    away (dot >= 0 vs the depth-1 view direction); normalize."""
    a1, a2, a3 = (f32(angles[0]), f32(angles[1]), f32(angles[2]))
    s1, s2, s3 = np.sin(a1), np.sin(a2), np.sin(a3)
    c1, c2, c3 = np.cos(a1), np.cos(a2), np.cos(a3)
    R = np.array([
        [c2 * c3, c3 * s1 * s2 - c1 * s3, s1 * s3 + c1 * c3 * s2],
        [c2 * s3, c1 * c3 + s1 * s2 * s3, c1 * s2 * s3 - c3 * s1],
        [-s2, c2 * s1, c1 * c2]], f32)
    n_p = R @ normal.astype(f32)
    vd = _view_direction(cam, x, y, f32(1.0))
    if float((n_p * vd).sum()) >= 0.0:
        n_p = normal.astype(f32)
    return n_p / f32(max(np.linalg.norm(n_p), 1e-12))


# ---------------------------------------------------------------------------
# Candidate regions — transcribed from the eight scan loops at
# APD.cu:1136-1316 (strong kernel), each with its exact bound conditions.
# ---------------------------------------------------------------------------

def strong_candidates(costs, x, y):
    """Per-region min-cost candidate for one pixel.  Returns
    (positions (8, 2) int, flags (8,) bool) in the reference's region order
    0 up_near, 1 up_far, 2 down_near, 3 down_far, 4 left_near, 5 left_far,
    6 right_near, 7 right_far.  The scan keeps the FIRST minimum (strict <),
    starting from the base offset."""
    h, w = costs.shape
    pos = np.zeros((8, 2), np.int64)
    flags = np.zeros(8, bool)

    def scan(cands):
        # cands: list of (cx, cy) already bounds-checked; first = base
        best = cands[0]
        best_c = costs[best[1], best[0]]
        for cx, cy in cands[1:]:
            if costs[cy, cx] < best_c:
                best_c = costs[cy, cx]
                best = (cx, cy)
        return best

    # up_far (APD.cu:1136-1153): base (x, y-3), extras (x, y-3-2i), i=1..10
    if y > 2:
        flags[1] = True
        cands = [(x, y - 3)]
        for i in range(1, 11):
            if y > 2 + 2 * i:
                cands.append((x, y - 3 - 2 * i))
        pos[1] = scan(cands)
    # down_far (APD.cu:1155-1172)
    if y < h - 3:
        flags[3] = True
        cands = [(x, y + 3)]
        for i in range(1, 11):
            if y < h - 3 - 2 * i:
                cands.append((x, y + 3 + 2 * i))
        pos[3] = scan(cands)
    # left_far (APD.cu:1174-1191)
    if x > 2:
        flags[5] = True
        cands = [(x - 3, y)]
        for i in range(1, 11):
            if x > 2 + 2 * i:
                cands.append((x - 3 - 2 * i, y))
        pos[5] = scan(cands)
    # right_far (APD.cu:1193-1210)
    if x < w - 3:
        flags[7] = True
        cands = [(x + 3, y)]
        for i in range(1, 11):
            if x < w - 3 - 2 * i:
                cands.append((x + 3 + 2 * i, y))
        pos[7] = scan(cands)
    # up_near (APD.cu:1212-1234): base (x, y-1); extras (x∓(i+1), y-(2+i))
    if y > 0:
        flags[0] = True
        cands = [(x, y - 1)]
        for i in range(3):
            if y > 1 + i and x > i:
                cands.append((x - (i + 1), y - (2 + i)))
            if y > 1 + i and x < w - 1 - i:
                cands.append((x + (i + 1), y - (2 + i)))
        pos[0] = scan(cands)
    # down_near (APD.cu:1236-1262)
    if y < h - 1:
        flags[2] = True
        cands = [(x, y + 1)]
        for i in range(3):
            if y < h - 2 - i and x > i:
                cands.append((x - (i + 1), y + (2 + i)))
            if y < h - 2 - i and x < w - 1 - i:
                cands.append((x + (i + 1), y + (2 + i)))
        pos[2] = scan(cands)
    # left_near (APD.cu:1264-1288)
    if x > 0:
        flags[4] = True
        cands = [(x - 1, y)]
        for i in range(3):
            if x > 1 + i and y > i:
                cands.append((x - (2 + i), y - (i + 1)))
            if x > 1 + i and y < h - 1 - i:
                cands.append((x - (2 + i), y + (i + 1)))
        pos[4] = scan(cands)
    # right_near (APD.cu:1290-1316)
    if x < w - 1:
        flags[6] = True
        cands = [(x + 1, y)]
        for i in range(3):
            if x < w - 2 - i and y > i:
                cands.append((x + (2 + i), y - (i + 1)))
            if x < w - 2 - i and y < h - 1 - i:
                cands.append((x + (2 + i), y + (i + 1)))
        pos[6] = scan(cands)
    return pos, flags


def find_min_cost_index(vals):
    """FindMinCostIndex (APD.cu:60-71): `<=` comparison — LAST minimum wins."""
    best, idx = vals[0], 0
    for i in range(1, len(vals)):
        if vals[i] <= best:
            best, idx = vals[i], i
    return idx


# ---------------------------------------------------------------------------
# Multi-hypothesis joint view selection (APD.cu:1318-1398 / :1506-1586).
# ---------------------------------------------------------------------------

def view_selection(cost_array, priors, iteration, uniforms, S,
                   threshold_base=0.8):
    """cost_array (8, S) f32 (aggregate-init quirks already applied),
    priors (S,), uniforms (15,).  Returns (view_weights (S,) f32,
    temp_selected (S,) bool, weight_norm f32).  `threshold_base` exists so
    the detection-power test can verify a perturbed 0.8 is caught."""
    it = f32(iteration)
    cost_threshold = f32(threshold_base) * np.exp(it * it / f32(-90.0),
                                                  dtype=f32)
    probs = np.zeros(S, f32)
    for i in range(S):
        count = f32(0.0)
        count_false = 0
        tmpw = f32(0.0)
        for j in range(8):
            c = f32(cost_array[j, i])
            if c < cost_threshold:
                tmpw += np.exp(c * c / f32(-0.18), dtype=f32)
                count += 1
            if c > f32(1.2):
                count_false += 1
        if count > 2 and count_false < 3:
            probs[i] = tmpw / count
        elif count_false < 3:
            probs[i] = np.exp(cost_threshold * cost_threshold / f32(-0.32),
                              dtype=f32)
        probs[i] = probs[i] * f32(priors[i])

    # TransformPDFToCDF (APD.cu:174-189) + the 15-sample loop.  The
    # reference scales each prob by 1/sum while accumulating; the production
    # sweep cumsums THEN divides — discretely identical, and we mirror the
    # production association so the sampled votes match bitwise.
    total = f32(probs.sum(dtype=f32))
    vw = np.zeros(S, f32)
    if total > 0:
        cdf = np.cumsum(probs, dtype=f32) / max(total, f32(1e-30))
        for s in range(NUM_SAMPLES):
            r = f32(uniforms[s])
            for i in range(S):
                if cdf[i] > r:
                    vw[i] += 1
                    break
    selected = vw > 0
    return vw, selected, f32(vw.sum(dtype=f32))


# ---------------------------------------------------------------------------
# Strong sweep oracle (one checkerboard color, batch of pixels).
# ---------------------------------------------------------------------------

def run_strong_oracle(costs_map, planes_map, selected_map, xs, ys,
                      iteration, sel_u, raws, cam, cost_fn, geom_fn, cfg,
                      depth_min, depth_max, geom_factor, S,
                      prior_hi=0.9, prior_lo=0.1, refine_margin=0.1,
                      threshold_base=0.8):
    """Transcription of CheckerboardPropagationStrong (APD.cu:1098-1439).

    costs_map (H, W) f32; planes_map (H, W, 4) f32; selected_map (H, W, S)
    bool; xs/ys (B,) pixel coords; sel_u (B, 15) selection uniforms;
    raws: dict with u_rand (B,), g (B, 3), u_pert (B,), angles (B, 3);
    cam: dict fx fy cx cy; cost_fn(xs, ys, planes (N,4)) -> (N, S) f32
    photometric cost; geom_fn same signature (geom-consistency cost) or
    None; cfg: dict(geom_consistency, use_impetus, refine_init).

    Returns dict of planes_out (B, 4), costs_out (B,), sel_out (B, S),
    vw (B, S), plus diagnostics (cand_pos, flags, min_cost_idx, adopted,
    refine_slot).
    """
    B = len(xs)
    depth_min = f32(depth_min)
    depth_max = f32(depth_max)
    geom_factor = f32(geom_factor)

    # stage 1: candidate positions (pure decision logic)
    cand_pos = np.zeros((B, 8, 2), np.int64)
    flags = np.zeros((B, 8), bool)
    for b in range(B):
        cand_pos[b], flags[b] = strong_candidates(costs_map, int(xs[b]),
                                                  int(ys[b]))

    # stage 2: batched candidate costs (injected kernel)
    cand_planes = planes_map[cand_pos[..., 1], cand_pos[..., 0]]  # (B, 8, 4)
    cost_array = np.zeros((B, 8, S), f32)
    for j in range(8):
        cost_array[:, j] = cost_fn(xs, ys, cand_planes[:, j])
    # aggregate-init quirk: float cost_array[8][32] = {2.0f} (APD.cu:1120) —
    # an INVALID region keeps zeros except element [0][0] which keeps 2.0
    for b in range(B):
        for j in range(8):
            if not flags[b, j]:
                cost_array[b, j, :] = 0.0
                if j == 0:
                    cost_array[b, 0, 0] = 2.0

    # stage 3: priors from the four immediate neighbors (APD.cu:1324-1337),
    # gated on flag[2i] (up/down/left/right near-region validity)
    cur_planes = planes_map[ys, xs]
    vw = np.zeros((B, S), f32)
    temp_sel = np.zeros((B, S), bool)
    wnorm = np.zeros(B, f32)
    final_costs = np.zeros((B, 8), f32)
    h, w = costs_map.shape
    for b in range(B):
        x, y = int(xs[b]), int(ys[b])
        priors = np.zeros(S, f32)
        nbs = [(x, y - 1), (x, y + 1), (x - 1, y), (x + 1, y)]
        for i, (nx, ny) in enumerate(nbs):
            if flags[b, 2 * i]:
                for j in range(S):
                    priors[j] += f32(prior_hi) if selected_map[ny, nx, j] \
                        else f32(prior_lo)
        vw[b], temp_sel[b], wnorm[b] = view_selection(
            cost_array[b], priors, iteration, sel_u[b], S,
            threshold_base=threshold_base)
        # final_costs (APD.cu:1393-1398): photometric only in strong
        for j in range(8):
            acc = f32(0.0)
            for i in range(S):
                if vw[b, i] > 0:
                    acc += vw[b, i] * cost_array[b, j, i]
            final_costs[b, j] = acc / wnorm[b] if wnorm[b] > 0 else f32(0.0)

    # stage 4: recompute current-plane cost (APD.cu:1400-1415); impetus gate
    use_geom_now = cfg["geom_consistency"] and cfg["use_impetus"]

    def weighted(planes):
        cv = cost_fn(xs, ys, planes).astype(f32)
        if use_geom_now:
            cv = cv + geom_factor * geom_fn(xs, ys, planes).astype(f32)
        out = np.zeros(B, f32)
        for b in range(B):
            acc = f32(0.0)
            for i in range(S):
                acc += vw[b, i] * cv[b, i]
            out[b] = acc / wnorm[b] if wnorm[b] > 0 else COST_MAX
        return out

    cost_recomputed = weighted(cur_planes)

    # stage 5: adopt the min-cost candidate (APD.cu:1399, 1418-1426)
    plane_cur = cur_planes.copy()
    cost_cur = cost_recomputed.copy()
    sel_out = selected_map[ys, xs].copy()
    min_idx = np.zeros(B, np.int64)
    adopted = np.zeros(B, bool)
    for b in range(B):
        mi = find_min_cost_index(final_costs[b])
        min_idx[b] = mi
        if flags[b, mi] and wnorm[b] > 0:
            d_before = depth_from_plane(cam, cand_planes[b, mi],
                                        int(xs[b]), int(ys[b]))
            if depth_min <= d_before <= depth_max \
                    and final_costs[b, mi] < cost_cur[b]:
                plane_cur[b] = cand_planes[b, mi]
                cost_cur[b] = final_costs[b, mi]
                sel_out[b] = temp_sel[b]
                adopted[b] = True

    # stage 6: refinement ladder (PlaneHypothesisRefinementStrong,
    # APD.cu:950-1007): depths [d_rand, d, d_rand, d, d_pert] x normals
    # [n_cur, n_rand, n_rand, n_pert, n_cur]; sequential accept
    refine_slot = np.full(B, -1, np.int64)
    depth_cur = np.array([depth_from_plane(cam, plane_cur[b], int(xs[b]),
                                           int(ys[b])) for b in range(B)],
                         f32)
    lad_depths = np.zeros((B, 5), f32)
    lad_normals = np.zeros((B, 5, 3), f32)
    for b in range(B):
        x, y = int(xs[b]), int(ys[b])
        d = depth_cur[b]
        d_rand = max(depth_min,
                     f32(raws["u_rand"][b]) * (depth_max - depth_min)
                     + depth_min)
        n_rand = random_normal_from_gaussian(cam, x, y, raws["g"][b], d)
        lo = f32(0.98) * d
        d_pert = max(lo, f32(raws["u_pert"][b]) * (f32(1.02) * d - lo) + lo)
        n_cur = plane_cur[b, :3]
        n_pert = perturbed_normal_from_angles(cam, x, y, n_cur,
                                              raws["angles"][b])
        lad_depths[b] = [d_rand, d, d_rand, d, d_pert]
        lad_normals[b] = [n_cur, n_rand, n_rand, n_pert, n_cur]

    lad_planes = np.zeros((B, 5, 4), f32)
    for b in range(B):
        for i in range(5):
            lad_planes[b, i] = make_plane(cam, int(xs[b]), int(ys[b]),
                                          lad_depths[b, i],
                                          lad_normals[b, i])
    lad_costs = np.stack([weighted(lad_planes[:, i]) for i in range(5)], 1)

    # the production sweep evaluates all 5 and takes argmin; the reference's
    # sequential `<` accept chain picks the same winner: argmin with
    # first-min tie-break over the valid slots
    for b in range(B):
        best_i, best_c = -1, cost_cur[b]
        for i in range(5):
            d_i = depth_from_plane(cam, lad_planes[b, i], int(xs[b]),
                                   int(ys[b]))
            if not (depth_min <= d_i <= depth_max) or wnorm[b] <= 0:
                continue
            if lad_costs[b, i] < best_c:
                best_i, best_c = i, lad_costs[b, i]
        if best_i >= 0:
            plane_cur[b] = lad_planes[b, best_i]
            cost_cur[b] = best_c
            refine_slot[b] = best_i

    # stage 7: commit (APD.cu:1430-1439)
    planes_out = plane_cur
    costs_out = cost_cur
    if cfg["refine_init"]:
        keep = cost_cur >= cost_recomputed - f32(refine_margin)
        planes_out = np.where(keep[:, None], cur_planes, plane_cur)
        costs_out = np.where(keep, cost_recomputed, cost_cur)
    return dict(planes_out=planes_out.astype(f32),
                costs_out=costs_out.astype(f32), sel_out=sel_out, vw=vw,
                cand_pos=cand_pos, flags=flags, min_cost_idx=min_idx,
                adopted=adopted, refine_slot=refine_slot,
                final_costs=final_costs, cost_recomputed=cost_recomputed)


# ---------------------------------------------------------------------------
# Weak sweep oracle.
# ---------------------------------------------------------------------------

def run_weak_oracle(planes_map, selected_map, weak_map, strong_value,
                    anchors, fit_planes, xs, ys, iteration, sel_u, raws,
                    cam, cost_fn, geom_fn, cfg, depth_min, depth_max,
                    geom_factor, S):
    """Transcription of CheckerboardPropagationWeak (APD.cu:1441-1615) +
    PlaneHypothesisRefinementWeak (APD.cu:1008-1096).

    anchors (B, 8, 2) int — GetAnchorPoint(p, 1..8) results, -1 = missing;
    fit_planes (B, 4) — all-zero NORMAL means "no RANSAC fit", which makes
    the refinement function return EARLY (no fit test, no random refine).
    cost_fn here is the deformable NCC (ComputeMultiViewCostVectorNew)
    evaluated at the WEAK pixel, batched over pixels: (planes (B, 4)) ->
    (B, S).  geom_fn (xs, ys, planes) -> (B, S) or None.
    """
    B = len(xs)
    depth_min = f32(depth_min)
    depth_max = f32(depth_max)
    geom_factor = f32(geom_factor)
    geom = cfg["geom_consistency"]

    a_x = anchors[..., 0]
    a_y = anchors[..., 1]
    exists = (a_x >= 0) & (a_y >= 0)
    flags = np.zeros((B, 8), bool)
    for b in range(B):
        for j in range(8):
            if exists[b, j] and weak_map[a_y[b, j], a_x[b, j]] \
                    == strong_value:
                flags[b, j] = True

    cand_planes = planes_map[np.maximum(a_y, 0), np.maximum(a_x, 0)]
    cost_array = np.zeros((B, 8, S), f32)
    gc_array = np.zeros((B, 8, S), f32)
    for j in range(8):
        cost_array[:, j] = cost_fn(cand_planes[:, j])
        if geom:
            gc_array[:, j] = geom_fn(xs, ys, cand_planes[:, j])
    for b in range(B):
        for j in range(8):
            if not flags[b, j]:
                cost_array[b, j, :] = 0.0
                if j == 0:
                    cost_array[b, 0, 0] = 2.0   # APD.cu:1464 aggregate init

    # priors from ALL existing anchors (only the -1 gate, APD.cu:1471-1485)
    cur_planes = planes_map[ys, xs]
    vw = np.zeros((B, S), f32)
    temp_sel = np.zeros((B, S), bool)
    wnorm = np.zeros(B, f32)
    final_costs = np.zeros((B, 8), f32)
    for b in range(B):
        priors = np.zeros(S, f32)
        for j in range(8):
            if exists[b, j]:
                for i in range(S):
                    priors[i] += f32(0.9) if selected_map[
                        a_y[b, j], a_x[b, j], i] else f32(0.1)
        vw[b], temp_sel[b], wnorm[b] = view_selection(
            cost_array[b], priors, iteration, sel_u[b], S)
        # final_costs (APD.cu:1556-1576): geom-consistency adds the real
        # geom cost for valid anchors, a flat 3.0 penalty for invalid ones
        for j in range(8):
            acc = f32(0.0)
            for i in range(S):
                if vw[b, i] > 0:
                    c = cost_array[b, j, i]
                    if geom:
                        pen = gc_array[b, j, i] if flags[b, j] \
                            else GEOM_COST_MAX
                        c = c + geom_factor * pen
                    acc += vw[b, i] * c
            final_costs[b, j] = acc / wnorm[b] if wnorm[b] > 0 else f32(0.0)

    def weighted(planes):
        cv = cost_fn(planes).astype(f32)
        if geom:
            cv = cv + geom_factor * geom_fn(xs, ys, planes).astype(f32)
        out = np.zeros(B, f32)
        for b in range(B):
            acc = f32(0.0)
            for i in range(S):
                acc += vw[b, i] * cv[b, i]
            out[b] = acc / wnorm[b] if wnorm[b] > 0 else COST_MAX
        return out

    cost_recomputed = weighted(cur_planes)

    plane_cur = cur_planes.copy()
    cost_cur = cost_recomputed.copy()
    sel_out = selected_map[ys, xs].copy()
    adopted = np.zeros(B, bool)
    min_idx = np.zeros(B, np.int64)
    for b in range(B):
        mi = find_min_cost_index(final_costs[b])
        min_idx[b] = mi
        if flags[b, mi] and wnorm[b] > 0:
            d_before = depth_from_plane(cam, cand_planes[b, mi],
                                        int(xs[b]), int(ys[b]))
            if depth_min <= d_before <= depth_max \
                    and final_costs[b, mi] < cost_cur[b]:
                plane_cur[b] = cand_planes[b, mi]
                cost_cur[b] = final_costs[b, mi]
                sel_out[b] = temp_sel[b]
                adopted[b] = True

    # PlaneHypothesisRefinementWeak: EARLY RETURN when the fit-plane normal
    # is all zeros (APD.cu:1029-1032) — those pixels get neither the fit
    # test nor random refinement
    has_fit = np.any(fit_planes[:, :3] != 0.0, axis=-1)

    # fit-plane test (APD.cu:1026-1052); sums gated on view_weights > 0
    fit_costs = weighted(fit_planes.astype(f32))
    took_fit = np.zeros(B, bool)
    for b in range(B):
        if not has_fit[b]:
            continue
        d_fit = depth_from_plane(cam, fit_planes[b], int(xs[b]),
                                 int(ys[b]))
        if depth_min <= d_fit <= depth_max and wnorm[b] > 0 \
                and fit_costs[b] < cost_cur[b]:
            plane_cur[b] = fit_planes[b].astype(f32)
            cost_cur[b] = fit_costs[b]
            took_fit[b] = True

    # random refinement (APD.cu:1054-1095), only for has_fit pixels
    refine_slot = np.full(B, -1, np.int64)
    depth_cur = np.array([depth_from_plane(cam, plane_cur[b], int(xs[b]),
                                           int(ys[b])) for b in range(B)],
                         f32)
    lad_planes = np.zeros((B, 5, 4), f32)
    for b in range(B):
        x, y = int(xs[b]), int(ys[b])
        d = depth_cur[b]
        d_rand = max(depth_min,
                     f32(raws["u_rand"][b]) * (depth_max - depth_min)
                     + depth_min)
        n_rand = random_normal_from_gaussian(cam, x, y, raws["g"][b], d)
        lo = f32(0.98) * d
        d_pert = max(lo, f32(raws["u_pert"][b]) * (f32(1.02) * d - lo) + lo)
        n_cur = plane_cur[b, :3]
        n_pert = perturbed_normal_from_angles(cam, x, y, n_cur,
                                              raws["angles"][b])
        for i, (dd, nn) in enumerate(zip(
                [d_rand, d, d_rand, d, d_pert],
                [n_cur, n_rand, n_rand, n_pert, n_cur])):
            lad_planes[b, i] = make_plane(cam, x, y, dd, nn)
    lad_costs = np.stack([weighted(lad_planes[:, i]) for i in range(5)], 1)
    for b in range(B):
        if not has_fit[b]:
            continue
        best_i, best_c = -1, cost_cur[b]
        for i in range(5):
            d_i = depth_from_plane(cam, lad_planes[b, i], int(xs[b]),
                                   int(ys[b]))
            if not (depth_min <= d_i <= depth_max) or wnorm[b] <= 0:
                continue
            if lad_costs[b, i] < best_c:
                best_i, best_c = i, lad_costs[b, i]
        if best_i >= 0:
            plane_cur[b] = lad_planes[b, best_i]
            cost_cur[b] = best_c
            refine_slot[b] = best_i

    planes_out = plane_cur
    costs_out = cost_cur
    if cfg["refine_init"]:
        keep = cost_cur >= cost_recomputed - f32(0.1)
        planes_out = np.where(keep[:, None], cur_planes, plane_cur)
        costs_out = np.where(keep, cost_recomputed, cost_cur)
    return dict(planes_out=planes_out.astype(f32),
                costs_out=costs_out.astype(f32), sel_out=sel_out, vw=vw,
                flags=flags, min_cost_idx=min_idx, adopted=adopted,
                took_fit=took_fit, refine_slot=refine_slot,
                final_costs=final_costs, cost_recomputed=cost_recomputed)


# ---------------------------------------------------------------------------
# DepthToWeak oracle (reference: APD.cu:2103-2250) — deterministic, so no
# injected RNG; per-view NCC/geom evaluation is injected like the sweeps'.
# ---------------------------------------------------------------------------

def run_depth_to_weak_oracle(planes_dn, selected, view_weights, valid,
                             xs, ys, cam, R_ref, ref_c, src_c, cost_fn,
                             geom_fn, weak_peak_radius, geom_factor,
                             depth_min, depth_max, width, height, S,
                             min_margin=6, radius=30):
    """Scalar transcription of the DepthToWeak kernel.

    planes_dn (H, W, 4): (WORLD normal, depth) — the post-GetDepthandNormal
    representation the kernel reads; the oracle applies
    TransformNormal2RefCam (n_cam = R n_world, APD.cu:415-423) itself.
    selected (H, W, S) bool; view_weights (H, W, S); valid (H, W) bool.
    cam: dict fx fy cx cy; R_ref (3, 3); ref_c (3,), src_c (S, 3) camera
    centers.  cost_fn(xs, ys, planes (B, 4)) -> (B, S) photometric NCC
    (ComputeBilateralNCCOld); geom_fn same or None.

    Returns dict: weak (B,) int (STRONG/WEAK/UNKNOWN values from config),
    curve (B, 61) f32, plus diagnostics (min_peak, peak_count).
    """
    from ..config import STRONG, UNKNOWN, WEAK

    B = len(xs)
    n_steps = 2 * radius + 1
    depth_min = f32(depth_min)
    depth_max = f32(depth_max)
    geom_factor = f32(geom_factor)

    weak_out = np.full(B, UNKNOWN, np.int64)
    curve = np.full((B, n_steps), 2.0, f32)
    min_peak_out = np.zeros(B, np.int64)
    peak_count_out = np.zeros(B, np.int64)

    # stage 1: per-pixel setup (margins, baseline, disparity)
    ok = np.zeros(B, bool)
    n_cam = np.zeros((B, 3), f32)
    disp = np.zeros(B, f32)
    base_line = np.zeros(B, f32)
    wnorm = np.zeros(B, f32)
    vw = np.zeros((B, S), f32)
    for b in range(B):
        x, y = int(xs[b]), int(ys[b])
        if x < min_margin or y < min_margin or x >= width - min_margin \
                or y >= height - min_margin or not valid[y, x]:
            continue
        n_w = planes_dn[y, x, :3].astype(f32)
        depth = f32(planes_dn[y, x, 3])
        n_cam[b] = (R_ref.astype(f32) @ n_w)
        if depth == 0:
            continue
        bl = f32(0.0)
        wn = f32(0.0)
        nsrc = 0
        for i in range(S):
            if selected[y, x, i]:
                wn += f32(view_weights[y, x, i])
                d = ref_c.astype(f32) - src_c[i].astype(f32)
                bl += np.sqrt(f32((d * d).sum()))
                vw[b, i] = view_weights[y, x, i]
                nsrc += 1
        if nsrc == 0:
            continue
        ok[b] = True
        base_line[b] = bl / nsrc
        wnorm[b] = wn
        disp[b] = f32(cam["fx"]) * base_line[b] / depth

    # stage 2: the 61-step sweep, batched per step through the injected NCC
    for si, p_disp in enumerate(range(-radius, radius + 1)):
        p_depth = np.where(disp + p_disp != 0,
                           f32(cam["fx"]) * base_line / (disp + p_disp),
                           np.inf).astype(f32)
        in_range = (p_depth >= depth_min) & (p_depth <= depth_max) & ok
        planes = np.zeros((B, 4), f32)
        for b in range(B):
            if in_range[b]:
                planes[b] = make_plane(cam, int(xs[b]), int(ys[b]),
                                       p_depth[b], n_cam[b])
        cv = cost_fn(xs, ys, planes).astype(f32)
        if geom_fn is not None:
            cv = cv + geom_factor * geom_fn(xs, ys, planes).astype(f32)
        for b in range(B):
            if not in_range[b]:
                continue
            acc = f32(0.0)
            for i in range(S):
                acc += vw[b, i] * cv[b, i]
            curve[b, si] = min(f32(2.0), acc / wnorm[b])

    # stage 3: peak rules (APD.cu:2203-2249)
    for b in range(B):
        if not ok[b]:
            continue
        pc = curve[b]
        is_peak = np.zeros(n_steps, bool)
        peak_count = 0
        min_peak = 0
        min_cost = f32(2.0)
        for i in range(2, n_steps - 2):
            if pc[i - 1] > pc[i] and pc[i + 1] > pc[i]:
                is_peak[i] = True
                peak_count += 1
                if pc[i] < min_cost:
                    min_peak = i
                    min_cost = pc[i]
        min_peak_out[b] = min_peak
        peak_count_out[b] = peak_count
        if abs(min_peak - radius) > weak_peak_radius or pc[min_peak] > 0.5:
            weak_out[b] = WEAK
        elif peak_count == 1:
            weak_out[b] = STRONG if pc[min_peak] <= 0.15 else WEAK
        else:
            var = f32(0.0)
            for i in range(2, n_steps - 2):
                if is_peak[i] and i != min_peak:
                    d = pc[i] - min_cost
                    var += d * d
            var = np.sqrt(var) / (peak_count - 1)
            weak_out[b] = STRONG if var > 0.2 else WEAK
    return dict(weak=weak_out, curve=curve, ok=ok,
                min_peak=min_peak_out, peak_count=peak_count_out)


def run_local_refine_oracle(planes_dn, selected, view_weights, valid,
                            xs, ys, cam, R_ref, ref_c, src_c, cost_fn,
                            geom_fn, geom_factor, depth_min, depth_max,
                            S, radius=5):
    """Scalar transcription of LocalRefine (APD.cu:2346-2432): +-5
    one-pixel-disparity sweep at fixed (ref-cam) normal; the depth is
    replaced when cost_now - min_cost > 0.1.  Same injection contract as
    `run_depth_to_weak_oracle`.  Returns dict(depth (B,), refined (B,)
    bool)."""
    B = len(xs)
    depth_min = f32(depth_min)
    depth_max = f32(depth_max)
    geom_factor = f32(geom_factor)

    out_depth = np.zeros(B, f32)
    refined = np.zeros(B, bool)
    ok = np.zeros(B, bool)
    n_cam = np.zeros((B, 3), f32)
    depth0 = np.zeros(B, f32)
    disp = np.zeros(B, f32)
    base_line = np.zeros(B, f32)
    wnorm = np.zeros(B, f32)
    vw = np.zeros((B, S), f32)
    for b in range(B):
        x, y = int(xs[b]), int(ys[b])
        n_w = planes_dn[y, x, :3].astype(f32)
        d0 = f32(planes_dn[y, x, 3])
        out_depth[b] = d0
        depth0[b] = d0
        n_cam[b] = R_ref.astype(f32) @ n_w
        if d0 == 0 or not valid[y, x]:
            continue
        bl = f32(0.0)
        wn = f32(0.0)
        nsrc = 0
        for i in range(S):
            if selected[y, x, i]:
                wn += f32(view_weights[y, x, i])
                d = ref_c.astype(f32) - src_c[i].astype(f32)
                bl += np.sqrt(f32((d * d).sum()))
                vw[b, i] = view_weights[y, x, i]
                nsrc += 1
        if nsrc == 0 or wn == 0:
            continue
        ok[b] = True
        base_line[b] = bl / nsrc
        wnorm[b] = wn
        disp[b] = f32(cam["fx"]) * base_line[b] / d0

    def weighted(p_depth, gate):
        planes = np.zeros((B, 4), f32)
        for b in range(B):
            if gate[b]:
                planes[b] = make_plane(cam, int(xs[b]), int(ys[b]),
                                       p_depth[b], n_cam[b])
        cv = cost_fn(xs, ys, planes).astype(f32)
        if geom_fn is not None:
            cv = cv + geom_factor * geom_fn(xs, ys, planes).astype(f32)
        out = np.full(B, COST_MAX, f32)
        for b in range(B):
            if gate[b]:
                acc = f32(0.0)
                for i in range(S):
                    acc += vw[b, i] * cv[b, i]
                out[b] = acc / wnorm[b]
        return out

    # NB: cost_now has NO depth-range gate and NO 2.0 clamp (APD.cu:2370-2398)
    cost_now = weighted(depth0, ok)
    min_cost = np.full(B, COST_MAX, f32)
    best_depth = depth0.copy()
    for p_disp in range(-radius, radius + 1):
        p_depth = np.where(disp + p_disp != 0,
                           f32(cam["fx"]) * base_line / (disp + p_disp),
                           np.inf).astype(f32)
        gate = ok & (p_depth >= depth_min) & (p_depth <= depth_max)
        c = weighted(p_depth, gate)
        for b in range(B):
            if gate[b] and c[b] < min_cost[b]:
                min_cost[b] = c[b]
                best_depth[b] = p_depth[b]
    for b in range(B):
        if ok[b] and cost_now[b] - min_cost[b] > f32(0.1):
            out_depth[b] = best_depth[b]
            refined[b] = True
    return dict(depth=out_depth, refined=refined, ok=ok)

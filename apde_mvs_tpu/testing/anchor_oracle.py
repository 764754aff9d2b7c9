"""Independent NumPy oracle for GenAnchors DECISION semantics.

Scalar per-pixel transcription of the reference's anchor generator
(/root/reference/APD.cu:1857-2082) plus the weak-reliable demotion
(NeigbourUpdate, :2084-2100) — the same second-encoding discipline as
testing/prop_oracle.py: the production kernel (ops/anchors.gen_anchors)
is vectorized JAX over compacted weak lists; this module mirrors the CUDA
kernel's per-pixel loops in plain Python so the two encodings can disagree.
tests/test_anchor_oracle.py asserts exact agreement on every discrete
output (per-direction hits, hit counts, RANSAC winner, anchor coordinate
lists, reliability), and proves detection power by perturbing each encoded
rule.

What is injected rather than re-derived (matching the production seams):

- the nearest-strong map: production replaces the reference's brute-force
  201x201 window scan (APD.cu:2434-2484) with a jump-flooding transform —
  a *documented deviation* quantified in QUALITY.md §3; both sides consume
  the same (H, W, 2) map here, so this oracle pins everything downstream
  of it.
- the radius schedule: production subsamples the reference's
  r <- min(2r, r+25) walk to a fixed geometric budget (deviation, QUALITY.md
  §4). The oracle takes the schedule as an argument; passing
  ops.anchors._radius_schedule(budget) pins the matched parts, passing the
  full walk measures the deviation.
- random draws (jitter shifts, RANSAC triplets) via ops.anchors.AnchorRaws,
  consumed POSITIONALLY: draw (d, r, j) of the flat layout feeds the same
  probe in both encodings (the reference consumes clock-seeded curand
  sequentially — replaced by key-split draws, SURVEY §5.2).

Float discipline: all comparisons that gate a discrete choice (cone
acceptance, inlier threshold, center-distance tie-break, triangle tests,
probe truncation) are computed as np.float32 chains in production's exact
operation order — RANSAC frequently redraws the SAME triangle in permuted
vertex order, whose cross products differ only in the last ulp, so any
reassociation between the encodings flips real ties. The decision LOGIC
(scan order, early exits, gates, sort) stays independently encoded — that
is what this oracle pins, per the prop-oracle charter.

Encoded rules (reference line cites):
- 8 compass origins x rotate_time rotations of 45/rotate_time degrees
  (APD.cu:1904-1911, 1955-1961), jittered probe points
  direction*20 + shift renormalized (APD.cu:1922-1925), margin-6 bounds
  (APD.cu:1927), nearest-strong snap (APD.cu:1930-1934), angular-cone
  first-hit acceptance cos > cos(angle/2) with radius-major / jitter-minor
  scan order and per-direction early exit (APD.cu:1936-1948), expansion
  stop when the un-jittered test point leaves the image (APD.cu:1917-1920);
- "> 3 hits" gate (APD.cu:1968);
- 50-iteration RANSAC: distinct triplet, 2-D triangle containment with
  2-px edge / triangle-inequality prechecks (PointinTriangle,
  APD.cu:122-143), degenerate-cross rejection, inliers by
  dist/depth_range < ransac_threshold, >= 6 inliers, more-inliers-first
  with center-distance tie-break (APD.cu:1989-2055);
- final anchors = 8 best hits sorted by plane distance with the RANSAC
  triangle's members boosted by -1, non-inliers dropped, stable insertion
  order (sort_small_weighted, APD.cu:25-38, 2057-2080);
- weak_reliable=0 on any failure path -> WEAK pixel demoted to UNKNOWN
  (NeigbourUpdate).
"""

from __future__ import annotations

import math

import numpy as np

f32 = np.float32
_EPS = f32(1e-20)


def direction_table(rotate_time: int) -> np.ndarray:
    """(D, 2) float32 probe directions in the reference's enumeration order:
    origin x outer / y inner, rotations innermost (APD.cu:1904-1911)."""
    dirs = []
    angle = 45.0 / rotate_time
    for ox in (-1, 0, 1):
        for oy in (-1, 0, 1):
            if ox == 0 and oy == 0:
                continue
            d = np.array([ox, oy], np.float64)
            d /= np.linalg.norm(d)
            for k in range(rotate_time):
                a = math.radians(angle * k)
                rot = np.array([[math.cos(a), -math.sin(a)],
                                [math.sin(a), math.cos(a)]])
                dirs.append(rot @ d)
    return np.asarray(dirs, f32)


def _sqrt32(v):
    return np.sqrt(f32(v))


def point_in_triangle(ax, ay, bx, by, cx, cy, px, py,
                      min_edge: float = 2.0) -> bool:
    """PointinTriangle (APD.cu:122-143), f32 chains."""
    ax, ay, bx, by = f32(ax), f32(ay), f32(bx), f32(by)
    cx, cy, px, py = f32(cx), f32(cy), f32(px), f32(py)
    me = f32(min_edge)
    abx, aby = bx - ax, by - ay
    bcx, bcy = cx - bx, cy - by
    cax, cay = ax - cx, ay - cy
    ab = _sqrt32(abx * abx + aby * aby)
    bc = _sqrt32(bcx * bcx + bcy * bcy)
    ca = _sqrt32(cax * cax + cay * cay)
    if ab <= me or bc <= me or ca <= me:
        return False
    if not (ab + bc > ca and bc + ca > ab and ab + ca > bc):
        return False
    pax, pay = ax - px, ay - py
    pbx, pby = bx - px, by - py
    pcx, pcy = cx - px, cy - py
    t1 = pax * pby - pay * pbx
    t2 = pbx * pcy - pby * pcx
    t3 = pcx * pay - pcy * pax
    return bool(t1 * t2 >= 0 and t1 * t3 >= 0)


def _backproject(cam, x, y, depth):
    """Get3DPoint (APD.cu:190-202): camera-frame point, f32 op order of
    core.geometry.backproject: depth * (x - cx) / fx."""
    X = f32(depth) * (f32(x) - f32(cam["cx"])) / f32(cam["fx"])
    Y = f32(depth) * (f32(y) - f32(cam["cy"])) / f32(cam["fy"])
    return np.array([X, Y, depth], f32)


def _cross3(a, b):
    """jnp.cross component order for 3-vectors."""
    return np.array([a[1] * b[2] - a[2] * b[1],
                     a[2] * b[0] - a[0] * b[2],
                     a[0] * b[1] - a[1] * b[0]], f32)


def _dot3(a, b):
    """Left-associated 3-term dot: (a0*b0 + a1*b1) + a2*b2 (XLA reduce)."""
    return (a[0] * b[0] + a[1] * b[1]) + a[2] * b[2]


def _plane_dist(plane, pt):
    return np.abs(_dot3(plane[:3], pt) + plane[3])


def run_gen_anchors_oracle(
        px_x: int, px_y: int, depth_map: np.ndarray,
        nearest_strong: np.ndarray, cam: dict, rotate_time: int,
        ransac_threshold: float, depth_min: float, depth_max: float,
        radii: np.ndarray, shift_x: np.ndarray, shift_y: np.ndarray,
        triplets: np.ndarray, jitter_samples: int = 4, anchor_num: int = 9,
        # perturbation knobs for detection-power tests (defaults = reference)
        min_margin: int = 6, inlier_min: int = 6, cone_slack: float = 0.0,
        abc_boost: float = 1.0, cdist_tiebreak: bool = True,
        min_tri_edge: float = 2.0):
    """GenAnchors for ONE weak pixel.

    depth_map: (H, W) stored depths (the pre-conversion plane .w channel);
    nearest_strong: (H, W, 2) int (x, y), -1 when none; cam: dict with
    fx/fy/cx/cy; radii: (Rn,) int radius schedule; shift_x/shift_y:
    (D*Rn*J,) int jitter draws in production's flat (dir-major, radius,
    jitter innermost) layout; triplets: (iters, 3) raw RANSAC draws.

    Returns dict: anchors (anchor_num, 2) int32 ([-1,-1] empty, [0]=self),
    reliable, hit_count, hits (D, 2), plane (4,) or None.
    """
    h, w = depth_map.shape
    dirs = direction_table(rotate_time)
    D = dirs.shape[0]
    Rn = len(radii)
    J = jitter_samples
    angle = 45.0 / rotate_time
    threshold = f32(math.cos(math.radians(angle / 2.0)) + cone_slack)
    thr = f32(ransac_threshold)
    depth_diff = f32(depth_max) - f32(depth_min)
    xf = f32(px_x)
    yf = f32(px_y)

    anchors = np.full((anchor_num, 2), -1, np.int32)
    anchors[0] = (px_x, px_y)
    out = {"anchors": anchors, "reliable": False, "hit_count": 0,
           "hits": np.full((D, 2), -1, np.int32), "plane": None}

    # ---- directional first-hit scan (APD.cu:1904-1963) -------------------
    hits = np.full((D, 2), -1, np.int32)
    for d in range(D):
        dx, dy = f32(dirs[d, 0]), f32(dirs[d, 1])
        found = False
        for ri in range(Rn):
            radius = f32(radii[ri])
            tx = xf + dx * radius
            ty = yf + dy * radius
            if tx < 0 or ty < 0 or tx >= w or ty >= h:
                break               # expansion stop (APD.cu:1917-1920)
            for j in range(J):
                flat = (d * Rn + ri) * J + j
                jdx = dx * f32(20.0) + f32(shift_x[flat])
                jdy = dy * f32(20.0) + f32(shift_y[flat])
                n = np.maximum(_sqrt32(jdx * jdx + jdy * jdy), _EPS)
                ax = int(xf + jdx / n * radius)
                ay = int(yf + jdy / n * radius)
                if ax < min_margin or ay < min_margin \
                        or ax >= w - min_margin or ay >= h - min_margin:
                    continue
                sx, sy = int(nearest_strong[ay, ax, 0]), \
                    int(nearest_strong[ay, ax, 1])
                if sx == -1 or sy == -1:
                    continue
                vx = f32(sx) - xf
                vy = f32(sy) - yf
                vn = np.maximum(_sqrt32(vx * vx + vy * vy), _EPS)
                cos_a = (vx * dx + vy * dy) / vn
                if cos_a > threshold:
                    hits[d] = (sx, sy)
                    found = True
                    break
            if found:
                break
    out["hits"] = hits
    valid = hits[:, 0] >= 0
    count = int(valid.sum())
    out["hit_count"] = count
    if count <= 3:                               # APD.cu:1968
        return out

    # compacted valid hits in direction order (APD.cu:1983-1987)
    vhits = hits[valid]
    vpts = np.stack([
        _backproject(cam, f32(x_), f32(y_), depth_map[y_, x_])
        for x_, y_ in vhits])
    center_pt = _backproject(cam, xf, yf, depth_map[px_y, px_x])

    # ---- RANSAC (APD.cu:1989-2055) ---------------------------------------
    best = None   # (count, cdist, plane, (a, b, c))
    for it in range(triplets.shape[0]):
        a, b, c = (int(t) % count for t in triplets[it])
        if a == b or b == c or a == c:
            continue
        if not point_in_triangle(
                vhits[a, 0], vhits[a, 1], vhits[b, 0], vhits[b, 1],
                vhits[c, 0], vhits[c, 1], px_x, px_y,
                min_edge=min_tri_edge):
            continue
        A, B, C = vpts[a], vpts[b], vpts[c]
        n = _cross3(A - C, B - C)
        norm = _sqrt32((n[0] * n[0] + n[1] * n[1]) + n[2] * n[2])
        if norm == 0 or not np.isfinite(norm):
            continue
        n = n / np.maximum(norm, _EPS)
        pw = -_dot3(n, A)
        n_in = 0
        for i in range(count):
            if _plane_dist(np.append(n, pw), vpts[i]) / depth_diff < thr:
                n_in += 1
        if n_in < inlier_min:
            continue
        plane = np.append(n, pw).astype(f32)
        cdist = _plane_dist(plane, center_pt)
        if best is None or n_in > best[0] \
                or (cdist_tiebreak and n_in == best[0] and cdist < best[1]):
            best = (n_in, cdist, plane, (a, b, c))
    if best is None:
        return out
    _, _, plane, abc = best
    out["plane"] = plane

    # ---- final anchors: distance-sorted inliers (APD.cu:2057-2080) -------
    entries = []   # (weight, order, x, y) — stable insertion == stable sort
    for i in range(count):
        dist = _plane_dist(plane, vpts[i])
        if dist / depth_diff >= thr:
            entries.append((np.inf, i, -1, -1))
            continue
        if i in abc:
            dist = dist - f32(abc_boost)
        entries.append((dist, i, int(vhits[i, 0]), int(vhits[i, 1])))
    entries.sort(key=lambda e: (e[0], e[1]))
    for slot, e in enumerate(entries[:anchor_num - 1]):
        anchors[slot + 1] = (e[2], e[3])
    out["anchors"] = anchors
    out["reliable"] = True
    return out


def depth_from_plane(cam, plane, x, y):
    """ComputeDepthfromPlaneHypothesis (APD.cu:237-240), f32 chain."""
    nx, ny, nz, w = (f32(plane[0]), f32(plane[1]), f32(plane[2]),
                     f32(plane[3]))
    denom = (f32(x) - f32(cam["cx"])) * nx \
        + (f32(cam["fx"]) / f32(cam["fy"])) * (f32(y) - f32(cam["cy"])) * ny \
        + f32(cam["fx"]) * nz
    return f32(-w * f32(cam["fx"]) / denom)


def run_fit_plane_oracle(px_x: int, px_y: int, anchors: np.ndarray,
                         planes_map: np.ndarray, cam: dict,
                         triplets: np.ndarray,
                         # perturbation knobs (defaults = reference)
                         exclude_abc_cost: bool = True,
                         require_triangle: bool = True,
                         flip_to_camera: bool = True):
    """RANSACToGetFitPlane for ONE weak pixel (APD.cu:2486-2598).

    anchors: (9, 2) int ([0] = self, unused); planes_map: (H, W, 4)
    camera-frame plane hypotheses; triplets: (iters, 3) raw draws.
    Returns (plane (4,) f32, has_plane bool) — zeros when no fit (the
    reference's <3-anchors current-plane fallback is dead in practice,
    see ops/anchors.ransac_fit_planes).

    Encoded rules: anchor compaction in slot order, anchor depths via
    ComputeDepthfromPlaneHypothesis at the anchor's own hypothesis,
    distinct triplet + triangle containment + degenerate-cross rejection,
    cost = sum of NON-triangle members' plane distances with strict-<
    winner, normal flipped toward the camera through the center pixel's
    current-depth view direction (APD.cu:2582-2594)."""
    pts = []
    coords = []
    for i in range(1, anchors.shape[0]):
        ax_, ay_ = int(anchors[i, 0]), int(anchors[i, 1])
        if ax_ == -1 or ay_ == -1:
            continue
        d = depth_from_plane(cam, planes_map[ay_, ax_], ax_, ay_)
        pts.append(_backproject(cam, f32(ax_), f32(ay_), d))
        coords.append((ax_, ay_))
    count = len(pts)
    if count < 3:
        return np.zeros(4, f32), False
    pts = np.stack(pts)

    best = None
    for it in range(triplets.shape[0]):
        a, b, c = (int(t) % count for t in triplets[it])
        if a == b or b == c or a == c:
            continue
        if require_triangle and not point_in_triangle(
                coords[a][0], coords[a][1], coords[b][0], coords[b][1],
                coords[c][0], coords[c][1], px_x, px_y):
            continue
        A, B, C = pts[a], pts[b], pts[c]
        n = _cross3(A - C, B - C)
        norm = _sqrt32((n[0] * n[0] + n[1] * n[1]) + n[2] * n[2])
        if norm == 0 or not np.isfinite(norm):
            continue
        n = n / np.maximum(norm, _EPS)
        pw = -_dot3(n, A)
        cost = f32(0.0)
        for i in range(count):
            if exclude_abc_cost and i in (a, b, c):
                continue
            cost = cost + np.abs(_dot3(n, pts[i]) + pw)
        if best is None or cost < best[0]:
            best = (cost, np.append(n, pw).astype(f32))
    if best is None:
        return np.zeros(4, f32), False
    plane = best[1]
    if flip_to_camera:
        d = depth_from_plane(cam, planes_map[px_y, px_x], px_x, px_y)
        X = _backproject(cam, f32(px_x), f32(px_y), d)
        vd = X / np.linalg.norm(X)
        if float(plane[0] * vd[0] + plane[1] * vd[1] + plane[2] * vd[2]) > 0:
            plane = -plane
    return plane, True


def neighbor_update_oracle(weak: np.ndarray, reliable_map: dict) -> np.ndarray:
    """NeigbourUpdate (APD.cu:2084-2100): WEAK pixels whose anchor generation
    failed become UNKNOWN. reliable_map: {(x, y): bool} for weak pixels."""
    from ..config import UNKNOWN, WEAK

    out = weak.copy()
    for (x, y), ok in reliable_map.items():
        if weak[y, x] == WEAK and not ok:
            out[y, x] = UNKNOWN
    return out

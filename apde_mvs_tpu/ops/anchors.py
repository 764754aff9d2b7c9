"""Adaptive patch deformation: anchor machinery for weak-texture pixels.

TPU re-architecture of the reference's three brute-force kernels:

- FindNearestStrongPoint (APD.cu:2434-2484) scans a 201x201 window per pixel;
  here it is a jump-flooding transform (log-step passes of 9 gathers) that
  returns the nearest STRONG pixel per pixel. The reference additionally
  requires candidate confidence >= the querying pixel's confidence; JFA
  applies the same acceptance predicate during relaxation, which is a close
  (not bitwise) approximation of the windowed search; ties prefer higher
  confidence, as in the reference.
- GenAnchors (APD.cu:1857-2082): per weak pixel, probe 8*rotate_time compass
  directions over an expanding-radius schedule with jittered samples snapped
  through the nearest-strong map, accept the first probe within the angular
  cone, then RANSAC a support plane through the hit set and keep the 8
  best-fitting hits as anchors. The reference's ~167-step radius schedule is
  subsampled to a fixed geometric budget (identical semantics, sparser far
  sampling) to keep the op compiled-size friendly.
- RANSACToGetFitPlane (APD.cu:2486-2598): per-iteration plane fit through a
  weak pixel's anchors.

All randomness is key-split JAX PRNG (the reference uses clock-seeded curand).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ANCHOR_NUM, MAX_SEARCH_RADIUS, STRONG, UNKNOWN, WEAK
from ..core import geometry as geo
from ..core.sampling import fetch
from .state import PMState


# ---------------------------------------------------------------------------
# Nearest strong point via jump flooding
# ---------------------------------------------------------------------------

def nearest_strong_jfa(weak: jnp.ndarray, confidence: jnp.ndarray,
                       valid: jnp.ndarray) -> jnp.ndarray:
    """(H, W) maps -> (H, W, 2) int32 coords of the nearest STRONG pixel with
    confidence >= own (ties prefer higher confidence); (-1, -1) when none.
    STRONG pixels map to themselves."""
    h, w = weak.shape
    ys, xs = jnp.mgrid[0:h, 0:w]
    xs = xs.astype(jnp.int32)
    ys = ys.astype(jnp.int32)
    strong = (weak == STRONG) & valid

    best_x = jnp.where(strong, xs, -1)
    best_y = jnp.where(strong, ys, -1)

    def relax(carry, step):
        bx, by = carry
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                nx = xs + dx * step
                ny = ys + dy * step
                cx = fetch(bx, nx, ny, fill=-1)
                cy = fetch(by, nx, ny, fill=-1)
                cand_ok = (cx >= 0)
                c_conf = fetch(confidence, jnp.maximum(cx, 0),
                               jnp.maximum(cy, 0))
                cand_ok &= c_conf >= confidence       # acceptance predicate
                d_cand = (cx - xs) ** 2 + (cy - ys) ** 2
                b_conf = fetch(confidence, jnp.maximum(bx, 0),
                               jnp.maximum(by, 0))
                d_best = jnp.where(bx >= 0, (bx - xs) ** 2 + (by - ys) ** 2,
                                   jnp.iinfo(jnp.int32).max)
                better = cand_ok & ((d_cand < d_best)
                                    | ((d_cand == d_best) & (c_conf > b_conf)))
                bx = jnp.where(better, cx, bx)
                by = jnp.where(better, cy, by)
        return (bx, by), None

    max_step = 1 << (max(h, w) - 1).bit_length()
    steps = []
    s = max_step
    while s >= 1:
        steps.append(s)
        s //= 2
    steps.append(1)  # extra pass improves JFA accuracy (JFA+1)
    (best_x, best_y), _ = jax.lax.scan(relax, (best_x, best_y),
                                       jnp.asarray(steps, jnp.int32))
    keep = strong  # strong pixels always map to themselves
    best_x = jnp.where(keep, xs, best_x)
    best_y = jnp.where(keep, ys, best_y)
    return jnp.stack([best_x, best_y], axis=-1)


# ---------------------------------------------------------------------------
# Directional anchor search + support-plane RANSAC
# ---------------------------------------------------------------------------

def _radius_schedule(budget: int = 25) -> np.ndarray:
    """Subsampled version of the reference's r <- min(2r, r+25) expansion
    (APD.cu:1915) from 2 to MAX_SEARCH_RADIUS. Subsampling is geometric in
    radius VALUE so the dense small-radius steps (where anchors actually
    live) are all kept and the +25 linear tail is thinned."""
    full = []
    r = 2
    while r <= MAX_SEARCH_RADIUS:
        full.append(r)
        r = min(2 * r, r + 25)
    if len(full) <= budget:
        return np.asarray(full, np.int32)
    targets = np.geomspace(2, full[-1], budget)
    full_arr = np.asarray(full)
    picked = sorted({int(full_arr[np.argmin(np.abs(full_arr - t))])
                     for t in targets})
    return np.asarray(picked, np.int32)


def _direction_table(rotate_time: int) -> np.ndarray:
    """(D, 2) unit directions: 8 compass origins x rotate_time rotations of
    45/rotate_time degrees (reference: APD.cu:1896-1961)."""
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
    return np.asarray(dirs, np.float32)


class AnchorResult(NamedTuple):
    anchors: jnp.ndarray    # (Nw, ANCHOR_NUM, 2) int32; [:, 0] = self
    reliable: jnp.ndarray   # (Nw,) bool
    hit_count: jnp.ndarray  # (Nw,) int32 directions with an accepted probe


RANSAC_ITERS = 50           # reference: `int iteration = 50` (APD.cu:1989)


class AnchorRaws(NamedTuple):
    """Injected raw random draws for `gen_anchors` (testing seam: the anchor
    oracle in testing/anchor_oracle.py consumes the SAME draws positionally,
    so production and oracle decisions are comparable exactly — the pattern
    established by ops.propagation.RefineRaws / testing.prop_oracle)."""

    shift_x: jnp.ndarray    # (Nw, D*Rn*J) int32 jitter draws
    shift_y: jnp.ndarray    # (Nw, D*Rn*J) int32
    triplets: jnp.ndarray   # (RANSAC_ITERS, Nw, 3) int32 raw draws [0, 2^30)


def _point_in_triangle(ax, ay, bx, by, cx, cy, px, py):
    """Reference PointinTriangle (APD.cu:122-143): degenerate edges (<= 2 px)
    and near-collinear triangles rejected; same-side cross-product test."""
    ab = jnp.sqrt((bx - ax) ** 2 + (by - ay) ** 2)
    bc = jnp.sqrt((cx - bx) ** 2 + (cy - by) ** 2)
    ca = jnp.sqrt((ax - cx) ** 2 + (ay - cy) ** 2)
    ok = (ab > 2) & (bc > 2) & (ca > 2)
    ok &= (ab + bc > ca) & (bc + ca > ab) & (ab + ca > bc)
    pax, pay = ax - px, ay - py
    pbx, pby = bx - px, by - py
    pcx, pcy = cx - px, cy - py
    t1 = pax * pby - pay * pbx
    t2 = pbx * pcy - pby * pcx
    t3 = pcx * pay - pcy * pax
    return ok & (t1 * t2 >= 0) & (t1 * t3 >= 0)


def _plane_from_triplet(pts, a_idx, b_idx, c_idx):
    """Unit plane (n, w) through three camera-frame points gathered from
    pts (Nw, D, 3); returns ((Nw, 4), degenerate mask)."""
    A = jnp.take_along_axis(pts, a_idx[:, None, None].repeat(3, -1), 1)[:, 0]
    B = jnp.take_along_axis(pts, b_idx[:, None, None].repeat(3, -1), 1)[:, 0]
    C = jnp.take_along_axis(pts, c_idx[:, None, None].repeat(3, -1), 1)[:, 0]
    n = jnp.cross(A - C, B - C)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    degenerate = (norm[..., 0] == 0) | ~jnp.isfinite(norm[..., 0])
    n = n / jnp.maximum(norm, 1e-20)
    w = -(n * A).sum(-1)
    return jnp.concatenate([n, w[:, None]], -1), degenerate, (A, B, C)


def gen_anchors(key, data, state: PMState, weak_x, weak_y, weak_valid,
                rotate_time: int, ransac_threshold, depth_min, depth_max,
                nearest_strong: jnp.ndarray, jitter_samples: int = 4,
                radius_budget: int = 25,
                raws: "AnchorRaws | None" = None) -> AnchorResult:
    """Anchor generation for the compacted weak list (reference: GenAnchors).

    `state.planes[..., 3]` must hold depths (this op runs before the per-pass
    camera-frame conversion, as in the reference's kernel order,
    APD.cu:2685-2690).

    ``raws`` injects the jitter/RANSAC random draws (tests); None draws them
    from ``key`` exactly as before.
    """
    h = getattr(data, "img_h", None) or state.weak.shape[0]
    w = getattr(data, "img_w", None) or state.weak.shape[1]
    Nw = weak_x.shape[0]
    min_margin = 6
    xf = weak_x.astype(jnp.float32)
    yf = weak_y.astype(jnp.float32)

    dirs_np = np.asarray(_direction_table(rotate_time), np.float32)  # (D, 2)
    D = dirs_np.shape[0]
    radii_np = np.asarray(_radius_schedule(radius_budget), np.float32)
    Rn = radii_np.shape[0]
    angle = 45.0 / rotate_time
    cone_cos = math.cos(math.radians(angle / 2.0))
    shift_range = max(int(math.tan(math.radians(angle / 2.0)) * 20), 1)

    # Flat probe layout: every (direction, radius, jitter) probe of a pixel
    # lives in ONE minor axis of length D*Rn*J (jitter innermost, radius
    # next — the reference's first-hit scan order). 4/5-D probe tensors
    # with tiny minor dims tile-pad catastrophically on TPU ((..., 19, 4)
    # lays out as (..., 24, 128): 32x memory, OOM at the 65536 weak-cap
    # bucket); 2-D (Nw, D*Rn*J) shapes pad negligibly.
    J = jitter_samples
    DRJ = D * Rn * J
    flat = np.arange(DRJ)
    d_of = flat // (Rn * J)
    r_of = (flat // J) % Rn
    dirx_f = jnp.asarray(dirs_np[d_of, 0])              # (DRJ,) broadcast
    diry_f = jnp.asarray(dirs_np[d_of, 1])
    rad_f = jnp.asarray(radii_np[r_of])

    if raws is None:
        key, k_sx, k_sy = jax.random.split(key, 3)
        shift_x = jax.random.randint(
            k_sx, (Nw, DRJ), -shift_range + 1, shift_range
        ).astype(jnp.float32)
        shift_y = jax.random.randint(
            k_sy, (Nw, DRJ), -shift_range + 1, shift_range
        ).astype(jnp.float32)
    else:
        shift_x = raws.shift_x.astype(jnp.float32)
        shift_y = raws.shift_y.astype(jnp.float32)
    pdx = dirx_f * 20.0 + shift_x
    pdy = diry_f * 20.0 + shift_y
    pn = jnp.maximum(jnp.sqrt(pdx * pdx + pdy * pdy), 1e-20)
    px = (xf[:, None] + pdx / pn * rad_f).astype(jnp.int32)
    py = (yf[:, None] + pdy / pn * rad_f).astype(jnp.int32)

    # expansion stop: the un-jittered test point at this radius must be in
    # the image (reference stops the radius expansion there; a ray from an
    # interior pixel leaves the convex image monotonically, so the
    # cumulative stop reduces to a per-radius bounds test)
    tx = xf[:, None] + dirx_f * rad_f
    ty = yf[:, None] + diry_f * rad_f
    expand_ok = (tx >= 0) & (ty >= 0) & (tx < w) & (ty < h)   # (Nw, DRJ)

    probe_ok = (px >= min_margin) & (py >= min_margin) \
        & (px < w - min_margin) & (py < h - min_margin) & expand_ok
    pxc = jnp.maximum(px, 0)
    pyc = jnp.maximum(py, 0)
    sx = fetch(nearest_strong[..., 0], pxc, pyc)
    sy = fetch(nearest_strong[..., 1], pxc, pyc)
    probe_ok &= (sx >= 0) & (sy >= 0)
    # angular cone acceptance against the ORIGIN direction
    vx = sx.astype(jnp.float32) - xf[:, None]
    vy = sy.astype(jnp.float32) - yf[:, None]
    vn = jnp.maximum(jnp.sqrt(vx * vx + vy * vy), 1e-20)
    cosang = (vx * dirx_f + vy * diry_f) / vn
    probe_ok &= cosang > cone_cos

    # first accepted probe per direction (radius-major, then jitter order)
    flat_ok = probe_ok.reshape(Nw, D, Rn * J)
    first = jnp.argmax(flat_ok, axis=-1)
    found = flat_ok.any(-1)
    fx = jnp.take_along_axis(sx.reshape(Nw, D, -1), first[..., None], -1)[..., 0]
    fy = jnp.take_along_axis(sy.reshape(Nw, D, -1), first[..., None], -1)[..., 0]
    fx = jnp.where(found, fx, -1)
    fy = jnp.where(found, fy, -1)

    count = found.sum(-1)
    enough = count > 3

    # camera-frame 3-D points of the hits at their current stored depth
    depth_map = state.planes[..., 3]
    hit_depth = fetch(depth_map, jnp.maximum(fx, 0), jnp.maximum(fy, 0))
    pts = geo.backproject(data.ref_cam, fx.astype(jnp.float32),
                          fy.astype(jnp.float32), hit_depth)   # (Nw, D, 3)
    center_depth = fetch(depth_map, weak_x, weak_y)
    center_pt = geo.backproject(data.ref_cam, xf, yf, center_depth)
    depth_diff = depth_max - depth_min

    # RANSAC for a support plane through >= 6 hits whose triangle contains p
    def draw(rank_key):
        r = jax.random.randint(rank_key, (Nw, 3), 0, 1 << 30)
        return r % jnp.maximum(count, 1)[:, None]

    rank = jnp.cumsum(found, axis=-1) - 1                      # (Nw, D)

    def nth_valid(n):
        hitmask = found & (rank == n[:, None])
        j = jnp.argmax(hitmask, axis=-1)
        return j

    def ransac_body(i, carry):
        best_count, best_cdist, best_plane, best_abc, has_plane, k = carry
        if raws is None:
            k, kd = jax.random.split(k)
            ns = draw(kd)
        else:
            ns = raws.triplets[i] % jnp.maximum(count, 1)[:, None]
        a = nth_valid(ns[:, 0])
        b = nth_valid(ns[:, 1])
        c = nth_valid(ns[:, 2])
        distinct = (a != b) & (b != c) & (a != c)

        def gat(v, idx):
            return jnp.take_along_axis(v, idx[:, None], 1)[:, 0]

        tri = _point_in_triangle(
            gat(fx, a).astype(jnp.float32), gat(fy, a).astype(jnp.float32),
            gat(fx, b).astype(jnp.float32), gat(fy, b).astype(jnp.float32),
            gat(fx, c).astype(jnp.float32), gat(fy, c).astype(jnp.float32),
            xf, yf)
        plane, degen, _ = _plane_from_triplet(pts, a, b, c)
        dist = jnp.abs((pts * plane[:, None, :3]).sum(-1) + plane[:, None, 3])
        inlier = found & (dist / depth_diff < ransac_threshold)
        n_in = inlier.sum(-1)
        usable = distinct & tri & ~degen & (n_in >= 6)
        cdist = jnp.abs((center_pt * plane[:, :3]).sum(-1) + plane[:, 3])
        better = usable & ((n_in > best_count)
                           | ((n_in == best_count) & (cdist < best_cdist)))
        best_plane = jnp.where(better[:, None], plane, best_plane)
        best_cdist = jnp.where(better, cdist, best_cdist)
        best_count = jnp.where(better, n_in, best_count)
        best_abc = jnp.where(better[:, None], jnp.stack([a, b, c], -1),
                             best_abc)
        has_plane = has_plane | better
        return (best_count, best_cdist, best_plane, best_abc, has_plane, k)

    key, k_ransac = jax.random.split(key)
    init = (jnp.full((Nw,), 3, jnp.int32), jnp.full((Nw,), jnp.inf),
            jnp.zeros((Nw, 4)), jnp.full((Nw, 3), -1, jnp.int32),
            jnp.zeros((Nw,), bool), k_ransac)
    best_count, _, best_plane, best_abc, has_plane, _ = jax.lax.fori_loop(
        0, RANSAC_ITERS, ransac_body, init)

    # rank hits by plane distance (triangle members boosted by -1), keep 8
    dist = jnp.abs((pts * best_plane[:, None, :3]).sum(-1)
                   + best_plane[:, None, 3])
    is_inlier = found & (dist / depth_diff < ransac_threshold)
    is_abc = (jnp.arange(D)[None, :, None] == best_abc[:, None, :]).any(-1)
    weight = jnp.where(is_inlier, dist - is_abc.astype(jnp.float32), jnp.inf)
    order = jnp.argsort(weight, axis=-1)
    top = order[:, :ANCHOR_NUM - 1]
    top_w = jnp.take_along_axis(weight, top, -1)
    ax = jnp.take_along_axis(fx, top, -1)
    ay = jnp.take_along_axis(fy, top, -1)
    ok = jnp.isfinite(top_w)
    ax = jnp.where(ok, ax, -1)
    ay = jnp.where(ok, ay, -1)

    reliable = enough & has_plane & weak_valid
    self_anchor = jnp.stack([weak_x, weak_y], -1)[:, None, :]
    rest = jnp.stack([ax, ay], -1)
    anchors = jnp.concatenate([self_anchor, rest], axis=1).astype(jnp.int32)
    anchors = jnp.where(reliable[:, None, None], anchors,
                        anchors.at[:, 1:].set(-1))
    return AnchorResult(anchors=anchors, reliable=reliable,
                        hit_count=count.astype(jnp.int32))


def neighbor_update(state: PMState, weak_x, weak_y, weak_valid,
                    reliable) -> PMState:
    """Demote weak pixels that failed anchor generation to UNKNOWN
    (reference: NeigbourUpdate, APD.cu:2084-2100)."""
    h, w = state.weak.shape
    flat_idx = jnp.where(weak_valid, weak_y * w + weak_x, h * w)
    vals = jnp.where(reliable, WEAK, UNKNOWN)
    weak = state.weak.reshape(-1).at[flat_idx].set(vals, mode="drop")
    return state.replace(weak=weak.reshape(h, w))


def ransac_fit_planes(key, data, state: PMState, weak_x, weak_y, weak_valid,
                      anchors, triplets=None) -> jnp.ndarray:
    """Per-iteration support-plane fit from a weak pixel's anchors
    (reference: RANSACToGetFitPlane, APD.cu:2486-2598). Runs on camera-frame
    planes; returns (Nw, 4) fit planes (zeros when no fit).

    Note a deliberately unreproduced reference branch: with <3 anchors the
    reference emits the CURRENT plane instead of zeros (APD.cu:2525-2528),
    which lets the weak refinement ladder run its random probes. That
    branch is dead in practice — every surviving WEAK pixel carries >=6
    anchors (GenAnchors requires >=6 inliers and NeigbourUpdate demotes
    the rest) — so we keep the simpler all-or-zeros contract.

    ``triplets``: injected (RANSAC_ITERS, Nw, 3) raw draws (testing seam,
    see AnchorRaws); None draws from ``key`` as before."""
    h, w = state.weak.shape
    Nw = weak_x.shape[0]
    xf = weak_x.astype(jnp.float32)
    yf = weak_y.astype(jnp.float32)
    cam = data.ref_cam

    ax = anchors[:, 1:, 0]
    ay = anchors[:, 1:, 1]
    exists = (ax >= 0) & (ay >= 0)
    a_planes = fetch(state.planes, jnp.maximum(ax, 0), jnp.maximum(ay, 0))
    a_depth = geo.depth_from_plane(cam, a_planes, ax.astype(jnp.float32),
                                   ay.astype(jnp.float32))
    pts = geo.backproject(cam, ax.astype(jnp.float32), ay.astype(jnp.float32),
                          a_depth)                              # (Nw, 8, 3)
    count = exists.sum(-1)
    enough = count >= 3
    rank = jnp.cumsum(exists, axis=-1) - 1

    def nth_valid(n):
        hit = exists & (rank == n[:, None])
        return jnp.argmax(hit, axis=-1)

    def body(i, carry):
        best_cost, best_plane, has, k = carry
        if triplets is None:
            k, kd = jax.random.split(k)
            r = jax.random.randint(kd, (Nw, 3), 0, 1 << 30) \
                % jnp.maximum(count, 1)[:, None]
        else:
            r = triplets[i] % jnp.maximum(count, 1)[:, None]
        a = nth_valid(r[:, 0])
        b = nth_valid(r[:, 1])
        c = nth_valid(r[:, 2])
        distinct = (a != b) & (b != c) & (a != c)

        def gat(v, idx):
            return jnp.take_along_axis(v, idx[:, None], 1)[:, 0]

        tri = _point_in_triangle(
            gat(ax, a).astype(jnp.float32), gat(ay, a).astype(jnp.float32),
            gat(ax, b).astype(jnp.float32), gat(ay, b).astype(jnp.float32),
            gat(ax, c).astype(jnp.float32), gat(ay, c).astype(jnp.float32),
            xf, yf)
        plane, degen, _ = _plane_from_triplet(pts, a, b, c)
        others = exists & (jnp.arange(8)[None, :] != a[:, None]) \
            & (jnp.arange(8)[None, :] != b[:, None]) \
            & (jnp.arange(8)[None, :] != c[:, None])
        dist = jnp.abs((pts * plane[:, None, :3]).sum(-1) + plane[:, None, 3])
        cost = jnp.where(others, dist, 0.0).sum(-1)
        usable = distinct & tri & ~degen & enough
        better = usable & (cost < best_cost)
        best_plane = jnp.where(better[:, None], plane, best_plane)
        best_cost = jnp.where(better, cost, best_cost)
        return (best_cost, best_plane, has | better, k)

    init = (jnp.full((Nw,), jnp.inf), jnp.zeros((Nw, 4)),
            jnp.zeros((Nw,), bool), key)
    _, best_plane, has, _ = jax.lax.fori_loop(0, RANSAC_ITERS, body, init)

    # flip toward the camera (reference: APD.cu:2582-2594)
    depth = geo.depth_from_plane(cam, fetch(state.planes, weak_x, weak_y),
                                 xf, yf)
    vd = geo.view_direction(cam, xf, yf, depth)
    flip = (best_plane[:, :3] * vd).sum(-1) > 0
    best_plane = jnp.where(flip[:, None], -best_plane, best_plane)
    return jnp.where((has & weak_valid)[:, None], best_plane,
                     jnp.zeros_like(best_plane))

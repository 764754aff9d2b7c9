"""Pixel-serial fusion oracle — exact reference semantics, slow on purpose.

The production fusion (`pipeline.fusion._fuse_general`) consumes matched
source pixels at ref-view granularity to stay vectorizable; the reference
consumes them pixel-by-pixel in row-major scan order
(/root/reference/APD.cpp:1140-1224), so a source pixel matched by an early
ref pixel is unavailable to every later pixel — including later pixels of
the SAME ref view. This oracle reproduces that serial behavior exactly, so
tests can measure how many extra points the view-level relaxation admits
(QUALITY.md records the rates)."""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from ..config import WEAK
from ..pipeline.fusion import FusionView, _backproject_world, _project


def fuse_general_serial(views: Sequence[FusionView], problems,
                        params) -> Tuple[np.ndarray, np.ndarray]:
    """Reference-ordered general fusion. Returns (coords (N,3), colors)."""
    id_to_index = {p.ref_image_id: i for i, p in enumerate(problems)}
    pts: List[np.ndarray] = []
    cols: List[np.ndarray] = []
    masks = [np.zeros(v.depth.shape, bool) for v in views]
    for ri, p in enumerate(problems):
        rv = views[ri]
        h, w = rv.depth.shape
        src_views = [id_to_index[sid] for sid in p.src_image_ids]
        for r in range(h):
            for c in range(w):
                if masks[ri][r, c] or rv.skip[r, c]:
                    continue
                ref_depth = rv.depth[r, c]
                if ref_depth <= 0.0:
                    continue
                ref_normal = rv.normal[r, c]
                Xw = _backproject_world(rv.camera, np.float32(c),
                                        np.float32(r), ref_depth)
                num_consistent = 0
                dyn = 0.0
                used = []
                for si in src_views:
                    sv = views[si]
                    sh, sw = sv.depth.shape
                    px, py, pd = _project(sv.camera, Xw)
                    sr = int(np.floor(py + 0.5))
                    sc = int(np.floor(px + 0.5))
                    if not (0 <= sc < sw and 0 <= sr < sh):
                        continue
                    if masks[si][sr, sc]:
                        continue
                    s_depth = sv.depth[sr, sc]
                    if s_depth <= 0.0:
                        continue
                    Xs = _backproject_world(sv.camera, np.float32(sc),
                                            np.float32(sr), s_depth)
                    bx, by, bd = _project(rv.camera, Xs)
                    reproj = np.sqrt((c - bx) ** 2 + (r - by) ** 2)
                    # the reference reuses proj_depth from the back-projection
                    # into the REF camera here (APD.cpp:1184-1186)
                    rel_d = abs(bd - ref_depth) / ref_depth
                    s_normal = sv.normal[sr, sc]
                    denom = max(np.linalg.norm(ref_normal)
                                * np.linalg.norm(s_normal), 1e-12)
                    ang = np.arccos(np.clip(
                        float(ref_normal @ s_normal) / denom, -1.0, 1.0))
                    if reproj < params.reproj_max \
                            and rel_d < params.rel_depth_max \
                            and ang < params.angle_max:
                        used.append((si, sr, sc))
                        dyn += np.exp(-(reproj + 200.0 * rel_d + 10.0 * ang))
                        num_consistent += 1
                factor = params.dyn_factor_weak if rv.weak[r, c] == WEAK \
                    else params.dyn_factor_strong
                if num_consistent >= 1 and dyn > factor * num_consistent:
                    color = rv.image[r, c].astype(np.float64).copy()
                    for si, sr, sc in used:
                        masks[si][sr, sc] = True
                        color += views[si].image[sr, sc]
                    pts.append(np.asarray(Xw, np.float32))
                    cols.append(np.clip(color / (num_consistent + 1),
                                        0, 255).astype(np.uint8))
    if not pts:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.uint8)
    return np.stack(pts), np.stack(cols)


def relaxation_report(views_fast, views_serial, problems, params) -> dict:
    """Run both schemes on (deep copies of) the same inputs and report the
    extra-point rate of the view-level consumption relaxation."""
    from ..pipeline.fusion import _fuse_general

    pts_fast, _ = _fuse_general(views_fast, problems, params)
    pts_serial, _ = fuse_general_serial(views_serial, problems, params)
    n_fast, n_serial = len(pts_fast), len(pts_serial)
    return {
        "points_view_level": n_fast,
        "points_pixel_serial": n_serial,
        "extra_point_rate": (n_fast - n_serial) / max(n_serial, 1),
    }

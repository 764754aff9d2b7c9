"""Depth-map fusion into a point cloud (reference: RunFusion / RunFusion_TAT_I
/ RunFusion_TAT_A + WeakVisFilter, APD.cpp:962-1608).

Vectorized re-architecture: the reference's serial CPU triple loop becomes
whole-image array math per (ref view, neighbor) pair. The reference consumes
matched source pixels while scanning pixels serially; we apply consumption at
ref-view granularity (all pixels of a view observe the mask state from the
view's start, and consumed pixels are committed afterwards). This keeps the
cross-view dedup semantics while exposing full parallelism; within-view
double-counting is possible where the reference would have suppressed a
second match onto the same source pixel.

Deviation from the reference, by design: WeakVisFilter compares confidences
by value — the reference reads the uchar confidence mat through a float
accessor (APD.cpp:1010), which reinterprets 4 bytes as a float; we implement
the evident intent.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

from ..config import FusionParams, STRONG, UNKNOWN, WEAK
from ..io import read_bin_mat
from ..io.cameras import Camera, read_camera
from ..io.images import read_image_color, resize_bilinear, write_image
from ..io.ply import export_point_cloud


@dataclasses.dataclass
class FusionView:
    image: np.ndarray        # (H, W, 3) uint8 BGR at depth resolution
    camera: Camera
    depth: np.ndarray        # (H, W) f32
    normal: np.ndarray       # (H, W, 3) f32
    weak: np.ndarray         # (H, W) uint8
    confidence: np.ndarray   # (H, W) uint8
    skip: np.ndarray         # (H, W) bool  (visibility-conflict filter)
    mask: np.ndarray         # (H, W) bool  (consumed)


def _backproject_world(cam: Camera, xs, ys, depth):
    X = np.stack([depth * (xs - cam.K[0, 2]) / cam.K[0, 0],
                  depth * (ys - cam.K[1, 2]) / cam.K[1, 1],
                  depth], axis=-1)
    return X @ np.asarray(cam.R) + cam.c


def _project(cam: Camera, Xw):
    Xc = (Xw - cam.c) @ np.asarray(cam.R).T
    d = Xc[..., 2]
    with np.errstate(divide="ignore", invalid="ignore"):
        x = (cam.K[0, 0] * Xc[..., 0] + cam.K[0, 2] * Xc[..., 2]) / d
        y = (cam.K[1, 1] * Xc[..., 1] + cam.K[1, 2] * Xc[..., 2]) / d
    return x, y, d


def load_fusion_views(dense_folder, problems, cache=None) -> List[FusionView]:
    dense_folder = Path(dense_folder)
    views = []
    for p in problems:
        img = read_image_color(
            dense_folder / "images" / (f"{p.ref_image_id:08d}" + p.img_ext))
        cam = read_camera(
            dense_folder / "cams" / (f"{p.ref_image_id:08d}_cam.txt"),
            cache=cache)
        depth = read_bin_mat(p.result_folder / "depths.bin", cache=cache)
        normal = read_bin_mat(p.result_folder / "normals.bin", cache=cache)
        weak = read_bin_mat(p.result_folder / "weak.bin", cache=cache)
        conf = read_bin_mat(p.result_folder / "confidence.bin", cache=cache)
        h, w = depth.shape
        if img.shape[:2] != (h, w):
            sy, sx = h / img.shape[0], w / img.shape[1]
            img = resize_bilinear(img, (h, w))
            cam = cam.scaled(sx, sy, w, h)
        else:
            cam = dataclasses.replace(cam, width=w, height=h)
        views.append(FusionView(
            image=img, camera=cam, depth=depth.astype(np.float32),
            normal=normal.astype(np.float32), weak=weak.astype(np.uint8),
            confidence=conf.astype(np.uint8),
            skip=np.zeros((h, w), bool), mask=np.zeros((h, w), bool)))
    return views


def weak_vis_filter(views: Sequence[FusionView], problems, dense_folder,
                    params: FusionParams) -> None:
    """Visibility-conflict filter over weak pixels (reference: WeakVisFilter,
    APD.cpp:962-1049): a weak point is skipped when it floats in front of
    enough higher-priority surfaces in other views."""
    from ..io import native

    use_native = native.native_available()
    for ri, rv in enumerate(views):
        h, w = rv.depth.shape
        weak_sel = rv.weak == WEAK
        strong_occ = np.zeros((h, w), np.int32)
        weak_occ = np.zeros((h, w), np.int32)
        if use_native:
            for si, sv in enumerate(views):
                if si != ri:
                    native.weak_vis_accumulate(
                        rv, sv, params.vis_max_baseline_deg,
                        params.vis_depth_margin, strong_occ, weak_occ)
        else:
            ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
            Xw = _backproject_world(rv.camera, xs, ys, rv.depth)
            for si, sv in enumerate(views):
                if si == ri:
                    continue
                a = rv.camera.c - Xw
                b = sv.camera.c - Xw
                cosang = (a * b).sum(-1) / np.maximum(
                    np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1),
                    1e-12)
                angle = np.degrees(np.arccos(np.clip(cosang, -1, 1)))
                px, py, pd = _project(sv.camera, Xw)
                sr = np.floor(py + 0.5).astype(np.int64)
                sc = np.floor(px + 0.5).astype(np.int64)
                sh, sw = sv.depth.shape
                inb = (pd > 0) & (sc >= 0) & (sc < sw) & (sr >= 0) & (sr < sh) \
                    & (angle <= params.vis_max_baseline_deg)
                src = np.clip(sr, 0, sh - 1)
                scc = np.clip(sc, 0, sw - 1)
                s_depth = sv.depth[src, scc]
                s_weak = sv.weak[src, scc]
                s_conf = sv.confidence[src, scc]
                occluded = inb & (pd < s_depth
                                  - params.vis_depth_margin * s_depth)
                strong_occ += (occluded & (s_weak == STRONG)).astype(np.int32)
                weak_occ += (occluded & (s_weak == WEAK)
                             & (s_conf < rv.confidence)).astype(np.int32)
        rv.skip = weak_sel & ((strong_occ >= params.strong_occluded_max)
                              | (weak_occ >= params.weak_occluded_max))
        out = Path(dense_folder) / "APD" / f"{problems[ri].ref_image_id:08d}" \
            / "skip.png"
        write_image(out, (rv.skip * 255).astype(np.uint8))


def _neighbor_geometry(rv: FusionView, sv: FusionView, Xw):
    """Projection of a ref view's world points into a neighbor: returns
    (usable, reproj error, relative depth diff, normal angle, src rows/cols).
    Uses the native C++ kernel when built (native/apde_native.cpp), falling
    back to vectorized numpy."""
    from ..io import native
    out = native.fusion_neighbor_geometry(rv, sv)
    if out is not None:
        return out
    px, py, pd = _project(sv.camera, Xw)
    sr = np.floor(py + 0.5).astype(np.int64)
    sc = np.floor(px + 0.5).astype(np.int64)
    sh, sw = sv.depth.shape
    inb = (sc >= 0) & (sc < sw) & (sr >= 0) & (sr < sh)
    src = np.clip(sr, 0, sh - 1)
    scc = np.clip(sc, 0, sw - 1)
    s_depth = sv.depth[src, scc]
    usable = inb & ~sv.mask[src, scc] & (s_depth > 0)
    ys2, xs2 = src.astype(np.float32), scc.astype(np.float32)
    Xs = _backproject_world(sv.camera, xs2, ys2, s_depth)
    bx, by, bd = _project(rv.camera, Xs)
    h, w = rv.depth.shape
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    reproj = np.sqrt((xx - bx) ** 2 + (yy - by) ** 2)
    rel_depth = np.abs(bd - rv.depth) / np.maximum(rv.depth, 1e-12)
    s_normal = sv.normal[src, scc]
    dot = (rv.normal * s_normal).sum(-1)
    denom = np.linalg.norm(rv.normal, axis=-1) * np.linalg.norm(s_normal, axis=-1)
    ang = np.arccos(np.clip(dot / np.maximum(denom, 1e-12), -1, 1))
    ang = np.where(np.isfinite(ang), ang, 0.0)
    return usable, reproj, rel_depth, ang, src, scc


def run_fusion(dense_folder, problems, name: str, params: FusionParams,
               export_color: bool = True, cache=None,
               shard=None) -> Path:
    """Fuse all views' depth maps into one PLY (dispatches on variant).

    ``shard=(i, n)`` enables distributed fusion: this process fuses only the
    reference views with index ≡ i (mod n) and writes a partial PLY
    (``<name>.part<i>of<n>``); `merge_fusion_shards` concatenates the parts.
    All views' maps are still loaded (they are every shard's neighbor
    inputs). Cross-shard source-pixel consumption is not exchanged — each
    shard deduplicates against its own views only, a documented relaxation
    of the reference's serial mask semantics.
    """
    views = load_fusion_views(dense_folder, problems, cache=cache)
    if cache is not None:
        cache.img_cache.clear()
    if params.weak_filter:
        weak_vis_filter(views, problems, dense_folder, params)
    ref_indices = list(range(len(problems)))
    if shard is not None:
        ref_indices = [i for i in ref_indices if i % shard[1] == shard[0]]
    consumption = None
    if params.variant == "general":
        if shard is not None:
            # the owner-wins replay buckets global pixel ids at multiples of
            # ONE hw (views[0]); mixed-resolution depth maps would misbucket
            # views at merge time — fail here with a clear message instead
            shapes = {v.depth.shape for v in views}
            if len(shapes) != 1:
                raise ValueError(
                    "sharded fusion with consumption recording requires all "
                    f"views to share one depth-map shape; got {shapes}")
            coords, colors, consumption = _fuse_general(
                views, problems, params, ref_indices,
                record_consumption=True)
        else:
            coords, colors = _fuse_general(views, problems, params,
                                           ref_indices)
    else:
        coords, colors = _fuse_tat(views, problems, params,
                                   advanced=(params.variant == "tat_a"),
                                   ref_indices=ref_indices)
    ply_path = Path(dense_folder) / "APD" / name
    if shard is not None:
        ply_path = ply_path.with_name(
            f"{name}.part{shard[0]}of{shard[1]}")
    export_point_cloud(ply_path, coords,
                       colors if export_color else None)
    if consumption is not None:
        h, w = views[0].depth.shape
        _write_consumption(ply_path, consumption, h * w)
    print(f"Fusion: {len(coords)} points -> {ply_path}", flush=True)
    return ply_path


def _write_consumption(ply_path, consumption, hw: int) -> None:
    """Persist a shard's consumption sidecar as raw mmap-able .npy files in
    `<ply>.consume/`, at the smallest sufficient integer width.

    The round-4 150-view x 6 MP stress run measured the old compressed-npz
    int64 format at 13 GB PER SHARD and OOM-killed the merge at 122 GB RSS
    (the merge decompressed every shard's K≈800M-entry arrays at once).
    Raw uint32 .npy halves the bytes and — the real point — lets the merge
    stream per-view slices via np.load(mmap_mode="r") instead of
    materializing everything."""
    import json as _json

    d = Path(str(ply_path) + ".consume")
    d.mkdir(parents=True, exist_ok=True)
    gid_max = max(int(consumption["origin"].max(initial=0)),
                  int(consumption["cons_gid"].max(initial=0)))
    gid_dt = np.uint32 if gid_max < 2 ** 32 else np.int64
    pt_max = int(consumption["cons_pt"].max(initial=0))
    pt_dt = np.uint32 if pt_max < 2 ** 32 else np.int64
    np.save(d / "origin.npy", consumption["origin"].astype(gid_dt))
    np.save(d / "cons_pt.npy", consumption["cons_pt"].astype(pt_dt))
    np.save(d / "cons_gid.npy", consumption["cons_gid"].astype(gid_dt))
    # lengths + version let the merge detect writer/reader skew or a
    # partially rewritten sidecar (one .npy regenerated, others stale)
    (d / "meta.json").write_text(_json.dumps({
        "version": 1, "hw": int(hw),
        "n_origin": int(len(consumption["origin"])),
        "n_cons": int(len(consumption["cons_pt"]))}))


def _owner_wins_replay(sides, hw: int, chunk: int = 1 << 24):
    """Memory-lean exact equivalent of `owner_wins_filter` over mmap-ed
    shard sidecars: one ascending pass over ref views with a consumed
    bitmap.

    The fixpoint semantics — a point is dropped iff a KEPT point of an
    EARLIER ref view consumed its origin pixel — have no cyclic
    dependencies (blockers only come from earlier views), so a single
    replay in view order computes the fixpoint exactly: decide all of view
    v's keeps against the bitmap, then mark the kept points' consumption.
    Memory: one bool per (view, pixel) gid (~1 GB at 150 views x 6 MP)
    plus one view's entry slices; per-shard arrays stay on disk.

    sides: list of dicts with mmap-ed "origin"/"cons_pt"/"cons_gid".
    Returns per-shard keep masks.
    """
    n_views = 0
    for s in sides:
        if len(s["origin"]):
            n_views = max(n_views, int(s["origin"][-1]) // hw + 1)
        if len(s["cons_gid"]):
            # consumed gids can exceed any origin (source views past the
            # last ref view); scan chunked for the max
            m = 0
            cg = s["cons_gid"]
            for i in range(0, len(cg), chunk):
                m = max(m, int(cg[i:i + chunk].max()))
            n_views = max(n_views, m // hw + 1)
    bitmap = np.zeros(n_views * hw, bool)
    kept = [np.ones(len(s["origin"]), bool) for s in sides]

    # per shard: point ranges per view (origin is ascending — points are
    # appended ref-view ascending, raster order within a view), and entry
    # ranges per view (entries are view-grouped by construction; one
    # chunked pass counts entries per view)
    pstarts = []
    eranges = []
    for s in sides:
        origin = s["origin"]
        ps = np.searchsorted(origin, np.arange(n_views + 1,
                                               dtype=np.int64) * hw)
        pstarts.append(ps)
        counts = np.zeros(n_views, np.int64)
        cp = s["cons_pt"]
        prev_v = -1
        for i in range(0, len(cp), chunk):
            c = cp[i:i + chunk]
            ev = np.searchsorted(ps, c, side="right") - 1
            counts += np.bincount(ev, minlength=n_views)
            # grouping sanity: entry views never go backwards across chunks
            if len(ev):
                assert prev_v <= int(ev[0]), "consumption not view-grouped"
                prev_v = int(ev[-1])
        eranges.append(np.concatenate([[0], np.cumsum(counts)]))

    for v in range(n_views):
        # decide view v's points everywhere before marking any consumption
        for si, s in enumerate(sides):
            p0, p1 = int(pstarts[si][v]), int(pstarts[si][v + 1])
            if p1 > p0:
                kept[si][p0:p1] = ~bitmap[np.asarray(s["origin"][p0:p1],
                                                     np.int64)]
        for si, s in enumerate(sides):
            e0, e1 = int(eranges[si][v]), int(eranges[si][v + 1])
            for i in range(e0, e1, chunk):
                j = min(i + chunk, e1)
                cp = np.asarray(s["cons_pt"][i:j], np.int64)
                m = kept[si][cp]
                bitmap[np.asarray(s["cons_gid"][i:j], np.int64)[m]] = True
    return kept


def owner_wins_filter(origin, cons_pt, cons_gid, hw):
    """Cross-shard consumption at merge time: a point whose origin ref pixel
    was consumed by a kept point of an EARLIER ref view is dropped — the
    exact reason the reference's serial scan would have skipped that pixel
    (APD.cpp:1149). Iterates to a fixpoint so dropped points stop consuming.

    origin: (N,) global ref-pixel ids (view * hw + pixel); cons_pt: (K,)
    point ranks; cons_gid: (K,) consumed pixel ids. Returns a (N,) keep mask.
    """
    n = len(origin)
    origin_view = (origin // hw).astype(np.int64)
    # compact the gid universe so the scatter table stays small
    all_gids = np.concatenate([origin, cons_gid])
    uniq, inv = np.unique(all_gids, return_inverse=True)
    origin_c = inv[:n]
    cons_c = inv[n:]
    entry_view = origin_view[cons_pt]
    kept = np.ones(n, bool)
    big = np.int64(1 << 60)
    # consumption chains are bounded by the number of distinct ref views, so
    # iterate until the fixpoint with that bound (+1 slack to detect
    # non-convergence, which cannot happen but is guarded anyway)
    max_rounds = len(np.unique(origin_view)) + 1
    for round_i in range(max_rounds):
        min_view = np.full(len(uniq), big, np.int64)
        valid = kept[cons_pt]
        np.minimum.at(min_view, cons_c[valid], entry_view[valid])
        new_kept = min_view[origin_c] >= origin_view
        if np.array_equal(new_kept, kept):
            break
        kept = new_kept
    else:
        print("owner_wins_filter: no fixpoint after "
              f"{max_rounds} rounds (keeping last mask)", flush=True)
    return kept


def _consumption_side_ok(side, meta) -> bool:
    """Cross-check one shard's consumption sidecar against its recorded
    meta (format version, per-array lengths, entry/point pairing, point-rank
    bound) so a partially rewritten sidecar — one .npy regenerated while the
    others are stale — is caught before the replay trusts it."""
    if meta.get("version", 0) != 1:
        return False
    n_origin = meta.get("n_origin")
    n_cons = meta.get("n_cons")
    if n_origin is None or n_cons is None:
        return False
    if len(side["origin"]) != n_origin or len(side["cons_pt"]) != n_cons \
            or len(side["cons_gid"]) != n_cons:
        return False
    # cons_pt holds this shard's point ranks; a stale origin.npy shows up as
    # ranks past the point count (cheap endpoint checks — entries append in
    # point order, so the final entry carries the largest rank seen late)
    if n_cons and (int(side["cons_pt"][-1]) >= n_origin
                   or int(side["cons_pt"][0]) >= n_origin):
        return False
    return True


def merge_fusion_shards(dense_folder, name: str, num_shards: int,
                        export_color: bool = True) -> Path:
    """Merge partial PLYs written by sharded fusion runs.

    When consumption sidecars are present (general variant), applies the
    owner-wins filter so the merged cloud reproduces the reference's
    cross-view source-pixel consumption instead of concatenating the
    shards' duplicated points."""
    import json as _json

    import numpy as np

    from ..io.ply import read_ply

    coords, colors, sides, hw = [], [], [], None
    for i in range(num_shards):
        part = Path(dense_folder) / "APD" / f"{name}.part{i}of{num_shards}"
        c, col = read_ply(part)
        coords.append(c)
        if col is not None:
            colors.append(col)
        d = Path(str(part) + ".consume")
        if (d / "meta.json").exists():
            # mmap: the stress-scale sidecars are tens of GB total and the
            # replay only touches one view's slices at a time
            side = {k: np.load(d / f"{k}.npy", mmap_mode="r")
                    for k in ("origin", "cons_pt", "cons_gid")}
            meta = _json.loads((d / "meta.json").read_text())
            hw = int(meta["hw"])
            side["_meta_ok"] = _consumption_side_ok(side, meta)
            sides.append(side)
        else:
            sides.append(None)
    part_sizes = [len(c) for c in coords]
    coords = np.concatenate(coords)
    colors = np.concatenate(colors) if colors else None

    sides_ok = all(s is not None for s in sides) and all(
        len(s["origin"]) == m and s["_meta_ok"]
        for s, m in zip(sides, part_sizes))
    if any(s is not None for s in sides) and not sides_ok:
        print("merge_fusion_shards: consumption sidecars are stale or "
              "incomplete for the current part PLYs — merging without the "
              "owner-wins filter", flush=True)
    if sides_ok and len(coords):
        kept = np.concatenate(_owner_wins_replay(sides, hw))
        dropped = int((~kept).sum())
        coords = coords[kept]
        if colors is not None:
            colors = colors[kept]
        print(f"Owner-wins consumption merge: dropped {dropped} "
              f"cross-shard duplicate points", flush=True)

    ply_path = Path(dense_folder) / "APD" / name
    export_point_cloud(ply_path, coords,
                       colors if export_color and colors is not None else None)
    print(f"Merged {num_shards} fusion shards: {len(coords)} points -> "
          f"{ply_path}", flush=True)
    return ply_path


def _concat_points(all_pts, all_cols):
    """Concatenate per-view point/color chunks; empty input (e.g. a fusion
    shard with no reference views) yields empty (0, 3) arrays instead of the
    ValueError np.concatenate raises on an empty list."""
    if not all_pts:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.uint8)
    return np.concatenate(all_pts), np.concatenate(all_cols)


def _fuse_general(views, problems, params: FusionParams, ref_indices=None,
                  record_consumption=False):
    """Dynamic-consistency fusion (reference: RunFusion, APD.cpp:1051-1227).

    With ``record_consumption``, also returns per-point provenance (the
    origin ref pixel and every consumed source pixel, as global
    ``view_index * H * W + row * W + col`` ids) so sharded runs can apply
    the reference's cross-view consumption at merge time (owner-wins)."""
    all_pts, all_cols = [], []
    origins, consumed_flat, consumed_count = [], [], []
    id_to_index = {p.ref_image_id: i for i, p in enumerate(problems)}
    if ref_indices is None:
        ref_indices = range(len(problems))
    for ri in ref_indices:
        p = problems[ri]
        rv = views[ri]
        h, w = rv.depth.shape
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
        base = (~rv.mask) & (~rv.skip) & (rv.depth > 0)
        Xw = _backproject_world(rv.camera, xs, ys, rv.depth)
        num_consistent = np.zeros((h, w), np.int32)
        dyn = np.zeros((h, w), np.float64)
        used = []
        for sid in p.src_image_ids:
            sv = views[id_to_index[sid]]
            usable, reproj, rel_d, ang, src, scc = _neighbor_geometry(rv, sv, Xw)
            ok = usable & (reproj < params.reproj_max) \
                & (rel_d < params.rel_depth_max) & (ang < params.angle_max)
            num_consistent += ok.astype(np.int32)
            dyn += np.where(ok, np.exp(-(reproj + 200.0 * rel_d + 10.0 * ang)),
                            0.0)
            used.append((id_to_index[sid], sv, ok, src, scc))
        factor = np.where(rv.weak == WEAK, params.dyn_factor_weak,
                          params.dyn_factor_strong)
        accept = base & (num_consistent >= 1) & (dyn > factor * num_consistent)
        color = rv.image.astype(np.float64).copy()
        acc_order = np.full((h, w), -1, np.int64)
        n_before = sum(len(a) for a in all_pts)
        if record_consumption:
            acc_order[accept] = n_before + np.arange(int(accept.sum()))
        for si, sv, ok, src, scc in used:
            take = accept & ok
            color[take] += sv.image[src[take], scc[take]]
            sv.mask[src[take], scc[take]] = True
            if record_consumption:
                consumed_count.append(acc_order[take])          # point ranks
                consumed_flat.append(si * h * w + src[take] * w + scc[take])
        color[accept] /= (num_consistent[accept] + 1)[:, None]
        all_pts.append(Xw[accept].astype(np.float32))
        all_cols.append(np.clip(color[accept], 0, 255).astype(np.uint8))
        if record_consumption:
            yy, xx = np.nonzero(accept)
            origins.append(ri * h * w + yy * w + xx)
    pts, cols = _concat_points(all_pts, all_cols)
    if not record_consumption:
        return pts, cols
    def cat(parts, dtype):
        return (np.concatenate(parts) if parts
                else np.zeros((0,), dtype)).astype(dtype)
    return pts, cols, {
        "origin": cat(origins, np.int64),        # (N,) global ref-pixel id
        "cons_pt": cat(consumed_count, np.int64),  # (K,) point rank
        "cons_gid": cat(consumed_flat, np.int64),  # (K,) consumed pixel id
    }


def _fuse_tat(views, problems, params: FusionParams, advanced: bool,
              ref_indices=None):
    """Escalating-k consensus fusion (reference: RunFusion_TAT_I/_TAT_A,
    APD.cpp:1229-1608). The advanced variant drops the normal-angle test."""
    all_pts, all_cols = [], []
    id_to_index = {p.ref_image_id: i for i, p in enumerate(problems)}
    depth_base = params.depth_base_tat_a if advanced else params.depth_base_tat_i
    if ref_indices is None:
        ref_indices = range(len(problems))
    for ri in ref_indices:
        p = problems[ri]
        rv = views[ri]
        h, w = rv.depth.shape
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
        base = (~rv.skip) & (rv.depth > 0)
        Xw = _backproject_world(rv.camera, xs, ys, rv.depth)
        num_ngb = len(p.src_image_ids)
        geo = []
        for sid in p.src_image_ids:
            sv = views[id_to_index[sid]]
            usable, reproj, rel_d, ang, src, scc = _neighbor_geometry(rv, sv, Xw)
            geo.append((sv, usable, reproj, rel_d, ang, src, scc))
        accepted = np.zeros((h, w), bool)
        count_at_accept = np.zeros((h, w), np.int32)
        use_at_accept = [np.zeros((h, w), bool) for _ in range(num_ngb)]
        for k in range(2, num_ngb + 1):
            oks = []
            count = np.zeros((h, w), np.int32)
            for (sv, usable, reproj, rel_d, ang, src, scc) in geo:
                ok = usable & (reproj < k * params.dist_base) \
                    & (rel_d < k * depth_base)
                if not advanced:
                    ok &= ang < (k * params.angle_grad + params.angle_base)
                oks.append(ok)
                count += ok.astype(np.int32)
            newly = base & ~accepted & (count >= k)
            accepted |= newly
            count_at_accept = np.where(newly, count, count_at_accept)
            if not advanced:
                for j, ok in enumerate(oks):
                    use_at_accept[j] |= newly & ok
        rv.mask |= accepted
        color = rv.image.astype(np.float64).copy()
        if not advanced:
            for j, g in enumerate(geo):
                sv, src, scc = g[0], g[5], g[6]
                take = use_at_accept[j]
                color[take] += sv.image[src[take], scc[take]]
            color[accepted] /= (count_at_accept[accepted] + 1)[:, None]
        all_pts.append(Xw[accepted].astype(np.float32))
        all_cols.append(np.clip(color[accepted], 0, 255).astype(np.uint8))
    return _concat_points(all_pts, all_cols)

"""Multi-view matching cost kernels — the hot path of PatchMatch.

TPU re-architecture of the reference's texture-fetch NCC kernels
(ComputeBilateralNCCOld/New, APD.cu:448-721): costs are evaluated for a flat
*batch of pixels* (a checkerboard color half, a weak-pixel compaction, or a
whole image) rather than per CUDA thread. Everything reduces to bilinear
gathers from quad-packed images plus elementwise math, so the same primitive
serves propagation candidates, refinement, reliability sweeps and local
refine.

Key structural optimization over a literal translation: the reference
recomputes the reference-image window sums for every (candidate, view) pair;
they only depend on the pixel, so `precompute_ref_window` hoists them out of
the candidate x view loops (taps, validity masks, sum_ref, sum_ref_ref) —
a ~2x tap-traffic reduction with bit-identical semantics (all tap weights
are 1.0 in the reference).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core import geometry as geo
from ..core.sampling import bilinear_sample_packed, fetch, lerp_quad_rows, \
    pack_bilinear, pack_bilinear_u8, quad_coords, texel_fetch

COST_MAX = 2.0
GEOM_COST_MAX = 3.0
MIN_VAR = 1e-5

# Fixed 36-tap star pattern used inside SA segments (4 quadrants x 9 taps,
# truncated at segment boundaries; reference: APD.cu:664-719).
_STAR_SIGNS = np.array([[1, 1], [-1, -1], [1, -1], [-1, 1]])
_STAR_OFFSETS = np.array([[1, 1], [3, 1], [1, 3], [1, 5], [3, 3],
                          [5, 1], [5, 3], [3, 5], [5, 5]])


def star_taps() -> np.ndarray:
    """(36, 2) star taps ordered quadrant-major (truncation order)."""
    taps = []
    for sx, sy in _STAR_SIGNS:
        for ox, oy in _STAR_OFFSETS:
            taps.append((ox * sx, oy * sy))
    return np.asarray(taps, np.int32)


def square_taps(radius: int, increment: int) -> np.ndarray:
    axis = list(range(-radius, radius + 1, increment))
    return np.asarray([(dx, dy) for dy in axis for dx in axis], np.int32)


@struct.dataclass
class CostData:
    """Per-problem device data for cost evaluation (one reference view and its
    S source views). Static geometry info lives in `width`/`height`/`num_src`
    which are jit-static."""

    ref_cam: geo.CameraArrays            # unbatched
    src_cams: geo.CameraArrays           # batched over S
    ref_image: jnp.ndarray               # (H, W) f32
    src_quads: jnp.ndarray               # (S, H*W, 4) packed bilinear quads,
                                         # u8 (default) or f32 (exact oracle)
    sa_mask: jnp.ndarray                 # (H, W) int32; zeros when SA unused
    src_depths: jnp.ndarray              # (S, H, W) f32; zeros when unused
    width: int = struct.field(pytree_node=False)
    height: int = struct.field(pytree_node=False)
    num_src: int = struct.field(pytree_node=False)
    # real (unpadded) image bounds: out-of-image tests must use these, or
    # warps landing in the pad strip score edge-replicated NCC instead of
    # the reference's COST_MAX
    real_width: int = struct.field(pytree_node=False, default=0)
    real_height: int = struct.field(pytree_node=False, default=0)
    # source-array row count when it differs from `height` (the halo tile
    # sweep hands each shard a row-windowed REF image while source images
    # stay full-frame; quad indexing/clamping must use the source height)
    src_height: int = struct.field(pytree_node=False, default=0)

    @property
    def img_w(self):
        return self.real_width or self.width

    @property
    def img_h(self):
        return self.real_height or self.height

    @property
    def src_h(self):
        return self.src_height or self.height

    @classmethod
    def build(cls, ref_cam, src_cams, ref_image, src_images, sa_mask=None,
              src_depths=None, real_width=0, real_height=0,
              sampler_u8=False):
        """With ``sampler_u8`` the source images are packed as u8 quads
        (~2.4x gather throughput, 4x smaller table; see core.sampling) and
        both ref and source values are rounded to the integer grid so the
        two sides stay photometrically consistent (lossless for raw
        images)."""
        h, w = ref_image.shape
        s = src_images.shape[0]
        if sampler_u8:
            ref_image = jnp.clip(jnp.round(ref_image), 0.0, 255.0)
            quads = jax.vmap(pack_bilinear_u8)(src_images)
        else:
            quads = jax.vmap(pack_bilinear)(src_images)
        if sa_mask is None:
            sa_mask = jnp.zeros((h, w), jnp.int32)
        if src_depths is None:
            src_depths = jnp.zeros((s, h, w), jnp.float32)
        return cls(ref_cam=ref_cam, src_cams=src_cams,
                   ref_image=ref_image, src_quads=quads,
                   sa_mask=jnp.asarray(sa_mask, jnp.int32),
                   src_depths=jnp.asarray(src_depths, jnp.float32),
                   width=w, height=h, num_src=s,
                   real_width=real_width, real_height=real_height)


class RefWindow(NamedTuple):
    """Pixel-batch reference-side window data, independent of candidate/view.

    tap_dx/tap_dy/tap_w are (T,) shared constants in the plain case and
    (B, T) arrays in the SA-mixed case — keeping the shared case tiny matters:
    a broadcast (B, T) constant would be constant-folded by XLA into tens of
    MB and dominate compile time."""

    tap_dx: jnp.ndarray    # (T,) or (B, T) f32
    tap_dy: jnp.ndarray    # (T,) or (B, T)
    tap_val: jnp.ndarray   # (B, T) ref image values
    tap_w: jnp.ndarray     # (T,) or (B, T) 0/1 tap weights
    sum_ref: jnp.ndarray   # (B,)
    sum_rr: jnp.ndarray    # (B,)
    wsum: jnp.ndarray      # (B,) or scalar


def precompute_ref_window(data: CostData, x, y, radius: int, increment: int,
                          use_sa: bool) -> RefWindow:
    """Build the per-pixel window (tap offsets, validity, ref sums).

    Without SA: the plain square window, all taps weight 1 (reference:
    APD.cu:629-643). With SA and the pixel inside a segment (sa_mask != 0):
    the fixed star pattern truncated at the first same-quadrant tap leaving
    the segment; out-of-image taps are skipped without truncating
    (reference: APD.cu:664-698). The reference gates on the sa-mask value at
    the *warped src* location (APD.cu:619-621) which indexes the ref-view mask
    with src coordinates; we gate on the ref pixel's own segment — the sane
    reading of the intent.
    """
    sq = jnp.asarray(square_taps(radius, increment))     # (T, 2)
    B = x.shape
    xi = x.astype(jnp.int32)
    yi = y.astype(jnp.int32)
    if not use_sa:
        dx = sq[:, 0]
        dy = sq[:, 1]
        # clamped fetch for values (texture semantics), but weight stays 1
        valc = _clamped_fetch(data.ref_image, xi[..., None] + dx[None, :],
                              yi[..., None] + dy[None, :])
        w = jnp.ones((sq.shape[0],), jnp.float32)
        sum_ref = valc.sum(-1)
        sum_rr = (valc * valc).sum(-1)
        wsum = jnp.float32(sq.shape[0])
        return RefWindow(dx.astype(jnp.float32), dy.astype(jnp.float32),
                         valc, w, sum_ref, sum_rr, wsum)

    st = jnp.asarray(star_taps())                        # (36, 2)
    center_sa = fetch(data.sa_mask, xi, yi)              # (B,)
    in_segment = center_sa > 0

    # star branch validity with per-quadrant prefix truncation
    sdx = jnp.broadcast_to(st[None, :, 0], B + (36,))
    sdy = jnp.broadcast_to(st[None, :, 1], B + (36,))
    tx = xi[..., None] + sdx
    ty = yi[..., None] + sdy
    inb = (tx >= 0) & (tx < data.img_w) & (ty >= 0) & (ty < data.img_h)
    tap_sa = fetch(data.sa_mask, tx, ty)
    brk = inb & (tap_sa != center_sa[..., None])         # truncation triggers
    brk_q = brk.reshape(B + (4, 9))
    cut = jnp.cumsum(brk_q.astype(jnp.int32), axis=-1) > 0
    valid_star = inb.reshape(B + (4, 9)) & ~cut
    valid_star = valid_star.reshape(B + (36,))

    # square branch (all weight 1)
    qdx = jnp.broadcast_to(sq[None, :, 0], B + (sq.shape[0],))
    qdy = jnp.broadcast_to(sq[None, :, 1], B + (sq.shape[0],))
    if sq.shape[0] != 36:
        raise ValueError("SA mixing assumes 36-tap square windows")

    sel = in_segment[..., None]
    dx = jnp.where(sel, sdx, qdx).astype(jnp.float32)
    dy = jnp.where(sel, sdy, qdy).astype(jnp.float32)
    w = jnp.where(sel, valid_star.astype(jnp.float32), 1.0)
    val = _clamped_fetch(data.ref_image, xi[..., None] + dx.astype(jnp.int32),
                         yi[..., None] + dy.astype(jnp.int32))
    sum_ref = (w * val).sum(-1)
    sum_rr = (w * val * val).sum(-1)
    return RefWindow(dx, dy, val, w, sum_ref, sum_rr, w.sum(-1))


def sample_src_view(data: CostData, src_index, wx, wy,
                    band: bool | None = None, site: str = "?", origin=None):
    """Bilinear-sample source view `src_index` at warped positions (the CUDA
    texture-fetch replacement; reference APD.cu:617). The quad table is u8
    (default) or f32 (exact oracle); bilinear_sample_packed handles both.
    band/site: per-call-site banded-gather control; origin: pre-computed
    static band origin (core.sampling.static_band_take)."""
    return bilinear_sample_packed(data.src_quads[src_index], data.width,
                                  data.src_h, wx, wy, band=band, site=site,
                                  origin=origin)


def _clamped_fetch(arr, xi, yi):
    from ..core.sampling import take_rows
    h, w = arr.shape
    xc = jnp.clip(xi, 0, w - 1)
    yc = jnp.clip(yi, 0, h - 1)
    return take_rows(arr.reshape(-1), yc * w + xc)


def ncc_from_sums(sum_ref, sum_rr, sum_src, sum_ss, sum_rs, wsum):
    """NCC matching cost from weighted window sums (reference:
    APD.cu:543-563,644-662): cost = clip(1 - covar/sqrt(var_ref var_src)),
    cost_max where either variance is degenerate."""
    safe = wsum > 0
    inv = jnp.where(safe, 1.0 / jnp.maximum(wsum, 1e-20), 0.0)
    m_ref = sum_ref * inv
    m_rr = sum_rr * inv
    m_src = sum_src * inv
    m_ss = sum_ss * inv
    m_rs = sum_rs * inv
    var_ref = m_rr - m_ref * m_ref
    var_src = m_ss - m_src * m_src
    covar = m_rs - m_ref * m_src
    denom = jnp.sqrt(jnp.maximum(var_ref * var_src, 1e-30))
    cost = jnp.clip(1.0 - covar / denom, 0.0, COST_MAX)
    # non-finite sums (degenerate w=0 planes warp to NaN coordinates) must
    # cost COST_MAX, not NaN: NaN rows would poison argmin-based candidate
    # selection where the reference's NaN-comparison semantics skip them
    degenerate = (var_ref < MIN_VAR) | (var_src < MIN_VAR) | ~safe \
        | ~jnp.isfinite(cost)
    return jnp.where(degenerate, COST_MAX, cost)


def _per_view_ncc(data: CostData, src_index, x, y, plane, win: RefWindow,
                  band: bool | None = None, site: str = "strong",
                  origin=None):
    """NCC cost of `plane` at pixels (x, y) against one source view.

    x, y: (B,) f32; plane: (B, 4). Returns (B,) cost. All taps are evaluated
    as one (B, T) batched warp + gather — large fused ops keep the TPU's
    gather pipeline saturated instead of dispatching T tiny kernels.
    `origin`: static band origin for this (plane, view) gather (ops.bands).
    """
    src_cam = data.src_cams.view(src_index)
    H = geo.homography(data.ref_cam, src_cam, plane)
    cx, cy = geo.warp(H, x, y)
    oob = (cx < 0) | (cx >= data.img_w) | (cy < 0) | (cy >= data.img_h)

    tx = x[..., None] + win.tap_dx                       # (B, T)
    ty = y[..., None] + win.tap_dy
    wx, wy = geo.warp(H[..., None, :, :], tx, ty)
    sv = sample_src_view(data, src_index, wx, wy, band=band, site=site,
                         origin=origin)
    tw = win.tap_w
    s_src = (tw * sv).sum(-1)
    s_ss = (tw * sv * sv).sum(-1)
    s_rs = (tw * win.tap_val * sv).sum(-1)
    cost = ncc_from_sums(win.sum_ref, win.sum_rr, s_src, s_ss, s_rs, win.wsum)
    return jnp.where(oob, COST_MAX, cost)


def ncc_strong(data: CostData, x, y, plane, win: RefWindow,
               origins=None) -> jnp.ndarray:
    """Multi-view NCC cost vector (reference: ComputeMultiViewCostVectorOld,
    APD.cu:820-829). Returns (B, S). `origins`: optional (S,) int32 static
    band origins, one per view (ops.bands pre-pass)."""

    if origins is None:
        def body(s, _):
            return s + 1, _per_view_ncc(data, s, x, y, plane, win)

        _, costs = jax.lax.scan(body, 0, None, length=data.num_src)
    else:
        def body(s, org):
            return s + 1, _per_view_ncc(data, s, x, y, plane, win,
                                        origin=org)

        _, costs = jax.lax.scan(body, 0, origins)
    return jnp.moveaxis(costs, 0, -1)


def _gather_cams(cams: geo.CameraArrays, idx) -> geo.CameraArrays:
    """Per-pixel camera selection: gather camera rows by view index (B, K)."""
    return geo.CameraArrays(*[jnp.take(a, idx, axis=0) for a in cams])


def flat_src_table(data: CostData):
    """All source views' quad rows as one (S*H*W, 4) table for per-pixel
    dynamic view indexing (base = view_index * H * W)."""
    return data.src_quads.reshape(-1, 4)


# Measured v5e row-gather rates (M rows/s) for the two sampling strategies
# (PERF_NOTES "u8 quads", benchmarks/gather_slice_probe.py): the u8 fast
# emitter only engages for per-view-sized tables, so per-pixel view slots
# (flat (S*HW, 4) table) gather ~2.2x slower than all-views evaluation.
_SLOT_RATE_U8 = 181.0
_VIEW_RATE_U8 = 390.0


def prefer_view_slots(data: CostData, k: int) -> bool:
    """Static scheduling choice for per-pixel view-subset evaluation: True
    selects K compacted slot gathers (`ncc_selected`), False all-S-views
    evaluation with zero-weight masking (`ncc_strong`), whichever samples
    cheaper. The slot path must cut gather cost by >20% to pay for its
    per-slot camera gathers and index math (that margin reproduces the
    round-1 empirical S > 10 gate for f32 tables at K=8)."""
    if data.src_quads.dtype == jnp.uint8:
        return k / _SLOT_RATE_U8 < 0.8 * data.num_src / _VIEW_RATE_U8
    return k < 0.8 * data.num_src


def sample_src_flat(data: CostData, tab, base, wx, wy):
    """Bilinear sample from the flat_src_table layout. `base` is the
    view-row offset (view_index * H * W), broadcastable to wx's shape.
    Same clamp/floor/lerp as bilinear_sample_packed (shared helpers)."""
    idx, fx, fy = quad_coords(data.width, data.src_h, wx, wy)
    return lerp_quad_rows(jnp.take(tab, base + idx, axis=0), fx, fy)


def ncc_selected(data: CostData, x, y, plane, win: RefWindow, sel_idx,
                 sel_valid) -> jnp.ndarray:
    """NCC of one plane per pixel against a per-pixel view subset.

    sel_idx: (B, K) source-view indices; sel_valid: (B, K). Returns (B, K)
    costs (COST_MAX on invalid slots). This is the exact-parity fast path for
    the reference's `if (isSet(selected_views...))` loops (DepthToWeak,
    LocalRefine, APD.cu:2173-2186, 2414-2422): only selected views are
    sampled instead of sampling all views and masking.
    """
    B, K = sel_idx.shape
    hw = data.src_h * data.width
    src_cams = _gather_cams(data.src_cams, sel_idx)        # (B, K, ...)
    flat_tab = flat_src_table(data)                        # (S*HW, 4)

    def slot(k, _):
        cam_k = geo.CameraArrays(*[a[:, k] for a in src_cams])
        H = geo.homography(data.ref_cam, cam_k, plane)
        cx, cy = geo.warp(H, x, y)
        oob = (cx < 0) | (cx >= data.img_w) | (cy < 0) | (cy >= data.img_h)
        tx = x[..., None] + win.tap_dx
        ty = y[..., None] + win.tap_dy
        wx, wy = geo.warp(H[..., None, :, :], tx, ty)
        base = sel_idx[:, k, None] * hw
        sv = sample_src_flat(data, flat_tab, base, wx, wy)
        tw = win.tap_w
        cost = ncc_from_sums(win.sum_ref, win.sum_rr, (tw * sv).sum(-1),
                             (tw * sv * sv).sum(-1),
                             (tw * win.tap_val * sv).sum(-1), win.wsum)
        return k + 1, jnp.where(oob, COST_MAX, cost)

    _, costs = jax.lax.scan(slot, 0, None, length=K)
    costs = jnp.moveaxis(costs, 0, -1)
    return jnp.where(sel_valid, costs, COST_MAX)


def geom_selected(data: CostData, x, y, plane, sel_idx, sel_valid
                  ) -> jnp.ndarray:
    """Geometric consistency cost over a per-pixel view subset. (B, K)."""
    depth = geo.depth_from_plane(data.ref_cam, plane, x, y)
    Xw = geo.backproject_world(data.ref_cam, x, y, depth)
    src_cams = _gather_cams(data.src_cams, sel_idx)
    hw = data.src_h * data.width
    depths_flat = data.src_depths.reshape(-1)

    def slot(k, _):
        cam_k = geo.CameraArrays(*[a[:, k] for a in src_cams])
        sx, sy, _sd = geo.project(cam_k, Xw)
        xi = jnp.clip(sx.astype(jnp.int32), 0, data.width - 1)
        yi = jnp.clip(sy.astype(jnp.int32), 0, data.src_h - 1)
        from ..core.sampling import take_rows
        src_depth = take_rows(depths_flat,
                              sel_idx[:, k] * hw + yi * data.width + xi)
        Xs = geo.backproject_world(cam_k, sx, sy, src_depth)
        bx, by, _bd = geo.project(data.ref_cam, Xs)
        dist = jnp.sqrt((x - bx) ** 2 + (y - by) ** 2)
        cost = jnp.minimum(GEOM_COST_MAX, dist)
        bad = (src_depth == 0.0) | ~jnp.isfinite(cost)
        return k + 1, jnp.where(bad, GEOM_COST_MAX, cost)

    _, costs = jax.lax.scan(slot, 0, None, length=sel_idx.shape[1])
    costs = jnp.moveaxis(costs, 0, -1)
    return jnp.where(sel_valid, costs, GEOM_COST_MAX)


def geom_one_view(data: CostData, s, x, y, plane) -> jnp.ndarray:
    """Geometric consistency cost (B,) against ONE source view; `s` may be a
    traced view index. Same math as one step of `geom_cost` (reference:
    ComputeGeomConsistencyCost, APD.cu:865-902) — used by the view-major
    classification/refine sweeps that evaluate one view per program."""
    depth = geo.depth_from_plane(data.ref_cam, plane, x, y)
    Xw = geo.backproject_world(data.ref_cam, x, y, depth)
    src_cam = data.src_cams.view(s)
    sx, sy, _sd = geo.project(src_cam, Xw)
    src_depth = texel_fetch(data.src_depths[s], sx, sy)
    Xs = geo.backproject_world(src_cam, sx, sy, src_depth)
    bx, by, _bd = geo.project(data.ref_cam, Xs)
    dist = jnp.sqrt((x - bx) ** 2 + (y - by) ** 2)
    cost = jnp.minimum(GEOM_COST_MAX, dist)
    bad = (src_depth == 0.0) | ~jnp.isfinite(cost)
    return jnp.where(bad, GEOM_COST_MAX, cost)


def geom_cost(data: CostData, x, y, plane) -> jnp.ndarray:
    """Geometric consistency cost vector (B, S): forward-backward reprojection
    distance against source depth maps, clamped to 3; missing source depth
    costs 3 (reference: ComputeGeomConsistencyCost, APD.cu:865-902)."""

    def body(s, _):
        return s + 1, geom_one_view(data, s, x, y, plane)

    _, costs = jax.lax.scan(body, 0, None, length=data.num_src)
    return jnp.moveaxis(costs, 0, -1)


def initial_cost_and_selection(costs: jnp.ndarray, top_k: int
                               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k view selection from a (B, S) cost vector (reference:
    ComputeMultiViewInitialCostandSelectedViews, APD.cu:723-774).

    Returns (mean top-k cost (B,), selected mask (B, S)). Views are selected
    when their cost is <= the k-th smallest (ties select extra views, as in
    the reference); all-invalid pixels get cost_max and empty selection.
    """
    S = costs.shape[-1]
    num_valid = (costs < COST_MAX).sum(-1)
    k = jnp.minimum(num_valid, top_k)                      # (B,)
    csort = jnp.sort(costs, axis=-1)
    idx = jnp.arange(S)
    topk_sum = jnp.where(idx[None, :] < k[..., None], csort, 0.0).sum(-1)
    mean_cost = jnp.where(k > 0, topk_sum / jnp.maximum(k, 1), COST_MAX)
    thresh = jnp.take_along_axis(
        csort, jnp.maximum(k - 1, 0)[..., None], axis=-1)[..., 0]
    selected = (costs <= thresh[..., None]) & (k[..., None] > 0)
    return mean_cost, selected

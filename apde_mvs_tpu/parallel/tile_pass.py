"""Single-view tile-parallel pass: ONE reference view's complete PatchMatch
pass sharded over the device mesh by image rows.

Complements the view-parallel engine (parallel.scene): a v5e-8 running a
2-view scan — or a full-resolution pass whose single-view stage time busts
the remote worker's execution budget — would otherwise idle most chips or
fall back to the serial host-dispatched engine (reference's whole device
engine serves one view at a time, APD.cu:2663-2737; SURVEY §5.7 maps it to
row sharding + halo exchange on TPU).

Design (round 3, supersedes the strong-sweep-only prototype in tiles.py):

- ALL inputs (images, cameras, priors) are replicated; only the per-pixel
  STATE and the pixel work-lists are sharded. Per-pixel stages (init,
  classification, local refine, the strong sweeps' candidate/refinement
  evaluation) evaluate each device's own rows at GLOBAL coordinates against
  an all-gathered full state — one `all_gather` of the state per color
  sweep/stage rides ICI (tens of ms at 6 MP) and buys exact reuse of the
  serial stage bodies with no halo bookkeeping. (tiles.py's hand-rolled
  ppermute halo sweep remains as the measured lower-communication variant
  for the strong sweep.)
- The weak/anchor machinery is SHARDED over the compacted weak list
  (round 5, VERDICT r4 #1): weak pixels read only strong pixels' state and
  never each other (ops/propagation.py module doc; reference weak kernels
  APD.cu:1442-1615 under SURVEY §2.3 axis 1), and the list is already a
  flat batch — so anchor generation, the deformable init rescore, the
  fit-plane RANSAC and the weak sweeps each run on this device's
  cap/n-slice against the replicated full state, with one all-gather of
  the slice results before the (identical, replicated) state commit. Only
  the nearest-strong JFA stays replicated: it is a full-image log-step
  transform whose cost is independent of the weak count. At full-res 65%
  weak the weak machinery dominates an APD pass (init+sweeps 1908 s of
  2812, PERF_NOTES r4), so this is what makes few-views-many-chips APD
  passes (the TaT advanced shape) scale with the mesh.
- RNG: per-(device, iteration, color) keys — statistically equivalent to
  the serial engine, like the host-dispatch engine's per-chunk keys; the
  mesh-size-invariance test pins reconstruction quality, not bitwise state.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import ANCHOR_NUM, UNKNOWN, WEAK, PatchMatchParams
from ..core import checkerboard as cb
from ..core import geometry as geo
from ..core.sampling import fetch, pack_bilinear, pack_bilinear_u8
from ..ops import anchors as anchor_ops
from ..ops import filters, init as init_ops
from ..ops.cost import CostData, initial_cost_and_selection
from ..ops.deformable import WeakRefData, ncc_weak
from ..ops.propagation import _WEAK_SWEEP_CHUNK, _run_chunked, \
    _strong_body, _weak_body
from ..ops.state import PMState
from ..pipeline.full_pass import PassStatic


class TileInputs(NamedTuple):
    """One view's pass inputs; everything replicated."""

    ref_image: jnp.ndarray     # (H, W) u8/f32
    src_images: jnp.ndarray    # (S, H, W) u8/f32
    ref_cam: geo.CameraArrays  # unbatched leaves
    src_cams: geo.CameraArrays # batched over S
    sa: jnp.ndarray            # (H, W) int32
    src_depths: jnp.ndarray    # (S, H, W) f32 (zeros on photometric passes)
    prior_depth: jnp.ndarray   # (H, W) f32
    prior_normal: jnp.ndarray  # (H, W, 3) f32
    prior_weak: jnp.ndarray    # (H, W) int32
    prior_conf: jnp.ndarray    # (H, W) f32
    valid: jnp.ndarray         # (H, W) bool
    weak_x: jnp.ndarray        # (cap,) int32
    weak_y: jnp.ndarray        # (cap,) int32
    weak_valid: jnp.ndarray    # (cap,) bool
    key: jnp.ndarray           # PRNG key
    dmin: jnp.ndarray          # scalar f32
    dmax: jnp.ndarray          # scalar f32


def _full_data(tp: TileInputs, cfg: PassStatic, S: int, real_shape) -> CostData:
    """CostData from the replicated inputs (quads packed on the fly, as the
    view-parallel engine does — parallel.scene._view_setup)."""
    h, w = tp.ref_image.shape
    ref_img = tp.ref_image
    if cfg.sampler_u8:
        quads = jax.vmap(pack_bilinear)(tp.src_images) \
            if tp.src_images.dtype == jnp.uint8 \
            else jax.vmap(pack_bilinear_u8)(tp.src_images)
        ref_img = jnp.clip(jnp.round(ref_img.astype(jnp.float32)), 0.0, 255.0)
    else:
        quads = jax.vmap(pack_bilinear)(tp.src_images)
    return CostData(
        ref_cam=tp.ref_cam, src_cams=tp.src_cams,
        ref_image=ref_img.astype(jnp.float32), src_quads=quads,
        sa_mask=tp.sa, src_depths=tp.src_depths,
        width=w, height=h, num_src=S,
        real_width=real_shape[1], real_height=real_shape[0])


def _prior_state(tp: TileInputs, cfg: PassStatic, S: int) -> PMState:
    h, w = tp.ref_image.shape
    state = PMState.create(h, w, S, valid=tp.valid)
    if cfg.use_apd:
        state = state.replace(
            weak=jnp.where(tp.valid, tp.prior_weak, UNKNOWN),
            confidence=tp.prior_conf)
    if not cfg.first_init:
        state = state.replace(planes=jnp.concatenate(
            [tp.prior_normal, tp.prior_depth[..., None]], -1))
    return state


def _gather_rows(arr, axis: str):
    """Row-sharded (Rl, ...) -> full (H, ...) via one tiled all_gather."""
    return jax.lax.all_gather(arr, axis, tiled=True)


@functools.lru_cache(maxsize=32)
def build_tile_pass(mesh: Mesh, cfg: PassStatic, S: int, shape: tuple,
                    real_shape: tuple, axis: str = "tiles"):
    """Three jitted shard_map programs (sweeps / classify / finish) running
    one view's pass with the state row-sharded over `mesh` (same staging
    rationale as parallel.scene.build_sharded_full_pass: no single device
    program may exceed the remote worker's execution budget)."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    n = int(mesh.devices.size)
    h, w = shape
    if h % n or (h // n) % 2:
        raise ValueError(f"rows {h} must split into even-height shards on "
                         f"{n} devices")
    Rl = h // n
    if cfg.use_apd and cfg.nw_cap > 0 and cfg.nw_cap % n:
        raise ValueError(f"weak cap {cfg.nw_cap} must divide over {n} "
                         f"devices (pad the cap to a multiple of the mesh)")
    Wl = cfg.nw_cap // n if cfg.nw_cap else 0
    params = PatchMatchParams(
        strong_radius=cfg.prop.strong_radius,
        strong_increment=cfg.prop.strong_increment,
        weak_radius=cfg.prop.weak_radius,
        weak_increment=cfg.prop.weak_increment,
        use_sa=cfg.prop.use_sa, top_k=cfg.prop.top_k)
    use_weak = cfg.use_apd and cfg.nw_cap > 0

    def _my_coords(idx):
        """Global flat pixel coords of this device's rows."""
        base = jnp.arange(Rl * w, dtype=jnp.int32) + idx * (Rl * w)
        return base % w, base // w

    def _my_chunked_coords(idx):
        """Same, padded to (nc, chunk) for lax.map staging (pad lanes repeat
        the shard's first pixel; callers slice [:Rl*w])."""
        total = Rl * w
        chunkc = min(cfg.classify_chunk, total)
        ncv = -(-total // chunkc)
        base = jnp.arange(total, dtype=jnp.int32)
        base = jnp.concatenate(
            [base, jnp.zeros((ncv * chunkc - total,), jnp.int32)])
        flat = base + idx * total
        return ((flat % w).reshape(ncv, chunkc),
                (flat // w).reshape(ncv, chunkc), total)

    def sweeps_body(tp: TileInputs, ransac_threshold, geom_factor):
        data = _full_data(tp, cfg, S, real_shape)
        state = _prior_state(tp, cfg, S)
        idx = jax.lax.axis_index(axis)
        key = tp.key

        # ---- APD setup: JFA replicated (full-image transform), anchor
        # generation sharded over the weak list — this device's cap/n slice
        # against the replicated state; only the reliable flags need
        # gathering (the anchors themselves stay sharded: every later weak
        # stage consumes the same slice) -------------------------------
        anchors_my = jnp.full((max(Wl, 1), ANCHOR_NUM, 2), -1, jnp.int32)
        wx_my = wy_my = wv_my = None
        if use_weak:
            key, k_anchor = jax.random.split(key)
            ns = anchor_ops.nearest_strong_jfa(state.weak, state.confidence,
                                               state.valid)
            wslc = lambda a: jax.lax.dynamic_slice_in_dim(a, idx * Wl, Wl, 0)
            wx_my, wy_my, wv_my = (wslc(tp.weak_x), wslc(tp.weak_y),
                                   wslc(tp.weak_valid))
            res = anchor_ops.gen_anchors(
                jax.random.fold_in(k_anchor, idx), data, state,
                wx_my, wy_my, wv_my,
                cfg.rotate_time, ransac_threshold, tp.dmin, tp.dmax, ns,
                radius_budget=cfg.radius_budget)
            reliable = _gather_rows(res.reliable, axis)        # (cap,)
            state = anchor_ops.neighbor_update(
                state, tp.weak_x, tp.weak_y, tp.weak_valid, reliable)
            anchors_my = res.anchors

        # ---- init: replicated plane draw, row-sharded initial cost ------
        key, k_init, k_iter = jax.random.split(key, 3)
        if cfg.first_init:
            planes = init_ops.random_planes(k_init, data, tp.dmin, tp.dmax)
        else:
            planes = filters.depth_normal_to_planes(
                data, state.planes[..., 3], state.planes[..., :3])
        state = state.replace(planes=planes)
        xs_my, ys_my = _my_coords(idx)
        planes_my = jax.lax.dynamic_slice(
            planes.reshape(-1, 4), (idx * Rl * w, 0), (Rl * w, 4))
        costs_my = init_ops.initial_cost_chunk(
            data, planes_my, xs_my.astype(jnp.float32),
            ys_my.astype(jnp.float32), params)            # (Rl*w, S)
        costs = _gather_rows(costs_my, axis)              # (H*W, S)
        if use_weak:
            # deformable rescore of THIS device's weak slice, gathered to
            # the full list for the (replicated) cost table update
            wref = WeakRefData.build(
                data, wx_my.astype(jnp.float32), wy_my.astype(jnp.float32),
                anchors_my, state.selected, params)
            wplanes = planes.reshape(-1, 4)[wy_my * w + wx_my]
            wcosts = _gather_rows(ncc_weak(data, wref, wplanes, params),
                                  axis)                        # (cap, S)
            flat_idx = jnp.where(tp.weak_valid, tp.weak_y * w + tp.weak_x,
                                 h * w)
            costs = costs.at[flat_idx].set(wcosts, mode="drop")
        mean_cost, selected = initial_cost_and_selection(costs,
                                                         cfg.prop.top_k)
        state = state.replace(
            costs=jnp.where(state.valid, mean_cost.reshape(h, w), 1e9),
            selected=selected.reshape(h, w, -1) & state.valid[..., None])

        # ---- iterations: row-sharded strong sweeps (full-state gather per
        # color), replicated weak sweeps ----------------------------------
        def color_sweep(carry, inp):
            st, it = carry
            color, kc = inp
            # my rows' same-color pixels, global coords (the checkerboard
            # helpers are pure jnp arithmetic, so a traced color is fine)
            xg, yg = cb.color_coords(h, w, color)
            x_my = jax.lax.dynamic_slice(
                xg, (idx * Rl, jnp.int32(0)), (Rl, w // 2)).reshape(-1)
            y_my = jax.lax.dynamic_slice(
                yg, (idx * Rl, jnp.int32(0)), (Rl, w // 2)).reshape(-1)
            ks = jax.random.fold_in(kc, idx)
            k_sel, k_ref = jax.random.split(ks)
            planes_o, costs_o, sel_o, vw_o = _strong_body(
                data, st, cfg.prop, it, k_sel, k_ref, x_my, y_my,
                tp.dmin, tp.dmax, geom_factor, None)
            # gather all devices' color-pixel results and commit (identical
            # replicated commit on every device; same active-mask rule as
            # propagate_strong's scatter)
            po = _gather_rows(planes_o.reshape(Rl, w // 2, 4), axis)
            co = _gather_rows(costs_o.reshape(Rl, w // 2), axis)
            so = _gather_rows(sel_o.reshape(Rl, w // 2, S), axis)
            vo = _gather_rows(vw_o.reshape(Rl, w // 2, S), axis)
            x_all = xg.reshape(-1)
            y_all = yg.reshape(-1)
            weak_c = cb.gather_color(st.weak, color).reshape(-1)
            valid_c = cb.gather_color(st.valid, color).reshape(-1)
            active = (weak_c != WEAK) & valid_c

            def put(full, vals_hw, old_flat):
                flatv = vals_hw.reshape((h * (w // 2),) + vals_hw.shape[2:])
                sel = active.reshape(
                    active.shape + (1,) * (flatv.ndim - 1))
                merged = jnp.where(sel, flatv, old_flat)
                return cb.scatter_color(
                    full, merged.reshape((h, w // 2) + flatv.shape[1:]),
                    color)

            st = st.replace(
                planes=put(st.planes, po, fetch(st.planes, x_all, y_all)),
                costs=put(st.costs, co, fetch(st.costs, x_all, y_all)),
                selected=put(st.selected, so,
                             fetch(st.selected, x_all, y_all)),
                view_weights=put(st.view_weights, vo,
                                 fetch(st.view_weights, x_all, y_all)))
            return (st, it), None

        def weak_sweep(st, it, k_fit, k_sweep):
            """Fit-plane RANSAC + deformable weak sweep on this device's
            weak slice; slice results are all-gathered and committed
            identically on every device (the same scatter rule as
            ops.propagation.propagate_weak, which the single-device path is
            bitwise-equal to)."""
            fit_my = anchor_ops.ransac_fit_planes(
                jax.random.fold_in(k_fit, idx), data, st, wx_my, wy_my,
                wv_my, anchors_my)
            kd = jax.random.fold_in(k_sweep, idx)
            k_sel, k_ref = jax.random.split(kd)

            def body(ks, kr, xc, yc, anc, fpl):
                return _weak_body(data, st, cfg.prop, it, ks, kr, xc, yc,
                                  anc, fpl, tp.dmin, tp.dmax, geom_factor)

            planes_o, costs_o, sel_o, vw_o = _run_chunked(
                body, k_sel, k_ref, (wx_my, wy_my, anchors_my, fit_my),
                Wl, chunk=_WEAK_SWEEP_CHUNK)
            po = _gather_rows(planes_o, axis)                  # (cap, 4)
            co = _gather_rows(costs_o, axis)
            so = _gather_rows(sel_o, axis)
            vo = _gather_rows(vw_o, axis)
            x, y = tp.weak_x, tp.weak_y
            upd = tp.weak_valid & (fetch(st.weak, x, y) == WEAK)
            flat_idx = jnp.where(tp.weak_valid, y * w + x, h * w)

            def put_flat(full, vals, old):
                sel = upd.reshape(upd.shape + (1,) * (vals.ndim - 1))
                merged = jnp.where(sel, vals, old)
                flat = full.reshape((h * w,) + full.shape[2:])
                flat = flat.at[flat_idx].set(merged, mode="drop")
                return flat.reshape(full.shape)

            return st.replace(
                planes=put_flat(st.planes, po, fetch(st.planes, x, y)),
                costs=put_flat(st.costs, co, fetch(st.costs, x, y)),
                selected=put_flat(st.selected, so, fetch(st.selected, x, y)),
                view_weights=put_flat(st.view_weights, vo,
                                      fetch(st.view_weights, x, y)))

        def iter_body(st, inp):
            it, k = inp
            k1, k2, k3 = jax.random.split(k, 3)
            kcs = jax.random.split(k1, 2)
            (st, _), _ = jax.lax.scan(color_sweep, (st, it),
                                      (jnp.arange(2), kcs))
            if use_weak:
                st = weak_sweep(st, it, k2, k3)
            return st, None

        keys = jax.random.split(k_iter, cfg.max_iterations)
        state, _ = jax.lax.scan(
            iter_body, state, (jnp.arange(cfg.max_iterations), keys))
        state = state.replace(planes=filters.planes_to_depth_normal(
            data, state.planes))
        state, _ = jax.lax.scan(
            lambda st, color: (filters.median_filter_color(st, color), None),
            state, jnp.arange(2))
        # out: my rows only (state stays row-sharded between programs)
        return jax.tree_util.tree_map(
            lambda a: jax.lax.dynamic_slice_in_dim(a, idx * Rl, Rl, 0),
            state)

    def classify_body(tp: TileInputs, st_shard: PMState, weak_peak_radius,
                      geom_factor):
        data = _full_data(tp, cfg, S, real_shape)
        state = jax.tree_util.tree_map(lambda a: _gather_rows(a, axis),
                                       st_shard)
        idx = jax.lax.axis_index(axis)
        xs_my, ys_my, total = _my_chunked_coords(idx)

        def chunk(args):
            cx, cy = args
            nwk, _ = filters.depth_to_weak(
                data, state, cx, cy, weak_peak_radius, cfg.prop.use_sa,
                cfg.prop.geom_consistency, geom_factor, tp.dmin, tp.dmax,
                cfg.prop.strong_radius, cfg.prop.strong_increment,
                sweep_k=cfg.sweep_k)
            return nwk

        new_weak = jax.lax.map(chunk, (xs_my, ys_my))
        return new_weak.reshape(-1)[:total].reshape(Rl, w).astype(jnp.int32)

    def finish_body(tp: TileInputs, st_shard: PMState, geom_factor):
        data = _full_data(tp, cfg, S, real_shape)
        state = jax.tree_util.tree_map(lambda a: _gather_rows(a, axis),
                                       st_shard)
        if cfg.prop.geom_consistency or cfg.use_apd:
            state = filters.compute_confidence(data, state)
        idx = jax.lax.axis_index(axis)
        xs_my, ys_my, total = _my_chunked_coords(idx)

        def chunk(args):
            cx, cy = args
            return filters.local_refine(
                data, state, cx, cy, cfg.prop.use_sa,
                cfg.prop.geom_consistency, geom_factor, tp.dmin, tp.dmax,
                cfg.prop.strong_radius, cfg.prop.strong_increment,
                sweep_k=cfg.sweep_k)

        depth_my = jax.lax.map(
            chunk, (xs_my, ys_my)).reshape(-1)[:total].reshape(Rl, w)
        sl = lambda a: jax.lax.dynamic_slice_in_dim(a, idx * Rl, Rl, 0)
        return (depth_my, sl(state.planes)[..., :3], sl(state.weak),
                sl(state.confidence), sl(state.costs))

    rep = P()
    shd = P(axis)
    tp_specs = TileInputs(*([rep] * 17))
    st_specs = PMState(planes=shd, costs=shd, selected=shd,
                       view_weights=shd, weak=shd, confidence=shd, valid=shd)

    sweeps = jax.jit(shard_map(
        sweeps_body, mesh=mesh, in_specs=(tp_specs, rep, rep),
        out_specs=st_specs, check_vma=False))
    classify = jax.jit(shard_map(
        classify_body, mesh=mesh, in_specs=(tp_specs, st_specs, rep, rep),
        out_specs=shd, check_vma=False))
    finish = jax.jit(shard_map(
        finish_body, mesh=mesh, in_specs=(tp_specs, st_specs, rep),
        out_specs=(shd, shd, shd, shd, shd), check_vma=False))

    def step(tp: TileInputs, ransac_threshold, weak_peak_radius,
             geom_factor):
        st = sweeps(tp, ransac_threshold, geom_factor)
        new_weak = classify(tp, st, weak_peak_radius, geom_factor)
        st = st.replace(weak=new_weak)
        return finish(tp, st, geom_factor)

    # stage programs exposed for benchmarks/tests (per-device cost analysis
    # of the sharded weak machinery, benchmarks/tile_weak_scaling.py)
    step.sweeps = sweeps
    step.classify = classify
    step.finish = finish
    return step

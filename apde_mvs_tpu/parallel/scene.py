"""Production multi-chip path: all views of a scan run their COMPLETE
PatchMatch pass simultaneously, sharded over a device mesh.

The reference scales across GPUs at scan granularity and exchanges neighbor
depth maps through bin-files between passes (run.py:218-226,
APD.cpp:592-610); here a pass over a whole scan is one SPMD program: each
device runs `pipeline.full_pass` (APD setup, init, sweeps, classification,
confidence, local refine) for its local reference views, and the
between-pass depth exchange is a single `all_gather` over ICI.

Layout decisions (vs the round-1 strong-sweep prototype in mesh.py):

- Images are replicated as a flat (M+1, H, W) f32 table (all distinct view
  ids of pair.txt) and bilinear quad tables are built on the fly per source
  view inside the pass — replicating prepacked quads would cost 4x image
  bytes per device and caps the scan size (round-1 finding).
- Source-view lists of different lengths are padded with slot M: a dummy
  view whose camera projects everything ~1e9 px off-image, so every padded
  slot scores COST_MAX, receives zero sampling probability, and is never
  selected — no validity masks thread through the cost kernels.
- View counts not divisible by the mesh are padded with repeats of view 0;
  their outputs are discarded on the host.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..config import UNKNOWN
from ..core import geometry as geo
from ..core.sampling import pack_bilinear, pack_bilinear_u8
from ..ops.cost import CostData
from ..ops.state import PMState
from ..pipeline.full_pass import PassStatic, pass_classify, pass_finish, \
    pass_sweeps
from .mesh import make_mesh


class ScenePassInputs(NamedTuple):
    """One pass's inputs for all views. Leading dims: M+1 = image-table
    slots (replicated), Vp = mesh-padded problem count (view-sharded)."""

    images: jnp.ndarray        # (M+1, H, W) u8 (u8 sampler) or f32,
                               #   slot M = dummy zeros
    cam_K: jnp.ndarray         # (M+1, 3, 3)
    cam_R: jnp.ndarray         # (M+1, 3, 3)
    cam_t: jnp.ndarray         # (M+1, 3)
    cam_c: jnp.ndarray         # (M+1, 3)
    pair: jnp.ndarray          # (Vp, S) int32 into the table, pad = M
    ref_slot: jnp.ndarray      # (Vp,) int32 into the table
    depth_slot: jnp.ndarray    # (M+1,) int32 table -> gathered-depth row,
                               #   Vp = missing (zero depth)
    dmin: jnp.ndarray          # (Vp,) f32
    dmax: jnp.ndarray          # (Vp,) f32
    valid: jnp.ndarray         # (H, W) bool real-pixel mask (shared)
    # ---- view-sharded ----
    prior_depth: jnp.ndarray   # (Vp, H, W) f32
    prior_normal: jnp.ndarray  # (Vp, H, W, 3) f32
    prior_weak: jnp.ndarray    # (Vp, H, W) int32
    prior_conf: jnp.ndarray    # (Vp, H, W) f32
    sa: jnp.ndarray            # (Vp, H, W) int32
    weak_x: jnp.ndarray        # (Vp, cap) int32
    weak_y: jnp.ndarray        # (Vp, cap) int32
    weak_valid: jnp.ndarray    # (Vp, cap) bool
    keys: jnp.ndarray          # (Vp, 2) uint32 per-view PRNG keys
    # prior depths of reference views OUTSIDE this view batch (loaded from
    # the file interchange; zeros when the whole scan runs as one batch).
    # depth_slot addresses rows Vp+1+e of [gathered | zero-row | ext_depth].
    ext_depth: jnp.ndarray     # (Ep, H, W) f32, replicated


class ScenePassOutputs(NamedTuple):
    depth: jnp.ndarray         # (Vp, H, W) f32
    normal: jnp.ndarray        # (Vp, H, W, 3) f32 world-frame
    weak: jnp.ndarray          # (Vp, H, W) int32
    confidence: jnp.ndarray    # (Vp, H, W) f32
    cost: jnp.ndarray          # (Vp, H, W) f32


def dummy_camera(like_K: np.ndarray) -> tuple:
    """Camera for padded source slots: principal point ~1e9 px off-image, so
    every warp/projection lands far out of bounds -> COST_MAX / zero depth."""
    K = like_K.copy()
    K[0, 2] = -1e9
    K[1, 2] = -1e9
    return K, np.eye(3, dtype=np.float32), np.zeros(3, np.float32), \
        np.zeros(3, np.float32)


def _gathered_depths(scene: ScenePassInputs, axis: str) -> jnp.ndarray:
    """All reference views' prior depths: in-batch rows via one ICI
    all_gather, then a zero row (missing source) and the out-of-batch
    file-interchange rows — the depth_slot addressing contract."""
    _, h, w = scene.prior_depth.shape
    all_depths = jax.lax.all_gather(scene.prior_depth, axis, tiled=True)
    return jnp.concatenate(
        [all_depths, jnp.zeros((1, h, w), jnp.float32),
         scene.ext_depth], axis=0)


def _view_setup(scene: ScenePassInputs, all_depths, i, cfg: PassStatic,
                S: int, real_w: int, real_h: int, axis: str):
    """CostData + global problem index for local view `i` (shard_map body
    context). `all_depths` is `_gathered_depths` output, or None on
    photometric passes."""
    Vl, h, w = scene.prior_depth.shape
    cams = geo.CameraArrays(scene.cam_K, scene.cam_R, scene.cam_t,
                            scene.cam_c)
    g = jax.lax.axis_index(axis) * Vl + i
    ref = scene.ref_slot[g]
    pair_row = scene.pair[g]                     # (S,) table slots
    src_cams = geo.CameraArrays(*[a[pair_row] for a in cams])
    src_imgs = scene.images[pair_row]            # (S, H, W)
    ref_img = scene.images[ref]
    if cfg.sampler_u8:
        # u8 quads (core.sampling): ~2.4x gather rate. The image table
        # is already u8 (rounded once host-side, _RoundData) so both
        # sides share the integer photometric grid and the replicated
        # table costs 1 byte/px/view.
        quads = jax.vmap(pack_bilinear)(src_imgs) \
            if src_imgs.dtype == jnp.uint8 \
            else jax.vmap(pack_bilinear_u8)(src_imgs)
        ref_img = jnp.clip(jnp.round(ref_img.astype(jnp.float32)),
                           0.0, 255.0)
    else:
        quads = jax.vmap(pack_bilinear)(src_imgs)
    if all_depths is not None:
        src_depths = all_depths[scene.depth_slot[pair_row]]
    else:
        src_depths = jnp.zeros((S, h, w), jnp.float32)
    data = CostData(
        ref_cam=cams.view(ref), src_cams=src_cams,
        ref_image=ref_img, src_quads=quads,
        sa_mask=scene.sa[i], src_depths=src_depths,
        width=w, height=h, num_src=S,
        real_width=real_w, real_height=real_h)
    return data, g


def _prior_state(scene: ScenePassInputs, i, cfg: PassStatic, S: int
                 ) -> PMState:
    _, h, w = scene.prior_depth.shape
    state = PMState.create(h, w, S, valid=scene.valid)
    if cfg.use_apd:
        state = state.replace(
            weak=jnp.where(scene.valid, scene.prior_weak[i], UNKNOWN),
            confidence=scene.prior_conf[i])
    if not cfg.first_init:
        state = state.replace(planes=jnp.concatenate(
            [scene.prior_normal[i], scene.prior_depth[i][..., None]], -1))
    return state


def _stacked_zeros(template: PMState, Vl: int) -> PMState:
    return jax.tree_util.tree_map(
        lambda a: jnp.zeros((Vl,) + a.shape, a.dtype), template)


def _sweeps_body(scene, ransac_threshold, geom_factor, cfg: PassStatic,
                 S: int, real_w: int, real_h: int, geom_or_apd: bool,
                 axis: str) -> PMState:
    """Stage-1 shard_map body: APD setup + sweeps for each local view (ICI
    depth exchange inside). Returns the post-sweep state stacked (Vl, ...)."""
    Vl, h, w = scene.prior_depth.shape
    all_depths = _gathered_depths(scene, axis) if geom_or_apd else None

    def view_body(i, acc):
        data, g = _view_setup(scene, all_depths, i, cfg, S, real_w, real_h,
                              axis)
        st = pass_sweeps(
            data, _prior_state(scene, i, cfg, S), scene.weak_x[i],
            scene.weak_y[i], scene.weak_valid[i], scene.keys[i],
            ransac_threshold, scene.dmin[g], scene.dmax[g], geom_factor, cfg)
        return jax.tree_util.tree_map(lambda a, b: a.at[i].set(b), acc, st)

    init = _stacked_zeros(PMState.create(h, w, S, valid=scene.valid), Vl)
    return jax.lax.fori_loop(0, Vl, view_body, init)


def _classify_body(scene, stacked: PMState, weak_peak_radius, geom_factor,
                   cfg: PassStatic, S: int, real_w: int, real_h: int,
                   geom_or_apd: bool, axis: str) -> jnp.ndarray:
    """Stage-2 shard_map body: DepthToWeak reclassification per local view.
    Returns the (Vl, h, w) int32 weak maps."""
    Vl, h, w = scene.prior_depth.shape
    all_depths = _gathered_depths(scene, axis) if geom_or_apd else None

    def view_body(i, acc):
        data, g = _view_setup(scene, all_depths, i, cfg, S, real_w, real_h,
                              axis)
        st = jax.tree_util.tree_map(lambda a: a[i], stacked)
        nw = pass_classify(data, st, weak_peak_radius, scene.dmin[g],
                           scene.dmax[g], geom_factor, cfg)
        return acc.at[i].set(nw)

    return jax.lax.fori_loop(0, Vl, view_body,
                             jnp.zeros((Vl, h, w), jnp.int32))


def _finish_body(scene, stacked: PMState, geom_factor, cfg: PassStatic,
                 S: int, real_w: int, real_h: int, geom_or_apd: bool,
                 axis: str) -> ScenePassOutputs:
    """Stage-3 shard_map body: confidence + local refine per local view.
    `stacked.weak` must already hold stage 2's reclassification."""
    Vl, h, w = scene.prior_depth.shape
    all_depths = _gathered_depths(scene, axis) if geom_or_apd else None

    def view_body(i, outs):
        data, g = _view_setup(scene, all_depths, i, cfg, S, real_w, real_h,
                              axis)
        st = jax.tree_util.tree_map(lambda a: a[i], stacked)
        st = pass_finish(data, st, scene.dmin[g], scene.dmax[g], geom_factor,
                         cfg)
        depth, normal, weak, conf, cost = outs
        return (depth.at[i].set(st.planes[..., 3]),
                normal.at[i].set(st.planes[..., :3]),
                weak.at[i].set(st.weak),
                conf.at[i].set(st.confidence),
                cost.at[i].set(st.costs))

    init = (jnp.zeros((Vl, h, w), jnp.float32),
            jnp.zeros((Vl, h, w, 3), jnp.float32),
            jnp.zeros((Vl, h, w), jnp.int32),
            jnp.zeros((Vl, h, w), jnp.float32),
            jnp.zeros((Vl, h, w), jnp.float32))
    outs = jax.lax.fori_loop(0, Vl, view_body, init)
    return ScenePassOutputs(*outs)


def _scene_specs(axis: str):
    rep = P()
    shd = P(axis)
    return ScenePassInputs(
        images=rep, cam_K=rep, cam_R=rep, cam_t=rep, cam_c=rep,
        pair=rep, ref_slot=rep, depth_slot=rep, dmin=rep, dmax=rep,
        valid=rep,
        prior_depth=shd, prior_normal=shd, prior_weak=shd, prior_conf=shd,
        sa=shd, weak_x=shd, weak_y=shd, weak_valid=shd, keys=shd,
        ext_depth=rep)


def _state_specs(axis: str) -> PMState:
    shd = P(axis)
    return PMState(planes=shd, costs=shd, selected=shd, view_weights=shd,
                   weak=shd, confidence=shd, valid=shd)


@functools.lru_cache(maxsize=32)
def build_sharded_full_pass(mesh: Mesh, cfg: PassStatic, S: int,
                            shape: tuple, real_shape: tuple,
                            geom_or_apd: bool, axis: str = "views"):
    """The sharded full pass for a fixed configuration, dispatched as THREE
    jitted shard_map programs (sweeps / classify / finish) so no single
    device program exceeds the remote TPU worker's execution-time budget
    (~80 s hard kill; PERF_NOTES "three failure modes"). The intermediate
    per-view state stays device-resident and view-sharded between programs.

    One program set compiles per (resolution, S, weak bucket, flag set) —
    the same granularity as the serial engine's kernel cache."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    rep = P()
    shd = P(axis)
    scene_specs = _scene_specs(axis)
    state_specs = _state_specs(axis)
    real_h, real_w = real_shape
    common = dict(cfg=cfg, S=S, real_w=real_w, real_h=real_h,
                  geom_or_apd=geom_or_apd, axis=axis)

    sweeps = jax.jit(shard_map(
        lambda scene, rt, gf: _sweeps_body(scene, rt, gf, **common),
        mesh=mesh, in_specs=(scene_specs, rep, rep), out_specs=state_specs,
        check_vma=False))
    classify = jax.jit(shard_map(
        lambda scene, st, wpr, gf: _classify_body(scene, st, wpr, gf,
                                                  **common),
        mesh=mesh, in_specs=(scene_specs, state_specs, rep, rep),
        out_specs=shd, check_vma=False))
    finish = jax.jit(shard_map(
        lambda scene, st, gf: _finish_body(scene, st, gf, **common),
        mesh=mesh, in_specs=(scene_specs, state_specs, rep),
        out_specs=ScenePassOutputs(depth=shd, normal=shd, weak=shd,
                                   confidence=shd, cost=shd),
        check_vma=False))

    def step(scene, ransac_threshold, weak_peak_radius, geom_factor):
        st = sweeps(scene, ransac_threshold, geom_factor)
        new_weak = classify(scene, st, weak_peak_radius, geom_factor)
        st = st.replace(weak=new_weak)
        return finish(scene, st, geom_factor)

    return step

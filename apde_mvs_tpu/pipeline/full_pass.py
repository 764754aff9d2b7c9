"""The complete per-view PatchMatch pass as ONE pure jittable function.

`run_patchmatch` (patchmatch.py) stages the pass through several jits with
host round-trips so the serial CLI can chunk, compact, and export debug data
between stages. Multi-chip execution needs the opposite shape: the whole
pass — APD setup, init, iteration sweeps, classification, confidence, local
refine (reference schedule: APD.cu:2663-2737) — as a single traced program
that `shard_map` can run for every view of a scan simultaneously, with the
per-stage host loops replaced by `lax.map` chunking.

Semantics mirror `run_patchmatch` exactly (same ops, same key-split order),
so a 1-device sharded scan reproduces the serial engine bit-for-bit on
photometric passes; `tests/test_full_pass.py` pins that equivalence.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import ANCHOR_NUM, UNKNOWN, PatchMatchParams
from ..ops import anchors as anchor_ops
from ..ops import filters, init as init_ops
from ..ops.cost import CostData
from ..ops.propagation import PropCfg, propagate_strong, propagate_weak
from ..ops.state import PMState


class PassStatic(NamedTuple):
    """Jit-static configuration of one full pass."""

    prop: PropCfg
    use_apd: bool          # weak machinery on (excludes first_init)
    first_init: bool
    max_iterations: int
    rotate_time: int
    nw_cap: int            # padded weak-list capacity; 0 = no weak pixels
    radius_budget: int
    classify_chunk: int
    sweep_k: int = 8       # selected-view slots in classify/refine sweeps
    # u8 quad source sampling (core.sampling); defaults True to match
    # PatchMatchParams.sampler_u8 and _RoundData.sampler_u8 — a mismatch
    # would drive a u8 image table through the f32 cost path (uint8
    # ref-image products wrap mod 256)
    sampler_u8: bool = True

    @staticmethod
    def from_params(params: PatchMatchParams, nw_cap: int,
                    radius_budget: int = 25,
                    classify_chunk: int = 1 << 16,
                    sweep_k: int = 8) -> "PassStatic":
        first_init = params.state == "first_init"
        return PassStatic(
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
            use_apd=bool(params.use_apd) and not first_init,
            first_init=first_init,
            max_iterations=params.max_iterations,
            rotate_time=params.rotate_time,
            nw_cap=nw_cap,
            radius_budget=radius_budget,
            classify_chunk=classify_chunk,
            sweep_k=sweep_k,
            sampler_u8=bool(params.sampler_u8))


def _pixel_chunks(h: int, w: int, chunk: int) -> Tuple[jnp.ndarray, jnp.ndarray, int]:
    """All pixel coordinates reshaped to (n_chunks, chunk) with zero-padding."""
    total = h * w
    chunk = min(chunk, total)
    n_chunks = -(-total // chunk)
    pad = n_chunks * chunk - total
    idx = jnp.arange(total, dtype=jnp.int32)
    idx = jnp.concatenate([idx, jnp.zeros((pad,), jnp.int32)])
    xs = (idx % w).reshape(n_chunks, chunk)
    ys = (idx // w).reshape(n_chunks, chunk)
    return xs, ys, total


def pass_sweeps(data: CostData, state: PMState, weak_x, weak_y, weak_valid,
                key, ransac_threshold, depth_min, depth_max,
                geom_factor, cfg: PassStatic) -> PMState:
    """Stage 1 of the pass: APD setup, init, iteration sweeps, depth/normal
    extraction, median filter. Returns the post-sweep state whose planes are
    (world normal, depth)."""
    h, w = data.height, data.width
    use_weak = cfg.use_apd and cfg.nw_cap > 0
    params = PatchMatchParams(
        strong_radius=cfg.prop.strong_radius,
        strong_increment=cfg.prop.strong_increment,
        weak_radius=cfg.prop.weak_radius,
        weak_increment=cfg.prop.weak_increment,
        use_sa=cfg.prop.use_sa, top_k=cfg.prop.top_k)

    # ---- APD setup: nearest strong -> anchors -> demotion -----------------
    anchors = jnp.full((max(cfg.nw_cap, 1), ANCHOR_NUM, 2), -1, jnp.int32)
    if use_weak:
        key, k_anchor = jax.random.split(key)
        ns = anchor_ops.nearest_strong_jfa(state.weak, state.confidence,
                                           state.valid)
        res = anchor_ops.gen_anchors(
            k_anchor, data, state, weak_x, weak_y, weak_valid,
            cfg.rotate_time, ransac_threshold, depth_min, depth_max, ns,
            radius_budget=cfg.radius_budget)
        state = anchor_ops.neighbor_update(state, weak_x, weak_y, weak_valid,
                                           res.reliable)
        anchors = res.anchors

    # ---- init: planes + initial cost / view selection ---------------------
    key, k_init, k_iter = jax.random.split(key, 3)
    if cfg.first_init:
        planes = init_ops.random_planes(k_init, data, depth_min, depth_max)
    else:
        planes = filters.depth_normal_to_planes(
            data, state.planes[..., 3], state.planes[..., :3])
    state = state.replace(planes=planes)
    chunk = (1 << 19) if h * w > (1 << 20) else None
    state = init_ops.initial_cost(
        data, state, params, use_weak, weak_x, weak_y, weak_valid, anchors,
        chunk=chunk)

    # ---- iteration sweeps (identical scan structure to _jit_iterations) ---
    def color_sweep(carry, inp):
        st, it = carry
        color, kc = inp
        st = propagate_strong(data, st, cfg.prop, it, kc, color,
                              depth_min, depth_max, geom_factor)
        return (st, it), None

    def iter_body(st, inp):
        it, k = inp
        k1, k2, k3 = jax.random.split(k, 3)
        kcs = jax.random.split(k1, 2)
        (st, _), _ = jax.lax.scan(color_sweep, (st, it), (jnp.arange(2), kcs))
        if use_weak:
            fit = anchor_ops.ransac_fit_planes(
                k2, data, st, weak_x, weak_y, weak_valid, anchors)
            st = propagate_weak(
                data, st, cfg.prop, it, k3, weak_x, weak_y, weak_valid,
                anchors, fit, depth_min, depth_max, geom_factor)
        return st, None

    keys = jax.random.split(k_iter, cfg.max_iterations)
    state, _ = jax.lax.scan(
        iter_body, state, (jnp.arange(cfg.max_iterations), keys))
    state = state.replace(planes=filters.planes_to_depth_normal(
        data, state.planes))
    state, _ = jax.lax.scan(
        lambda st, color: (filters.median_filter_color(st, color), None),
        state, jnp.arange(2))
    return state


def pass_classify(data: CostData, state: PMState, weak_peak_radius,
                  depth_min, depth_max, geom_factor,
                  cfg: PassStatic) -> jnp.ndarray:
    """Stage 2: reliability classification (DepthToWeak) over all pixels in
    lax.map chunks. Returns the (h, w) int32 reclassified weak map."""
    h, w = data.height, data.width
    xs, ys, total = _pixel_chunks(h, w, cfg.classify_chunk)

    def classify_chunk(args):
        cx, cy = args
        nwk, _ = filters.depth_to_weak(
            data, state, cx, cy, weak_peak_radius, cfg.prop.use_sa,
            cfg.prop.geom_consistency, geom_factor, depth_min, depth_max,
            cfg.prop.strong_radius, cfg.prop.strong_increment,
            sweep_k=cfg.sweep_k)
        return nwk

    new_weak = jax.lax.map(classify_chunk, (xs, ys))
    return new_weak.reshape(-1)[:total].reshape(h, w).astype(jnp.int32)


def pass_finish(data: CostData, state: PMState, depth_min, depth_max,
                geom_factor, cfg: PassStatic) -> PMState:
    """Stage 3: confidence map + local depth refine. `state.weak` must
    already hold stage 2's reclassification."""
    h, w = data.height, data.width
    if cfg.prop.geom_consistency or cfg.use_apd:
        state = filters.compute_confidence(data, state)
    xs, ys, total = _pixel_chunks(h, w, cfg.classify_chunk)

    def refine_chunk(args):
        cx, cy = args
        return filters.local_refine(
            data, state, cx, cy, cfg.prop.use_sa, cfg.prop.geom_consistency,
            geom_factor, depth_min, depth_max,
            cfg.prop.strong_radius, cfg.prop.strong_increment,
            sweep_k=cfg.sweep_k)

    new_depth = jax.lax.map(refine_chunk, (xs, ys))
    depth_map = new_depth.reshape(-1)[:total].reshape(h, w)
    return state.replace(planes=state.planes.at[..., 3].set(depth_map))


def full_pass(data: CostData, state: PMState, weak_x, weak_y, weak_valid,
              key, ransac_threshold, weak_peak_radius, depth_min, depth_max,
              geom_factor, cfg: PassStatic) -> PMState:
    """One complete PatchMatch pass for one view; fully traceable.

    `state` enters with prior planes = (world normal, depth) for non-first
    passes (as loaded from depths/normals.bin) and prior weak/confidence for
    APD passes; it returns with planes = (world normal, refined depth), the
    reclassified weak map, and confidence — i.e. exactly what the serial
    driver persists per view. Composed of the three stage functions above,
    which the multi-chip runner also dispatches as SEPARATE programs so no
    single device program exceeds the remote worker's execution budget."""
    state = pass_sweeps(data, state, weak_x, weak_y, weak_valid, key,
                        ransac_threshold, depth_min, depth_max, geom_factor,
                        cfg)
    state = state.replace(weak=pass_classify(
        data, state, weak_peak_radius, depth_min, depth_max, geom_factor,
        cfg))
    return pass_finish(data, state, depth_min, depth_max, geom_factor, cfg)

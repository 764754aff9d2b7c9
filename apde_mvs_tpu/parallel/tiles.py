"""Within-view tile parallelism: one view's sweep sharded over chips.

Complements `parallel.mesh` (view-parallel): when a scan has fewer views
than chips — or per-view latency matters — a single view's propagation can
itself be distributed by sharding the pixel state over image rows. The
checkerboard candidate reads reach at most ±23 rows and NCC windows ±5
(SURVEY.md §5.7), so row-sharded state needs only boundary halos; sharding
constraints on the state arrays let XLA's SPMD partitioner derive the
halo/all-gather collectives rather than hand-scheduling RDMA.

Numerical results are identical to the single-device sweep (tested on the
virtual CPU mesh), because the sweep semantics never depended on placement.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.propagation import PropCfg, propagate_strong
from ..ops.state import PMState


def make_tile_mesh(num_devices: Optional[int] = None,
                   axis: str = "tiles") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_state_rows(state: PMState, mesh: Mesh,
                     axis: str = "tiles") -> PMState:
    """Place the per-pixel state row-sharded on the mesh (images and other
    read-only data stay replicated)."""

    def put(arr):
        spec = P(axis, *([None] * (arr.ndim - 1)))
        return jax.device_put(arr, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, state)


def build_tile_sharded_sweep(mesh: Mesh, cfg: PropCfg, axis: str = "tiles"):
    """One full (black + red) sweep with row-sharded state."""

    def row_spec(arr):
        return NamedSharding(mesh, P(axis, *([None] * (arr.ndim - 1))))

    def sweep(data, state, key, iteration, depth_min, depth_max, geom_factor):
        def body(state, inp):
            color, kc = inp
            state = propagate_strong(data, state, cfg, iteration, kc, color,
                                     depth_min, depth_max, geom_factor)
            # re-pin the updated state to the row sharding so XLA keeps the
            # computation tiled instead of collapsing to one device
            state = jax.tree_util.tree_map(
                lambda a: jax.lax.with_sharding_constraint(a, row_spec(a)),
                state)
            return state, None

        kcs = jax.random.split(key, 2)
        state, _ = jax.lax.scan(body, state, (jnp.arange(2), kcs))
        return state

    return jax.jit(sweep)


# Checkerboard candidate regions reach ±23 rows (propagation._REGIONS far
# offsets 3+2*10) and NCC windows another ±5; 24 halo rows cover the state
# reads of one color sweep.
HALO_ROWS = 24


def build_halo_tile_sweep(mesh: Mesh, cfg: PropCfg, axis: str = "tiles",
                          halo: int = HALO_ROWS):
    """One full (black + red) strong sweep with EXPLICIT halo exchange.

    The partitioner-derived path above collapses to full-state all-gathers
    (the sweep's data-dependent gathers defeat locality analysis — verified
    in tests/test_tiles.py), so this variant hand-rolls the communication:
    each device holds a contiguous row shard, exchanges `halo` boundary rows
    of (costs, planes, selected) with its neighbors via `ppermute` before
    each color sweep, runs the sweep on the extended block, and keeps its
    interior rows. Per-color communication is 2*halo rows instead of the
    whole state.

    Semantics: identical reads to the unsharded sweep (global row bounds are
    threaded into the candidate-region validity so out-of-image halos act
    exactly like array edges). The Monte-Carlo view-selection draws are
    keyed per shard, so results are statistically equivalent but not
    bitwise identical across tile counts (the reference is clock-seeded
    nondeterministic; single-chip runs stay bitwise reproducible).

    Requires: shard height even (checkerboard parity) and >= halo.
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    n = mesh.devices.size
    fwd = [(i, i + 1) for i in range(n - 1)]
    bwd = [(i + 1, i) for i in range(n - 1)]

    def extend(arr):
        """(Rl, W, ...) -> (Rl + 2*halo, W, ...) with neighbor halo rows;
        devices at the chain ends receive zeros (out-of-image)."""
        from_prev = jax.lax.ppermute(arr[-halo:], axis, fwd)
        from_next = jax.lax.ppermute(arr[:halo], axis, bwd)
        return jnp.concatenate([from_prev, arr, from_next], axis=0)

    def body(data_pad, state: PMState, key, iteration, depth_min, depth_max,
             geom_factor):
        # data_pad: CostData whose ref_image/sa_mask rows are pre-padded by
        # `halo` on both ends (zeros), everything else untouched.
        rl = state.costs.shape[0]
        ext_h = rl + 2 * halo
        idx = jax.lax.axis_index(axis)
        row0 = idx * rl - halo          # global row of ext-block row 0
        h_global = rl * n
        lo = jnp.maximum(0, -row0)      # globally-valid rows of the block
        hi = jnp.minimum(ext_h - 1, h_global - 1 - row0)
        key = jax.random.fold_in(key, idx)

        # local view of the problem: ref image rows of the extended block,
        # principal point shifted so local pixel (x, y) maps to the same ray
        # as global pixel (x, y + row0). Camera-frame plane hypotheses are
        # intrinsics-shift invariant, so state needs no conversion.
        ref_img = jax.lax.dynamic_slice(
            data_pad.ref_image, (idx * rl, 0), (ext_h, data_pad.width))
        sa = jax.lax.dynamic_slice(
            data_pad.sa_mask, (idx * rl, 0), (ext_h, data_pad.width))
        K = data_pad.ref_cam.K.at[1, 2].add(-row0.astype(jnp.float32))
        # real_width/real_height stay GLOBAL: they bound warped *source*
        # coordinates, which are unaffected by the ref-row windowing
        data = data_pad.replace(
            ref_cam=data_pad.ref_cam._replace(K=K),
            ref_image=ref_img, sa_mask=sa, height=ext_h,
            src_height=data_pad.height)

        def color_sweep(st, inp):
            color, kc = inp
            ext = PMState(
                planes=extend(st.planes), costs=extend(st.costs),
                selected=extend(st.selected),
                view_weights=extend(st.view_weights),
                weak=extend(st.weak), confidence=extend(st.confidence),
                valid=extend(st.valid))
            out = propagate_strong(data, ext, cfg, iteration, kc, color,
                                   depth_min, depth_max, geom_factor,
                                   row_bounds=(lo, hi))
            keep = lambda a: a[halo:halo + rl]
            return PMState(planes=keep(out.planes), costs=keep(out.costs),
                           selected=keep(out.selected),
                           view_weights=keep(out.view_weights),
                           weak=st.weak, confidence=st.confidence,
                           valid=st.valid), None

        kcs = jax.random.split(key, 2)
        state, _ = jax.lax.scan(color_sweep, state, (jnp.arange(2), kcs))
        return state

    shd = P(axis)
    rep = P()

    def state_spec(sharded):
        return PMState(planes=sharded, costs=sharded, selected=sharded,
                       view_weights=sharded, weak=sharded, confidence=sharded,
                       valid=sharded)

    mapped = shard_map(
        body, mesh=mesh,
        in_specs=(rep, state_spec(shd), rep, rep, rep, rep, rep),
        out_specs=state_spec(shd), check_vma=False)

    def sweep(data, state, key, iteration, depth_min, depth_max, geom_factor):
        rl = state.costs.shape[0] // n
        if state.costs.shape[0] % n:
            raise ValueError(
                f"rows {state.costs.shape[0]} not divisible by {n} shards")
        if rl % 2 or rl < halo:
            # odd shard heights flip checkerboard parity mid-image and
            # shards shorter than the halo under-fill the exchange — both
            # corrupt silently, so reject here
            raise ValueError(
                f"shard height {rl} must be even and >= halo ({halo})")
        # edge-replicate the halo pad so window clamping at the global image
        # border matches the unsharded sweep's texture-clamp semantics; pin
        # the real image bounds explicitly, because the body overrides
        # `height` with the local block height and img_h must stay global
        data_pad = data.replace(
            ref_image=jnp.pad(data.ref_image, ((halo, halo), (0, 0)),
                              mode="edge"),
            sa_mask=jnp.pad(data.sa_mask, ((halo, halo), (0, 0))),
            real_width=data.img_w, real_height=data.img_h)
        return mapped(data_pad, state, key, iteration, depth_min, depth_max,
                      geom_factor)

    return jax.jit(sweep)

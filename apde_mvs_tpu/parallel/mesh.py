"""Multi-chip execution: views sharded over a device mesh.

The reference scales by running independent scans on separate GPUs
(run.py:218-226) and exchanges neighbor depth maps through the filesystem
between iterations (SURVEY.md §5.8). The TPU-native design keeps whole scans
resident: all views of a scan live on a `jax.sharding.Mesh` sharded over a
``views`` axis, every device sweeps its local reference views in parallel,
and the between-iteration depth exchange becomes an all-gather over ICI
instead of bin-files on disk.

`view_parallel_step` is the SPMD inner loop: one full PatchMatch iteration
(black + red strong sweeps, optional geometric consistency against the
gathered neighbor depths) for every view of a scan simultaneously.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core import geometry as geo
from ..ops import propagation
from ..ops.cost import CostData
from ..ops.propagation import PropCfg
from ..ops.state import PMState
from ..ops import filters


def make_mesh(num_devices: Optional[int] = None, axis: str = "views") -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


class SceneBatch(NamedTuple):
    """A whole scan as view-stacked arrays (leading dim V, shardable)."""

    images: jnp.ndarray      # (V, H, W) f32
    quads: jnp.ndarray       # (V, H*W, 4) packed bilinear
    cams: geo.CameraArrays   # batched (V, ...)
    pair: jnp.ndarray        # (V, S) int32 source-view indices
    planes: jnp.ndarray      # (V, H, W, 4) camera-frame plane state
    costs: jnp.ndarray       # (V, H, W)
    selected: jnp.ndarray    # (V, H, W, S) bool
    view_weights: jnp.ndarray  # (V, H, W, S) f32
    weak: jnp.ndarray        # (V, H, W) int32
    depths: jnp.ndarray      # (V, H, W) f32 previous-iteration depth maps


def scene_batch_from_arrays(images, cams: geo.CameraArrays, pair, key,
                            depth_min: float = 1.0,
                            depth_max: float = 10.0) -> SceneBatch:
    """Initialize a SceneBatch with random plane hypotheses per view, drawn
    from the scene's [depth_min, depth_max] range."""
    from ..core.sampling import pack_bilinear

    V, H, W = images.shape
    S = pair.shape[1]
    ys, xs = jnp.mgrid[0:H, 0:W]
    xs = xs.astype(jnp.float32)
    ys = ys.astype(jnp.float32)

    def init_view(k, cam_i):
        return geo.random_plane_hypothesis(k, cam_i, xs, ys, depth_min,
                                           depth_max)

    keys = jax.random.split(key, V)
    planes = jax.vmap(init_view)(keys, cams)
    return SceneBatch(
        images=images,
        quads=jax.vmap(pack_bilinear)(images),
        cams=cams, pair=jnp.asarray(pair, jnp.int32),
        planes=planes,
        costs=jnp.full((V, H, W), 2.0, jnp.float32),
        selected=jnp.ones((V, H, W, S), bool),
        view_weights=jnp.ones((V, H, W, S), jnp.float32),
        weak=jnp.ones((V, H, W), jnp.int32),       # all STRONG
        depths=jnp.zeros((V, H, W), jnp.float32),
    )


def _per_view_iteration(all_images, all_quads, all_cams: geo.CameraArrays,
                        ref_index, pair_row, all_depths, planes, costs,
                        selected, view_weights, weak, key, cfg: PropCfg,
                        iteration, depth_min, depth_max, geom_factor):
    """One full PatchMatch iteration for a single reference view whose
    source data has been gathered to the local device."""
    H, W = planes.shape[:2]
    S = pair_row.shape[0]
    # gather source cameras / images by pair indices
    src_cams = geo.CameraArrays(*[a[pair_row] for a in all_cams])
    data = CostData(
        ref_cam=geo.CameraArrays(*[a[ref_index] for a in all_cams]),
        src_cams=src_cams,
        ref_image=all_images[ref_index],
        src_quads=all_quads[pair_row],
        sa_mask=jnp.zeros((H, W), jnp.int32),
        src_depths=all_depths[pair_row],
        width=W, height=H, num_src=S)
    state = PMState(planes=planes, costs=costs, selected=selected,
                    view_weights=view_weights, weak=weak,
                    confidence=jnp.ones((H, W), jnp.float32),
                    valid=jnp.ones((H, W), bool))
    for color in (0, 1):
        key, k = jax.random.split(key)
        state = propagation.propagate_strong(
            data, state, cfg, iteration, k, color, depth_min, depth_max,
            geom_factor)
    depth = geo.depth_from_plane(
        data.ref_cam, state.planes,
        jnp.mgrid[0:H, 0:W][1].astype(jnp.float32),
        jnp.mgrid[0:H, 0:W][0].astype(jnp.float32))
    return state, depth


def view_parallel_step(scene: SceneBatch, cfg: PropCfg, iteration, key,
                       depth_min, depth_max, geom_factor,
                       axis: str = "views") -> SceneBatch:
    """SPMD body: runs inside shard_map with `scene` view-sharded.

    The depth maps of ALL views are all-gathered over the mesh (the ICI
    replacement for the reference's cross-view depths.bin reads,
    APD.cpp:592-610); images/quads/cameras are passed replicated.
    """
    local_planes = scene.planes          # (Vl, H, W, 4) local shard
    Vl = local_planes.shape[0]
    # neighbor depth exchange: gather every view's previous depth map
    all_depths = jax.lax.all_gather(scene.depths, axis, tiled=True)
    all_images = scene.images            # replicated
    all_quads = scene.quads              # replicated
    my_shard = jax.lax.axis_index(axis)

    def body(i, carry):
        planes, costs, selected, vw, weak, depths, k = carry
        global_view = my_shard * Vl + i
        # fold in the global view id: per-view streams are identical no
        # matter how views are sharded over devices
        kv = jax.random.fold_in(k, global_view)
        state, depth = _per_view_iteration(
            all_images, all_quads, scene.cams,
            global_view, scene.pair[global_view], all_depths,
            planes[i], costs[i], selected[i], vw[i], weak[i], kv,
            cfg, iteration, depth_min, depth_max, geom_factor)
        return (planes.at[i].set(state.planes), costs.at[i].set(state.costs),
                selected.at[i].set(state.selected),
                vw.at[i].set(state.view_weights), weak, depths.at[i].set(depth),
                k)

    init = (local_planes, scene.costs, scene.selected, scene.view_weights,
            scene.weak, scene.depths, key)
    planes, costs, selected, vw, weak, depths, _ = jax.lax.fori_loop(
        0, Vl, body, init)
    return scene._replace(planes=planes, costs=costs, selected=selected,
                          view_weights=vw, depths=depths)


def build_sharded_step(mesh: Mesh, cfg: PropCfg, axis: str = "views"):
    """jit(shard_map(step)) with views sharded, static data replicated."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    sharded = P(axis)
    replicated = P()
    scene_specs = SceneBatch(
        images=replicated, quads=replicated,
        cams=geo.CameraArrays(replicated, replicated, replicated, replicated),
        pair=replicated,
        planes=sharded, costs=sharded, selected=sharded,
        view_weights=sharded, weak=sharded, depths=sharded)

    def step(scene, iteration, key, depth_min, depth_max, geom_factor):
        return view_parallel_step(scene, cfg, iteration, key, depth_min,
                                  depth_max, geom_factor, axis=axis)

    mapped = shard_map(step, mesh=mesh,
                       in_specs=(scene_specs, replicated, replicated,
                                 replicated, replicated, replicated),
                       out_specs=scene_specs,
                       check_vma=False)
    return jax.jit(mapped)

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

"""Per-pass state initialization (reference: RandomInitialization,
APD.cu:919-948): FIRST_INIT draws random plane hypotheses; later passes
convert the loaded (world normal, depth) maps into camera-frame planes. Both
then compute the initial multi-view cost and top-k view selection."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import WEAK
from ..core import geometry as geo
from .cost import CostData, initial_cost_and_selection, ncc_strong, \
    precompute_ref_window
from .deformable import WeakRefData, ncc_weak
from .state import PMState


def random_planes(key, data: CostData, depth_min, depth_max) -> jnp.ndarray:
    h, w = data.height, data.width
    ys, xs = jnp.mgrid[0:h, 0:w]
    return geo.random_plane_hypothesis(
        key, data.ref_cam, xs.astype(jnp.float32), ys.astype(jnp.float32),
        depth_min, depth_max)


def initial_cost_chunk(data: CostData, planes_flat, x, y, params,
                       origins=None):
    """Strong NCC cost vectors for one flat pixel chunk (jit-friendly).
    `origins`: optional (S,) static band origins (ops.bands)."""
    xf = x.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    win = precompute_ref_window(data, xf, yf, params.strong_radius,
                                params.strong_increment, bool(params.use_sa))
    if origins is not None:
        from .bands import banded_view_tables
        data = banded_view_tables(data, origins)
    return ncc_strong(data, xf, yf, planes_flat, win, origins=origins)


def initial_cost(data: CostData, state: PMState, params, use_apd: bool,
                 weak_x=None, weak_y=None, weak_valid=None, anchors=None,
                 chunk: Optional[int] = None) -> PMState:
    """Initial cost + selected views for the whole image. With APD enabled,
    WEAK pixels are re-scored with the deformable NCC over the weak list
    (reference: ComputeMultiViewInitialCostandSelectedViews, APD.cu:723-774).

    ``chunk`` bounds the (chunk, taps) intermediates: full-resolution images
    would otherwise materialize ~1 GB per (H*W, 36) array.
    """
    h, w = data.height, data.width
    ys, xs = jnp.mgrid[0:h, 0:w]
    xf = xs.astype(jnp.float32).reshape(-1)
    yf = ys.astype(jnp.float32).reshape(-1)
    planes = state.planes.reshape(-1, 4)
    if chunk is None or chunk >= h * w:
        costs = initial_cost_chunk(data, planes, xf, yf, params)  # (HW, S)
    else:
        n = h * w
        pad = (-n) % chunk
        xf_p = jnp.concatenate([xf, jnp.zeros((pad,), xf.dtype)])
        yf_p = jnp.concatenate([yf, jnp.zeros((pad,), yf.dtype)])
        pl_p = jnp.concatenate([planes, jnp.zeros((pad, 4), planes.dtype)])
        nc = (n + pad) // chunk
        costs = jax.lax.map(
            lambda args: initial_cost_chunk(data, args[0], args[1], args[2],
                                            params),
            (pl_p.reshape(nc, chunk, 4), xf_p.reshape(nc, chunk),
             yf_p.reshape(nc, chunk)))
        costs = costs.reshape(-1, data.num_src)[:n]

    if use_apd and weak_x is not None:
        wref = WeakRefData.build(
            data, weak_x.astype(jnp.float32), weak_y.astype(jnp.float32),
            anchors, state.selected, params)
        wplanes = state.planes.reshape(-1, 4)[weak_y * w + weak_x]
        wcosts = ncc_weak(data, wref, wplanes, params)     # (Nw, S)
        flat_idx = jnp.where(weak_valid, weak_y * w + weak_x, h * w)
        costs = costs.at[flat_idx].set(wcosts, mode="drop")

    mean_cost, selected = initial_cost_and_selection(costs, params.top_k)
    return state.replace(
        costs=jnp.where(state.valid, mean_cost.reshape(h, w), 1e9),
        selected=selected.reshape(h, w, -1) & state.valid[..., None])

"""Within-view tile sharding: identical results to the 1-device sweep."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apde_mvs_tpu.core import geometry as geo
from apde_mvs_tpu.ops.cost import CostData
from apde_mvs_tpu.ops.init import initial_cost, random_planes
from apde_mvs_tpu.ops.propagation import PropCfg
from apde_mvs_tpu.ops.state import PMState
from apde_mvs_tpu.parallel import tiles
from apde_mvs_tpu.config import PatchMatchParams
from apde_mvs_tpu.testing import synthetic


def test_tile_sharded_sweep_matches_single_device():
    assert len(jax.devices()) >= 4
    h, w = 32, 64  # h divisible by 4 shards
    scene = synthetic.make_scene(num_views=3, height=h, width=w)
    cams = geo.CameraArrays.from_cameras(scene.cameras)
    src = np.asarray([1, 2])
    data = CostData.build(
        cams.view(0), geo.CameraArrays(*[a[src] for a in cams]),
        jnp.asarray(scene.images[0]), jnp.asarray(scene.images[src]))
    params = PatchMatchParams(use_sa=False)
    state = PMState.create(h, w, 2)
    state = state.replace(planes=random_planes(jax.random.PRNGKey(0), data,
                                               jnp.float32(2.0),
                                               jnp.float32(8.0)))
    state = initial_cost(data, state, params, use_apd=False)
    cfg = PropCfg(use_sa=False)
    args = (jax.random.PRNGKey(3), jnp.int32(0), jnp.float32(2.0),
            jnp.float32(8.0), jnp.float32(0.2))

    m1 = tiles.make_tile_mesh(1)
    s1 = tiles.shard_state_rows(state, m1)
    out1 = tiles.build_tile_sharded_sweep(m1, cfg)(data, s1, *args)
    jax.block_until_ready(out1.costs)

    m4 = tiles.make_tile_mesh(4)
    s4 = tiles.shard_state_rows(state, m4)
    out4 = tiles.build_tile_sharded_sweep(m4, cfg)(data, s4, *args)
    jax.block_until_ready(out4.costs)

    # SPMD partitioning reassociates f32 arithmetic; PatchMatch's discrete
    # accept/reject decisions amplify ULP-level differences at a few pixels,
    # so equivalence is statistical: the overwhelming majority of pixels
    # must match exactly-ish and overall quality must be identical.
    c1 = np.asarray(out1.costs)
    c4 = np.asarray(out4.costs)
    close = np.isclose(c1, c4, rtol=1e-3, atol=1e-3)
    assert close.mean() > 0.95, f"only {close.mean():.2%} of costs match"
    assert abs(np.median(c1) - np.median(c4)) < 0.02
    # the sweep did real work
    assert not np.allclose(np.asarray(out4.planes), np.asarray(state.planes))


def _problem(h, w, seed=0):
    scene = synthetic.make_scene(num_views=3, height=h, width=w)
    cams = geo.CameraArrays.from_cameras(scene.cameras)
    src = np.asarray([1, 2])
    data = CostData.build(
        cams.view(0), geo.CameraArrays(*[a[src] for a in cams]),
        jnp.asarray(scene.images[0]), jnp.asarray(scene.images[src]))
    params = PatchMatchParams(use_sa=False)
    state = PMState.create(h, w, 2)
    state = state.replace(planes=random_planes(jax.random.PRNGKey(seed), data,
                                               jnp.float32(2.0),
                                               jnp.float32(8.0)))
    state = initial_cost(data, state, params, use_apd=False)
    return scene, data, state


def test_halo_tile_sweep_communicates_halos_only():
    """The hand-rolled halo sweep must contain NO all-gather of state arrays
    — only halo-row collective-permutes (VERDICT round-1 item 8)."""
    import re

    h, w = 256, 64   # shards of 64 rows >= the 24-row halo
    _, data, state = _problem(h, w)
    cfg = PropCfg(use_sa=False)
    mesh = tiles.make_tile_mesh(4)
    sweep = tiles.build_halo_tile_sweep(mesh, cfg)
    s4 = tiles.shard_state_rows(state, mesh)
    args = (jax.random.PRNGKey(3), jnp.int32(0), jnp.float32(2.0),
            jnp.float32(8.0), jnp.float32(0.2))
    txt = sweep.lower(data, s4, *args).compile().as_text()
    assert len(re.findall(r"all-gather", txt)) == 0, \
        "halo sweep must not all-gather state"
    cps = re.findall(r"collective-permute[^\n]*", txt)
    assert cps, "halo exchange should lower to collective-permute"
    # every permuted buffer is halo-sized, never a full shard
    shapes = re.findall(r"=\s+\S*\[([0-9,]+)\][^\n]*collective-permute", txt)
    for s in shapes:
        rows = int(s.split(",")[0])
        assert rows <= tiles.HALO_ROWS, \
            f"collective-permute moves {s} (not halo-sized)"


def test_halo_tile_sweep_propagates_across_shards():
    """Candidates must cross shard boundaries through the halo: seed one
    shard's rows with ground-truth planes and check that, after sweeps,
    adjacent rows in the NEIGHBOR shard adopt low-cost planes."""
    from apde_mvs_tpu.ops import filters

    h, w = 256, 64
    scene, data, state = _problem(h, w)
    cfg = PropCfg(use_sa=False)
    mesh = tiles.make_tile_mesh(4)   # shards of 64 rows
    # ground-truth planes in shard 1 only (rows 64..128)
    gt_depth = jnp.asarray(scene.depths[0])
    ys, xs = jnp.mgrid[0:h, 0:w]
    n_world = jnp.asarray(scene.normals[0])
    gt_planes = filters.depth_normal_to_planes(data, gt_depth, n_world)
    seeded = jnp.where((ys[..., None] >= 64) & (ys[..., None] < 128),
                       gt_planes, state.planes)
    from apde_mvs_tpu.config import PatchMatchParams as _P
    state = state.replace(planes=seeded)
    state = initial_cost(data, state, _P(use_sa=False), use_apd=False)
    before = np.asarray(state.costs)

    sweep = tiles.build_halo_tile_sweep(mesh, cfg)
    s4 = tiles.shard_state_rows(state, mesh)
    out = s4
    key = jax.random.PRNGKey(7)
    for it in range(2):
        key, k = jax.random.split(key)
        out = sweep(data, out, k, jnp.int32(it), jnp.float32(2.0),
                    jnp.float32(8.0), jnp.float32(0.2))
    after = np.asarray(out.costs)
    # rows just below the seeded shard (in shard 2) must improve via
    # propagation THROUGH the halo
    band = slice(128, 140)
    inner = (slice(None), slice(8, -8))
    assert np.median(after[band][inner]) < \
        np.median(before[band][inner]) - 0.05, \
        "cross-shard propagation through halos failed"


def test_halo_tile_sweep_quality_matches_unsharded():
    """Same initial state, one sweep: the halo-sharded result's cost
    distribution matches the unsharded sweep (different PRNG streams, so
    statistical equivalence)."""
    from apde_mvs_tpu.ops.propagation import propagate_strong

    h, w = 256, 64
    _, data, state = _problem(h, w)
    cfg = PropCfg(use_sa=False)
    args = (jnp.float32(2.0), jnp.float32(8.0), jnp.float32(0.2))

    st = state
    key = jax.random.PRNGKey(3)
    for color in (0, 1):
        key, k = jax.random.split(key)
        st = propagate_strong(data, st, cfg, jnp.int32(0), k, color, *args)
    ref_costs = np.asarray(st.costs)

    mesh = tiles.make_tile_mesh(4)
    sweep = tiles.build_halo_tile_sweep(mesh, cfg)
    out = sweep(data, tiles.shard_state_rows(state, mesh),
                jax.random.PRNGKey(3), jnp.int32(0), *args)
    tile_costs = np.asarray(out.costs)
    assert abs(np.median(ref_costs) - np.median(tile_costs)) < 0.02
    assert abs(ref_costs.mean() - tile_costs.mean()) < 0.05

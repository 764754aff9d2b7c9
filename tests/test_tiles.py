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

"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apde_mvs_tpu.core import geometry as geo
from apde_mvs_tpu.ops.propagation import PropCfg
from apde_mvs_tpu.parallel import distributed, mesh as pmesh
from apde_mvs_tpu.testing import synthetic


def _scene_batch(num_views, h, w, seed=0):
    scene = synthetic.make_scene(num_views=num_views, height=h, width=w)
    cams = geo.CameraArrays.from_cameras(scene.cameras)
    pair = np.stack([[(v + 1) % num_views, (v - 1) % num_views]
                     for v in range(num_views)])
    return scene, pmesh.scene_batch_from_arrays(
        jnp.asarray(scene.images), cams, pair, jax.random.PRNGKey(seed))


def test_view_parallel_step_runs_on_mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    scene, batch = _scene_batch(8, 16, 32)
    m = pmesh.make_mesh(8)
    cfg = PropCfg(use_sa=False, geom_consistency=True)
    step = pmesh.build_sharded_step(m, cfg)
    with m:
        out = step(batch, jnp.int32(0), jax.random.PRNGKey(1),
                   jnp.float32(1.0), jnp.float32(10.0), jnp.float32(0.2))
    jax.block_until_ready(out.depths)
    assert out.depths.shape == batch.depths.shape
    assert np.isfinite(np.asarray(out.costs)).all()
    # every view's planes were touched
    assert not np.allclose(np.asarray(out.planes), np.asarray(batch.planes))


def test_sharded_step_matches_single_device():
    """The 4-device sharded step must produce the same result as a 1-device
    run (same keys, same data) — sharding must not change semantics."""
    scene, batch = _scene_batch(4, 16, 32, seed=3)
    cfg = PropCfg(use_sa=False)
    args = (jnp.int32(0), jax.random.PRNGKey(7), jnp.float32(1.0),
            jnp.float32(10.0), jnp.float32(0.2))
    m1 = pmesh.make_mesh(1)
    m4 = pmesh.make_mesh(4)
    with m1:
        out1 = pmesh.build_sharded_step(m1, cfg)(batch, *args)
        jax.block_until_ready(out1.depths)
    with m4:
        out4 = pmesh.build_sharded_step(m4, cfg)(batch, *args)
        jax.block_until_ready(out4.depths)
    np.testing.assert_allclose(np.asarray(out1.depths),
                               np.asarray(out4.depths), rtol=1e-4, atol=1e-4)


def test_partition_scans_lpt():
    scans = [("a", 100), ("b", 90), ("c", 50), ("d", 40), ("e", 30)]
    parts = [distributed.partition_scans(scans, 2, h) for h in range(2)]
    assert sorted(parts[0] + parts[1]) == ["a", "b", "c", "d", "e"]
    assert set(parts[0]) & set(parts[1]) == set()
    # LPT: biggest to host 0, second to host 1, then balance
    assert "a" in parts[0] and "b" in parts[1]
    loads = [sum(dict(scans)[s] for s in p) for p in parts]
    assert abs(loads[0] - loads[1]) <= 50


def test_throughput_report():
    rep = distributed.throughput_report({"s1": 60.0, "s2": 50.0}, 2,
                                        single_host_baseline_s=110.0)
    assert rep["scans_per_hour"] == pytest.approx(2 / 60 * 3600)
    assert rep["scaling_efficiency"] == pytest.approx(55.0 / 60.0)


def test_initialize_single_process():
    idx, count = distributed.initialize()
    assert idx == 0 and count == 1

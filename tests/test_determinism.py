"""Determinism: identical seeds must reproduce identical outputs (the
framework replaces the reference's clock-seeded curand with key-split PRNG —
reproducibility is a design guarantee, not best-effort)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apde_mvs_tpu.config import PatchMatchParams
from apde_mvs_tpu.core import geometry as geo
from apde_mvs_tpu.ops.cost import CostData
from apde_mvs_tpu.pipeline.patchmatch import run_patchmatch
from apde_mvs_tpu.testing import synthetic


def _run(seed):
    scene = synthetic.make_scene(num_views=3, height=48, width=64)
    cams = geo.CameraArrays.from_cameras(scene.cameras)
    src = np.asarray([1, 2])
    data = CostData.build(
        cams.view(0), geo.CameraArrays(*[a[src] for a in cams]),
        jnp.asarray(scene.images[0]), jnp.asarray(scene.images[src]))
    params = PatchMatchParams(state="first_init", use_apd=False, use_sa=False,
                              geom_consistency=False, weak_peak_radius=6)
    return run_patchmatch(
        data, params,
        depth_min=scene.cameras[0].depth_min * 0.6,
        depth_max=scene.cameras[0].depth_max * 1.2, seed=seed)


def test_same_seed_reproduces_bitwise():
    a = _run(7)
    b = _run(7)
    np.testing.assert_array_equal(a.depth, b.depth)
    np.testing.assert_array_equal(a.normal, b.normal)
    np.testing.assert_array_equal(a.weak, b.weak)
    np.testing.assert_array_equal(a.cost, b.cost)


def test_different_seed_differs():
    a = _run(7)
    c = _run(8)
    assert not np.array_equal(a.depth, c.depth)

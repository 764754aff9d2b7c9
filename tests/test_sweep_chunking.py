"""Pixel-chunked sweep execution (full-resolution memory bound).

At ETH3D-native resolution one checkerboard color half is ~12M pixels and
the unchunked sweep working set ((B, hyp, S) cost tensors plus (B, taps)
windows) exceeds v5e HBM. `ops.propagation._run_chunked` splits the sweep
into fixed-size chunks under lax.scan; same-color pixels never read each
other (all candidate/neighbor offsets have odd parity), so chunking cannot
change which state a pixel reads — only the per-chunk PRNG folding differs
from the unchunked draw order.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apde_mvs_tpu.core import geometry as geo
from apde_mvs_tpu.ops import propagation as prop_mod
from apde_mvs_tpu.ops.cost import CostData
from apde_mvs_tpu.ops.init import initial_cost
from apde_mvs_tpu.ops.propagation import PropCfg, _run_chunked, \
    propagate_strong
from apde_mvs_tpu.ops.state import PMState
from apde_mvs_tpu.config import PatchMatchParams, WEAK
from apde_mvs_tpu.testing import synthetic


def test_run_chunked_reassembles_and_pads():
    """Chunked execution must slice off padding and preserve order; the body
    sees fold_in-derived keys per chunk."""
    n, chunk = 1000, 256            # not a multiple: 4 chunks, 24 pad rows
    xs = jnp.arange(n, dtype=jnp.int32)
    mat = jnp.arange(n * 3, dtype=jnp.float32).reshape(n, 3)
    keys_seen = []

    def body(ks, kr, xc, mc):
        keys_seen.append((ks, kr))
        return xc * 2, mc.sum(-1)

    out_x, out_s = _run_chunked(body, jax.random.PRNGKey(0),
                                jax.random.PRNGKey(1), (xs, mat), n,
                                chunk=chunk)
    np.testing.assert_array_equal(np.asarray(out_x), np.arange(n) * 2)
    np.testing.assert_allclose(np.asarray(out_s),
                               np.asarray(mat.sum(-1)), rtol=1e-6)
    # scan traces the body once; the keys are traced fold_ins, not reused
    assert len(keys_seen) == 1

    # unchunked short-circuit: body called directly with the given keys
    keys_seen.clear()
    out_x2, _ = _run_chunked(body, jax.random.PRNGKey(0),
                             jax.random.PRNGKey(1), (xs, mat), n,
                             chunk=4096)
    np.testing.assert_array_equal(np.asarray(out_x2), np.arange(n) * 2)


def _strong_setup(h=48, w=64, num_views=4):
    scene = synthetic.make_scene(num_views=num_views, height=h, width=w)
    cams = geo.CameraArrays.from_cameras(scene.cameras)
    src = np.arange(1, num_views)
    data = CostData.build(
        cams.view(0), geo.CameraArrays(*[a[src] for a in cams]),
        jnp.asarray(scene.images[0]), jnp.asarray(scene.images[src]))
    params = PatchMatchParams()
    state = PMState.create(h, w, data.num_src)
    planes = np.zeros((h, w, 4), np.float32)
    planes[..., 3] = scene.depths[0] * 1.05
    planes[..., :3] = scene.normals[0]
    state = state.replace(planes=jnp.asarray(planes))
    state = initial_cost(data, state, params, use_apd=False)
    dmin = jnp.float32(scene.cameras[0].depth_min * 0.6)
    dmax = jnp.float32(scene.cameras[0].depth_max * 1.2)
    return scene, data, state, dmin, dmax


def test_propagate_strong_chunked_deterministic_and_sane(monkeypatch):
    """Chunked sweep: bitwise-reproducible, converges like the unchunked
    sweep, and padding pixels never leak into the state."""
    scene, data, state0, dmin, dmax = _strong_setup()
    cfg = PropCfg(use_sa=False)
    key = jax.random.PRNGKey(9)

    def run(state):
        st = state
        k = key
        for color in (0, 1):
            k, kc = jax.random.split(k)
            st = propagate_strong(data, st, cfg, jnp.int32(0), kc, color,
                                  dmin, dmax, jnp.float32(0.2))
        return st

    ref = run(state0)                       # unchunked (B = 1536 << chunk)

    # force chunking: B = 48*64/2 = 1536 -> 3 chunks of 512 + no pad,
    # then a non-dividing chunk to exercise padding
    for chunk in (512, 700):
        monkeypatch.setattr(prop_mod, "_SWEEP_CHUNK", chunk)
        out1 = run(state0)
        out2 = run(state0)
        # deterministic
        np.testing.assert_array_equal(np.asarray(out1.costs),
                                      np.asarray(out2.costs))
        np.testing.assert_array_equal(np.asarray(out1.planes),
                                      np.asarray(out2.planes))
        # same convergence quality as unchunked (RNG draws differ, the
        # adopted planes come from the same candidate sets)
        gt = scene.depths[0]
        h, w = gt.shape
        ys, xs = np.mgrid[0:h, 0:w]
        xs_f = jnp.asarray(xs.reshape(-1), jnp.float32)
        ys_f = jnp.asarray(ys.reshape(-1), jnp.float32)
        for out in (ref, out1):
            d = np.asarray(geo.depth_from_plane(
                data.ref_cam, out.planes.reshape(-1, 4), xs_f, ys_f)
            ).reshape(h, w)
            rel = np.abs(d - gt) / gt
            # one iteration from a 5%-perturbed start: meaningful progress
            assert np.median(rel) < 0.035
        assert abs(float(out1.costs.mean()) - float(ref.costs.mean())) < 0.05


def test_propagate_strong_chunked_respects_weak_mask(monkeypatch):
    """WEAK pixels must not be updated by the strong sweep, chunked or not."""
    scene, data, state0, dmin, dmax = _strong_setup()
    h, w = state0.costs.shape
    weak = np.zeros((h, w), np.int32)
    weak[10:20, 10:30] = WEAK
    state0 = state0.replace(weak=jnp.asarray(weak))
    monkeypatch.setattr(prop_mod, "_SWEEP_CHUNK", 512)
    cfg = PropCfg(use_sa=False)
    st = propagate_strong(data, state0, cfg, jnp.int32(0),
                          jax.random.PRNGKey(1), 0, dmin, dmax,
                          jnp.float32(0.2))
    mask = weak == WEAK
    np.testing.assert_array_equal(np.asarray(st.planes)[mask],
                                  np.asarray(state0.planes)[mask])
    np.testing.assert_array_equal(np.asarray(st.costs)[mask],
                                  np.asarray(state0.costs)[mask])

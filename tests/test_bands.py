"""Static-band gather bounds (ops.bands): the pre-pass must be exactly
conservative — whenever it reports `fits`, the banded NCC is bitwise equal
to the plain full-table NCC; planes it cannot bound must be flagged."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apde_mvs_tpu.core import geometry as geo
from apde_mvs_tpu.core.sampling import BAND_ROWS
from apde_mvs_tpu.ops import bands
from apde_mvs_tpu.ops.cost import CostData, ncc_strong, precompute_ref_window
from apde_mvs_tpu.testing import synthetic

# table must exceed BAND_ROWS for banding to be meaningful: 512 * 1600 =
# 819200 rows > 786432
W, H, V = 512, 1600, 3


@pytest.fixture(scope="module")
def big_scene():
    scene = synthetic.make_scene(num_views=V, height=H, width=W,
                                 baseline=0.18, focal=1.1 * W)
    cams = geo.CameraArrays.from_cameras(scene.cameras)
    src_ids = np.asarray([v for v in range(V) if v != 0])
    data = CostData.build(
        cams.view(0), geo.CameraArrays(*[a[src_ids] for a in cams]),
        jnp.asarray(scene.images[0]),
        jnp.asarray(scene.images[src_ids]),
        real_width=W, real_height=H, sampler_u8=True)
    assert int(data.src_quads.shape[1]) > BAND_ROWS
    return scene, data


def _chunk(scene, B=2048):
    flat0 = (H // 2) * W - B // 2
    xi = (flat0 + np.arange(B)) % W
    yi = (flat0 + np.arange(B)) // W
    return (jnp.asarray(xi, jnp.float32), jnp.asarray(yi, jnp.float32),
            xi, yi)


def test_banded_ncc_bitwise_equal_when_fits(big_scene):
    scene, data = big_scene
    xf, yf, xi, yi = _chunk(scene)
    C = 4
    gt_d = jnp.asarray(scene.depths[0][yi, xi])
    gt_n = jnp.asarray(scene.normals[0][yi, xi])
    planes = jnp.stack(
        [geo.make_plane(data.ref_cam, xf, yf, gt_d * (1 + 0.003 * c), gt_n)
         for c in range(C)], axis=1)                        # (B, C, 4)

    bb = jax.jit(bands.strong_bounds, static_argnames="max_extent")(
        data, xf, yf, planes, max_extent=5)
    fits = np.asarray(bb.fits)
    origins = np.asarray(bb.origin)
    assert fits.all(), f"coherent gt planes must band: {fits}"

    win = precompute_ref_window(data, xf, yf, 5, 2, False)
    for c in range(C):
        plain = np.asarray(ncc_strong(data, xf, yf, planes[:, c], win))
        banded = np.asarray(ncc_strong(data, xf, yf, planes[:, c], win,
                                       origins=jnp.asarray(origins[c])))
        np.testing.assert_array_equal(plain, banded)


def test_random_depth_planes_fit_claims_are_bitwise_right(big_scene):
    """Full-range random depths: with (near-)horizontal baselines the
    epipolar motion is mostly in x, so row bands often still fit — whatever
    the pre-pass claims must be bitwise right where it claims `fits`."""
    scene, data = big_scene
    xf, yf, xi, yi = _chunk(scene, B=256)
    B = int(xf.shape[0])
    key = jax.random.PRNGKey(0)
    d_lo = float(scene.depths[0][scene.depths[0] > 0].min())
    d_rand = jax.random.uniform(key, (B,), jnp.float32, 0.05 * d_lo,
                                50.0 * d_lo)
    n_flat = jnp.broadcast_to(
        jnp.asarray([0.9999, 0.0, -0.0141]), (B, 3))
    planes = jnp.stack(
        [geo.make_plane(data.ref_cam, xf, yf, d_rand, n_flat)], axis=1)

    bb = jax.jit(bands.strong_bounds, static_argnames="max_extent")(
        data, xf, yf, planes, max_extent=5)
    fits = np.asarray(bb.fits)
    win = precompute_ref_window(data, xf, yf, 5, 2, False)
    plain = np.asarray(ncc_strong(data, xf, yf, planes[:, 0], win))
    banded = np.asarray(ncc_strong(data, xf, yf, planes[:, 0], win,
                                   origins=jnp.asarray(bb.origin[0])))
    match = plain == banded
    for s in range(data.num_src):
        if fits[0, s]:
            assert match[:, s].all(), f"claimed fit but mismatch, view {s}"


def test_degenerate_planes_are_flagged(big_scene):
    """Planes whose homography blows up (w -> 0: the degenerate hypotheses
    the body scores COST_MAX but still gathers for) must be unbandable —
    their clamped warp coords can land anywhere in the table."""
    scene, data = big_scene
    xf, yf, xi, yi = _chunk(scene, B=256)
    B = int(xf.shape[0])
    bad = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0, 0.0]), (B, 4))
    planes = bad[:, None, :]
    bb = jax.jit(bands.strong_bounds, static_argnames="max_extent")(
        data, xf, yf, planes, max_extent=5)
    assert not np.asarray(bb.fits).any()


def test_bounds_cover_actual_gather_indices(big_scene):
    """The pre-pass row bounds must cover every index the NCC body actually
    gathers (direct index-level check, independent of cost math)."""
    scene, data = big_scene
    xf, yf, xi, yi = _chunk(scene)
    gt_d = jnp.asarray(scene.depths[0][yi, xi])
    gt_n = jnp.asarray(scene.normals[0][yi, xi])
    plane = geo.make_plane(data.ref_cam, xf, yf, gt_d, gt_n)

    from apde_mvs_tpu.core.sampling import quad_coords
    from apde_mvs_tpu.ops.cost import square_taps
    sq = jnp.asarray(square_taps(5, 2))
    bb = jax.jit(bands.strong_bounds, static_argnames="max_extent")(
        data, xf, yf, plane[:, None], max_extent=5)
    for s in range(data.num_src):
        if not bool(bb.fits[0, s]):
            continue
        Hm = geo.homography(data.ref_cam, data.src_cams.view(s), plane)
        tx = xf[:, None] + sq[None, :, 0].astype(jnp.float32)
        ty = yf[:, None] + sq[None, :, 1].astype(jnp.float32)
        wx, wy = geo.warp(Hm[:, None], tx, ty)
        idx, _, _ = quad_coords(data.width, data.src_h, wx, wy)
        idx = np.asarray(idx)
        org = int(bb.origin[0, s])
        assert idx.min() >= org
        assert idx.max() < org + BAND_ROWS

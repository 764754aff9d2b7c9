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


def test_strong_host_banded_matches_plain(monkeypatch):
    """The production host-dispatched strong sweep with static-band dispatch
    must be bitwise identical to the plain path (band shrunk so a small
    scene exercises it; at least one chunk must actually ride the band)."""
    import jax
    from apde_mvs_tpu.core import sampling
    from apde_mvs_tpu.ops import propagation as P
    from apde_mvs_tpu.ops.state import PMState
    from apde_mvs_tpu.ops import init as init_ops
    from apde_mvs_tpu.ops.cost import initial_cost_and_selection
    from apde_mvs_tpu.config import PatchMatchParams

    monkeypatch.setattr(sampling, "BAND_ROWS", 16384)
    h, w, V = 248, 136, 3
    scene = synthetic.make_scene(num_views=V, height=h, width=w,
                                 baseline=0.2, focal=1.2 * w)
    cams = geo.CameraArrays.from_cameras(scene.cameras)
    src_ids = np.asarray([v for v in range(V) if v != 0])
    data = CostData.build(
        cams.view(0), geo.CameraArrays(*[a[src_ids] for a in cams]),
        jnp.asarray(scene.images[0]), jnp.asarray(scene.images[src_ids]),
        real_width=w, real_height=h, sampler_u8=True)
    assert sampling.static_bands_enabled(data.src_quads)

    # plausible state: gt planes + jitter, initial costs/selection
    # (rebuilt per arm — the host sweep's commit DONATES the state)
    gt_d = jnp.asarray(scene.depths[0])
    gt_n = jnp.asarray(scene.normals[0])

    def make_state():
        key = jax.random.PRNGKey(7)
        jit_d = gt_d * (1.0 + 0.01 * jax.random.normal(key, gt_d.shape))
        from apde_mvs_tpu.ops.filters import depth_normal_to_planes
        state = PMState.create(h, w, data.num_src)
        planes = depth_normal_to_planes(data, jit_d, gt_n)
        state = state.replace(planes=planes)
        params = PatchMatchParams()
        state = init_ops.initial_cost(data, state, params, False,
                                      jnp.zeros((1,), jnp.int32),
                                      jnp.zeros((1,), jnp.int32),
                                      jnp.zeros((1,), bool),
                                      jnp.zeros((1, 9, 2), jnp.int32))
        return jax.block_until_ready(state)

    cfg = P.PropCfg(use_sa=False)
    kw = dict(iteration=0, key=jax.random.PRNGKey(3), color=0,
              depth_min=jnp.float32(float(gt_d.min()) * 0.7),
              depth_max=jnp.float32(float(gt_d.max()) * 1.3),
              geom_factor=jnp.float32(0.2), chunk=4096)

    before = P.BAND_DISPATCH_STATS["strong"][0]
    sampling.set_static_bands(True)
    out_b = P.propagate_strong_host(data, make_state(), cfg, **kw)
    out_b = jax.block_until_ready(out_b)
    banded_chunks = P.BAND_DISPATCH_STATS["strong"][0] - before
    assert banded_chunks > 0, "no chunk rode the band - test is vacuous"

    sampling.set_static_bands(False)
    try:
        out_p = jax.block_until_ready(
            P.propagate_strong_host(data, make_state(), cfg, **kw))
    finally:
        sampling.set_static_bands(True)

    np.testing.assert_array_equal(np.asarray(out_b.planes),
                                  np.asarray(out_p.planes))
    np.testing.assert_array_equal(np.asarray(out_b.costs),
                                  np.asarray(out_p.costs))
    np.testing.assert_array_equal(np.asarray(out_b.selected),
                                  np.asarray(out_p.selected))


@pytest.mark.slow
def test_full_pass_banded_matches_plain(monkeypatch):
    """run_patchmatch in host-dispatch mode with static bands on vs off:
    init chunks, strong sweeps and the view-major classify/refine must all
    be bitwise identical, and each site must actually ride the band."""
    import jax
    from apde_mvs_tpu.core import sampling
    from apde_mvs_tpu.ops import propagation as P
    from apde_mvs_tpu.pipeline import patchmatch as pm
    from apde_mvs_tpu.config import PatchMatchParams

    monkeypatch.setattr(sampling, "BAND_ROWS", 16384)
    monkeypatch.setattr(pm, "_iterations_host_mode",
                        lambda shape, S, cfg, u8=True: True)
    monkeypatch.setattr(pm, "_host_chunks", lambda S, banded=False: (4096, 2048))
    monkeypatch.setenv("APDE_VIEW_MAJOR", "1")
    # slices must span fewer raster rows than the (shrunken) band
    monkeypatch.setenv("APDE_VIEW_SB", "2048")

    h, w, V = 248, 136, 3
    scene = synthetic.make_scene(num_views=V, height=h, width=w,
                                 baseline=0.2, focal=1.2 * w)
    cams = geo.CameraArrays.from_cameras(scene.cameras)
    src_ids = np.asarray([v for v in range(V) if v != 0])
    data = CostData.build(
        cams.view(0), geo.CameraArrays(*[a[src_ids] for a in cams]),
        jnp.asarray(scene.images[0]), jnp.asarray(scene.images[src_ids]),
        real_width=w, real_height=h, sampler_u8=True)
    d_lo = float(scene.depths[0][scene.depths[0] > 0].min())
    d_hi = float(scene.depths[0].max())

    # first_init correctly skips the band pre-passes (random planes measured
    # a 0% fit rate); its outputs prime a refine pass where bands engage
    first = PatchMatchParams(state="first_init", max_iterations=2,
                             use_sa=False)
    out0 = pm.run_patchmatch(
        data, first, depth_min=d_lo * 0.7, depth_max=d_hi * 1.3,
        seed=11, classify_chunk=4096)

    params = PatchMatchParams(state="refine_iter", max_iterations=2,
                              use_sa=False, geom_consistency=False)

    def run():
        return pm.run_patchmatch(
            data, params, prior_depth=out0.depth, prior_normal=out0.normal,
            depth_min=d_lo * 0.7, depth_max=d_hi * 1.3,
            seed=12, classify_chunk=4096)

    before = {k: list(v) for k, v in P.BAND_DISPATCH_STATS.items()}
    sampling.set_static_bands(True)
    out_b = run()
    for site in ("strong", "init", "view_major"):
        assert P.BAND_DISPATCH_STATS[site][0] > before[site][0], \
            f"site {site} never rode the band - vacuous"
    sampling.set_static_bands(False)
    try:
        out_p = run()
    finally:
        sampling.set_static_bands(True)

    np.testing.assert_array_equal(out_b.depth, out_p.depth)
    np.testing.assert_array_equal(out_b.cost, out_p.cost)
    np.testing.assert_array_equal(out_b.weak, out_p.weak)
    np.testing.assert_array_equal(out_b.normal, out_p.normal)

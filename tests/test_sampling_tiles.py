"""u8 quad sampling layout: parity with the f32 quad path.

For integer-valued images (raw 0..255 inputs) the u8 path must be
bitwise-identical to the f32 path: same gathered values, same lerp order.
"""
import jax
import jax.numpy as jnp
import numpy as np

from apde_mvs_tpu.core import geometry as geo
from apde_mvs_tpu.core.sampling import bilinear_sample_packed, \
    pack_bilinear, pack_bilinear_u8
from apde_mvs_tpu.ops.cost import CostData, ncc_selected, ncc_strong, \
    precompute_ref_window
from apde_mvs_tpu.testing import synthetic


def _int_image(rng, h, w):
    return jnp.asarray(rng.integers(0, 256, (h, w)), jnp.float32)


def test_pack_u8_layout():
    rng = np.random.default_rng(0)
    h, w = 11, 19
    img = _int_image(rng, h, w)
    quads = np.asarray(pack_bilinear_u8(img)).reshape(h, w, 4)
    imn = np.asarray(img)
    for y, x in [(0, 0), (3, 7), (h - 1, w - 1), (h - 2, 5)]:
        for c, (dy, dx) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
            yy = min(y + dy, h - 1)
            xx = min(x + dx, w - 1)
            assert quads[y, x, c] == imn[yy, xx]


def test_u8_sampler_bitwise_equals_f32():
    rng = np.random.default_rng(1)
    h, w = 40, 56
    img = _int_image(rng, h, w)
    quad = pack_bilinear(img)
    quad8 = pack_bilinear_u8(img)
    x = jnp.asarray(rng.uniform(-3, w + 3, (500,)), jnp.float32)
    y = jnp.asarray(rng.uniform(-3, h + 3, (500,)), jnp.float32)
    # include exact-integer and exact-edge positions
    x = jnp.concatenate([x, jnp.asarray([0.0, w - 1.0, 17.0, w - 1.5])])
    y = jnp.concatenate([y, jnp.asarray([0.0, h - 1.0, 11.0, h - 1.5])])
    a = np.asarray(bilinear_sample_packed(quad, w, h, x, y))
    b = np.asarray(bilinear_sample_packed(quad8, w, h, x, y))
    np.testing.assert_array_equal(a, b)


def _two_datas(num_views=4, h=48, w=64):
    scene = synthetic.make_scene(num_views=num_views, height=h, width=w)
    # pre-round so the quad path sees the identical photometry as the tiles
    images = jnp.round(jnp.asarray(scene.images))
    cams = geo.CameraArrays.from_cameras(scene.cameras)
    src_ids = np.arange(1, num_views)
    src_cams = geo.CameraArrays(*[a[src_ids] for a in cams])
    dq = CostData.build(cams.view(0), src_cams, images[0], images[src_ids])
    dt = CostData.build(cams.view(0), src_cams, images[0], images[src_ids],
                        sampler_u8=True)
    return scene, dq, dt


def test_ncc_strong_parity():
    scene, dq, dt = _two_datas()
    rng = np.random.default_rng(2)
    B = 256
    x = jnp.asarray(rng.uniform(6, dq.width - 7, B), jnp.float32)
    y = jnp.asarray(rng.uniform(6, dq.height - 7, B), jnp.float32)
    n = np.tile(np.asarray([0.1, -0.05, -1.0]) / np.linalg.norm([0.1, -0.05, -1.0]),
                (B, 1))
    d = rng.uniform(3.0, 5.0, B)
    plane = geo.make_plane(dq.ref_cam, x, y, jnp.asarray(d, jnp.float32),
                           jnp.asarray(n, jnp.float32))
    win_q = precompute_ref_window(dq, x, y, 5, 2, False)
    win_t = precompute_ref_window(dt, x, y, 5, 2, False)
    cq = np.asarray(ncc_strong(dq, x, y, plane, win_q))
    ct = np.asarray(ncc_strong(dt, x, y, plane, win_t))
    np.testing.assert_array_equal(cq, ct)


def test_ncc_selected_parity():
    scene, dq, dt = _two_datas()
    rng = np.random.default_rng(3)
    B, K = 128, 2
    x = jnp.asarray(rng.uniform(6, dq.width - 7, B), jnp.float32)
    y = jnp.asarray(rng.uniform(6, dq.height - 7, B), jnp.float32)
    n = np.tile(np.asarray([0.0, 0.0, -1.0]), (B, 1))
    plane = geo.make_plane(dq.ref_cam, x, y,
                           jnp.asarray(rng.uniform(3.2, 4.8, B), jnp.float32),
                           jnp.asarray(n, jnp.float32))
    sel_idx = jnp.asarray(rng.integers(0, dq.num_src, (B, K)), jnp.int32)
    sel_valid = jnp.asarray(rng.random((B, K)) > 0.3)
    win_q = precompute_ref_window(dq, x, y, 5, 2, False)
    cq = np.asarray(ncc_selected(dq, x, y, plane, win_q, sel_idx, sel_valid))
    ct = np.asarray(ncc_selected(dt, x, y, plane, win_q, sel_idx, sel_valid))
    np.testing.assert_array_equal(cq, ct)


def test_ncc_weak_parity():
    from apde_mvs_tpu.config import PatchMatchParams
    from apde_mvs_tpu.ops.deformable import WeakRefData, ncc_weak
    scene, dq, dt = _two_datas()
    rng = np.random.default_rng(4)
    B = 64
    params = PatchMatchParams(use_sa=False)
    x = jnp.asarray(rng.integers(10, dq.width - 10, B), jnp.float32)
    y = jnp.asarray(rng.integers(10, dq.height - 10, B), jnp.float32)
    anchors = np.full((B, 9, 2), -1, np.int32)
    anchors[:, 0, 0] = np.asarray(x, np.int32)
    anchors[:, 0, 1] = np.asarray(y, np.int32)
    for a in range(1, 5):
        anchors[:, a, 0] = rng.integers(8, dq.width - 8, B)
        anchors[:, a, 1] = rng.integers(8, dq.height - 8, B)
    anchors = jnp.asarray(anchors)
    selected = jnp.ones((dq.height, dq.width, dq.num_src), bool)
    n = np.tile(np.asarray([0.0, 0.0, -1.0]), (B, 1))
    plane = geo.make_plane(dq.ref_cam, x, y,
                           jnp.asarray(rng.uniform(3.2, 4.8, B), jnp.float32),
                           jnp.asarray(n, jnp.float32))
    wq = WeakRefData.build(dq, x, y, anchors, selected, params)
    wt = WeakRefData.build(dt, x, y, anchors, selected, params)
    cq = np.asarray(ncc_weak(dq, wq, plane, params))
    ct = np.asarray(ncc_weak(dt, wt, plane, params))
    np.testing.assert_array_equal(cq, ct)


def test_ncc_weak_selected_matches_full():
    """Slot-compacted deformable NCC == the all-views sweep gathered at the
    slot indices, on both sampling layouts."""
    from apde_mvs_tpu.config import PatchMatchParams
    from apde_mvs_tpu.ops.deformable import WeakRefData, ncc_weak, \
        ncc_weak_selected
    scene, dq, dt = _two_datas(num_views=5)
    rng = np.random.default_rng(5)
    B, K = 48, 3
    params = PatchMatchParams(use_sa=False)
    x = jnp.asarray(rng.integers(10, dq.width - 10, B), jnp.float32)
    y = jnp.asarray(rng.integers(10, dq.height - 10, B), jnp.float32)
    anchors = np.full((B, 9, 2), -1, np.int32)
    anchors[:, 0, 0] = np.asarray(x, np.int32)
    anchors[:, 0, 1] = np.asarray(y, np.int32)
    for a in range(1, 6):
        anchors[:, a, 0] = rng.integers(8, dq.width - 8, B)
        anchors[:, a, 1] = rng.integers(8, dq.height - 8, B)
    anchors = jnp.asarray(anchors)
    selected = jnp.asarray(rng.random((dq.height, dq.width, dq.num_src)) > 0.4)
    n = np.tile(np.asarray([0.0, 0.0, -1.0]), (B, 1))
    plane = geo.make_plane(dq.ref_cam, x, y,
                           jnp.asarray(rng.uniform(3.2, 4.8, B), jnp.float32),
                           jnp.asarray(n, jnp.float32))
    sel_idx = jnp.asarray(rng.integers(0, dq.num_src, (B, K)), jnp.int32)
    sel_valid = jnp.asarray(rng.random((B, K)) > 0.3)
    for data in (dq, dt):
        wref = WeakRefData.build(data, x, y, anchors, selected, params)
        full = np.asarray(ncc_weak(data, wref, plane, params))       # (B, S)
        got = np.asarray(ncc_weak_selected(data, wref, plane, params,
                                           sel_idx, sel_valid))      # (B, K)
        want = np.take_along_axis(full, np.asarray(sel_idx), axis=-1)
        want = np.where(np.asarray(sel_valid), want, 2.0)            # COST_MAX
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_banded_take_bitwise_equals_plain():
    """banded_take must equal jnp.take on both regimes: indices spanning a
    narrow band (fast branch) and the whole table (fallback branch)."""
    from apde_mvs_tpu.core.sampling import BAND_ROWS, banded_take

    rng = np.random.default_rng(7)
    n = BAND_ROWS + 50000
    tab = jnp.asarray(rng.integers(0, 256, (n, 4)), jnp.uint8)

    fits = jnp.asarray(rng.integers(123456, 123456 + BAND_ROWS // 2,
                                    (64, 36)), jnp.int32)
    wide = jnp.asarray(rng.integers(0, n, (64, 36)), jnp.int32)
    edge = jnp.asarray(rng.integers(n - BAND_ROWS // 4, n,
                                    (64, 36)), jnp.int32)  # clamped start
    take = jax.jit(lambda t, i: banded_take(t, i))
    for idx in (fits, wide, edge):
        got = np.asarray(take(tab, idx))
        want = np.asarray(jnp.take(tab, idx, axis=0))
        assert np.array_equal(got, want)


def test_banded_sampler_bitwise_equals_unbanded():
    """bilinear_sample_packed through a big u8 table must match the
    plain-gather result bitwise regardless of band hit/miss."""
    from apde_mvs_tpu.core import sampling as S

    rng = np.random.default_rng(3)
    h = (S.BAND_ROWS // 640) + 40          # force n > BAND_ROWS
    w = 640
    img = _int_image(rng, h, w)
    quad = pack_bilinear_u8(img)
    assert quad.shape[0] > S.BAND_ROWS

    # narrow-band coords (one row region) and full-span coords
    xs = jnp.asarray(rng.uniform(0, w - 1, (512,)), jnp.float32)
    y_narrow = jnp.asarray(rng.uniform(100, 130, (512,)), jnp.float32)
    y_wide = jnp.asarray(rng.uniform(0, h - 1, (512,)), jnp.float32)
    for ys in (y_narrow, y_wide):
        got = np.asarray(bilinear_sample_packed(quad, w, h, xs, ys))
        idx, fx, fy = S.quad_coords(w, h, xs, ys)
        want = np.asarray(S.lerp_quad_rows(
            jnp.take(quad, idx, axis=0), fx, fy))
        assert np.array_equal(got, want)
        # per-call-site opt-out takes the plain gather, same values
        off = np.asarray(bilinear_sample_packed(quad, w, h, xs, ys,
                                                band=False))
        assert np.array_equal(off, want)


def test_band_site_gating(monkeypatch):
    """APDE_BAND_SITES selects which call sites ride the banded gather;
    results are identical either way (banding is bitwise-neutral). The
    deformable weak NCC additionally switches its anchor gathers between
    per-slot (banded) and fused (plain) layouts — pin their agreement on a
    'big' table by shrinking BAND_ROWS under the test. (Gathered values are
    bitwise equal; the two layouts reduce window sums in different orders,
    so costs agree to float tolerance, not bitwise.)"""
    from apde_mvs_tpu.core import sampling as S
    import apde_mvs_tpu.ops.deformable as deform
    from apde_mvs_tpu.config import PatchMatchParams
    from apde_mvs_tpu.ops.deformable import WeakRefData, ncc_weak

    monkeypatch.setattr(S, "_BAND_SITES", "strong,classify")
    assert S.site_banded("strong") and S.site_banded("classify")
    assert not S.site_banded("weak_anchor")
    monkeypatch.setattr(S, "_BAND_SITES", "all")
    assert S.site_banded("weak_anchor")

    # make the 48x64 test table count as "big" so the banded paths engage
    monkeypatch.setattr(S, "BAND_ROWS", 1024)
    monkeypatch.setattr(deform, "BAND_ROWS", 1024)

    scene, dq, dt = _two_datas()
    rng = np.random.default_rng(11)
    B = 32
    params = PatchMatchParams(use_sa=False)
    x = jnp.asarray(rng.integers(10, dt.width - 10, B), jnp.float32)
    y = jnp.asarray(rng.integers(10, dt.height - 10, B), jnp.float32)
    anchors = np.full((B, 9, 2), -1, np.int32)
    anchors[:, 0, 0] = np.asarray(x, np.int32)
    anchors[:, 0, 1] = np.asarray(y, np.int32)
    for a in range(1, 5):
        anchors[:, a, 0] = rng.integers(8, dt.width - 8, B)
        anchors[:, a, 1] = rng.integers(8, dt.height - 8, B)
    anchors = jnp.asarray(anchors)
    selected = jnp.ones((dt.height, dt.width, dt.num_src), bool)
    n = np.tile(np.asarray([0.0, 0.0, -1.0]), (B, 1))
    plane = geo.make_plane(dt.ref_cam, x, y,
                           jnp.asarray(rng.uniform(3.2, 4.8, B), jnp.float32),
                           jnp.asarray(n, jnp.float32))
    wref = WeakRefData.build(dt, x, y, anchors, selected, params)
    banded = np.asarray(ncc_weak(dt, wref, plane, params))   # per-slot banded
    monkeypatch.setattr(S, "_BAND_SITES", "")
    plain = np.asarray(ncc_weak(dt, wref, plane, params))    # fused plain
    np.testing.assert_allclose(banded, plain, rtol=0, atol=1e-5)

"""GenAnchors vs the independent NumPy anchor oracle.

VERDICT r4 next-round #4: extend the prop_oracle pattern (scalar NumPy,
injected RNG) to the anchor generator so its discrete decision rules —
direction/radius scan, cone acceptance, RANSAC plane + triangle containment
+ >=6-inlier rule, center-distance tie-break, distance-sorted top-8,
weak_reliable demotion — are encoded twice and pinned against each other
(reference: /root/reference/APD.cu:1857-2100).

The nearest-strong map and the radius schedule are shared inputs (the JFA
and budgeted-schedule deviations are documented and quantified in
QUALITY.md §3-4; this suite pins everything downstream of them).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apde_mvs_tpu.config import STRONG, UNKNOWN, WEAK
from apde_mvs_tpu.core import geometry as geo
from apde_mvs_tpu.ops import anchors as anchor_ops
from apde_mvs_tpu.ops.anchors import AnchorRaws, RANSAC_ITERS
from apde_mvs_tpu.ops.state import PMState
from apde_mvs_tpu.testing import anchor_oracle as oracle

ROTATE_TIME = 2
H, W = 96, 112
DEPTH_MIN, DEPTH_MAX = 2.0, 6.0
THRESH = 0.004


def _scene(seed=0, noise=0.015, weak_box=(40, 56, 44, 68), holes=0.25):
    """Strong field with random UNKNOWN holes, a central weak blob, and a
    noisy planar depth map (noise scaled to depth range so RANSAC inlier
    counts vary between 0 and all hits — exercising the >=6-inlier gate and
    the tie-breaks rather than trivially accepting everything)."""
    rng = np.random.default_rng(seed)
    weak = np.full((H, W), STRONG, np.int32)
    weak[rng.random((H, W)) < holes] = UNKNOWN
    y0, y1, x0, x1 = weak_box
    weak[y0:y1, x0:x1] = WEAK
    # a second blob NEAR THE BORDER: its outward probes land in the margin
    # ring (coords in [5, 6)), which is what gives the min_margin knob
    # detection power (APD.cu:1927)
    weak[70:86, 8:16] = WEAK
    conf = rng.integers(0, 256, (H, W)).astype(np.float32)
    depth = np.empty((H, W), np.float32)
    ys, xs = np.mgrid[0:H, 0:W]
    depth[:] = 4.0 + 0.004 * xs + 0.003 * ys
    depth += (noise * (DEPTH_MAX - DEPTH_MIN)
              * rng.standard_normal((H, W))).astype(np.float32)
    K = jnp.asarray([[120.0, 0, W / 2], [0, 120.0, H / 2], [0, 0, 1.0]])
    cam = geo.CameraArrays(K=K, R=jnp.eye(3), t=jnp.zeros(3), c=jnp.zeros(3))
    return weak, conf, depth, cam


def _run_production(weak, conf, depth, cam, raws, wx, wy, radius_budget=25):
    class Data:
        ref_cam = cam
        img_h = H
        img_w = W

    state = PMState.create(H, W, 2)
    planes = np.zeros((H, W, 4), np.float32)
    planes[..., 3] = depth
    planes[..., 2] = -1.0
    state = state.replace(planes=jnp.asarray(planes),
                          weak=jnp.asarray(weak),
                          confidence=jnp.asarray(conf))
    ns = anchor_ops.nearest_strong_jfa(state.weak, state.confidence,
                                       state.valid)
    res = anchor_ops.gen_anchors(
        jax.random.PRNGKey(0), Data, state, jnp.asarray(wx), jnp.asarray(wy),
        jnp.ones((len(wx),), bool), rotate_time=ROTATE_TIME,
        ransac_threshold=THRESH, depth_min=DEPTH_MIN, depth_max=DEPTH_MAX,
        nearest_strong=ns, radius_budget=radius_budget, raws=raws)
    return res, np.asarray(ns), state


def _make_raws(rng, n, drj):
    import math
    angle = 45.0 / ROTATE_TIME
    shift_range = max(int(math.tan(math.radians(angle / 2.0)) * 20), 1)
    return AnchorRaws(
        shift_x=jnp.asarray(rng.integers(-shift_range + 1, shift_range,
                                         (n, drj)), jnp.int32),
        shift_y=jnp.asarray(rng.integers(-shift_range + 1, shift_range,
                                         (n, drj)), jnp.int32),
        triplets=jnp.asarray(rng.integers(0, 1 << 30,
                                          (RANSAC_ITERS, n, 3)), jnp.int32))


def _scene_sparse(seed=3):
    """Almost-empty strong field: exactly 3 strong pixels in the whole
    image. Every probe snaps to one of them and two directions 22.5 degrees
    apart cannot both lie within the 11.25-degree cone of one target, so
    hit_count <= 3 — the only regime where the reference's `> 3` gate
    (APD.cu:1968) actually fires with a dense-enough field it never would."""
    rng = np.random.default_rng(seed)
    weak = np.full((H, W), UNKNOWN, np.int32)
    for y, x in ((20, 20), (30, 90), (80, 40)):
        weak[y, x] = STRONG
    weak[46:50, 52:56] = WEAK
    conf = rng.integers(0, 256, (H, W)).astype(np.float32)
    depth = np.full((H, W), 4.0, np.float32)
    K = jnp.asarray([[120.0, 0, W / 2], [0, 120.0, H / 2], [0, 0, 1.0]])
    cam = geo.CameraArrays(K=K, R=jnp.eye(3), t=jnp.zeros(3), c=jnp.zeros(3))
    return weak, conf, depth, cam


def _pin(scene):
    weak, conf, depth, cam = scene
    wy, wx = np.nonzero(weak == WEAK)
    n = len(wx)
    radii = anchor_ops._radius_schedule(25)
    dirs = oracle.direction_table(ROTATE_TIME)
    drj = dirs.shape[0] * len(radii) * 4
    rng = np.random.default_rng(7)
    raws = _make_raws(rng, n, drj)
    res, ns, state = _run_production(weak, conf, depth, cam, raws, wx, wy)
    cam_d = {"fx": float(cam.fx), "fy": float(cam.fy),
             "cx": float(cam.cx), "cy": float(cam.cy)}
    sx = np.asarray(raws.shift_x)
    sy = np.asarray(raws.shift_y)
    tri = np.asarray(raws.triplets)
    return dict(weak=weak, depth=depth, ns=ns, cam=cam_d, radii=radii,
                wx=wx, wy=wy, sx=sx, sy=sy, tri=tri, n=n,
                anchors=np.asarray(res.anchors),
                reliable=np.asarray(res.reliable),
                hit_count=np.asarray(res.hit_count))


@pytest.fixture(scope="module")
def pinned():
    """Production + oracle inputs/outputs over every weak pixel of the
    dense scene, shared by the agreement and detection-power tests."""
    return _pin(_scene())


@pytest.fixture(scope="module")
def pinned_sparse():
    return _pin(_scene_sparse())


def _oracle_pixel(p, i, **kw):
    return oracle.run_gen_anchors_oracle(
        int(p["wx"][i]), int(p["wy"][i]), p["depth"], p["ns"], p["cam"],
        ROTATE_TIME, THRESH, DEPTH_MIN, DEPTH_MAX, p["radii"],
        p["sx"][i], p["sy"][i], p["tri"][:, i], **kw)


def _signature(anchors, reliable, hit_count):
    """Discrete decision signature of one pixel's anchor result.

    Slots 1-3 are compared as a SET: the winning RANSAC triangle's own
    members lie on the fitted plane by construction, so their -1-boosted
    sort weights are all -1 + O(ulp) and their order among themselves is
    floating-point noise that two independent encodings cannot share.
    Everything else — which triangle won (the set), and the exact
    distance-sorted order of the remaining inliers — is deterministic and
    pinned exactly."""
    a = np.asarray(anchors)
    return (int(hit_count), bool(reliable),
            frozenset(map(tuple, a[1:4])),
            tuple(map(tuple, a[4:])),
            tuple(sorted(map(tuple, a[1:]))))


def test_oracle_matches_production(pinned):
    """Every weak pixel: hit counts, reliability, the RANSAC triangle set
    and the distance-sorted anchor tail agree between the two encodings."""
    p = pinned
    n_reliable = 0
    for i in range(p["n"]):
        o = _oracle_pixel(p, i)
        got = _signature(p["anchors"][i], p["reliable"][i], p["hit_count"][i])
        want = _signature(o["anchors"], o["reliable"], o["hit_count"])
        assert got == want, \
            f"pixel {i} ({p['wx'][i]},{p['wy'][i]}):\n prod {got}\n orac {want}"
        n_reliable += o["reliable"]
    # the scene must exercise BOTH outcomes or the pin is vacuous
    assert 0 < n_reliable < p["n"], \
        f"degenerate scene: {n_reliable}/{p['n']} reliable"


def test_sparse_scene_hits_the_gate_and_matches(pinned_sparse):
    """The 3-strong-pixel scene drives every pixel under the >3 hit gate
    (no direction pair can share one target's cone) — the gate outcome and
    the per-direction hits must agree with the oracle exactly."""
    p = pinned_sparse
    assert (p["hit_count"] <= 3).all()
    assert not p["reliable"].any()
    for i in range(p["n"]):
        o = _oracle_pixel(p, i)
        assert o["hit_count"] == p["hit_count"][i]
        assert not o["reliable"]
        np.testing.assert_array_equal(o["anchors"], p["anchors"][i])
    # at least one pixel found *some* hit, or the cone/snap path is untested
    assert (p["hit_count"] > 0).any()


def test_scene_exercises_the_rules(pinned):
    """Fixture sanity: anchor lists include full ones AND partially-filled
    ones (-1 slots from non-inlier demotion) so the sort/top-8 rules are
    actually loaded."""
    p = pinned
    assert (p["hit_count"] > 3).any()
    rel = p["anchors"][p["reliable"]]
    fill = (rel[:, 1:, 0] >= 0).sum(axis=1)
    assert (fill == 8).any(), "no full anchor set"
    assert (fill < 8).any(), "no partially-filled anchor set"


@pytest.mark.parametrize("knob, kw", [
    ("cone_slack", {"cone_slack": 0.002}),
    ("inlier_min", {"inlier_min": 5}),
    # sign-flipped boost pushes the RANSAC triangle's members BEHIND the
    # other inliers — catches a mis-signed/mis-applied boost. (Removing the
    # boost outright is undetectable BY CONSTRUCTION: triangle members lie
    # on their own plane, so their unboosted weights are 0+ulp and still
    # sort first; the only orderings the boost then changes are the
    # fp-noise ties the signature comparator deliberately excludes.)
    ("abc_boost", {"abc_boost": -1.0}),
    ("cdist_tiebreak", {"cdist_tiebreak": False}),
    ("min_margin", {"min_margin": 5}),
    ("min_tri_edge", {"min_tri_edge": 0.0}),
])
def test_detection_power(pinned, knob, kw):
    """Perturbing each encoded rule must flip at least one pixel's discrete
    output — i.e. the agreement test would CATCH a production regression in
    that rule (the prop-oracle detection-power discipline)."""
    p = pinned
    for i in range(p["n"]):
        o = _oracle_pixel(p, i, **kw)
        got = _signature(p["anchors"][i], p["reliable"][i], p["hit_count"][i])
        want = _signature(o["anchors"], o["reliable"], o["hit_count"])
        if got != want:
            return
    pytest.fail(f"perturbing {knob} changed nothing — no detection power")


def test_neighbor_update_demotes_unreliable(pinned):
    p = pinned
    state = PMState.create(H, W, 2).replace(weak=jnp.asarray(p["weak"]))
    upd = anchor_ops.neighbor_update(
        state, jnp.asarray(p["wx"]), jnp.asarray(p["wy"]),
        jnp.ones((p["n"],), bool), jnp.asarray(p["reliable"]))
    got = np.asarray(upd.weak)
    want = oracle.neighbor_update_oracle(
        p["weak"], {(int(p["wx"][i]), int(p["wy"][i])): bool(p["reliable"][i])
                    for i in range(p["n"])})
    np.testing.assert_array_equal(got, want)


@pytest.fixture(scope="module")
def fit_pinned(pinned):
    """Production fit planes on the pinned scene's anchors, with injected
    RANSAC draws shared with the oracle."""
    p = pinned
    rng = np.random.default_rng(21)
    tri = rng.integers(0, 1 << 30, (RANSAC_ITERS, p["n"], 3)).astype(np.int32)

    class Data:
        ref_cam = geo.CameraArrays(
            K=jnp.asarray([[p["cam"]["fx"], 0, p["cam"]["cx"]],
                           [0, p["cam"]["fy"], p["cam"]["cy"]],
                           [0, 0, 1.0]]),
            R=jnp.eye(3), t=jnp.zeros(3), c=jnp.zeros(3))

    planes = np.zeros((H, W, 4), np.float32)
    planes[..., 3] = p["depth"]
    planes[..., 2] = -1.0     # (0,0,-1,d): depth_from_plane returns d
    state = PMState.create(H, W, 2).replace(
        planes=jnp.asarray(planes), weak=jnp.asarray(p["weak"]))
    fits = anchor_ops.ransac_fit_planes(
        jax.random.PRNGKey(0), Data, state, jnp.asarray(p["wx"]),
        jnp.asarray(p["wy"]), jnp.ones((p["n"],), bool),
        jnp.asarray(p["anchors"]), triplets=jnp.asarray(tri))
    return dict(planes_map=planes, tri=tri, fits=np.asarray(fits))


def _fit_oracle_pixel(p, fp, i, **kw):
    return oracle.run_fit_plane_oracle(
        int(p["wx"][i]), int(p["wy"][i]), p["anchors"][i],
        fp["planes_map"], p["cam"], fp["tri"][:, i], **kw)


def test_fit_plane_oracle_matches_production(pinned, fit_pinned):
    """RANSACToGetFitPlane second encoding: has-plane flags exact, plane
    coefficients to tight tolerance (winner ties between vertex
    permutations of one triangle converge after the camera flip)."""
    p, fp = pinned, fit_pinned
    n_has = 0
    for i in range(p["n"]):
        plane_o, has_o = _fit_oracle_pixel(p, fp, i)
        has_p = bool(np.any(fp["fits"][i, :3] != 0))
        assert has_o == has_p, f"pixel {i}: has {has_o} vs {has_p}"
        if has_o:
            np.testing.assert_allclose(
                fp["fits"][i], plane_o, rtol=2e-4, atol=2e-4,
                err_msg=f"pixel {i} ({p['wx'][i]},{p['wy'][i]})")
            n_has += 1
    assert n_has > 0, "no pixel produced a fit plane — vacuous"
    # pixels without anchors (unreliable) must yield zeros on both sides
    assert n_has < p["n"], "every pixel fit — the no-fit path is untested"


# NOTE the exclude-abc-from-cost rule (APD.cu:2569-2571) has no testable
# knob: triangle members lie on their own plane, so including their
# distances changes the cost by ulps — a production regression there would
# be behavior-invisible by construction (same class as the abc-boost
# removal in the GenAnchors suite). The distinct-triplet check is likewise
# shadowed by the degenerate-cross rejection (a==b makes the cross zero).
@pytest.mark.parametrize("knob, kw", [
    ("require_triangle", {"require_triangle": False}),
    ("flip_to_camera", {"flip_to_camera": False}),
])
def test_fit_plane_detection_power(pinned, fit_pinned, knob, kw):
    p, fp = pinned, fit_pinned
    for i in range(p["n"]):
        plane_o, has_o = _fit_oracle_pixel(p, fp, i, **kw)
        has_p = bool(np.any(fp["fits"][i, :3] != 0))
        if has_o != has_p:
            return
        if has_o and not np.allclose(fp["fits"][i], plane_o, rtol=2e-4,
                                     atol=2e-4):
            return
    pytest.fail(f"perturbing {knob} changed nothing — no detection power")

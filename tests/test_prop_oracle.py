"""Independent propagation-semantics oracle (VERDICT r3 #5).

ops/propagation.py is the only other encoding of the reference's most
intricate kernel (CheckerboardPropagationStrong/Weak, APD.cu:1098-1615).
testing/prop_oracle.py transcribes the same semantics a second time as
per-pixel NumPy following the CUDA control flow, with NCC/geom evaluation
injected as black boxes and the RNG injected as raw draws from the exact
keys the production sweep splits.  These tests assert the two encodings
agree EXACTLY on every discrete choice (Monte-Carlo view weights, selected
views) and to float tolerance on planes/costs, across photometric,
geom+impetus and REFINE_INIT configurations — then demonstrate detection
power: perturbing a region offset, the 0.8 quality threshold, the 0.9/0.1
priors, the impetus gate or the REFINE_INIT margin breaks the agreement.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apde_mvs_tpu.config import STRONG, WEAK
from apde_mvs_tpu.core import checkerboard as cb
from apde_mvs_tpu.core import geometry as geo
from apde_mvs_tpu.ops import selection
from apde_mvs_tpu.ops.cost import CostData, geom_cost, ncc_strong, \
    precompute_ref_window
from apde_mvs_tpu.ops.deformable import WeakRefData, ncc_weak
from apde_mvs_tpu.ops.init import random_planes
from apde_mvs_tpu.ops.propagation import PropCfg, propagate_strong, \
    propagate_weak, refinement_raws
from apde_mvs_tpu.ops.state import PMState
from apde_mvs_tpu.testing import prop_oracle, synthetic

H, W, V = 24, 32, 5          # S = 4 source views


def _setup(seed=0, geom=False):
    scene = synthetic.make_scene(num_views=V, height=H, width=W)
    cams = geo.CameraArrays.from_cameras(scene.cameras)
    src = np.arange(1, V)
    kwargs = {}
    if geom:
        kwargs["src_depths"] = jnp.asarray(
            np.stack([scene.depths[s] for s in src]).astype(np.float32))
    data = CostData.build(
        cams.view(0), geo.CameraArrays(*[a[src] for a in cams]),
        jnp.asarray(scene.images[0]), jnp.asarray(scene.images[src]),
        **kwargs)
    dmin = float(scene.cameras[0].depth_min * 0.6)
    dmax = float(scene.cameras[0].depth_max * 1.2)

    kp, kc, ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    state = PMState.create(H, W, data.num_src)
    state = state.replace(
        planes=random_planes(kp, data, dmin, dmax),
        costs=jax.random.uniform(kc, (H, W), jnp.float32, 0.0, 1.5),
        selected=jax.random.bernoulli(ks, 0.4, (H, W, data.num_src)))
    rc = data.ref_cam
    cam = dict(fx=float(rc.fx), fy=float(rc.fy), cx=float(rc.cx),
               cy=float(rc.cy))
    return scene, data, state, dmin, dmax, cam


def _strong_oracle_inputs(state, key, color):
    """Replicate propagate_strong's coordinate order and key splits."""
    xs2, ys2 = cb.color_coords(H, W, color)
    xs = np.asarray(xs2).reshape(-1)
    ys = np.asarray(ys2).reshape(-1)
    key, k_sel = jax.random.split(key)
    key, k_ref = jax.random.split(key)
    sel_u = np.asarray(jax.random.uniform(k_sel,
                                          (len(xs), selection.NUM_SAMPLES)))
    raws = refinement_raws(k_ref, (len(xs),))
    raws = {k: np.asarray(v) for k, v in raws._asdict().items()}
    return xs, ys, sel_u, raws


def _run_both_strong(cfg, iteration, geom_factor, seed=0, oracle_kw=None):
    scene, data, state, dmin, dmax, cam = _setup(seed=seed,
                                                 geom=cfg.geom_consistency)
    key = jax.random.PRNGKey(seed + 100)
    color = 0
    out_state = propagate_strong(data, state, cfg, iteration, key, color,
                                 jnp.float32(dmin), jnp.float32(dmax),
                                 jnp.float32(geom_factor))

    xs, ys, sel_u, raws = _strong_oracle_inputs(state, key, color)
    xf = jnp.asarray(xs, jnp.float32)
    yf = jnp.asarray(ys, jnp.float32)
    win = precompute_ref_window(data, xf, yf, cfg.strong_radius,
                                cfg.strong_increment, cfg.use_sa)

    @jax.jit
    def _ncc(planes):
        return ncc_strong(data, xf, yf, planes, win)

    @jax.jit
    def _geom(planes):
        return geom_cost(data, xf, yf, planes)

    oracle = prop_oracle.run_strong_oracle(
        np.asarray(state.costs), np.asarray(state.planes),
        np.asarray(state.selected), xs, ys, iteration, sel_u, raws, cam,
        lambda _x, _y, p: np.asarray(_ncc(jnp.asarray(p, jnp.float32))),
        lambda _x, _y, p: np.asarray(_geom(jnp.asarray(p, jnp.float32))),
        dict(geom_consistency=cfg.geom_consistency,
             use_impetus=cfg.use_impetus, refine_init=cfg.refine_init),
        dmin, dmax, geom_factor, data.num_src, **(oracle_kw or {}))
    got = dict(
        vw=np.asarray(out_state.view_weights)[ys, xs],
        sel=np.asarray(out_state.selected)[ys, xs],
        planes=np.asarray(out_state.planes)[ys, xs],
        costs=np.asarray(out_state.costs)[ys, xs])
    return got, oracle


def _assert_strong_match(got, oracle):
    np.testing.assert_array_equal(got["vw"], oracle["vw"])
    np.testing.assert_array_equal(got["sel"], oracle["sel_out"])
    np.testing.assert_allclose(got["costs"], oracle["costs_out"],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(got["planes"], oracle["planes_out"],
                               rtol=2e-5, atol=2e-5)


def _discrete_mismatch(got, oracle):
    return (not np.array_equal(got["vw"], oracle["vw"])
            or not np.allclose(got["costs"], oracle["costs_out"],
                               rtol=2e-5, atol=2e-5)
            or not np.allclose(got["planes"], oracle["planes_out"],
                               rtol=2e-5, atol=2e-5))


def test_strong_photometric_matches_oracle():
    cfg = PropCfg(use_sa=False)
    got, oracle = _run_both_strong(cfg, iteration=0, geom_factor=0.2)
    _assert_strong_match(got, oracle)
    # the scene must actually exercise the machinery
    assert oracle["adopted"].sum() > 10
    assert (oracle["refine_slot"] >= 0).sum() > 10
    assert (~oracle["flags"].all(-1)).sum() > 0   # border pixels present


def test_strong_geom_impetus_refine_init_matches_oracle():
    cfg = PropCfg(use_sa=False, geom_consistency=True, use_impetus=True,
                  refine_init=True)
    got, oracle = _run_both_strong(cfg, iteration=2, geom_factor=0.2)
    _assert_strong_match(got, oracle)


def test_strong_geom_no_impetus_matches_oracle():
    """Without use_impetus the geom term must NOT enter the recomputed /
    refinement costs (APD.cu:1405-1412) even though geom_consistency is on."""
    cfg = PropCfg(use_sa=False, geom_consistency=True, use_impetus=False)
    got, oracle = _run_both_strong(cfg, iteration=1, geom_factor=0.5)
    _assert_strong_match(got, oracle)


def test_strong_iteration_threshold_schedule():
    """iteration enters only through 0.8*exp(-iter^2/90); iter=5 must still
    agree (threshold 0.609)."""
    cfg = PropCfg(use_sa=False)
    got, oracle = _run_both_strong(cfg, iteration=5, geom_factor=0.2)
    _assert_strong_match(got, oracle)


# ---------------------------------------------------------------------------
# Detection power: each reference constant, when perturbed in the ORACLE,
# must break the agreement with production (proving the test would catch the
# same transcription error in ops/propagation.py).
# ---------------------------------------------------------------------------

def test_oracle_detects_threshold_perturbation():
    cfg = PropCfg(use_sa=False)
    got, oracle = _run_both_strong(cfg, iteration=0, geom_factor=0.2,
                                   oracle_kw=dict(threshold_base=0.75))
    assert not np.array_equal(got["vw"], oracle["vw"])


def test_oracle_detects_prior_perturbation():
    cfg = PropCfg(use_sa=False)
    got, oracle = _run_both_strong(cfg, iteration=0, geom_factor=0.2,
                                   oracle_kw=dict(prior_hi=0.8,
                                                  prior_lo=0.2))
    assert not np.array_equal(got["vw"], oracle["vw"])


def test_oracle_detects_refine_margin_perturbation():
    cfg = PropCfg(use_sa=False, geom_consistency=True, use_impetus=True,
                  refine_init=True)
    got, oracle = _run_both_strong(cfg, iteration=2, geom_factor=0.2,
                                   oracle_kw=dict(refine_margin=0.05))
    assert _discrete_mismatch(got, oracle)


def test_oracle_detects_impetus_gate_removal():
    """Evaluating geom in the recompute WITHOUT the impetus flag set must
    disagree — the gate is geom_consistency AND use_impetus."""
    cfg = PropCfg(use_sa=False, geom_consistency=True, use_impetus=False)
    scene, data, state, dmin, dmax, cam = _setup(geom=True)
    key = jax.random.PRNGKey(100)
    out_state = propagate_strong(data, state, cfg, 1, key, 0,
                                 jnp.float32(dmin), jnp.float32(dmax),
                                 jnp.float32(0.5))
    xs, ys, sel_u, raws = _strong_oracle_inputs(state, key, 0)
    xf = jnp.asarray(xs, jnp.float32)
    yf = jnp.asarray(ys, jnp.float32)
    win = precompute_ref_window(data, xf, yf, cfg.strong_radius,
                                cfg.strong_increment, cfg.use_sa)
    oracle = prop_oracle.run_strong_oracle(
        np.asarray(state.costs), np.asarray(state.planes),
        np.asarray(state.selected), xs, ys, 1, sel_u, raws, cam,
        lambda _x, _y, p: np.asarray(jax.jit(lambda q: ncc_strong(
            data, xf, yf, q, win))(jnp.asarray(p, jnp.float32))),
        lambda _x, _y, p: np.asarray(jax.jit(lambda q: geom_cost(
            data, xf, yf, q))(jnp.asarray(p, jnp.float32))),
        # WRONG on purpose: pretend impetus is on while production has it off
        dict(geom_consistency=True, use_impetus=True, refine_init=False),
        dmin, dmax, 0.5, data.num_src)
    got = dict(vw=np.asarray(out_state.view_weights)[ys, xs],
               costs=np.asarray(out_state.costs)[ys, xs],
               planes=np.asarray(out_state.planes)[ys, xs])
    assert not np.allclose(got["costs"], oracle["costs_out"],
                           rtol=2e-5, atol=2e-5)


def test_oracle_detects_region_offset_perturbation(monkeypatch):
    cfg = PropCfg(use_sa=False)
    orig = prop_oracle.strong_candidates

    def shifted(costs, x, y):
        # up_far's base offset transcribed as -2 instead of -3: the classic
        # one-off transcription error in a _REGIONS table.  (A pure SWAP of
        # two regions is NOT detectable — view selection sums over regions
        # symmetrically and adoption picks the same winning plane.)
        pos, flags = orig(costs, x, y)
        if flags[1]:
            pos = pos.copy()
            pos[1] = (x, y - 2)
        return pos, flags

    monkeypatch.setattr(prop_oracle, "strong_candidates", shifted)
    got, oracle = _run_both_strong(cfg, iteration=0, geom_factor=0.2)
    assert _discrete_mismatch(got, oracle)


# ---------------------------------------------------------------------------
# Weak sweep
# ---------------------------------------------------------------------------

def _weak_setup(seed=3, geom=False):
    scene, data, state, dmin, dmax, cam = _setup(seed=seed, geom=geom)
    rng = np.random.RandomState(seed)
    weak_np = np.asarray(state.weak).copy()
    # a centered weak block; everything else stays strong
    weak_np[8:16, 10:26] = WEAK
    state = state.replace(weak=jnp.asarray(weak_np))
    wy, wx = np.nonzero(weak_np == WEAK)
    Nw = len(wx)

    # strong pixels carry near-ground-truth planes (good anchor candidates);
    # the weak block keeps its bad random planes, so anchor adoption, the
    # fit-plane test and random refinement all fire on this fixture
    ysg, xsg = np.mgrid[0:H, 0:W]
    gt = np.array(geo.make_plane(
        data.ref_cam, jnp.asarray(xsg, jnp.float32),
        jnp.asarray(ysg, jnp.float32),
        jnp.asarray(scene.depths[0]), jnp.asarray(scene.normals[0])))
    planes_np = np.array(state.planes)
    strong_mask = weak_np != WEAK
    planes_np[strong_mask] = gt[strong_mask]
    state = state.replace(planes=jnp.asarray(planes_np))

    # anchors: slot 0 = self; slots 1..8 random, some -1, some aimed at WEAK
    anchors = np.full((Nw, 9, 2), -1, np.int32)
    anchors[:, 0, 0] = wx
    anchors[:, 0, 1] = wy
    # NB: candidate ADOPTION needs all 8 anchors valid — any invalid slot
    # contributes a zero final_cost that wins the last-min scan and fails
    # the flag check (the reference's aggregate-init + FindMinCostIndex
    # interplay) — so most anchors here must be valid strong pixels
    for b in range(Nw):
        for j in range(1, 9):
            mode = rng.rand()
            if mode < 0.04:
                continue                          # missing anchor
            ax = rng.randint(0, W)
            ay = rng.randint(0, H)
            if mode < 0.08:
                # aim into the weak block: exists but flag must be False
                ax = rng.randint(10, 26)
                ay = rng.randint(8, 16)
            anchors[b, j] = (ax, ay)

    # fit planes: ground truth for ~30% (fit-plane wins), random for ~30%
    # (refinement can win), all-zero "no RANSAC fit" for the rest (the
    # early-return branch)
    kf = jax.random.PRNGKey(seed + 7)
    fit = np.array(geo.random_plane_hypothesis(
        kf, data.ref_cam, jnp.asarray(wx, jnp.float32),
        jnp.asarray(wy, jnp.float32), dmin, dmax))
    u = rng.rand(Nw)
    fit[u < 0.3] = gt[wy, wx][u < 0.3]
    fit[u >= 0.6] = 0.0
    return (scene, data, state, dmin, dmax, cam, wx, wy,
            jnp.asarray(anchors), jnp.asarray(fit))


def _run_both_weak(cfg, iteration, geom_factor, seed=3):
    (scene, data, state, dmin, dmax, cam, wx, wy, anchors,
     fit) = _weak_setup(seed=seed, geom=cfg.geom_consistency)
    key = jax.random.PRNGKey(seed + 50)
    Nw = len(wx)
    out_state = propagate_weak(
        data, state, cfg, iteration, key, jnp.asarray(wx, jnp.int32),
        jnp.asarray(wy, jnp.int32), jnp.ones(Nw, bool), anchors, fit,
        jnp.float32(dmin), jnp.float32(dmax), jnp.float32(geom_factor))

    key2, k_sel = jax.random.split(key)
    key2, k_ref = jax.random.split(key2)
    sel_u = np.asarray(jax.random.uniform(k_sel,
                                          (Nw, selection.NUM_SAMPLES)))
    raws = refinement_raws(k_ref, (Nw,))
    raws = {k: np.asarray(v) for k, v in raws._asdict().items()}

    xf = jnp.asarray(wx, jnp.float32)
    yf = jnp.asarray(wy, jnp.float32)
    wref = WeakRefData.build(data, xf, yf, anchors, state.selected, cfg)

    @jax.jit
    def _ncc(planes):
        return ncc_weak(data, wref, planes, cfg)

    @jax.jit
    def _geom(planes):
        return geom_cost(data, xf, yf, planes)

    oracle = prop_oracle.run_weak_oracle(
        np.asarray(state.planes), np.asarray(state.selected),
        np.asarray(state.weak), int(STRONG), np.asarray(anchors)[:, 1:],
        np.asarray(fit), np.asarray(wx), np.asarray(wy), iteration, sel_u,
        raws, cam,
        lambda p: np.asarray(_ncc(jnp.asarray(p, jnp.float32))),
        lambda _x, _y, p: np.asarray(_geom(jnp.asarray(p, jnp.float32))),
        dict(geom_consistency=cfg.geom_consistency,
             use_impetus=cfg.use_impetus, refine_init=cfg.refine_init),
        dmin, dmax, geom_factor, data.num_src)
    got = dict(
        vw=np.asarray(out_state.view_weights)[wy, wx],
        sel=np.asarray(out_state.selected)[wy, wx],
        planes=np.asarray(out_state.planes)[wy, wx],
        costs=np.asarray(out_state.costs)[wy, wx])
    return got, oracle


def test_weak_photometric_matches_oracle():
    cfg = PropCfg(use_sa=False)
    got, oracle = _run_both_weak(cfg, iteration=1, geom_factor=0.2)
    np.testing.assert_array_equal(got["vw"], oracle["vw"])
    np.testing.assert_array_equal(got["sel"], oracle["sel_out"])
    np.testing.assert_allclose(got["costs"], oracle["costs_out"],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(got["planes"], oracle["planes_out"],
                               rtol=2e-5, atol=2e-5)
    # the fixture must exercise every branch: adoption, fit-plane wins,
    # random refinement, AND the no-fit early return
    assert oracle["adopted"].sum() > 3
    assert oracle["took_fit"].sum() > 3
    assert (oracle["refine_slot"] >= 0).sum() > 3


def test_weak_geom_matches_oracle():
    """Weak geom semantics: candidates pay geom (flat 3.0 penalty when the
    anchor is invalid), the recompute/fit/refine pay geom with NO impetus
    gate (APD.cu:1556-1576, 1589-1599)."""
    cfg = PropCfg(use_sa=False, geom_consistency=True, use_impetus=False,
                  refine_init=True)
    got, oracle = _run_both_weak(cfg, iteration=2, geom_factor=0.2)
    np.testing.assert_array_equal(got["vw"], oracle["vw"])
    np.testing.assert_array_equal(got["sel"], oracle["sel_out"])
    np.testing.assert_allclose(got["costs"], oracle["costs_out"],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(got["planes"], oracle["planes_out"],
                               rtol=2e-5, atol=2e-5)


def test_weak_no_fit_pixels_skip_refinement():
    """The reference's PlaneHypothesisRefinementWeak returns early when the
    fit plane is zero (APD.cu:1029-1032): no fit test, no random refine."""
    cfg = PropCfg(use_sa=False)
    got, oracle = _run_both_weak(cfg, iteration=1, geom_factor=0.2)
    no_fit = ~(oracle["took_fit"] | (oracle["refine_slot"] >= 0))
    # pixels without a fit plane never entered refinement in the oracle;
    # production must agree on their final planes (checked above) — and the
    # fixture must include such pixels
    assert no_fit.sum() > 3


# ---------------------------------------------------------------------------
# DepthToWeak oracle (deterministic — no RNG injection needed)
# ---------------------------------------------------------------------------

def _classify_setup(seed=11, geom=False):
    scene, data, state, dmin, dmax, cam = _setup(seed=seed, geom=geom)
    rng = np.random.RandomState(seed)
    # post-GetDepthandNormal representation: (world normal, depth), with
    # mildly noisy GT so curves have real minima; a few zero-depth pixels
    # exercise the UNKNOWN guard
    depth = scene.depths[0] * (1 + rng.randn(H, W).astype(np.float32) * 0.01)
    # ~30% of pixels get badly-off depths: their cost minimum sits far from
    # the sweep center (or above 0.5), exercising the WEAK rules
    off = rng.rand(H, W) < 0.3
    depth = np.where(off, depth * (1 + rng.choice([-0.08, 0.1], (H, W))
                                   .astype(np.float32)), depth)
    depth[rng.rand(H, W) < 0.02] = 0.0
    n_world = scene.normals[0].astype(np.float32)
    planes_dn = np.concatenate([n_world, depth[..., None]], -1)
    sel = rng.rand(H, W, data.num_src) < 0.6
    vw = (rng.randint(0, 6, (H, W, data.num_src))).astype(np.float32)
    state = state.replace(
        planes=jnp.asarray(planes_dn),
        selected=jnp.asarray(sel),
        view_weights=jnp.asarray(vw))
    return scene, data, state, dmin, dmax, cam, planes_dn, sel, vw


@pytest.mark.parametrize("geom", [False, True])
def test_depth_to_weak_matches_oracle(geom):
    from apde_mvs_tpu.ops import filters

    (scene, data, state, dmin, dmax, cam, planes_dn, sel,
     vw) = _classify_setup(geom=geom)
    ys, xs = np.mgrid[0:H, 0:W]
    xs = xs.reshape(-1).astype(np.int32)
    ys = ys.reshape(-1).astype(np.int32)
    gf = 0.2
    new_weak, curve = jax.jit(
        lambda d, s: filters.depth_to_weak(
            d, s, jnp.asarray(xs), jnp.asarray(ys), 2, False, geom,
            jnp.float32(gf), jnp.float32(dmin), jnp.float32(dmax),
            return_curve=True))(data, state)

    xf = jnp.asarray(xs, jnp.float32)
    yf = jnp.asarray(ys, jnp.float32)
    win = precompute_ref_window(data, xf, yf, 5, 2, False)

    @jax.jit
    def _ncc(planes):
        return ncc_strong(data, xf, yf, planes, win)

    @jax.jit
    def _geom(planes):
        return geom_cost(data, xf, yf, planes)

    rc = data.ref_cam
    oracle = prop_oracle.run_depth_to_weak_oracle(
        planes_dn, sel, vw, np.asarray(state.valid), xs, ys, cam,
        np.asarray(rc.R), np.asarray(rc.c), np.asarray(data.src_cams.c),
        lambda _x, _y, p: np.asarray(_ncc(jnp.asarray(p, jnp.float32))),
        (lambda _x, _y, p: np.asarray(_geom(jnp.asarray(p, jnp.float32))))
        if geom else None,
        2, gf, dmin, dmax, W, H, data.num_src)

    got_weak = np.asarray(new_weak)
    # curves compare only where the setup is usable (production leaves
    # garbage curves on UNKNOWN pixels; the classification masks them)
    ok = oracle["ok"]
    np.testing.assert_allclose(np.asarray(curve)[ok], oracle["curve"][ok],
                               rtol=3e-5, atol=3e-5)
    np.testing.assert_array_equal(got_weak, oracle["weak"])
    # fixture must exercise all three classes and the peak rules
    from apde_mvs_tpu.config import STRONG, UNKNOWN, WEAK
    assert (got_weak == STRONG).sum() > 20
    assert (got_weak == WEAK).sum() > 20
    assert (got_weak == UNKNOWN).sum() > 20
    assert (oracle["peak_count"][ok] > 1).sum() > 10


def test_depth_to_weak_oracle_detects_threshold_perturbations():
    """Perturbing the 0.5 / 0.15 / 0.2 classification constants in the
    oracle must break agreement (proving the test catches the same
    transcription error in ops/filters.py)."""
    from apde_mvs_tpu.ops import filters

    (scene, data, state, dmin, dmax, cam, planes_dn, sel,
     vw) = _classify_setup()
    ys, xs = np.mgrid[0:H, 0:W]
    xs = xs.reshape(-1).astype(np.int32)
    ys = ys.reshape(-1).astype(np.int32)
    new_weak, _ = jax.jit(
        lambda d, s: filters.depth_to_weak(
            d, s, jnp.asarray(xs), jnp.asarray(ys), 2, False, False,
            jnp.float32(0.2), jnp.float32(dmin), jnp.float32(dmax)))(
        data, state)
    # weak_peak_radius 2 -> 5: the |min_peak - 30| gate moves
    xf = jnp.asarray(xs, jnp.float32)
    yf = jnp.asarray(ys, jnp.float32)
    win = precompute_ref_window(data, xf, yf, 5, 2, False)

    @jax.jit
    def _ncc(planes):
        return ncc_strong(data, xf, yf, planes, win)

    rc = data.ref_cam
    oracle = prop_oracle.run_depth_to_weak_oracle(
        planes_dn, sel, vw, np.asarray(state.valid), xs, ys, cam,
        np.asarray(rc.R), np.asarray(rc.c), np.asarray(data.src_cams.c),
        lambda _x, _y, p: np.asarray(_ncc(jnp.asarray(p, jnp.float32))),
        None, 5, 0.2, dmin, dmax, W, H, data.num_src)
    assert not np.array_equal(np.asarray(new_weak), oracle["weak"])


@pytest.mark.parametrize("geom", [False, True])
def test_local_refine_matches_oracle(geom):
    from apde_mvs_tpu.ops import filters

    (scene, data, state, dmin, dmax, cam, planes_dn, sel,
     vw) = _classify_setup(seed=13, geom=geom)
    ys, xs = np.mgrid[0:H, 0:W]
    xs = xs.reshape(-1).astype(np.int32)
    ys = ys.reshape(-1).astype(np.int32)
    gf = 0.2
    new_depth = jax.jit(
        lambda d, s: filters.local_refine(
            d, s, jnp.asarray(xs), jnp.asarray(ys), False, geom,
            jnp.float32(gf), jnp.float32(dmin), jnp.float32(dmax)))(
        data, state)

    xf = jnp.asarray(xs, jnp.float32)
    yf = jnp.asarray(ys, jnp.float32)
    win = precompute_ref_window(data, xf, yf, 5, 2, False)

    @jax.jit
    def _ncc(planes):
        return ncc_strong(data, xf, yf, planes, win)

    @jax.jit
    def _geom(planes):
        return geom_cost(data, xf, yf, planes)

    rc = data.ref_cam
    oracle = prop_oracle.run_local_refine_oracle(
        planes_dn, sel, vw, np.asarray(state.valid), xs, ys, cam,
        np.asarray(rc.R), np.asarray(rc.c), np.asarray(data.src_cams.c),
        lambda _x, _y, p: np.asarray(_ncc(jnp.asarray(p, jnp.float32))),
        (lambda _x, _y, p: np.asarray(_geom(jnp.asarray(p, jnp.float32))))
        if geom else None,
        gf, dmin, dmax, data.num_src)
    np.testing.assert_allclose(np.asarray(new_depth), oracle["depth"],
                               rtol=3e-5, atol=3e-5)
    # the >0.1 improvement gate must actually fire on this fixture
    assert oracle["refined"].sum() > 20
    assert (~oracle["refined"] & oracle["ok"]).sum() > 20


def test_weak_oracle_detects_geom_penalty_perturbation(monkeypatch):
    """The flat 3.0 geom penalty for invalid anchors (APD.cu:1565) is a
    constant the oracle must guard.  Its observable role: with geom ON it
    lifts invalid anchors' final_costs off zero, which is what lets valid
    anchors win the last-min scan at all — shrinking it far enough parks
    the minimum back on invalid anchors and blocks adoptions."""
    monkeypatch.setattr(prop_oracle, "GEOM_COST_MAX", np.float32(0.1))
    cfg = PropCfg(use_sa=False, geom_consistency=True, use_impetus=False,
                  refine_init=False)
    got, oracle = _run_both_weak(cfg, iteration=2, geom_factor=0.5)
    mismatch = (not np.array_equal(got["vw"], oracle["vw"])
                or not np.allclose(got["costs"], oracle["costs_out"],
                                   rtol=2e-5, atol=2e-5)
                or not np.allclose(got["planes"], oracle["planes_out"],
                                   rtol=2e-5, atol=2e-5))
    assert mismatch

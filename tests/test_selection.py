import jax
import jax.numpy as jnp
import numpy as np
import pytest

from apde_mvs_tpu.ops import selection


def test_priors_vote_accumulation():
    sel = jnp.asarray([[[True, False], [True, True], [False, False],
                        [True, False]]])
    valid = jnp.asarray([[True, True, False, True]])
    pri = np.asarray(selection.view_selection_priors(sel, valid))
    # view 0: 0.9 + 0.9 + 0.9 = 2.7 ; view 1: 0.1 + 0.9 + 0.1 = 1.1
    np.testing.assert_allclose(pri[0], [2.7, 1.1], atol=1e-6)


def test_sampling_probabilities_branches():
    # view 0: many good candidates -> tmpw/count branch
    # view 1: few good but few bad -> fallback exp branch
    # view 2: many bad -> zero
    costs = np.full((1, 8, 3), 2.0, np.float32)
    costs[0, :, 0] = 0.1          # 8 good
    costs[0, :, 1] = 0.9          # below 1.2: not "false", above threshold
    costs[0, :, 2] = 1.9          # all false
    priors = jnp.ones((1, 3))
    probs = np.asarray(selection.sampling_probabilities(
        jnp.asarray(costs), priors, 0))
    thr = 0.8
    assert probs[0, 0] == pytest.approx(np.exp(0.01 / -0.18), rel=1e-5)
    assert probs[0, 1] == pytest.approx(np.exp(thr * thr / -0.32), rel=1e-5)
    assert probs[0, 2] == 0.0


def test_monte_carlo_weights_sum_and_guard():
    probs = jnp.asarray([[0.9, 0.1, 0.0], [0.0, 0.0, 0.0]])
    vw, sel, norm = selection.monte_carlo_view_weights(
        jax.random.PRNGKey(0), probs)
    vw = np.asarray(vw)
    assert vw[0].sum() == selection.NUM_SAMPLES
    assert vw[0, 0] > vw[0, 1]
    assert vw[0, 2] == 0
    # zero-mass pixel: no votes
    assert vw[1].sum() == 0
    assert not np.asarray(sel)[1].any()
    assert np.asarray(norm)[1] == 0


def test_monte_carlo_distribution():
    probs = jnp.tile(jnp.asarray([[0.5, 0.25, 0.25]]), (2000, 1))
    vw, _, _ = selection.monte_carlo_view_weights(jax.random.PRNGKey(1), probs)
    mean = np.asarray(vw).mean(0) / selection.NUM_SAMPLES
    np.testing.assert_allclose(mean, [0.5, 0.25, 0.25], atol=0.02)

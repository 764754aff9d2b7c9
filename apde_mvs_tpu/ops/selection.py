"""Multi-hypothesis joint view selection (reference: APD.cu:1318-1386).

Given the 8 candidate cost vectors of a pixel, estimate per-view sampling
probabilities (quality from candidate costs x prior votes from neighbors'
selected views), then draw 15 Monte-Carlo samples from the CDF to produce
integer view weights. The clock-seeded curand stream is replaced by key-split
JAX PRNG (statistically equivalent, deterministic).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

NUM_SAMPLES = 15
PRIOR_SELECTED = 0.9
PRIOR_UNSELECTED = 0.1


def view_selection_priors(neighbor_selected: jnp.ndarray,
                          neighbor_valid: jnp.ndarray) -> jnp.ndarray:
    """Accumulate 0.9/0.1 votes over neighbors (B, K, S) -> (B, S)."""
    votes = jnp.where(neighbor_selected, PRIOR_SELECTED, PRIOR_UNSELECTED)
    return (votes * neighbor_valid[..., None].astype(votes.dtype)).sum(axis=-2)


def sampling_probabilities(cost_array: jnp.ndarray, priors: jnp.ndarray,
                           iteration) -> jnp.ndarray:
    """Per-view sampling probability from the (B, 8, S) candidate costs
    (reference: APD.cu:1339-1361)."""
    it = jnp.asarray(iteration, jnp.float32)
    cost_threshold = 0.8 * jnp.exp(it * it / -90.0)
    good = cost_array < cost_threshold
    count = good.sum(axis=-2)                               # (B, S)
    tmpw = jnp.where(good, jnp.exp(cost_array * cost_array / -0.18), 0.0
                     ).sum(axis=-2)
    count_false = (cost_array > 1.2).sum(axis=-2)
    many_good = (count > 2) & (count_false < 3)
    few_bad = count_false < 3
    fallback = jnp.exp(cost_threshold * cost_threshold / -0.32)
    probs = jnp.where(many_good, tmpw / jnp.maximum(count, 1),
                      jnp.where(few_bad, fallback, 0.0))
    return probs * priors


def monte_carlo_view_weights(key, probs: jnp.ndarray
                             ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Draw NUM_SAMPLES samples from the per-pixel CDF over views.

    Returns (view_weights (B, S) f32 counts, selected (B, S) bool,
    weight_norm (B,)). Pixels whose probability mass is zero get empty
    selection (the reference leaves this case undefined through a 0/0; we
    define it as no votes and the callers guard on weight_norm == 0).
    """
    B, S = probs.shape
    total = probs.sum(-1, keepdims=True)
    cdf = jnp.cumsum(probs, axis=-1) / jnp.maximum(total, 1e-30)
    r = jax.random.uniform(key, (B, NUM_SAMPLES))
    # first view whose cdf exceeds r  <=>  count of cdf entries <= r
    idx = (cdf[:, None, :] <= r[..., None]).sum(-1)          # (B, NUM_SAMPLES)
    onehot = (idx[..., None] == jnp.arange(S)[None, None, :])
    vw = onehot.sum(axis=1).astype(jnp.float32)
    vw = jnp.where(total > 0, vw, 0.0)
    selected = vw > 0
    return vw, selected, vw.sum(-1)

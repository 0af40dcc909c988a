"""RANSAC as a static hypothesis batch.

The reference relies on OpenCV's adaptive RANSAC loops
(``cv2.findEssentialMat`` mono_slam.py:111, ``cv2.solvePnPRansac``
stereo_slam.py:294-295). Data-dependent iteration counts don't map to XLA,
so the TPU-native formulation is: draw a *fixed* batch of minimal samples,
vmap the minimal solver over all of them at once, score all hypotheses
against all points in one broadcast, and argmax inlier count
(SURVEY.md §7.1, §7.3 item 2). With 512-1024 hypotheses the success
probability matches or exceeds OpenCV's defaults (prob=0.999 at 50% outliers
for minimal sample 6 needs ~440 draws), and the whole estimator becomes one
dense kernel instead of a sequential loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ransac_sample_indices(
    key: jax.Array,
    valid: jax.Array,
    n_hypotheses: int,
    sample_size: int,
    weights: jax.Array | None = None,
) -> jax.Array:
    """Draw (n_hypotheses, sample_size) distinct indices of valid points.

    Gumbel top-k over masked uniform noise: distinct within each sample,
    never selects invalid slots (as long as >= sample_size points are valid;
    with fewer, duplicates appear but the caller's degeneracy handling
    applies).

    ``weights`` (N,) biases the draw: adding log-weights to the Gumbel
    noise samples each minimal set *without replacement* proportionally to
    the weights (Gumbel top-k = weighted reservoir sampling). With a
    correspondence-quality prior this raises the clean-hypothesis rate from
    p_uniform^k to p_weighted^k — decisive at the ~0.3 inlier rates of
    wide-baseline matching where p^6 would starve a 1024-hypothesis batch.
    """
    n = valid.shape[0]
    g = jax.random.gumbel(key, (n_hypotheses, n))
    if weights is not None:
        g = g + jnp.log(jnp.maximum(weights, 1e-9))[None, :]
    g = jnp.where(valid[None, :], g, -jnp.inf)
    _, idx = jax.lax.top_k(g, sample_size)
    return idx


def best_hypothesis(scores: jax.Array) -> jax.Array:
    """Index of the best-scoring hypothesis (ties -> first)."""
    return jnp.argmax(scores)

"""Equivalence: fused exp-domain Sinkhorn decode (pallas_sinkhorn.py) vs
the log-domain XLA reference (superglue.log_sinkhorn +
match_from_couplings). Interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from forest_slam_tpu.frontend.pallas_sinkhorn import match_decode, sinkhorn_decode
from forest_slam_tpu.frontend.superglue import log_sinkhorn, match_from_couplings

ITERS = 20
THRESH = 0.2


def _problem(key, B=2, K0=256, K1=256, n_valid0=200, n_valid1=180):
    k1, k2, k3 = jax.random.split(key, 3)
    # descriptor-similarity-like scores: mostly noise + a planted diagonal
    scores = jax.random.normal(k1, (B, K0, K1)) * 1.5
    k = min(K0, K1, n_valid0, n_valid1)
    planted = jnp.eye(K0, K1) * 6.0
    scores = scores + planted
    valid0 = jnp.arange(K0)[None, :] < jnp.array([n_valid0, K0])[:B, None]
    valid1 = jnp.arange(K1)[None, :] < jnp.array([n_valid1, K1])[:B, None]
    alpha = jnp.float32(1.3)
    return scores, valid0, valid1, alpha


def _reference(scores, valid0, valid1, alpha):
    log_p = log_sinkhorn(scores, valid0, valid1, alpha, ITERS)
    return match_from_couplings(log_p, valid0, valid1, THRESH)


def test_decode_matches_log_domain_reference():
    scores, valid0, valid1, alpha = _problem(jax.random.PRNGKey(0))
    ref = _reference(scores, valid0, valid1, alpha)
    got = match_decode(
        scores, valid0, valid1, alpha, ITERS, THRESH, interpret=True
    )
    np.testing.assert_array_equal(np.array(got.matches0), np.array(ref.matches0))
    np.testing.assert_array_equal(np.array(got.matches1), np.array(ref.matches1))
    np.testing.assert_allclose(
        np.array(got.matching_scores0),
        np.array(ref.matching_scores0),
        rtol=2e-4, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.array(got.matching_scores1),
        np.array(ref.matching_scores1),
        rtol=2e-4, atol=2e-5,
    )


def test_decode_scores_are_couplings():
    """sc0 equals exp(max_j log_p) row-wise (the probability the XLA path
    thresholds at 0.2) — not just a monotone surrogate."""
    scores, valid0, valid1, alpha = _problem(jax.random.PRNGKey(1), B=1)
    log_p = log_sinkhorn(scores, valid0, valid1, alpha, ITERS)
    p = jnp.exp(log_p[:, :-1, :-1])
    best1, sc0, best0, sc1 = sinkhorn_decode(
        scores, valid0, valid1, alpha, ITERS, True
    )
    np.testing.assert_allclose(
        np.array(sc0[valid0]),
        np.array(jnp.max(p, axis=2)[valid0]),
        rtol=2e-4, atol=2e-5,
    )
    np.testing.assert_array_equal(
        np.array(best1[valid0]), np.array(jnp.argmax(p, axis=2)[valid0])
    )


def test_all_invalid_side_is_stable():
    """A frame with zero valid keypoints on one side must not NaN."""
    scores, valid0, valid1, alpha = _problem(jax.random.PRNGKey(2), B=2)
    valid1 = jnp.zeros_like(valid1)
    got = match_decode(
        scores, valid0, valid1, alpha, ITERS, THRESH, interpret=True
    )
    assert np.all(np.array(got.matches0) == -1)
    assert np.all(np.isfinite(np.array(got.matching_scores0)))


def test_superglue_module_pallas_impl_matches_xla():
    """Full SuperGlue forward with sinkhorn_impl='pallas_interpret' equals
    the xla impl (same params, same inputs)."""
    from forest_slam_tpu.frontend.superglue import SuperGlue, SuperGlueConfig

    K = 128
    cfg = dict(descriptor_dim=64, keypoint_encoder_dims=(16, 32),
               gnn_layers=2, num_heads=2, sinkhorn_iterations=20)
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 8)
    B, H, W = 2, 64, 96
    xy0 = jax.random.uniform(ks[0], (B, K, 2)) * jnp.array([W, H])
    xy1 = jax.random.uniform(ks[1], (B, K, 2)) * jnp.array([W, H])
    sc0 = jax.random.uniform(ks[2], (B, K))
    sc1 = jax.random.uniform(ks[3], (B, K))
    # planted correspondences (d1 = d0 + noise) so decoded matches are
    # confident — scores exactly at the 0.2 threshold would make the
    # comparison brittle to f32-vs-exp-domain rounding
    d0 = jax.random.normal(ks[4], (B, K, 64))
    d1 = d0 + 0.05 * jax.random.normal(ks[5], (B, K, 64))
    v0 = jnp.arange(K)[None, :] < jnp.array([100, K])[:, None]
    v1 = jnp.arange(K)[None, :] < jnp.array([90, K])[:, None]

    mods = {
        name: SuperGlue(SuperGlueConfig(sinkhorn_impl=name, **cfg))
        for name in ("xla", "pallas_interpret")
    }
    params = mods["xla"].init(
        ks[6], xy0, sc0, d0, v0, xy1, sc1, d1, v1, (H, W)
    )
    outs = {
        name: m.apply(params, xy0, sc0, d0, v0, xy1, sc1, d1, v1, (H, W))
        for name, m in mods.items()
    }
    a, b = outs["xla"], outs["pallas_interpret"]
    np.testing.assert_array_equal(np.array(a.matches0), np.array(b.matches0))
    np.testing.assert_array_equal(np.array(a.matches1), np.array(b.matches1))
    np.testing.assert_allclose(
        np.array(a.matching_scores0), np.array(b.matching_scores0),
        rtol=3e-4, atol=3e-5,
    )

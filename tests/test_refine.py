"""Post-match SAD refinement (frontend/refine.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from forest_slam_tpu.frontend.refine import RefineConfig, refine_matches


def test_recovers_known_shift():
    """Matches perturbed by up to 9 px snap back to the true (sub-pixel)
    correspondence on a translated image."""
    key = jax.random.PRNGKey(0)
    H, W = 120, 160
    img0 = jax.random.uniform(key, (H, W)) * 255
    img1 = jnp.roll(jnp.roll(img0, 5, axis=1), -3, axis=0)

    K = 64
    xy0 = jnp.stack(
        [
            jax.random.uniform(jax.random.PRNGKey(1), (K,)) * 100 + 30,
            jax.random.uniform(jax.random.PRNGKey(2), (K,)) * 60 + 30,
        ],
        axis=1,
    ).round()
    true1 = xy0 + jnp.array([5.0, -3.0])
    noise = jax.random.uniform(jax.random.PRNGKey(3), (K, 2), minval=-9, maxval=9)
    xy1 = true1 + noise
    valid = jnp.ones((K,), bool)

    ref, ok = refine_matches(img0, img1, xy0, xy1, valid, RefineConfig(radius=12))
    ok = np.asarray(ok)
    assert ok.mean() > 0.9
    err = np.linalg.norm(np.asarray(ref - true1), axis=1)
    assert np.median(err[ok]) < 0.3


def test_invalid_and_border_points_pass_through():
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (80, 100)) * 255
    xy0 = jnp.array([[2.0, 2.0], [50.0, 40.0]])  # first: window off-image
    xy1 = jnp.array([[2.0, 2.0], [50.0, 40.0]])
    valid = jnp.array([True, False])
    ref, ok = refine_matches(img, img, xy0, xy1, valid, RefineConfig(radius=8))
    ok = np.asarray(ok)
    assert not ok[0] and not ok[1]
    np.testing.assert_allclose(np.asarray(ref), np.asarray(xy1))

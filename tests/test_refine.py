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


def test_pallas_cost_volume_matches_xla():
    """The fused TPU kernel's cost volume equals the XLA tap-accumulation
    path (interpret mode on CPU; summation order differs -> allclose)."""
    from forest_slam_tpu.frontend.pallas_refine import refine_cost_volume
    from forest_slam_tpu.frontend.refine import _cost_volume_xla

    key = jax.random.PRNGKey(0)
    H, W = 96, 144
    img0 = jax.random.uniform(key, (H, W)) * 255
    img1 = jnp.roll(img0, 3, axis=1) + 1.0
    K = 16
    rng = np.random.default_rng(0)
    xi0 = jnp.asarray(rng.integers(0, W, K), jnp.int32)
    yi0 = jnp.asarray(rng.integers(0, H, K), jnp.int32)
    xi1 = jnp.asarray(rng.integers(0, W, K), jnp.int32)
    yi1 = jnp.asarray(rng.integers(0, H, K), jnp.int32)
    for t, R in [(8, 12), (8, 4), (6, 7)]:
        ref = _cost_volume_xla(img0, img1, xi0, yi0, xi1, yi1, t, R)
        got = refine_cost_volume(
            img0, img1, xi0, yi0, xi1, yi1, t, R, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-3
        )


def test_pallas_cost_volume_vmap_batches():
    from forest_slam_tpu.frontend.pallas_refine import refine_cost_volume
    from forest_slam_tpu.frontend.refine import _cost_volume_xla

    key = jax.random.PRNGKey(1)
    B, H, W, K = 3, 64, 128, 8
    img0 = jax.random.uniform(key, (B, H, W)) * 255
    img1 = jnp.flip(img0, axis=2)
    rng = np.random.default_rng(1)
    xi0 = jnp.asarray(rng.integers(0, W, (B, K)), jnp.int32)
    yi0 = jnp.asarray(rng.integers(0, H, (B, K)), jnp.int32)
    xi1 = jnp.asarray(rng.integers(0, W, (B, K)), jnp.int32)
    yi1 = jnp.asarray(rng.integers(0, H, (B, K)), jnp.int32)
    got = jax.vmap(
        lambda a, b, c, d, e, f: refine_cost_volume(
            a, b, c, d, e, f, 8, 6, interpret=True
        )
    )(img0, img1, xi0, yi0, xi1, yi1)
    ref = jax.vmap(
        lambda a, b, c, d, e, f: _cost_volume_xla(a, b, c, d, e, f, 8, 6)
    )(img0, img1, xi0, yi0, xi1, yi1)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-3
    )


def test_pallas_cost_volume_mixed_sizes():
    """Frame 1 may be a downscaled copy (scale-searching refinement) —
    the kernel must pad each frame by its own shape."""
    from forest_slam_tpu.frontend.pallas_refine import refine_cost_volume
    from forest_slam_tpu.frontend.refine import _cost_volume_xla

    key = jax.random.PRNGKey(3)
    img0 = jax.random.uniform(key, (96, 144)) * 255
    img1 = jax.image.resize(img0, (80, 120), "linear")
    K = 8
    rng = np.random.default_rng(3)
    xi0 = jnp.asarray(rng.integers(10, 130, K), jnp.int32)
    yi0 = jnp.asarray(rng.integers(10, 80, K), jnp.int32)
    xi1 = jnp.asarray(rng.integers(10, 100, K), jnp.int32)
    yi1 = jnp.asarray(rng.integers(10, 70, K), jnp.int32)
    ref = _cost_volume_xla(img0, img1, xi0, yi0, xi1, yi1, 8, 6)
    got = refine_cost_volume(
        img0, img1, xi0, yi0, xi1, yi1, 8, 6, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-3
    )


def test_refine_matches_scale_search_recovers_zoom():
    """A zoomed frame 1 defeats fixed-scale SAD but the scale-searching
    refiner locks on (RefineConfig.scales)."""
    key = jax.random.PRNGKey(4)
    H, W = 120, 160
    base = jax.random.uniform(key, (H * 2, W * 2)) * 255
    k = jnp.array([0.25, 0.5, 0.25])
    sm = jnp.apply_along_axis(lambda r: jnp.convolve(r, k, "same"), 0, base)
    sm = jnp.apply_along_axis(lambda r: jnp.convolve(r, k, "same"), 1, sm)
    img0 = sm[:H, :W]
    # frame 1 = frame 0 magnified 1.4x about the origin
    s = 1.4
    ys = jnp.arange(H) / s
    xs = jnp.arange(W) / s
    yi = jnp.clip(ys.astype(int), 0, H - 1)
    xi = jnp.clip(xs.astype(int), 0, W - 1)
    img1 = img0[yi][:, xi]
    K = 16
    rng = np.random.default_rng(4)
    xy0 = jnp.asarray(
        np.stack([rng.uniform(20, 90, K), rng.uniform(20, 70, K)], 1),
        jnp.float32,
    ).round()
    gt_xy1 = xy0 * s  # true correspondence under the magnification
    # matcher estimate: a few px off the truth
    xy1 = gt_xy1 + 3.0
    valid = jnp.ones((K,), bool)
    cfg = RefineConfig(radius=8, cost_path="xla")
    _, ok_fixed = refine_matches(img0, img1, xy0, xy1, valid, cfg)
    ref_s, ok_s = refine_matches(
        img0, img1, xy0, xy1, valid,
        cfg._replace(scales=(1.0, 1.2, 1.4)),
    )
    err = np.linalg.norm(np.asarray(ref_s - gt_xy1), axis=1)
    ok_s = np.asarray(ok_s)
    # scale search must lock most points near the truth; fixed scale locks
    # almost nothing on a 1.4x zoom
    assert ok_s.sum() >= K // 2, ok_s.sum()
    assert np.median(err[ok_s]) < 2.5, err
    assert ok_s.sum() > np.asarray(ok_fixed).sum()


def test_pallas_cost_volume_batch_chunking():
    """Batches above max_batch are split across pallas_calls (SMEM guard)
    with identical results."""
    from forest_slam_tpu.frontend.pallas_refine import (
        refine_cost_volume_pallas,
    )

    key = jax.random.PRNGKey(2)
    B, H, W, K = 5, 48, 96, 8
    img0 = jax.random.uniform(key, (B, H, W)) * 255
    img1 = jnp.roll(img0, 2, axis=2)
    rng = np.random.default_rng(2)
    mk = lambda hi: jnp.asarray(rng.integers(10, hi, (B, K)), jnp.int32)
    xi0, yi0, xi1, yi1 = mk(W - 10), mk(H - 10), mk(W - 10), mk(H - 10)
    whole = refine_cost_volume_pallas(
        img0, img1, xi0, yi0, xi1, yi1, 8, 4, interpret=True, max_batch=8
    )
    chunked = refine_cost_volume_pallas(
        img0, img1, xi0, yi0, xi1, yi1, 8, 4, interpret=True, max_batch=2
    )
    np.testing.assert_allclose(
        np.asarray(chunked), np.asarray(whole), atol=1e-4
    )


def test_refine_matches_pallas_path_end_to_end():
    """refine_matches with cost_path=pallas_interpret reproduces the xla
    path's refined coords and ok mask on a clean shift."""
    key = jax.random.PRNGKey(0)
    H, W = 96, 128
    img0 = jax.random.uniform(key, (H, W)) * 255
    img1 = jnp.roll(img0, 4, axis=1)
    K = 32
    xy0 = jnp.stack(
        [
            jax.random.uniform(jax.random.PRNGKey(1), (K,)) * 80 + 24,
            jax.random.uniform(jax.random.PRNGKey(2), (K,)) * 48 + 24,
        ],
        axis=1,
    ).round()
    xy1 = xy0 + jnp.array([4.0, 0.0]) + 3.0
    valid = jnp.ones((K,), bool)
    ref_x, ok_x = refine_matches(
        img0, img1, xy0, xy1, valid, RefineConfig(radius=8, cost_path="xla")
    )
    ref_p, ok_p = refine_matches(
        img0, img1, xy0, xy1, valid,
        RefineConfig(radius=8, cost_path="pallas_interpret"),
    )
    np.testing.assert_array_equal(np.asarray(ok_x), np.asarray(ok_p))
    np.testing.assert_allclose(
        np.asarray(ref_p), np.asarray(ref_x), atol=1e-3
    )


def test_pallas_cost_volume_nvalid_bounds_live_rows():
    """With valid-compacted inputs, rows >= nvalid come back as exact
    zeros and live rows equal the XLA path (interpret mode)."""
    from forest_slam_tpu.frontend.pallas_refine import refine_cost_volume
    from forest_slam_tpu.frontend.refine import _cost_volume_xla

    key = jax.random.PRNGKey(4)
    H, W = 96, 144
    img0 = jax.random.uniform(key, (H, W)) * 255
    img1 = jnp.roll(img0, 2, axis=1) + 1.0
    K, t, R = 16, 8, 8
    rng = np.random.default_rng(0)
    xi0 = jnp.asarray(rng.integers(10, W - 10, (K,)), jnp.int32)
    yi0 = jnp.asarray(rng.integers(10, H - 10, (K,)), jnp.int32)
    xi1 = jnp.asarray(rng.integers(10, W - 10, (K,)), jnp.int32)
    yi1 = jnp.asarray(rng.integers(10, H - 10, (K,)), jnp.int32)

    nv = 11
    cp = refine_cost_volume(
        img0, img1, xi0, yi0, xi1, yi1, t, R, interpret=True,
        nvalid=jnp.int32(nv),
    )
    cx = _cost_volume_xla(img0, img1, xi0, yi0, xi1, yi1, t, R)
    np.testing.assert_allclose(np.asarray(cp[:nv]), np.asarray(cx[:nv]), rtol=1e-6)
    assert float(jnp.max(jnp.abs(cp[nv:]))) == 0.0


def test_refine_quality_compaction_invariance():
    """refine_matches_quality with a scattered valid mask must equal the
    all-valid run on the valid slots and pass through the rest — the
    valid-compaction fast path cannot change per-keypoint results."""
    from forest_slam_tpu.frontend.refine import refine_matches_quality

    key = jax.random.PRNGKey(7)
    H, W = 100, 140
    img0 = jax.random.uniform(key, (H, W)) * 255
    img1 = jnp.roll(jnp.roll(img0, 4, axis=1), -2, axis=0)
    K = 32
    xy0 = jnp.stack(
        [
            jax.random.uniform(jax.random.PRNGKey(1), (K,)) * 80 + 30,
            jax.random.uniform(jax.random.PRNGKey(2), (K,)) * 40 + 30,
        ],
        axis=1,
    ).round()
    xy1 = xy0 + jnp.array([4.0, -2.0]) + jax.random.uniform(
        jax.random.PRNGKey(3), (K, 2), minval=-5, maxval=5
    )
    mask = jnp.asarray(np.random.default_rng(1).random(K) < 0.5)
    cfg = RefineConfig(radius=8)

    out_all, ok_all, q_all = refine_matches_quality(
        img0, img1, xy0, xy1, jnp.ones((K,), bool), cfg
    )
    out_m, ok_m, q_m = refine_matches_quality(img0, img1, xy0, xy1, mask, cfg)

    m = np.asarray(mask)
    np.testing.assert_allclose(
        np.asarray(out_m)[m], np.asarray(out_all)[m], atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(ok_m)[m], np.asarray(ok_all)[m])
    np.testing.assert_allclose(np.asarray(q_m)[m], np.asarray(q_all)[m], atol=1e-6)
    assert not np.asarray(ok_m)[~m].any()
    np.testing.assert_allclose(np.asarray(out_m)[~m], np.asarray(xy1)[~m])

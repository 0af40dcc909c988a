"""Tests for FAST/Harris/ORB and Hamming matching."""

import numpy as np
import jax.numpy as jnp
import pytest

cv2 = pytest.importorskip("cv2")

from forest_slam_tpu.frontend.fast import fast_score_map, harris_response
from forest_slam_tpu.frontend import (
    OrbConfig,
    extract_orb,
    hamming_distance_matrix,
    mutual_nn_match,
)


def textured_image(rng, h=240, w=320):
    """Blocky synthetic scene with strong corners + mild noise."""
    blocks = rng.integers(0, 256, size=(h // 16, w // 16)).astype(np.uint8)
    img = np.kron(blocks, np.ones((16, 16), np.uint8))
    noise = rng.normal(0, 3, size=img.shape)
    return np.clip(img.astype(np.float64) + noise, 0, 255).astype(np.uint8)


SMALL_CFG = OrbConfig(n_features=256, n_levels=4)


def test_fast_matches_opencv_corners(rng):
    img = textured_image(rng)
    ours = np.asarray(fast_score_map(jnp.asarray(img), threshold=20.0))
    our_pts = np.argwhere(ours > 0)  # (n, 2) of (y, x)

    det = cv2.FastFeatureDetector_create(
        threshold=20, nonmaxSuppression=False, type=cv2.FAST_FEATURE_DETECTOR_TYPE_9_16
    )
    kps = det.detect(img, None)
    cv_pts = np.array([[kp.pt[1], kp.pt[0]] for kp in kps])
    cv_pts = cv_pts[
        (cv_pts[:, 0] >= 3)
        & (cv_pts[:, 0] < img.shape[0] - 3)
        & (cv_pts[:, 1] >= 3)
        & (cv_pts[:, 1] < img.shape[1] - 3)
    ]
    assert len(cv_pts) > 50
    # every OpenCV corner should be detected by ours (identical criterion);
    # allow a small miss rate from the strict-inequality boundary
    our_set = {tuple(p) for p in our_pts}
    hits = sum(1 for p in cv_pts if (int(p[0]), int(p[1])) in our_set)
    assert hits / len(cv_pts) > 0.95


def test_harris_correlates_with_opencv(rng):
    img = textured_image(rng)
    ours = np.asarray(harris_response(jnp.asarray(img), block_size=7))
    cv = cv2.cornerHarris(np.float32(img), blockSize=7, ksize=3, k=0.04)
    # compare rankings in the interior (border handling differs)
    a = ours[10:-10, 10:-10].ravel()
    b = cv[10:-10, 10:-10].ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.99


def _pack_bits(bits):
    """(N, 256) {0,1} -> (N, 8) uint32 little-endian like the extractor."""
    b = bits.reshape(-1, 8, 32).astype(np.uint64)
    shifts = np.arange(32, dtype=np.uint64)
    return (b << shifts[None, None, :]).sum(axis=-1).astype(np.uint32)


def test_hamming_distance_matrix_exact(rng):
    bits_a = rng.integers(0, 2, size=(64, 256))
    bits_b = rng.integers(0, 2, size=(48, 256))
    da = _pack_bits(bits_a)
    db = _pack_bits(bits_b)
    ours = np.asarray(hamming_distance_matrix(jnp.asarray(da), jnp.asarray(db)))
    expect = (bits_a[:, None, :] != bits_b[None, :, :]).sum(-1)
    np.testing.assert_array_equal(ours, expect)


def test_mutual_nn_matches_bfmatcher_crosscheck(rng):
    bits_a = rng.integers(0, 2, size=(80, 256))
    # b = shuffled noisy copies of a subset of a -> known correspondences
    perm = rng.permutation(80)[:60]
    bits_b = bits_a[perm].copy()
    flip = rng.random(size=bits_b.shape) < 0.05
    bits_b = np.where(flip, 1 - bits_b, bits_b)

    da = _pack_bits(bits_a)
    db = _pack_bits(bits_b)
    dist = hamming_distance_matrix(jnp.asarray(da), jnp.asarray(db))
    ours = np.asarray(mutual_nn_match(dist))

    bf = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=True)
    desc_a = np.frombuffer(da.tobytes(), np.uint8).reshape(80, 32)
    desc_b = np.frombuffer(db.tobytes(), np.uint8).reshape(-1, 32)
    cv_matches = {m.queryIdx: m.trainIdx for m in bf.match(desc_a, desc_b)}

    agree = sum(
        1 for i, j in cv_matches.items() if ours[i] == j
    )
    assert agree / len(cv_matches) > 0.95
    # and the planted correspondences are recovered
    planted = sum(1 for bi, ai in enumerate(perm) if ours[ai] == bi)
    assert planted / len(perm) > 0.9


def test_mutual_nn_respects_validity_masks(rng):
    dist = jnp.asarray(rng.integers(0, 100, size=(10, 10)), jnp.int32)
    valid_a = jnp.asarray([True] * 5 + [False] * 5)
    valid_b = jnp.asarray([False] * 5 + [True] * 5)
    m = np.asarray(mutual_nn_match(dist, valid_a, valid_b))
    assert np.all(m[5:] == -1)
    assert np.all((m[:5] == -1) | (m[:5] >= 5))


def test_orb_extract_shapes_and_validity(rng):
    img = textured_image(rng)
    feats = extract_orb(jnp.asarray(img), SMALL_CFG)
    n = SMALL_CFG.n_features
    assert feats.xy.shape == (n, 2)
    assert feats.desc.shape == (n, 8)
    assert feats.valid.shape == (n,)
    v = np.asarray(feats.valid)
    assert v.sum() > 100  # plenty of corners in the blocky scene
    xy = np.asarray(feats.xy)[v]
    assert xy[:, 0].max() < img.shape[1] and xy[:, 1].max() < img.shape[0]
    assert np.asarray(feats.octave).max() >= 1  # multi-scale fired


def test_orb_matching_under_rotation(rng):
    """End-to-end front-end gate: rotate an image 12 degrees, extract+match,
    verify matches agree with the known warp (rBRIEF orientation works)."""
    img = textured_image(rng, 240, 320)
    M = cv2.getRotationMatrix2D((160, 120), 12.0, 1.0)
    warped = cv2.warpAffine(img, M, (320, 240))

    fa = extract_orb(jnp.asarray(img), SMALL_CFG)
    fb = extract_orb(jnp.asarray(warped), SMALL_CFG)
    dist = hamming_distance_matrix(fa.desc, fb.desc)
    matches = np.asarray(
        mutual_nn_match(dist, fa.valid, fb.valid, max_distance=64)
    )

    xy_a = np.asarray(fa.xy)
    xy_b = np.asarray(fb.xy)
    matched = matches >= 0
    assert matched.sum() > 40
    src = np.concatenate([xy_a[matched], np.ones((matched.sum(), 1))], axis=1)
    pred = (M @ src.T).T
    err = np.linalg.norm(pred - xy_b[matches[matched]], axis=1)
    inlier_ratio = (err < 3.0).mean()
    assert inlier_ratio > 0.6, f"inlier ratio {inlier_ratio}"

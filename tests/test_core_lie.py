"""Unit tests for SO(3)/SE(3)/quaternion math against scipy and random data."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from forest_slam_tpu.core import lie


def random_rotations(n, rng):
    return Rotation.random(n, random_state=rng).as_matrix().astype(np.float64)


def test_quat_matrix_roundtrip(rng):
    R = random_rotations(64, 0)
    q = lie.quat_from_matrix(jnp.asarray(R))
    R2 = lie.quat_to_matrix(q)
    np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)


def test_quat_from_matrix_matches_scipy_up_to_sign():
    R = random_rotations(64, 1)
    ours = np.asarray(lie.quat_from_matrix(jnp.asarray(R)))
    scipys = Rotation.from_matrix(R).as_quat()  # [x,y,z,w]
    # same quaternion up to global sign; ours enforces w >= 0
    assert np.all(ours[:, 3] >= 0)
    sign = np.sign(np.sum(ours * scipys, axis=1))[:, None]
    np.testing.assert_allclose(ours, scipys * sign, atol=1e-5)


def test_quat_from_matrix_near_pi():
    # 180-degree rotations hit the degenerate branch
    for axis in np.eye(3):
        R = Rotation.from_rotvec(np.pi * axis).as_matrix()
        q = np.asarray(lie.quat_from_matrix(jnp.asarray(R)))
        R2 = np.asarray(lie.quat_to_matrix(jnp.asarray(q)))
        np.testing.assert_allclose(R2, R, atol=1e-5)


def test_quat_multiply_matches_rotation_compose():
    ra = Rotation.random(16, random_state=2)
    rb = Rotation.random(16, random_state=3)
    qa = jnp.asarray(ra.as_quat())
    qb = jnp.asarray(rb.as_quat())
    ours = np.asarray(lie.quat_multiply(qa, qb))
    expect = (ra * rb).as_quat()
    sign = np.sign(np.sum(ours * expect, axis=1))[:, None]
    np.testing.assert_allclose(ours, expect * sign, atol=1e-6)


def test_so3_exp_matches_scipy():
    rng = np.random.default_rng(4)
    w = rng.normal(size=(128, 3)) * 1.5  # angles may exceed pi
    R = lie.so3_exp(jnp.asarray(w))
    expect = Rotation.from_rotvec(w).as_matrix()
    np.testing.assert_allclose(np.asarray(R), expect, atol=1e-5)


def test_so3_exp_log_roundtrip():
    rng = np.random.default_rng(4)
    w = rng.normal(size=(128, 3))
    # log returns the principal axis-angle, so restrict |w| < pi
    w = w / np.linalg.norm(w, axis=1, keepdims=True) * rng.uniform(
        1e-3, np.pi - 1e-3, size=(128, 1)
    )
    R = lie.so3_exp(jnp.asarray(w))
    w2 = np.asarray(lie.so3_log(R))
    np.testing.assert_allclose(w2, w, atol=2e-3)  # f32, amplified near theta=pi


def test_so3_log_small_and_large_angles():
    for angle in [1e-9, 1e-5, 0.1, 3.0, np.pi - 1e-4]:
        w = np.array([0.3, -0.5, 0.8])
        w = w / np.linalg.norm(w) * angle
        R = Rotation.from_rotvec(w).as_matrix()
        w2 = np.asarray(lie.so3_log(jnp.asarray(R)))
        np.testing.assert_allclose(w2, w, atol=2e-3)  # f32, amplified near theta=pi


def test_se3_exp_log_roundtrip():
    rng = np.random.default_rng(5)
    xi = rng.normal(size=(64, 6))
    # keep the rotation part below pi so log is the exact inverse
    wn = np.linalg.norm(xi[:, 3:], axis=1, keepdims=True)
    xi[:, 3:] *= np.minimum(1.0, 2.8 / wn)
    T = lie.se3_exp(jnp.asarray(xi))
    xi2 = np.asarray(lie.se3_log(T))
    np.testing.assert_allclose(xi2, xi, atol=1e-5)
    # verify it is a valid rigid transform
    T = np.asarray(T)
    RtR = np.einsum("nij,nik->njk", T[:, :3, :3], T[:, :3, :3])
    np.testing.assert_allclose(RtR, np.tile(np.eye(3), (64, 1, 1)), atol=1e-6)
    np.testing.assert_allclose(T[:, 3, :], np.tile([0, 0, 0, 1], (64, 1)), atol=0)


def test_se3_inverse_and_compose():
    rng = np.random.default_rng(6)
    xi = rng.normal(size=(8, 6))
    T = lie.se3_exp(jnp.asarray(xi))
    I = lie.se3_compose(T, lie.se3_inverse(T))
    np.testing.assert_allclose(
        np.asarray(I), np.tile(np.eye(4), (8, 1, 1)), atol=1e-6
    )


def test_se3_chain_matches_serial_loop():
    rng = np.random.default_rng(7)
    xi = rng.normal(size=(32, 6)) * 0.1
    rel = np.asarray(lie.se3_exp(jnp.asarray(xi)))
    chained = np.asarray(lie.se3_chain(jnp.asarray(rel)))
    acc = np.eye(4)
    for i in range(32):
        acc = acc @ rel[i]
        np.testing.assert_allclose(chained[i], acc, atol=1e-5)


def test_se3_chain_with_initial():
    rng = np.random.default_rng(8)
    rel = np.asarray(lie.se3_exp(jnp.asarray(rng.normal(size=(5, 6)) * 0.1)))
    init = np.asarray(lie.se3_exp(jnp.asarray(rng.normal(size=(6,)))))
    chained = np.asarray(lie.se3_chain(jnp.asarray(rel), jnp.asarray(init)))
    acc = init.copy()
    for i in range(5):
        acc = acc @ rel[i]
        np.testing.assert_allclose(chained[i], acc, atol=1e-5)


def test_rodrigues_matches_opencv():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(9)
    for _ in range(10):
        rvec = rng.normal(size=(3,))
        expect, _ = cv2.Rodrigues(rvec)
        ours = np.asarray(lie.rodrigues(jnp.asarray(rvec)))
        np.testing.assert_allclose(ours, expect, atol=1e-6)


def test_jit_and_vmap():
    w = jnp.array([[0.1, 0.2, 0.3]] * 4)
    out = jax.jit(jax.vmap(lie.so3_exp))(w)
    assert out.shape == (4, 3, 3)


def test_so3_orthonormalize_fixes_scaled_rotation(rng):
    from scipy.spatial.transform import Rotation
    from forest_slam_tpu.core import se3_orthonormalize, so3_orthonormalize

    R = Rotation.random(8, random_state=3).as_matrix()
    # the measured TPU failure mode: uniform ~1% contraction + small skew
    bad = R * 0.988 + rng.normal(size=R.shape) * 1e-3
    fixed = np.asarray(so3_orthonormalize(jnp.asarray(bad, jnp.float32)))
    eye = np.einsum("nij,nkj->nik", fixed, fixed)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (8, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(fixed), 1.0, atol=1e-5)
    # stays close to the underlying rotation
    assert np.abs(fixed - R).max() < 5e-3

    T = np.tile(np.eye(4), (8, 1, 1))
    T[:, :3, :3] = bad
    T[:, :3, 3] = rng.normal(size=(8, 3))
    Tf = np.asarray(se3_orthonormalize(jnp.asarray(T, jnp.float32)))
    np.testing.assert_allclose(Tf[:, :3, 3], T[:, :3, 3], atol=1e-6)
    np.testing.assert_allclose(np.linalg.det(Tf[:, :3, :3]), 1.0, atol=1e-5)

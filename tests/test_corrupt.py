"""Motion-blur corruption (reference stereo_slam.py:137-174, quirk B9)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from forest_slam_tpu.utils.corrupt import (
    BlurConfig,
    SensorConfig,
    apply_motion_blur,
    apply_random_motion_blur,
    apply_sensor_nuisance,
    corrupt_stack,
    motion_blur_kernel,
    sensor_shift_stack,
)


def test_kernel_is_normalized_line():
    for angle in [0.0, 30.0, 45.0, 90.0]:
        k = np.asarray(motion_blur_kernel(15, angle))
        assert k.shape == (15, 15)
        assert abs(k.sum() - 1.0) < 1e-5
        assert (k >= 0).all()
    # horizontal kernel only has mass on the center row (tent width 1)
    k0 = np.asarray(motion_blur_kernel(15, 0.0))
    assert k0[7].sum() > 0.999
    # 90 deg = vertical
    k90 = np.asarray(motion_blur_kernel(15, 90.0))
    assert k90[:, 7].sum() > 0.999


def test_full_blur_smooths_along_angle():
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (64, 64)) * 255.0
    out = apply_motion_blur(img, kernel_size=9, angle_deg=0.0)
    # horizontal blur: row-direction variation drops much more than column
    dx = np.abs(np.diff(np.asarray(out), axis=1)).mean()
    dy = np.abs(np.diff(np.asarray(out), axis=0)).mean()
    assert dx < 0.5 * dy


def test_zero_percentage_is_identity():
    img = jnp.arange(32 * 32, dtype=jnp.float32).reshape(32, 32)
    out = apply_random_motion_blur(img, jax.random.PRNGKey(0), BlurConfig())
    assert out is img  # no-op fast path (quirk B9: machinery present, off)


def test_random_blur_masks_expected_fraction():
    key = jax.random.PRNGKey(1)
    img = jax.random.uniform(key, (128, 128)) * 255.0
    cfg = BlurConfig(blur_percentage=5.0, kernel_size=9)
    out = apply_random_motion_blur(img, jax.random.PRNGKey(2), cfg)
    changed = (np.asarray(out) != np.asarray(img)).mean()
    # 5% seeds dilated by 9x9 boxes -> large but not total coverage
    assert 0.3 < changed < 0.995


def test_corrupt_stack_per_frame_independent():
    imgs = jnp.tile(jnp.linspace(0, 255, 48 * 64).reshape(1, 48, 64), (3, 1, 1))
    cfg = BlurConfig(blur_percentage=10.0, kernel_size=5)
    out = np.asarray(corrupt_stack(imgs, jax.random.PRNGKey(0), cfg))
    # identical inputs, different keys -> different masks
    assert not np.array_equal(out[0], out[1])


def test_sensor_nuisance_bounded_and_keyed():
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (96, 128)) * 200.0 + 20.0
    cfg = SensorConfig()
    out1 = np.asarray(apply_sensor_nuisance(img, jax.random.PRNGKey(1), cfg))
    out2 = np.asarray(apply_sensor_nuisance(img, jax.random.PRNGKey(2), cfg))
    assert out1.shape == img.shape
    assert (out1 >= 0).all() and (out1 <= 255).all()
    # different keys -> different photometric draws
    assert not np.array_equal(out1, out2)
    # the shift is photometric, not geometric: correlation with the clean
    # image stays high (structure preserved) but the images differ
    a = (out1 - out1.mean()).ravel()
    b = (np.asarray(img) - np.asarray(img).mean()).ravel()
    corr = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
    assert corr > 0.8
    assert np.abs(out1 - np.asarray(img)).mean() > 1.0


def test_sensor_vignette_darkens_corners():
    img = jnp.full((128, 128), 200.0)
    cfg = SensorConfig(max_gain=0.0, max_bias=0.0, max_gamma=0.0,
                       shot_sigma=0.0, read_sigma=0.0, vignette=0.4)
    out = np.asarray(apply_sensor_nuisance(img, jax.random.PRNGKey(0), cfg))
    assert out[0, 0] < out[64, 64] * 0.75
    # center nearly untouched
    assert abs(out[64, 64] - 200.0) < 2.0


def test_sensor_stack_per_frame_independent():
    imgs = jnp.tile(
        jnp.linspace(0, 255, 48 * 64).reshape(1, 48, 64), (3, 1, 1)
    )
    out = np.asarray(sensor_shift_stack(imgs, jax.random.PRNGKey(0)))
    assert not np.array_equal(out[0], out[1])


@pytest.mark.slow
def test_vo_degrades_gracefully_under_blur():
    from forest_slam_tpu.eval import ape_translation
    from forest_slam_tpu.frontend import OrbConfig
    from forest_slam_tpu.io.synthetic import render_sequence
    from forest_slam_tpu.io.tum import Trajectory
    from forest_slam_tpu.pipelines.stereo import StereoConfig, run_stereo_vo
    from forest_slam_tpu.stereo import SgmConfig

    seq = render_sequence(n_frames=10, height=160, width=224, seed=3, speed=0.25)
    cfg = StereoConfig(
        orb=OrbConfig(n_features=384, n_levels=4),
        sgm=SgmConfig(num_disparities=48),
        n_hypotheses=512,
        compose_mode="odometry",
    )
    gt = Trajectory.from_matrices(
        seq.timestamps, np.asarray(seq.T_world_cam, np.float64)
    )

    blur = BlurConfig(blur_percentage=10.0, kernel_size=7)
    key = jax.random.PRNGKey(5)
    il = corrupt_stack(jnp.asarray(seq.images_left, jnp.float32), key, blur)
    ir = corrupt_stack(
        jnp.asarray(seq.images_right, jnp.float32), jax.random.fold_in(key, 1), blur
    )

    blurred, outs = run_stereo_vo(il, ir, seq.timestamps, seq.rig, cfg)
    ate_blur = ape_translation(blurred, gt, align=True, with_scale=False).rmse
    # still tracks most frames under moderate blur and does not diverge
    # (ATE typically degrades clean 0.016 -> ~0.12 at this setting)
    assert np.asarray(outs.ok).mean() > 0.6
    assert ate_blur < 0.5

"""Relocalization after tracking loss (backend/relocalize.py).

The reference holds the last pose on a PnP failure (quirk B5 territory,
SURVEY.md §2.4), permanently offsetting the rest of the trajectory by
the lost motion. These tests corrupt one mid-sequence frame to noise so
VO loses both pairs touching it, then check that relocalization repairs
the chain to near ground truth.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from forest_slam_tpu.backend.relocalize import (
    RelocalizeConfig,
    relocalize_trajectory,
)
from forest_slam_tpu.frontend import OrbConfig
from forest_slam_tpu.frontend.base import orb_frontend
from forest_slam_tpu.io.synthetic import (
    corridor_trajectory,
    default_rig,
    make_corridor_world,
    render_view,
)
from forest_slam_tpu.pipelines.slam import SlamConfig, run_stereo_slam
from forest_slam_tpu.pipelines.stereo import StereoConfig, run_stereo_vo_batched
from forest_slam_tpu.stereo import SgmConfig

H, W = 160, 224
NOISE_FRAME = 12
N_FRAMES = 24
SPEED = 0.25

CFG = StereoConfig(
    orb=OrbConfig(n_features=384, n_levels=4),
    sgm=SgmConfig(num_disparities=48),
    n_hypotheses=512,
    compose_mode="odometry",
)


def _render_corrupted():
    world = make_corridor_world(jax.random.PRNGKey(3))
    rig = default_rig(H, W)
    Ts = corridor_trajectory(N_FRAMES, speed=SPEED)
    K, T_lr = rig.left.K, rig.T_left_right

    def rf(T):
        left, _ = render_view(world, T, K, H, W)
        right, _ = render_view(world, T @ T_lr, K, H, W)
        return left, right

    il, ir = jax.lax.map(rf, Ts)
    noise = jax.random.uniform(jax.random.PRNGKey(9), (H, W)) * 255.0
    il = il.at[NOISE_FRAME].set(noise)
    ir = ir.at[NOISE_FRAME].set(noise)
    # GT poses relative to frame 0, matching the VO chain's frame
    T0inv = jnp.linalg.inv(Ts[0])
    gt = jnp.einsum("ij,njk->nik", T0inv, Ts)
    return il, ir, rig, np.asarray(gt)


@pytest.fixture(scope="module")
def corrupted_vo():
    il, ir, rig, gt = _render_corrupted()
    frontend = orb_frontend(CFG.orb, CFG.max_match_distance)
    outs, art = run_stereo_vo_batched(
        il, ir, rig, CFG, jax.random.PRNGKey(0), frontend, None,
        return_artifacts=True,
    )
    return il, ir, rig, gt, frontend, outs, art


def test_noise_frame_loses_tracking(corrupted_vo):
    _, _, _, _, _, outs, _ = corrupted_vo
    ok = np.asarray(outs.ok)
    # both pairs touching the noise frame must fail...
    assert not ok[NOISE_FRAME - 1] and not ok[NOISE_FRAME]
    # ...and everything else tracks
    rest = np.delete(ok, [NOISE_FRAME - 1, NOISE_FRAME])
    assert rest.mean() > 0.9


def test_relocalize_repairs_chain(corrupted_vo):
    il, _, rig, gt, frontend, outs, art = corrupted_vo
    end_gt = gt[-1, :3, 3]
    err_before = np.linalg.norm(
        np.asarray(outs.pose)[-1, :3, 3] - end_gt
    )
    # pose-hold loses ~2 frames of forward motion
    assert err_before > 0.25

    poses, ev = relocalize_trajectory(
        outs.pose, outs.ok, art, rig.left, jax.random.PRNGKey(1),
        frontend, None, (H, W), RelocalizeConfig(),
    )
    # the frame AFTER the noise frame relocalizes (the noise frame itself
    # has garbage features and cannot)
    assert ev.n_lost == 2
    assert ev.n_repaired >= 1
    assert (ev.frame == NOISE_FRAME + 1).any()
    # references must be trusted pre-loss frames
    assert (ev.reference < NOISE_FRAME).all()
    err_after = np.linalg.norm(poses[-1, :3, 3] - end_gt)
    assert err_after < 0.1
    assert err_after < err_before / 3


def test_relocalize_noop_on_clean_chain(corrupted_vo):
    _, _, rig, _, frontend, outs, art = corrupted_vo
    ok = np.ones_like(np.asarray(outs.ok))
    poses, ev = relocalize_trajectory(
        outs.pose, ok, art, rig.left, jax.random.PRNGKey(1),
        frontend, None, (H, W), RelocalizeConfig(),
    )
    assert ev.n_lost == 0 and ev.n_repaired == 0
    np.testing.assert_allclose(poses, np.asarray(outs.pose), rtol=0, atol=0)


@pytest.mark.slow
def test_slam_pipeline_with_relocalization(corrupted_vo):
    il, ir, rig, gt, _, _, _ = corrupted_vo
    cfg = SlamConfig(stereo=CFG, keyframe_stride=4,
                     relocalize=RelocalizeConfig())
    outs = run_stereo_slam(il, ir, rig, cfg, jax.random.PRNGKey(0))
    assert int(outs.n_relocalized) >= 1
    err = np.linalg.norm(np.asarray(outs.pose)[-1, :3, 3] - gt[-1, :3, 3])
    assert err < 0.15

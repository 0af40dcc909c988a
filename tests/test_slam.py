"""Full SLAM (VO + loop closure + pose graph) and sharded multi-sequence
eval (BASELINE config 5)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from forest_slam_tpu.backend.loop_closure import LoopClosureConfig
from forest_slam_tpu.frontend import OrbConfig
from forest_slam_tpu.io.synthetic import (
    default_rig,
    make_corridor_world,
    out_and_back_trajectory,
    render_sequence,
    render_view,
)
from forest_slam_tpu.pipelines.slam import SlamConfig, run_stereo_slam
from forest_slam_tpu.pipelines.stereo import StereoConfig
from forest_slam_tpu.stereo import SgmConfig

STEREO_CFG = StereoConfig(
    orb=OrbConfig(n_features=384, n_levels=4),
    sgm=SgmConfig(num_disparities=48),
    n_hypotheses=512,
    compose_mode="odometry",
)


@pytest.mark.slow
def test_slam_closes_synthetic_loop():
    H, W = 160, 224
    world = make_corridor_world(jax.random.PRNGKey(3))
    rig = default_rig(H, W)
    Ts = out_and_back_trajectory(n_forward=12, n_turn=18, speed=0.25, n_rejoin=6)
    N = int(Ts.shape[0])
    K = rig.left.K
    T_lr = rig.T_left_right

    def rf(T):
        l, _ = render_view(world, T, K, H, W)
        r, _ = render_view(world, T @ T_lr, K, H, W)
        return l, r

    il, ir = jax.lax.map(rf, Ts)
    cfg = SlamConfig(
        stereo=STEREO_CFG,
        loop=LoopClosureConfig(
            max_candidates=16, min_separation=6, min_similarity=0.5,
            min_inliers=25,
        ),
        keyframe_stride=4,
    )
    outs = run_stereo_slam(il, ir, rig, cfg, jax.random.PRNGKey(0))

    assert np.asarray(outs.vo.ok).mean() > 0.9
    assert int(outs.n_loops) >= 1  # the true revisit must be found
    # accepted loops must span a real temporal gap
    acc = np.asarray(outs.loop_accepted)
    pairs = np.asarray(outs.loop_pairs)[acc]
    assert (np.abs(pairs[:, 1] - pairs[:, 0]) >= 6).all()

    gt_end = np.asarray(Ts)[-1, :3, 3]
    vo_end = np.linalg.norm(np.asarray(outs.vo.pose)[-1, :3, 3] - gt_end)
    slam_end = np.linalg.norm(np.asarray(outs.pose)[-1, :3, 3] - gt_end)
    # closing the loop must tighten the endpoint (measured 0.18 -> 0.04 m)
    assert slam_end < vo_end, (vo_end, slam_end)
    assert slam_end < 0.15


@pytest.mark.slow
def test_batched_multi_sequence_eval_on_mesh():
    from forest_slam_tpu.pipelines.batch_eval import run_batched_eval

    S, N = 8, 6
    seqs = [
        render_sequence(n_frames=N, height=160, width=224, seed=s, speed=0.25)
        for s in range(S)
    ]
    il = jnp.stack([s.images_left for s in seqs])
    ir = jnp.stack([s.images_right for s in seqs])
    gt = jnp.stack([s.T_world_cam for s in seqs])
    rig = seqs[0].rig

    # all 8 virtual devices on the data axis (sequence parallelism)
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices()[:8]).reshape(8, 1)
    mesh = Mesh(devs, axis_names=("data", "model"))

    cfg = STEREO_CFG._replace(sgm=SgmConfig(num_disparities=32))
    results, poses = run_batched_eval(
        il, ir, gt, rig, cfg, mesh, frame_batch=3, pair_batch=5
    )
    assert len(results) == S
    assert poses.shape == (S, N - 1, 4, 4)
    ates = [r.ate_rmse for r in results]
    oks = [r.ok_fraction for r in results]
    # every sequence tracks and stays metrically sane on its own device
    assert all(o > 0.7 for o in oks), oks
    assert all(a < 0.25 for a in ates), ates

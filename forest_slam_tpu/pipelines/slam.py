"""Full stereo SLAM: batched VO + loop closure + pose-graph optimization.

BASELINE config 5's single-sequence half (the reference itself is pure
odometry, SURVEY.md §0). Stages:

1. frame-parallel stereo VO (pipelines/stereo.py, batched runner) with
   artifacts (per-frame features, depths, matches);
2. keyframe selection: every ``keyframe_stride``-th frame (static);
3. loop-closure retrieval + geometric verification over keyframes
   (backend/loop_closure.py);
4. SE(3) pose-graph optimization over keyframes with odometry + loop edges
   (backend/pose_graph.py);
5. correction propagation: every non-keyframe pose rides rigidly with its
   anchor keyframe (T_f' = T_kf' @ T_kf^-1 @ T_f);
6. optional sliding-window BA pre-refinement (backend/window.py).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from forest_slam_tpu.backend.loop_closure import (
    LoopClosureConfig,
    descriptor_signature,
    detect_loop_candidates,
    verify_loops,
)
from forest_slam_tpu.backend.pose_graph import (
    PoseGraph,
    odometry_edges,
    optimize_pose_graph,
)
from forest_slam_tpu.backend.relocalize import (
    RelocalizeConfig,
    relocalize_trajectory,
)
from forest_slam_tpu.backend.window import WindowBAConfig, refine_trajectory_ba
from forest_slam_tpu.core.camera import StereoRig
from forest_slam_tpu.core.lie import se3_compose, se3_inverse
from forest_slam_tpu.frontend.base import FrontendFns, orb_frontend
from forest_slam_tpu.io.tum import Trajectory
from forest_slam_tpu.pipelines.stereo import (
    StereoConfig,
    StereoStepOut,
    run_stereo_vo_batched,
)

_HI = jax.lax.Precision.HIGHEST


class SlamConfig(NamedTuple):
    stereo: StereoConfig = StereoConfig()
    loop: LoopClosureConfig = LoopClosureConfig()
    keyframe_stride: int = 5
    pose_graph_iters: int = 10
    loop_edge_weight: float = 3.0  # relative to odometry edges
    ba: WindowBAConfig | None = None  # optional window-BA pre-refinement
    # repair tracking losses by absolute re-localization against earlier
    # frames (backend/relocalize.py); needs compose_mode="odometry"
    relocalize: RelocalizeConfig | None = None


class SlamOutputs(NamedTuple):
    vo: StereoStepOut  # raw VO outputs (poses BEFORE graph correction)
    pose: jax.Array  # (N-1, 4, 4) corrected trajectory
    n_loops: jax.Array  # () accepted loop-closure edges
    loop_pairs: jax.Array  # (C, 2) keyframe-index candidates
    loop_accepted: jax.Array  # (C,)
    n_relocalized: int = 0  # tracking losses repaired (cfg.relocalize)


def run_stereo_slam(
    images_l,
    images_r,
    rig: StereoRig,
    cfg: SlamConfig,
    key: jax.Array,
    frontend: FrontendFns | None = None,
    fparams=None,
) -> SlamOutputs:
    """Full SLAM over device-resident stacks (N, H, W) x2."""
    if frontend is None:
        frontend = orb_frontend(cfg.stereo.orb, cfg.stereo.max_match_distance)
    images_l = jnp.asarray(images_l, jnp.float32)
    images_r = jnp.asarray(images_r, jnp.float32)
    key, vo_key, loop_key, reloc_key = jax.random.split(key, 4)
    image_shape = tuple(images_l.shape[1:])

    outs, art = run_stereo_vo_batched(
        images_l, images_r, rig, cfg.stereo, vo_key, frontend, fparams,
        return_artifacts=True,
    )
    poses = outs.pose
    n_relocalized = 0
    if cfg.relocalize is not None:
        poses_np, reloc_ev = relocalize_trajectory(
            poses, outs.ok, art, rig.left, reloc_key, frontend, fparams,
            image_shape, cfg.relocalize,
        )
        poses = jnp.asarray(poses_np, poses.dtype)
        n_relocalized = reloc_ev.n_repaired
    if cfg.ba is not None:
        poses = refine_trajectory_ba(
            poses, art, rig.left, cfg.ba,
            frontend=frontend, fparams=fparams,
            image_shape=image_shape,
        )

    N = art.valid.shape[0]
    T_wc = jnp.concatenate([jnp.eye(4)[None], poses], axis=0)  # (N, 4, 4)

    # --- keyframes ------------------------------------------------------
    kf = jnp.arange(0, N, cfg.keyframe_stride)
    n_kf = int(kf.shape[0])
    kf_feats = jax.tree.map(lambda a: a[kf], art.feats)
    kf_T = T_wc[kf]

    # --- loop closure ----------------------------------------------------
    sigs = jax.vmap(descriptor_signature)(kf_feats.desc, kf_feats.valid)
    pairs, _, proposal = detect_loop_candidates(sigs, cfg.loop)
    Z_loop, n_inl, accepted = verify_loops(
        pairs, proposal, kf_feats, art.z[kf], art.z_ok[kf], rig.left,
        loop_key, frontend, fparams, image_shape, cfg.loop,
    )

    # --- pose graph over keyframes ---------------------------------------
    ei, ej, Z_odo, w_odo = odometry_edges(kf_T)
    w_loop = jnp.where(accepted, cfg.loop_edge_weight, 0.0)
    graph = PoseGraph(
        poses=kf_T,
        edge_i=jnp.concatenate([ei, pairs[:, 0]]),
        edge_j=jnp.concatenate([ej, pairs[:, 1]]),
        edge_T=jnp.concatenate([Z_odo, Z_loop]),
        edge_weight=jnp.concatenate([w_odo, w_loop]),
    )
    res = optimize_pose_graph(graph, iters=cfg.pose_graph_iters)

    # --- propagate corrections to non-keyframe poses ----------------------
    anchor = jnp.arange(N) // cfg.keyframe_stride  # keyframe id per frame
    delta = jax.vmap(lambda a, b: se3_compose(a, se3_inverse(b)))(res.poses, kf_T)
    T_corr = jnp.einsum(
        "nij,njk->nik", delta[anchor], T_wc, precision=_HI
    )

    return SlamOutputs(
        vo=outs,
        pose=T_corr[1:],
        n_loops=jnp.sum(accepted),
        loop_pairs=pairs,
        loop_accepted=accepted,
        n_relocalized=n_relocalized,
    )


def run_slam(
    images_l,
    images_r,
    timestamps,
    rig: StereoRig,
    cfg: SlamConfig = SlamConfig(),
    seed: int = 0,
    frontend: FrontendFns | None = None,
    fparams=None,
) -> tuple[Trajectory, SlamOutputs]:
    """Host entry point mirroring run_stereo_vo."""
    outs = run_stereo_slam(
        images_l, images_r, rig, cfg, jax.random.PRNGKey(seed), frontend, fparams
    )
    traj = Trajectory.from_matrices(
        np.asarray(timestamps)[1:], np.asarray(outs.pose, np.float64)
    )
    return traj, outs

"""Stereo visual odometry + mapping pipeline.

TPU-native rebuild of the reference's ``stereo_slam.py`` main loop
(stereo_slam.py:177-345): per stereo pair — temporal feature matching on the
left stream, stereo depth for the previous frame's keypoints, PnP-RANSAC
pose, cumulative chaining, and map accumulation. Structural notes:

- one ``lax.scan`` over the (N, 2, H, W) stereo stack with a pure
  ``StereoState`` (prev features + prev keypoint depths + cumulative pose);
- depth comes from **sparse per-keypoint stereo matching** by default
  (stereo/sparse.py): the reference computes a full dense SGBM map and then
  reads it at <=1024 keypoint pixels (stereo_slam.py:262,278) — ~500x
  wasted arithmetic; ``dense_depth=True`` restores the dense-SGM parity
  path (stereo/disparity.py) with the reference's clamping semantics;
- the reference also matches the right stream but never consumes the result
  (dead compute, SURVEY.md §3.1) — dropped;
- per-frame map points are fixed-size masked slabs stacked by the scan;
  flattening/voxelization happens once at export (fixes quirk B8's O(N^2)
  republishing);
- PnP failure (< 6 valid points or RANSAC collapse) holds the pose,
  mirroring the reference's guard (stereo_slam.py:292) — but unlike the
  reference it cannot propagate garbage on a silent PnP failure (quirk B5)
  because ``ok`` gates the update.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from forest_slam_tpu.core.camera import StereoRig
from forest_slam_tpu.core.lie import se3_matrix, se3_inverse
from forest_slam_tpu.frontend import OrbConfig
from forest_slam_tpu.frontend.base import FrontendFns, orb_frontend
from forest_slam_tpu.geometry import solve_pnp_ransac
from forest_slam_tpu.io.tum import Trajectory
from forest_slam_tpu.stereo import (
    SgmConfig,
    sgm_disparity,
    disparity_to_depth,
    backproject_keypoints,
)
from forest_slam_tpu.core.camera import backproject_depth
from forest_slam_tpu.stereo.sparse import (
    SparseStereoConfig,
    sparse_depth_at_keypoints,
)


class StereoConfig(NamedTuple):
    orb: OrbConfig = OrbConfig()
    sgm: SgmConfig = SgmConfig()
    sparse: SparseStereoConfig = SparseStereoConfig()
    dense_depth: bool = False  # True -> reference-parity dense SGM path
    reproj_threshold_px: float = 1.0  # stereo_slam.py:294
    n_hypotheses: int = 1024  # iterationsCount=1000 -> static batch
    max_match_distance: int = 64
    min_points: int = 6  # stereo_slam.py:292
    refine_iters: int = 8
    compose_mode: str = "parity"
    min_depth: float = 0.1
    max_depth: float = 1000.0


class StereoState(NamedTuple):
    prev: Any  # previous-frame features (front-end specific pytree)
    prev_depth: jax.Array  # dense: (H, W) map; sparse: (K,) per keypoint
    prev_depth_ok: jax.Array  # dense: (1,) dummy; sparse: (K,) validity
    cumulative: jax.Array  # (4, 4)
    key: jax.Array


class StereoStepOut(NamedTuple):
    pose: jax.Array  # (4, 4) cumulative
    map_points: jax.Array  # (K, 3) world-frame points
    map_valid: jax.Array  # (K,) bool
    n_matches: jax.Array
    n_inliers: jax.Array
    ok: jax.Array


def _depth_state(feats, img_l, img_r, rig: StereoRig, cfg: StereoConfig):
    """Compute this frame's depth record for the state."""
    if cfg.dense_depth:
        disp = sgm_disparity(img_l, img_r, cfg.sgm)
        depth = disparity_to_depth(disp, rig.left.fx, rig.baseline)
        return depth, jnp.ones((1,), bool)
    depth_k, ok_k = sparse_depth_at_keypoints(
        img_l, img_r, feats.xy, rig.left.fx, rig.baseline, cfg.sparse
    )
    return depth_k, ok_k


def _backproject_prev(state: StereoState, rig: StereoRig, cfg: StereoConfig):
    """Previous keypoints -> camera-frame 3D points + validity."""
    if cfg.dense_depth:
        return backproject_keypoints(
            state.prev.xy, state.prev_depth, rig.left, cfg.min_depth, cfg.max_depth
        )
    z = state.prev_depth
    pts = backproject_depth(state.prev.xy, z, rig.left)
    ok = state.prev_depth_ok & (z > cfg.min_depth) & (z < cfg.max_depth)
    return pts, ok


def stereo_step(
    state: StereoState,
    img_l: jax.Array,
    img_r: jax.Array,
    rig: StereoRig,
    cfg: StereoConfig,
    frontend: FrontendFns,
    fparams,
) -> tuple[StereoState, StereoStepOut]:
    feats = frontend.extract(fparams, img_l)
    depth_rec, depth_rec_ok = _depth_state(feats, img_l, img_r, rig, cfg)

    matches = frontend.match(fparams, state.prev, feats, img_l.shape)
    mask = matches >= 0
    idx = jnp.where(mask, matches, 0)

    # back-project matched *previous* keypoints through the previous
    # frame's stereo depth (stereo_slam.py:274-288)
    pts3d, depth_ok = _backproject_prev(state, rig, cfg)
    valid = mask & depth_ok & state.prev.valid
    obs = feats.xy[idx]  # current-frame pixel observations

    key, sub = jax.random.split(state.key)
    pnp = solve_pnp_ransac(
        pts3d,
        obs,
        valid,
        rig.left,
        sub,
        reproj_threshold=cfg.reproj_threshold_px,
        n_hypotheses=cfg.n_hypotheses,
        min_inliers=cfg.min_points,
        refine_iters=cfg.refine_iters,
    )
    ok = pnp.ok & (jnp.sum(valid) >= cfg.min_points)
    rel = se3_matrix(pnp.R, pnp.t)
    if cfg.compose_mode == "odometry":
        rel = se3_inverse(rel)
    rel = jnp.where(ok, rel, jnp.eye(4))
    cumulative = state.cumulative @ rel

    # world-frame map points (stereo_slam.py:309-314): transform the
    # previous-frame 3D points by the updated cumulative pose
    world = (
        jnp.einsum("ij,nj->ni", cumulative[:3, :3], pts3d) + cumulative[:3, 3]
    )
    map_valid = valid & ok

    new_state = StereoState(
        prev=feats,
        prev_depth=depth_rec,
        prev_depth_ok=depth_rec_ok,
        cumulative=cumulative,
        key=key,
    )
    return new_state, StereoStepOut(
        pose=cumulative,
        map_points=world,
        map_valid=map_valid,
        n_matches=jnp.sum(mask),
        n_inliers=pnp.n_inliers,
        ok=ok,
    )


@functools.partial(jax.jit, static_argnums=(3, 5))
def stereo_vo_init(
    img_l: jax.Array,
    img_r: jax.Array,
    rig: StereoRig,
    cfg: StereoConfig,
    key: jax.Array,
    frontend: FrontendFns,
    fparams,
) -> StereoState:
    """Seed the VO state from the first stereo pair."""
    first = frontend.extract(fparams, img_l)
    first_depth, first_ok = _depth_state(first, img_l, img_r, rig, cfg)
    return StereoState(
        prev=first,
        prev_depth=first_depth,
        prev_depth_ok=first_ok,
        cumulative=jnp.eye(4),
        key=key,
    )


@functools.partial(jax.jit, static_argnums=(4, 5))
def run_stereo_vo_chunk(
    state: StereoState,
    images_l: jax.Array,
    images_r: jax.Array,
    rig: StereoRig,
    cfg: StereoConfig,
    frontend: FrontendFns,
    fparams,
) -> tuple[StereoState, StereoStepOut]:
    """Advance VO over a chunk of (C, H, W) pairs, carrying state across
    chunks — the streaming form used for long sequences so only one chunk
    of frames is resident in HBM at a time."""

    def step(state, pair):
        return stereo_step(state, pair[0], pair[1], rig, cfg, frontend, fparams)

    return jax.lax.scan(step, state, jnp.stack([images_l, images_r], axis=1))


def run_stereo_vo_scan(
    images_l: jax.Array,
    images_r: jax.Array,
    rig: StereoRig,
    cfg: StereoConfig,
    key: jax.Array,
    frontend: FrontendFns,
    fparams,
) -> StereoStepOut:
    """Stereo VO over device-resident stacks (N, H, W) x2. Outputs stacked
    per-frame results for frames 1..N-1."""
    state = stereo_vo_init(
        images_l[0], images_r[0], rig, cfg, key, frontend, fparams
    )
    _, outs = run_stereo_vo_chunk(
        state, images_l[1:], images_r[1:], rig, cfg, frontend, fparams
    )
    return outs


def run_stereo_vo(
    images_l,
    images_r,
    timestamps,
    rig: StereoRig,
    cfg: StereoConfig = StereoConfig(),
    seed: int = 0,
    frontend: FrontendFns | None = None,
    fparams=None,
) -> tuple[Trajectory, StereoStepOut]:
    """Host entry point: trajectory (frames 1..N-1) + per-frame outputs.
    Default front-end is ORB; pass ``frontend=learned_frontend(fe),
    fparams=weights`` for SP+SG."""
    if frontend is None:
        frontend = orb_frontend(cfg.orb, cfg.max_match_distance)
    images_l = jnp.asarray(images_l, jnp.float32)
    images_r = jnp.asarray(images_r, jnp.float32)
    outs = run_stereo_vo_scan(
        images_l, images_r, rig, cfg, jax.random.PRNGKey(seed), frontend, fparams
    )
    poses = np.asarray(outs.pose, np.float64)
    traj = Trajectory.from_matrices(np.asarray(timestamps)[1:], poses)
    return traj, outs

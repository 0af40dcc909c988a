"""Monocular visual odometry pipeline.

TPU-native rebuild of the reference's ``mono_slam.py`` main loop
(mono_slam.py:85-139): per frame — feature extraction, matching against the
previous frame, essential-matrix RANSAC, ``recoverPose``, and cumulative
SE(3) chaining. Architectural differences (SURVEY.md §7.1):

- the frame loop is a ``lax.scan`` over a device-resident image stack with a
  pure ``MonoState`` pytree (prev features + cumulative pose) instead of
  Python globals — one compiled program for the whole sequence, no per-frame
  dispatch;
- keypoints/matches are fixed-shape masked tensors;
- the classical front-end is our ORB (the reference's commented alternative,
  stereo_slam.py:83-85); the learned front-end plugs into the same step via
  the shared ``matches0`` contract.

Composition convention: ``compose_mode='parity'`` reproduces the reference
exactly — ``cumulative @= [R|t]`` with the point-transform (not camera-pose)
relative matrix and unit-norm translation (mono scale ambiguity, quirk B6).
``'odometry'`` composes the proper camera pose ``cumulative @= inv([R|t])``.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from forest_slam_tpu.core.camera import PinholeCamera
from forest_slam_tpu.core.lie import se3_compose, se3_matrix, se3_inverse
from forest_slam_tpu.frontend import OrbConfig
from forest_slam_tpu.frontend.base import FrontendFns, orb_frontend
from forest_slam_tpu.geometry import estimate_relative_pose
from forest_slam_tpu.io.tum import Trajectory


class MonoConfig(NamedTuple):
    orb: OrbConfig = OrbConfig()
    ransac_threshold_px: float = 1.0  # mono_slam.py:111 threshold=1.0
    n_hypotheses: int = 1024
    max_match_distance: int = 64
    refine_iters: int = 8
    compose_mode: str = "parity"
    min_matches: int = 8
    # Essential minimal solver: "8pt" (linear), "5pt" (Nister — the
    # reference's cv2.findEssentialMat IS a 5-point RANSAC,
    # mono_slam.py:111 — survives planar-dominant scenes where the
    # 8-point system degenerates; geometry/fivepoint.py), or "auto"
    # (default): 5pt under compose_mode="parity" (reference semantics,
    # VERDICT r3 #7), 8pt under "odometry" (the speed option; measured
    # throughput delta recorded in BASELINE.md).
    minimal: str = "auto"


def _resolve_minimal(cfg: "MonoConfig") -> str:
    if cfg.minimal != "auto":
        return cfg.minimal
    return "5pt" if cfg.compose_mode == "parity" else "8pt"


class MonoState(NamedTuple):
    prev: Any  # previous-frame features (front-end specific pytree)
    cumulative: jax.Array  # (4, 4)
    key: jax.Array


class MonoStepOut(NamedTuple):
    pose: jax.Array  # (4, 4) cumulative
    n_matches: jax.Array
    n_inliers: jax.Array
    ok: jax.Array


def _normalize(xy: jax.Array, cam: PinholeCamera) -> jax.Array:
    return (xy - jnp.stack([cam.cx, cam.cy])) / jnp.stack([cam.fx, cam.fy])


def mono_step(
    state: MonoState,
    image: jax.Array,
    cam: PinholeCamera,
    cfg: MonoConfig,
    frontend: FrontendFns,
    fparams,
) -> tuple[MonoState, MonoStepOut]:
    """One VO step: image (H, W) float32 grayscale, already undistorted."""
    feats = frontend.extract(fparams, image)
    matches = frontend.match(fparams, state.prev, feats, image.shape)
    mask = matches >= 0
    idx = jnp.where(mask, matches, 0)
    x0 = _normalize(state.prev.xy, cam)
    x1 = _normalize(feats.xy[idx], cam)

    key, sub = jax.random.split(state.key)
    rel_pose = estimate_relative_pose(
        x0,
        x1,
        mask,
        sub,
        threshold=cfg.ransac_threshold_px / cam.fx,
        n_hypotheses=cfg.n_hypotheses,
        refine_iters=cfg.refine_iters,
        minimal=_resolve_minimal(cfg),
    )
    ok = rel_pose.ok & (jnp.sum(mask) >= cfg.min_matches)
    rel = se3_matrix(rel_pose.R, rel_pose.t)
    if cfg.compose_mode == "odometry":
        rel = se3_inverse(rel)
    rel = jnp.where(ok, rel, jnp.eye(4))
    cumulative = se3_compose(state.cumulative, rel)
    new_state = MonoState(prev=feats, cumulative=cumulative, key=key)
    return new_state, MonoStepOut(
        pose=cumulative,
        n_matches=jnp.sum(mask),
        n_inliers=rel_pose.n_inliers,
        ok=ok,
    )


@functools.partial(jax.jit, static_argnums=(2, 4))
def run_mono_vo_scan(
    images: jax.Array,
    cam: PinholeCamera,
    cfg: MonoConfig,
    key: jax.Array,
    frontend: FrontendFns,
    fparams,
) -> MonoStepOut:
    """VO over a device-resident stack (N, H, W). Returns per-frame outputs
    for frames 1..N-1 stacked (the first frame only seeds the state)."""
    first = frontend.extract(fparams, images[0])
    init = MonoState(prev=first, cumulative=jnp.eye(4), key=key)

    def step(state, image):
        return mono_step(state, image, cam, cfg, frontend, fparams)

    _, outs = jax.lax.scan(step, init, images[1:])
    return outs


# --------------------------------------------------------------------------
# Batched (frame-parallel) runner — mirrors pipelines/stereo.py: extraction
# and pair estimation are frame-independent, only chaining is sequential
# --------------------------------------------------------------------------


class MonoPair(NamedTuple):
    rel: jax.Array  # (4, 4) gated relative transform
    ok: jax.Array
    n_matches: jax.Array
    n_inliers: jax.Array


def _mono_pair(prev_feats, cur_feats, key, cam, cfg: MonoConfig,
               frontend: FrontendFns, fparams, image_shape) -> MonoPair:
    matches = frontend.match(fparams, prev_feats, cur_feats, image_shape)
    mask = matches >= 0
    idx = jnp.where(mask, matches, 0)
    x0 = _normalize(prev_feats.xy, cam)
    x1 = _normalize(cur_feats.xy[idx], cam)
    rel_pose = estimate_relative_pose(
        x0, x1, mask, key,
        threshold=cfg.ransac_threshold_px / cam.fx,
        n_hypotheses=cfg.n_hypotheses,
        refine_iters=cfg.refine_iters,
        minimal=_resolve_minimal(cfg),
    )
    ok = rel_pose.ok & (jnp.sum(mask) >= cfg.min_matches)
    rel = se3_matrix(rel_pose.R, rel_pose.t)
    if cfg.compose_mode == "odometry":
        rel = se3_inverse(rel)
    rel = jnp.where(ok, rel, jnp.eye(4))
    return MonoPair(
        rel=rel, ok=ok, n_matches=jnp.sum(mask), n_inliers=rel_pose.n_inliers
    )


@functools.partial(jax.jit, static_argnums=(1,))
def _mono_extract_chunk(images, frontend, fparams):
    return jax.vmap(lambda im: frontend.extract(fparams, im))(images)


def _tree_slice_pad(tree, start: int, size: int):
    def take(a):
        n = a.shape[0]
        idx = jnp.minimum(jnp.arange(start, start + size), n - 1)
        return a[idx]

    return jax.tree.map(take, tree)


@functools.partial(jax.jit, static_argnums=(4, 5, 7))
def _mono_pairs(prev_feats, cur_feats, keys, cam, cfg, frontend, fparams,
                image_shape) -> MonoPair:
    return jax.vmap(
        lambda p, c, k: _mono_pair(
            p, c, k, cam, cfg, frontend, fparams, image_shape
        )
    )(prev_feats, cur_feats, keys)


def run_mono_vo_batched(
    images: jax.Array,
    cam: PinholeCamera,
    cfg: MonoConfig,
    key: jax.Array,
    frontend: FrontendFns,
    fparams,
    frame_chunk: int = 32,
    pair_chunk: int = 64,
) -> MonoStepOut:
    """Frame-parallel mono VO; same outputs as run_mono_vo_scan."""
    from forest_slam_tpu.core.lie import se3_chain

    n = int(images.shape[0])
    n_pairs = n - 1
    image_shape = tuple(images.shape[1:])

    chunks = []
    for s in range(0, n, frame_chunk):
        chunk = _tree_slice_pad(images, s, frame_chunk)
        chunks.append(_mono_extract_chunk(chunk, frontend, fparams))
    feats = jax.tree.map(lambda *xs: jnp.concatenate(xs)[:n], *chunks)

    keys = jax.random.split(key, n_pairs)
    prev_all = jax.tree.map(lambda a: a[: n - 1], feats)
    cur_all = jax.tree.map(lambda a: a[1:], feats)
    outs = []
    for s in range(0, n_pairs, pair_chunk):
        p = _tree_slice_pad(prev_all, s, pair_chunk)
        c = _tree_slice_pad(cur_all, s, pair_chunk)
        k = _tree_slice_pad(keys, s, pair_chunk)
        outs.append(_mono_pairs(p, c, k, cam, cfg, frontend, fparams, image_shape))
    pairs = jax.tree.map(lambda *xs: jnp.concatenate(xs)[:n_pairs], *outs)

    cums = se3_chain(pairs.rel)
    return MonoStepOut(
        pose=cums,
        n_matches=pairs.n_matches,
        n_inliers=pairs.n_inliers,
        ok=pairs.ok,
    )


def run_mono_vo(
    images,
    timestamps,
    cam: PinholeCamera,
    cfg: MonoConfig = MonoConfig(),
    seed: int = 0,
    frontend: FrontendFns | None = None,
    fparams=None,
    mode: str = "batched",
) -> tuple[Trajectory, MonoStepOut]:
    """Host entry point: run VO and return a TUM trajectory (frames 1..N-1,
    like the reference, which appends poses once a previous frame exists,
    mono_slam.py:98,138). Default front-end is ORB; pass
    ``frontend=learned_frontend(fe), fparams=weights`` for SP+SG.
    ``mode``: "batched" (frame-parallel) or "scan" (sequential)."""
    if frontend is None:
        frontend = orb_frontend(cfg.orb, cfg.max_match_distance)
    images = jnp.asarray(images, jnp.float32)
    if mode == "batched":
        outs = run_mono_vo_batched(
            images, cam, cfg, jax.random.PRNGKey(seed), frontend, fparams
        )
    else:
        outs = run_mono_vo_scan(
            images, cam, cfg, jax.random.PRNGKey(seed), frontend, fparams
        )
    poses = np.asarray(outs.pose, np.float64)
    traj = Trajectory.from_matrices(np.asarray(timestamps)[1:], poses)
    return traj, outs

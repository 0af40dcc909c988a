"""Loop-closure detection for the stereo SLAM pipeline (BASELINE config 5).

Beyond the reference (pure odometry, SURVEY.md §0). Two stages, both
fixed-shape and batched:

1. **Retrieval**: every keyframe gets a global signature — the L2-normalized
   mean of its keypoint descriptors (bit-unpacked for ORB's packed uint32
   descriptors, used as-is for float descriptors). All-pairs similarity is
   ONE keyframe x keyframe matmul on the MXU; candidate pairs are the top-C
   entries of the masked similarity (enforcing a minimum temporal
   separation), a static-shape ``top_k``.
2. **Geometric verification**: for each candidate (i, j), match keyframe
   descriptors with the pipeline's own front-end matcher and run
   PnP-RANSAC with keyframe i's stored per-keypoint stereo depths against
   keyframe j's pixels — exactly the VO pair estimator, vmapped over all C
   candidates at once. Survivors become SE(3) edges for
   backend/pose_graph.py, weighted by inlier count.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from forest_slam_tpu.core.camera import PinholeCamera, backproject_depth
from forest_slam_tpu.core.lie import se3_inverse, se3_matrix
from forest_slam_tpu.geometry import solve_pnp_ransac


class LoopClosureConfig(NamedTuple):
    max_candidates: int = 8  # verified edges (static shape)
    min_separation: int = 20  # minimum keyframe index distance
    min_similarity: float = 0.8  # signature cosine gate
    min_inliers: int = 40  # PnP consensus required to accept a loop
    min_inlier_ratio: float = 0.3  # of the matched+depth-valid set
    reproj_px: float = 2.0
    n_hypotheses: int = 512
    min_depth: float = 0.1
    max_depth: float = 1000.0


def descriptor_signature(desc: jax.Array, valid: jax.Array) -> jax.Array:
    """(K, ...) descriptors + (K,) validity -> L2-normalized signature.

    ORB's packed (K, 8) uint32 descriptors are unpacked to 256 bits in
    {-1, +1}; float descriptors (e.g. SuperPoint's (K, D)) are used as-is.
    """
    if jnp.issubdtype(desc.dtype, jnp.unsignedinteger):
        shifts = jnp.arange(32, dtype=jnp.uint32)
        bits = (desc[..., None] >> shifts) & jnp.uint32(1)  # (K, 8, 32)
        d = bits.reshape(desc.shape[0], -1).astype(jnp.float32) * 2.0 - 1.0
    else:
        d = desc.astype(jnp.float32)
    vf = valid.astype(jnp.float32)[:, None]
    mean = jnp.sum(d * vf, axis=0) / jnp.maximum(jnp.sum(vf), 1.0)
    return mean / jnp.maximum(jnp.linalg.norm(mean), 1e-9)


def detect_loop_candidates(
    signatures: jax.Array, cfg: LoopClosureConfig
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(N, D) signatures -> (C, 2) candidate index pairs (i < j), their
    similarities, and a (C,) proposal mask (similarity + separation gates).
    """
    N = signatures.shape[0]
    sim = signatures @ signatures.T  # (N, N) one MXU matmul
    ii = jnp.arange(N)[:, None]
    jj = jnp.arange(N)[None, :]
    ok = (jj - ii) >= cfg.min_separation  # upper triangle, separated
    sim = jnp.where(ok, sim, -jnp.inf)
    C = min(cfg.max_candidates, N * N)
    vals, flat = jax.lax.top_k(sim.reshape(-1), C)
    pairs = jnp.stack([flat // N, flat % N], axis=1).astype(jnp.int32)
    mask = jnp.isfinite(vals) & (vals >= cfg.min_similarity)
    return pairs, vals, mask


def verify_loops(
    pairs: jax.Array,
    proposal_mask: jax.Array,
    kf_feats: Any,
    kf_z: jax.Array,
    kf_z_ok: jax.Array,
    cam: PinholeCamera,
    key: jax.Array,
    frontend,
    fparams,
    image_shape,
    cfg: LoopClosureConfig,
):
    """Geometric verification of candidate pairs.

    Returns (edge_T (C, 4, 4) measured Z_ij = T_i^-1 @ T_j, n_inliers (C,),
    accepted (C,)). ``kf_feats`` is the keyframes' feature pytree (leading
    axis = keyframe), ``kf_z``/``kf_z_ok`` their per-keypoint stereo depths.
    """
    keys = jax.random.split(key, pairs.shape[0])

    def one(pair, k):
        i, j = pair[0], pair[1]
        fi = jax.tree.map(lambda a: a[i], kf_feats)
        fj = jax.tree.map(lambda a: a[j], kf_feats)
        matches = frontend.match(fparams, fi, fj, image_shape)
        mask = matches >= 0
        idx = jnp.where(mask, matches, 0)
        z = kf_z[i]
        valid = (
            mask
            & fi.valid
            & kf_z_ok[i]
            & (z > cfg.min_depth)
            & (z < cfg.max_depth)
        )
        pts3d = backproject_depth(fi.xy, z, cam)  # keyframe-i camera frame
        obs = fj.xy[idx]
        pnp = solve_pnp_ransac(
            pts3d, obs, valid, cam, k,
            reproj_threshold=cfg.reproj_px,
            n_hypotheses=cfg.n_hypotheses,
            min_inliers=cfg.min_inliers,
        )
        n_valid = jnp.sum(valid)
        accepted = (
            pnp.ok
            & (pnp.n_inliers >= cfg.min_inliers)
            & (pnp.n_inliers >= cfg.min_inlier_ratio * jnp.maximum(n_valid, 1))
        )
        # PnP maps keyframe-i camera points into keyframe-j camera frame:
        # T_{j<-i}. The pose-graph edge convention is Z_ij = T_i^-1 @ T_j
        # (for world->camera chain poses T_wc), i.e. T_{i<-j} = inv(T_{j<-i}).
        Z = se3_inverse(se3_matrix(pnp.R, pnp.t))
        return Z, pnp.n_inliers, accepted

    Z, n_inl, acc = jax.vmap(one)(pairs, keys)
    return Z, n_inl, acc & proposal_mask

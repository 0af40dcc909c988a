"""Relocalization after tracking loss.

Beyond the reference: si220/Forest-SLAM holds the last pose when PnP
fails (and quirk B5 means it may not even notice — SURVEY.md §2.4), so a
single unmatched pair permanently offsets the remainder of the
trajectory by the lost motion. This module repairs that: every frame
whose incoming VO pair failed is re-localized *absolutely* against the
map built so far, and the correction is propagated down the chain
(frame-to-frame VO after the loss is relative-correct, so one rigid
delta fixes the whole suffix).

Mechanism (reusing the loop-closure machinery, backend/loop_closure.py):

1. **Retrieval** — global descriptor signatures (L2-normalized mean
   descriptor) for every frame, one matmul against the trusted earlier
   frames, top ``retrieval_candidates`` tried in similarity order.
2. **Verification** — the VO pair estimator itself: front-end descriptor
   matching reference→lost, PnP-RANSAC on the reference frame's
   stereo-backprojected 3D points, accepted on the same inlier-count +
   inlier-ratio gates the pipeline uses.
3. **Correction** — with camera-to-world chain poses P (compose_mode
   ``"odometry"``), a verified T_{c<-r} gives P_c' = P_r @ T^{-1}; the
   rigid delta P_c' @ P_c^{-1} left-multiplies every pose from c on.

Trust bookkeeping: frames downstream of an *unrepaired* loss are never
used as retrieval references (their absolute pose is offset); a
successful relocalization restores trust for the suffix. A frame whose
own image is corrupted simply fails verification against every
candidate and the walk moves on to the next lost pair — where the
now-sharp frame relocalizes against the pre-loss map.

The event walk is host-side (a handful of events per sequence, outside
the hot loop); retrieval and verification are fixed-shape jitted calls
reused across events.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from forest_slam_tpu.backend.loop_closure import descriptor_signature
from forest_slam_tpu.core.camera import PinholeCamera, backproject_depth
from forest_slam_tpu.core.lie import se3_inverse, se3_matrix
from forest_slam_tpu.geometry import solve_pnp_ransac


class RelocalizeConfig(NamedTuple):
    retrieval_candidates: int = 4  # reference frames tried per lost frame
    min_similarity: float = 0.5  # signature cosine gate on candidates
    min_inliers: int = 25  # PnP consensus to accept a relocalization
    min_inlier_ratio: float = 0.2  # of the matched+depth-valid set
    reproj_px: float = 2.0
    n_hypotheses: int = 512
    min_depth: float = 0.1
    max_depth: float = 1000.0


class RelocalizeEvents(NamedTuple):
    """Outcome record (numpy, host-side): one row per repaired frame."""

    frame: np.ndarray  # (E,) relocalized frame index
    reference: np.ndarray  # (E,) reference frame it localized against
    n_inliers: np.ndarray  # (E,)
    n_lost: int  # lost pairs encountered
    n_repaired: int  # lost pairs repaired (== E)


def _make_verifier(frontend, cam: PinholeCamera, image_shape, cfg: RelocalizeConfig):
    """One jitted (ref-frame, lost-frame) → (T_{c<-r}, n_inliers, accepted)."""

    def verify(fparams, fr, zr, zokr, fc, key):
        matches = frontend.match(fparams, fr, fc, image_shape)
        mask = matches >= 0
        idx = jnp.where(mask, matches, 0)
        valid = (
            mask
            & fr.valid
            & zokr
            & (zr > cfg.min_depth)
            & (zr < cfg.max_depth)
        )
        pts3d = backproject_depth(fr.xy, zr, cam)  # reference camera frame
        obs = fc.xy[idx]
        pnp = solve_pnp_ransac(
            pts3d, obs, valid, cam, key,
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
        return se3_matrix(pnp.R, pnp.t), pnp.n_inliers, accepted

    return jax.jit(verify)


def relocalize_trajectory(
    poses,
    ok,
    art,
    cam: PinholeCamera,
    key: jax.Array,
    frontend,
    fparams,
    image_shape,
    cfg: RelocalizeConfig = RelocalizeConfig(),
) -> tuple[np.ndarray, RelocalizeEvents]:
    """Repair a VO chain around tracking losses.

    Args:
      poses: (N-1, 4, 4) cumulative camera-to-world poses for frames
        1..N-1 (``compose_mode="odometry"`` chains; the reference-parity
        composition is not a rigid world pose and cannot be corrected
        this way).
      ok: (N-1,) per-pair VO success flags.
      art: StereoArtifacts from the batched runner (needs ``feats`` with
        descriptors, ``z``/``z_ok``).

    Returns (corrected (N-1, 4, 4) float64 numpy poses, RelocalizeEvents).
    """
    ok = np.asarray(ok, bool)
    n_pairs = int(ok.shape[0])
    N = n_pairs + 1
    # full chain incl. frame 0 at identity
    P = np.concatenate(
        [np.eye(4)[None], np.asarray(poses, np.float64)], axis=0
    )
    if ok.all():
        return P[1:], RelocalizeEvents(
            frame=np.zeros((0,), np.int64),
            reference=np.zeros((0,), np.int64),
            n_inliers=np.zeros((0,), np.int64),
            n_lost=0,
            n_repaired=0,
        )

    sigs = jax.vmap(descriptor_signature)(art.feats.desc, art.feats.valid)
    sigs = np.asarray(sigs)
    verify = _make_verifier(frontend, cam, image_shape, cfg)

    # frames not touching any failed pair have reliable features AND a
    # pose that is correct relative to their trust segment
    clean = np.ones(N, bool)
    clean[1:] &= ok  # incoming pair succeeded
    clean[:-1] &= ok  # outgoing pair succeeded
    trusted = np.ones(N, bool)  # absolute pose not offset by an unfixed loss

    ev_frame, ev_ref, ev_inl = [], [], []
    lost_pairs = np.flatnonzero(~ok)
    for e, p in enumerate(lost_pairs):
        c = int(p) + 1  # frame whose incoming motion was lost
        trusted[c:] = False  # suffix is offset until repaired
        cand_mask = clean & trusted
        cand_mask[c:] = False
        cand = np.flatnonzero(cand_mask)
        if cand.size == 0:
            continue
        sims = sigs[cand] @ sigs[c]
        order = np.argsort(-sims)[: cfg.retrieval_candidates]
        for a, oi in enumerate(order):
            if sims[oi] < cfg.min_similarity:
                break
            r = int(cand[oi])
            fr = jax.tree.map(lambda x: x[r], art.feats)
            fc = jax.tree.map(lambda x: x[c], art.feats)
            k = jax.random.fold_in(jax.random.fold_in(key, e), a)
            T, n_inl, accepted = verify(
                fparams, fr, art.z[r], art.z_ok[r], fc, k
            )
            if not bool(accepted):
                continue
            # P_c' = P_r @ T_{c<-r}^{-1}; delta fixes the whole suffix
            P_c = P[r] @ np.asarray(se3_inverse(T), np.float64)
            delta = P_c @ np.linalg.inv(P[c])
            P[c:] = delta[None] @ P[c:]
            trusted[c:] = True
            ev_frame.append(c)
            ev_ref.append(r)
            ev_inl.append(int(n_inl))
            break

    events = RelocalizeEvents(
        frame=np.asarray(ev_frame, np.int64),
        reference=np.asarray(ev_ref, np.int64),
        n_inliers=np.asarray(ev_inl, np.int64),
        n_lost=int(lost_pairs.size),
        n_repaired=len(ev_frame),
    )
    return P[1:], events

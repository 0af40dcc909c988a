"""Sliding-window BA refinement of a VO trajectory (BASELINE config 4).

The reference is pure frame-to-frame odometry (SURVEY.md §0 — no BA); this
module implements the build plan's extension: split the sequence into
keyframe windows, build feature tracks by composing the pipeline's
frame-to-frame matches, and jointly refine the window's poses + landmarks
with the LM/Schur solver (backend/ba.py), stitching windows by re-anchoring
each one at the previous window's corrected boundary pose.

TPU-first structure: every window has the same static shape (W windows x M
frames x K landmark slots with validity masks); all windows' track tables
are composed with one vmapped index-chase and ALL windows solve in
parallel under vmap (each in its own VO coordinates — see solve_window);
only the final relative-motion chaining is a (trivial) sequential scan.

Acceptance (scripts/eval_window_ba.py, clean 960x600 corridor, 97 frames):
VO ATE 0.0218 m -> BA 0.0096 m — BA is a no-regret refinement on clean
data as well as degraded data (tests/test_window_ba.py). Getting here took
three fixes layered on round 1's "BA only helps noisy VO" state: anchor
re-matching for >=3-observation tracks (_anchor_rematch_table), a Huber
IRLS loss on the pixel residuals (BAProblem.huber_px — VO's PnP gates
inliers at 1 px, so an L2 BA on 4 px-gated tracks was strictly more
outlier-exposed than the estimate it refined), and — decisive — exact
SO(3) pose algebra: TPU f32 matmuls at default precision run as bfloat16
passes, and the accumulated ~1%-per-product error de-orthonormalized VO
rotations (measured det(R) = 0.9883 on one frame) which the transpose-
inverses here turned into ~0.5 m of phantom drift. All pose-path matmuls
now run at Precision.HIGHEST and inputs are re-rigidified on entry.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from forest_slam_tpu.backend.ba import BAProblem, ba_solve
from forest_slam_tpu.core.camera import PinholeCamera, backproject_depth, project_points
from forest_slam_tpu.core.lie import se3_compose, se3_inverse, se3_orthonormalize

_HI = jax.lax.Precision.HIGHEST


class StereoArtifacts(NamedTuple):
    """Per-frame/per-pair intermediates the batched VO runner can hand to
    the BA / loop-closure backends (all fixed-shape, K = keypoint slots)."""

    xy: jax.Array  # (N, K, 2) level-0 keypoint coords
    valid: jax.Array  # (N, K) keypoint validity
    z: jax.Array  # (N, K) per-keypoint stereo depth
    z_ok: jax.Array  # (N, K) depth validity
    matches: jax.Array  # (N-1, K) int32: frame i kpt -> frame i+1 kpt or -1
    feats: Any = None  # full per-frame feature pytree (front-end specific)


class WindowBAConfig(NamedTuple):
    window: int = 5  # keyframes per window (incl. shared anchor)
    iters: int = 8  # LM iterations per window
    gate_px: float = 4.0  # drop track observations with initial reproj error above
    gate_depth_rel: float = 0.25  # drop depth measurements off by more than this
    min_obs: int = 2  # landmark must be seen in >= this many frames
    depth_weight: float = 25.0  # see BAProblem.depth_weight
    min_depth: float = 0.1
    max_depth: float = 1000.0
    pose_prior_weight: float = 0.0  # see BAProblem.pose_prior_weight
    huber_px: float = 1.0  # see BAProblem.huber_px


def _compose_tracks(xy_w, valid_w, matches_w, z_w, z_ok_w, cfg: WindowBAConfig):
    """Track table for one window.

    Inputs are window-local: xy_w (M, K, 2), valid_w (M, K), matches_w
    (M-1, K), per-frame keypoint depths z_w (M, K) + z_ok_w (M, K).
    Landmark k = anchor keypoint k. Returns (obs (M, K, 2), mask (M, K),
    z_obs (M, K), z_mask (M, K)) — observation of landmark k in window
    frame j following match composition; dead tracks are masked.
    """
    M, K = valid_w.shape
    in_range = lambda z: (z > cfg.min_depth) & (z < cfg.max_depth)

    def step(carry, inp):
        idx, alive = carry
        m_row, xy_row, val_row, z_row, zok_row = inp
        nxt = m_row[idx]
        alive = alive & (nxt >= 0)
        idx = jnp.where(alive, nxt, 0)
        alive = alive & val_row[idx]
        zk = z_row[idx]
        return (idx, alive), (xy_row[idx], alive, zk, alive & zok_row[idx] & in_range(zk))

    idx0 = jnp.arange(K)
    z0, z0_ok = z_w[0], z_ok_w[0]
    alive0 = valid_w[0] & z0_ok & in_range(z0)
    (_, _), (obs_rest, mask_rest, z_rest, zm_rest) = jax.lax.scan(
        step,
        (idx0, alive0),
        (matches_w, xy_w[1:], valid_w[1:], z_w[1:], z_ok_w[1:]),
    )
    obs = jnp.concatenate([xy_w[:1], obs_rest], axis=0)  # (M, K, 2)
    mask = jnp.concatenate([alive0[None], mask_rest], axis=0)
    z_obs = jnp.concatenate([z0[None], z_rest], axis=0)
    z_mask = jnp.concatenate([alive0[None], zm_rest], axis=0)
    # a track observed in frames 0..j stays masked after its first death
    # (scan's `alive` is monotone), so mask rows are prefix-shaped already
    return obs, mask, z_obs, z_mask


def _compose_tracks_multi(
    xy_w, valid_w, matches_w, z_w, z_ok_w, cfg: WindowBAConfig,
    include_anchor_start: bool = True,
):
    """All-starts track table for one window.

    Frame-to-frame mutual-NN matching attrites hard (measured ~25%
    survival per hop), so anchoring landmarks only at the window's first
    frame leaves later frames nearly unconstrained (3 obs at frame 4 in a
    5-frame window). Instead a landmark is started at EVERY frame j < M-1
    for each keypoint that is not the continuation of an existing track,
    giving each pose the full match set as constraints (2-observation
    tracks still pin relative pose thanks to the stereo depth residuals).

    Returns (obs (M, P, 2), mask (M, P), z_obs (M, P), z_mask (M, P),
    start (P,) int32, anchor_xy (P, 2), anchor_z (P,)) with P = (M-1)*K
    (or (M-2)*K with ``include_anchor_start=False``, used when the
    anchor's landmarks come from direct re-matching instead).
    """
    M, K = valid_w.shape
    # keypoints of frame j that are targets of a match from frame j-1
    # (continuations of existing tracks)
    def targeted(m_row, src_valid):
        tgt = jnp.zeros((K,), bool)
        ok = (m_row >= 0) & src_valid
        return tgt.at[jnp.where(ok, m_row, 0)].max(ok)

    tables = []
    for j in range(0 if include_anchor_start else 1, M - 1):
        # roll the window so start frame j sits at row 0, reuse the
        # single-start composer, then roll back and mask rows < j
        xy_j = jnp.roll(xy_w, -j, axis=0)
        val_j = jnp.roll(valid_w, -j, axis=0)
        z_j = jnp.roll(z_w, -j, axis=0)
        zok_j = jnp.roll(z_ok_w, -j, axis=0)
        mat_j = jnp.roll(matches_w, -j, axis=0)
        if j > 0:
            new = ~targeted(matches_w[j - 1], valid_w[j - 1])
            val_j = val_j.at[0].set(val_j[0] & new)
        obs, mask, z_obs, z_mask = _compose_tracks(
            xy_j, val_j, mat_j, z_j, zok_j, cfg
        )
        obs = jnp.roll(obs, j, axis=0)
        mask = jnp.roll(mask, j, axis=0)
        z_obs = jnp.roll(z_obs, j, axis=0)
        z_mask = jnp.roll(z_mask, j, axis=0)
        row_ok = (jnp.arange(M) >= j)[:, None]
        tables.append(
            (
                obs,
                mask & row_ok,
                z_obs,
                z_mask & row_ok,
                jnp.full((K,), j, jnp.int32),
                xy_w[j],
                z_w[j],
            )
        )
    cat = lambda i, ax: jnp.concatenate([t[i] for t in tables], axis=ax)
    return (
        cat(0, 1), cat(1, 1), cat(2, 1), cat(3, 1),
        cat(4, 0), cat(5, 0), cat(6, 0),
    )


def _anchor_rematch_table(
    feats_w, xy_w, valid_w, z_w, z_ok_w, frontend, fparams, image_shape, cfg
):
    """Direct anchor->frame-j track table for every window.

    Frame-to-frame composed tracks attrite ~25% per hop, so a 5-frame
    window's anchor landmarks rarely reach 3+ observations — the
    conditioning failure behind round 1's "BA only helps noisy VO" caveat.
    Re-matching each window's ANCHOR features directly against every other
    window frame (the matcher is already batched) gives the anchor's
    landmarks observations in all M frames with no composition loss.

    Inputs are window-sliced pytrees: feats_w (W, M, ...), xy_w
    (W, M, K, 2), etc. Returns (obs (W, M, K, 2), mask (W, M, K),
    z_obs (W, M, K), z_mask (W, M, K)).
    """
    in_range = lambda z: (z > cfg.min_depth) & (z < cfg.max_depth)
    f_anchor = jax.tree.map(lambda a: a[:, 0], feats_w)

    def one_window(fa, fw, xyw, valw, zw, zokw):
        def one_frame(fj, xyj, valj, zj, zokj):
            m = frontend.match(fparams, fa, fj, image_shape)  # (K,)
            idx = jnp.where(m >= 0, m, 0)
            ok = (m >= 0) & valj[idx]
            zk = zj[idx]
            return xyj[idx], ok, zk, ok & zokj[idx] & in_range(zk)

        obs_r, mask_r, z_r, zm_r = jax.vmap(one_frame)(
            jax.tree.map(lambda a: a[1:], fw),
            xyw[1:], valw[1:], zw[1:], zokw[1:],
        )
        alive0 = valw[0] & zokw[0] & in_range(zw[0])
        obs = jnp.concatenate([xyw[:1], obs_r], axis=0)
        mask = jnp.concatenate([alive0[None], mask_r & alive0[None]], axis=0)
        z_obs = jnp.concatenate([zw[:1], z_r], axis=0)
        z_mask = jnp.concatenate([alive0[None], zm_r & alive0[None]], axis=0)
        return obs, mask, z_obs, z_mask

    return jax.vmap(one_window)(f_anchor, feats_w, xy_w, valid_w, z_w, z_ok_w)


def refine_trajectory_ba(
    poses: jax.Array,
    artifacts: StereoArtifacts,
    cam: PinholeCamera,
    cfg: WindowBAConfig = WindowBAConfig(),
    frontend=None,
    fparams=None,
    image_shape=None,
) -> jax.Array:
    """Refine VO poses (N-1, 4, 4) T_wc for frames 1..N-1 with windowed BA.

    Returns refined (N-1, 4, 4). Frames beyond the last complete window are
    carried along rigidly with the last window's boundary correction.

    With ``frontend`` (+ its ``fparams`` and the ``image_shape`` its
    matcher expects), anchor keyframes are re-matched against every window
    frame for long, well-conditioned tracks (see _anchor_rematch_table);
    without it, tracks are composed from the VO's frame-to-frame matches
    only.
    """
    M = cfg.window
    N = artifacts.valid.shape[0]
    # re-rigidify: this module round-trips every pose through transpose-
    # inverses and relative-motion chains, which assume exact SO(3); VO
    # poses produced before the pose path moved to Precision.HIGHEST
    # carried up to 1.2% rotation scale error (det 0.9883 measured) and
    # that alone dragged a clean 0.046 m trajectory to 0.49 m here
    poses = se3_orthonormalize(poses)
    T_wc = jnp.concatenate([jnp.eye(4)[None], poses], axis=0)  # (N, 4, 4)

    stride = M - 1
    n_win = max((N - 1) // stride, 0)
    if n_win == 0:
        return poses

    starts = jnp.arange(n_win) * stride  # all fit: s + M - 1 <= N - 1
    widx = starts[:, None] + jnp.arange(M)[None, :]  # (W, M)

    xy_w = artifacts.xy[widx]  # (W, M, K, 2)
    valid_w = artifacts.valid[widx]
    match_w = artifacts.matches[starts[:, None] + jnp.arange(M - 1)[None, :]]
    z_w = artifacts.z[widx]
    z_ok_w = artifacts.z_ok[widx]
    T_w = T_wc[widx]  # (W, M, 4, 4) original VO poses

    rematch = frontend is not None and artifacts.feats is not None
    obs, mask, z_obs, z_mask, start, anchor_xy, anchor_z = jax.vmap(
        lambda a, b, c, d, e: _compose_tracks_multi(
            a, b, c, d, e, cfg, include_anchor_start=not rematch
        )
    )(xy_w, valid_w, match_w, z_w, z_ok_w)
    if rematch:
        feats_w = jax.tree.map(lambda a: a[widx], artifacts.feats)
        if image_shape is None:
            image_shape = (cam.height, cam.width)
        obs_a, mask_a, z_obs_a, z_mask_a = _anchor_rematch_table(
            feats_w, xy_w, valid_w, z_w, z_ok_w,
            frontend, fparams, image_shape, cfg,
        )
        K = valid_w.shape[-1]
        obs = jnp.concatenate([obs_a, obs], axis=2)
        mask = jnp.concatenate([mask_a, mask], axis=2)
        z_obs = jnp.concatenate([z_obs_a, z_obs], axis=2)
        z_mask = jnp.concatenate([z_mask_a, z_mask], axis=2)
        start = jnp.concatenate(
            [jnp.zeros((start.shape[0], K), jnp.int32), start], axis=1
        )
        anchor_xy = jnp.concatenate([xy_w[:, 0], anchor_xy], axis=1)
        anchor_z = jnp.concatenate([z_w[:, 0], anchor_z], axis=1)
    # require a minimum track length (observations per landmark)
    long_enough = jnp.sum(mask, axis=1) >= cfg.min_obs  # (W, P)
    mask = mask & long_enough[:, None, :]

    def solve_window(T_win, st, axy, az, obs_w, mask_w, zo_w, zm_w):
        """Refine ONE window in its own VO coordinates.

        Windows are deliberately INDEPENDENT: an earlier design re-anchored
        each window on the previous window's BA-corrected boundary pose
        inside a sequential scan, but the cm-scale boundary correction makes
        the transplanted VO relative poses inconsistent with the gated
        observations — the reprojection gate then keeps only points that
        agree with the *shifted* anchor and BA amplifies the error window
        over window (measured 0.015 -> 0.2 -> 3.5 m over three windows at
        960x600 while every window solved standalone stays within 2 cm).
        Solving in VO coordinates keeps gating consistent, and the global
        trajectory is rebuilt afterwards from refined RELATIVE motions —
        which also lets all windows solve in parallel under vmap.
        """
        # landmarks: backprojection from each track's start frame, lifted
        # to world through that frame's pose
        pts_c = backproject_depth(axy, az, cam)  # (P, 3)
        T_anchor = T_win[st]  # (P, 4, 4)
        pts_w = (
            jnp.einsum("pij,pj->pi", T_anchor[:, :3, :3], pts_c, precision=_HI)
            + T_anchor[:, :3, 3]
        )
        T_cw = jax.vmap(se3_inverse)(T_win)
        # gate observations whose initial reprojection or measured depth is
        # already wild (mutual-NN mismatches survive track composition)
        pc = (
            jnp.einsum("mij,kj->mki", T_cw[:, :3, :3], pts_w, precision=_HI)
            + T_cw[:, None, :3, 3]
        )
        proj = project_points(pc, cam, with_distortion=True)
        err0 = jnp.linalg.norm(proj - obs_w, axis=-1)
        mask_g = mask_w & (err0 < cfg.gate_px) & (pc[..., 2] > cfg.min_depth)
        rel_z = jnp.abs(pc[..., 2] - zo_w) / jnp.maximum(zo_w, 1e-6)
        zmask_g = zm_w & mask_g & (rel_z < cfg.gate_depth_rel)

        res = ba_solve(
            BAProblem(
                poses=T_cw,
                points=pts_w,
                observations=obs_w,
                mask=mask_g,
                cam=cam,
                depths=zo_w,
                depth_mask=zmask_g,
                depth_weight=cfg.depth_weight,
                pose_prior_weight=cfg.pose_prior_weight,
                huber_px=cfg.huber_px,
            ),
            iters=cfg.iters,
            fix_first=True,
        )
        T_ref = jax.vmap(se3_inverse)(res.poses)  # (M, 4, 4) T_wc refined
        # safety: fall back to the VO window if the solve went non-finite
        # or failed to reduce the masked cost
        ok = (
            jnp.all(jnp.isfinite(T_ref))
            & jnp.isfinite(res.final_cost)
            & (res.final_cost <= res.initial_cost)
        )
        return jnp.where(ok, T_ref, T_win)

    T_ref_all = jax.vmap(solve_window)(
        T_w, start, anchor_xy, anchor_z, obs, mask, z_obs, z_mask
    )  # (W, M, 4, 4)

    # rebuild the global trajectory from each window's refined RELATIVE
    # motion: T_global[s+j] = anchor_s @ inv(T_ref[0]) @ T_ref[j]
    def chain(anchor, T_ref):
        rel = jnp.einsum(
            "ij,mjk->mik", se3_inverse(T_ref[0]), T_ref, precision=_HI
        )
        out = jnp.einsum("ij,mjk->mik", anchor, rel, precision=_HI)
        return out[-1], out[1:]

    last_anchor, refined = jax.lax.scan(chain, jnp.eye(4), T_ref_all)
    refined = refined.reshape(n_win * stride, 4, 4)  # frames 1..n_win*stride

    # frames past the last window boundary: rigidly attach the VO tail to
    # the corrected boundary pose
    covered = n_win * stride  # last refined frame index
    delta_tail = se3_compose(last_anchor, se3_inverse(T_wc[covered]))
    tail = jnp.einsum(
        "ij,mjk->mik", delta_tail, T_wc[covered + 1 :], precision=_HI
    )
    return jnp.concatenate([refined, tail], axis=0)

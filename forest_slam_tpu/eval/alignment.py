"""Umeyama trajectory alignment (SE(3) or Sim(3)).

The reference evaluates trajectories with evo's "Sim(3) Umeyama alignment"
(plot titles in pose_estimation_results/, e.g. 1018_00/1018-00-Stereo-ape.png;
SURVEY.md §6). This is the closed-form least-squares similarity transform
[Umeyama 1991]. Host-side float64 numpy: alignment conditioning matters more
than speed here (a few thousand 3-vectors).
"""

from __future__ import annotations

import numpy as np

from forest_slam_tpu.io.tum import Trajectory


def umeyama_alignment(
    src: np.ndarray, dst: np.ndarray, with_scale: bool = True
) -> tuple[float, np.ndarray, np.ndarray]:
    """Least-squares ``dst ≈ s * R @ src + t``.

    Args:
        src, dst: (N, 3) corresponding points.
        with_scale: solve Sim(3) if True else SE(3) (s = 1).

    Returns:
        (s, R, t) with R (3, 3), t (3,).
    """
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    n = src.shape[0]
    if n < 3:
        raise ValueError(f"need >= 3 points for alignment, got {n}")
    mu_src = src.mean(axis=0)
    mu_dst = dst.mean(axis=0)
    src_c = src - mu_src
    dst_c = dst - mu_dst
    cov = dst_c.T @ src_c / n
    U, d, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1.0
    R = U @ S @ Vt
    if with_scale:
        var_src = (src_c ** 2).sum() / n
        s = float(np.trace(np.diag(d) @ S) / var_src)
    else:
        s = 1.0
    t = mu_dst - s * R @ mu_src
    return s, R, t


def align_trajectory(
    est: Trajectory, ref: Trajectory, with_scale: bool = True
) -> Trajectory:
    """Align ``est`` onto ``ref`` (same length, already associated)."""
    s, R, t = umeyama_alignment(est.positions, ref.positions, with_scale)
    from scipy.spatial.transform import Rotation

    pos = (s * (R @ est.positions.T)).T + t
    rot = (
        Rotation.from_matrix(R) * Rotation.from_quat(est.quaternions)
    ).as_quat()
    return Trajectory(est.timestamps.copy(), pos, rot)

"""Timestamp association between two trajectories.

Replaces the reference's per-frame ``find_closest_timestamp`` O(N) scan
(gt_localisation.py:43-51) with a vectorized O(N log M) searchsorted pass,
and replaces evo's association step for APE/RPE evaluation. Tolerates
duplicate timestamps (reference quirk B7, SURVEY.md §2.4).
"""

from __future__ import annotations

import numpy as np

from forest_slam_tpu.io.tum import Trajectory


def nearest_indices(query: np.ndarray, reference: np.ndarray) -> np.ndarray:
    """For each query stamp, index of the nearest reference stamp.

    ``reference`` must be sorted ascending (TUM files are). Vectorized
    binary search — no per-frame argmin over the full array.
    """
    idx = np.searchsorted(reference, query)
    idx = np.clip(idx, 1, len(reference) - 1)
    left = reference[idx - 1]
    right = reference[idx]
    idx -= (query - left) < (right - query)
    return idx


def associate(
    est: Trajectory,
    ref: Trajectory,
    max_diff: float = 0.01,
) -> tuple[Trajectory, Trajectory]:
    """Pair each estimated pose with the nearest reference pose.

    Pairs further apart than ``max_diff`` seconds are dropped (evo's default
    tolerance). Returns (est_matched, ref_matched) of equal length.
    """
    if len(est) == 0 or len(ref) == 0:
        empty = Trajectory(
            np.zeros(0), np.zeros((0, 3)), np.zeros((0, 4))
        )
        return empty, empty
    order = np.argsort(ref.timestamps, kind="stable")
    ref_sorted = Trajectory(
        ref.timestamps[order], ref.positions[order], ref.quaternions[order]
    )
    idx = nearest_indices(est.timestamps, ref_sorted.timestamps)
    keep = np.abs(ref_sorted.timestamps[idx] - est.timestamps) <= max_diff
    idx = idx[keep]
    est_m = Trajectory(
        est.timestamps[keep], est.positions[keep], est.quaternions[keep]
    )
    ref_m = Trajectory(
        ref_sorted.timestamps[idx],
        ref_sorted.positions[idx],
        ref_sorted.quaternions[idx],
    )
    return est_m, ref_m

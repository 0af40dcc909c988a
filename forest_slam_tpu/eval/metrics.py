"""APE / RPE trajectory metrics (evo-equivalent).

Reproduces the reference's evaluation protocol (SURVEY.md §4, §6): absolute
pose error of the translation part after Sim(3) Umeyama alignment, and
relative pose error as a point-distance error ratio over fixed path-length
deltas. The ATE table in BASELINE.md was produced with exactly this method
and matches the evo plot colorbars checked into the reference, so these
functions are regression-locked against those numbers in
tests/test_eval_reference_parity.py.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from forest_slam_tpu.eval.alignment import align_trajectory
from forest_slam_tpu.eval.association import associate
from forest_slam_tpu.io.tum import Trajectory


class ErrorStats(NamedTuple):
    rmse: float
    mean: float
    median: float
    std: float
    min: float
    max: float
    n: int

    @classmethod
    def from_errors(cls, e: np.ndarray) -> "ErrorStats":
        e = np.asarray(e, np.float64)
        if e.size == 0:
            return cls(*([float("nan")] * 6), 0)
        return cls(
            rmse=float(np.sqrt(np.mean(e ** 2))),
            mean=float(np.mean(e)),
            median=float(np.median(e)),
            std=float(np.std(e)),
            min=float(np.min(e)),
            max=float(np.max(e)),
            n=int(e.size),
        )


def ape_translation(
    est: Trajectory,
    ref: Trajectory,
    align: bool = True,
    with_scale: bool = True,
    max_diff: float = 0.01,
) -> ErrorStats:
    """Absolute (translation) pose error after association + alignment.

    Defaults reproduce the reference's plots: nearest-timestamp association
    and Sim(3) Umeyama alignment.
    """
    est_m, ref_m = associate(est, ref, max_diff=max_diff)
    if align and len(est_m) >= 3:
        est_m = align_trajectory(est_m, ref_m, with_scale=with_scale)
    err = np.linalg.norm(est_m.positions - ref_m.positions, axis=1)
    return ErrorStats.from_errors(err)


def rpe_distance_ratio(
    est: Trajectory,
    ref: Trajectory,
    delta_m: float = 20.0,
    max_diff: float = 0.01,
) -> ErrorStats:
    """Relative error as point-distance error ratio (%) over path-length
    deltas — the reference's RPE metric ("point distance error ratio (%),
    delta = 20.0 m, consecutive pairs", plot titles in
    pose_estimation_results/1018_00/).

    Pairs (i, j) are consecutive, non-overlapping segments whose accumulated
    ground-truth path length first reaches ``delta_m``. The error for a pair
    is ``| |est_j - est_i| - |ref_j - ref_i| | / |ref_j - ref_i| * 100``.
    """
    est_m, ref_m = associate(est, ref, max_diff=max_diff)
    n = len(est_m)
    if n < 2:
        return ErrorStats.from_errors(np.zeros(0))
    if n >= 3:
        # the reference's RPE plots are titled "with Sim(3) Umeyama
        # alignment" — without it a unit-scale mono trajectory is meaningless
        est_m = align_trajectory(est_m, ref_m, with_scale=True)
    # evo's filter_pairs_by_path rule (all_pairs=False, pairs from the
    # aligned ESTIMATE — evo's default --pairs_from_reference=False): walk
    # the trajectory accumulating per-frame displacement, mark an id every
    # time the accumulator reaches delta (then reset), and pair consecutive
    # marks. Note index 0 is NOT a mark, so the first partial segment is
    # dropped — matching this rule exactly reproduces the reference's
    # plotted stats (BASELINE.md RPE rows).
    seg = np.linalg.norm(np.diff(est_m.positions, axis=0), axis=1)
    ids = []
    acc = 0.0
    for i in range(1, n):
        acc += seg[i - 1]
        if acc >= delta_m:
            ids.append(i)
            acc = 0.0
    pairs = list(zip(ids[:-1], ids[1:]))
    errors = []
    for i, j in pairs:
        d_ref = np.linalg.norm(ref_m.positions[j] - ref_m.positions[i])
        d_est = np.linalg.norm(est_m.positions[j] - est_m.positions[i])
        if d_ref > 1e-9:
            errors.append(abs(d_est - d_ref) / d_ref * 100.0)
    return ErrorStats.from_errors(np.asarray(errors))


def evaluate_ate(est_path: str, ref_path: str, **kwargs) -> ErrorStats:
    """Convenience: APE translation RMSE between two TUM files."""
    from forest_slam_tpu.io.tum import read_tum

    return ape_translation(read_tum(est_path), read_tum(ref_path), **kwargs)

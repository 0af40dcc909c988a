"""Regression-lock the eval module against the reference's own numbers.

BASELINE.md's ATE table was computed from the reference's checked-in TUM
trajectories with a method that exactly reproduces the evo plot colorbars
checked into the reference repo (SURVEY.md §6). If our eval reproduces those
numbers, the whole metric stack (TUM io -> association -> Umeyama -> APE) is
validated end to end, and later SLAM pipelines can be gated on it.
"""

import os

import numpy as np
import pytest

from forest_slam_tpu.eval import ape_translation, rpe_distance_ratio
from forest_slam_tpu.io.tum import read_tum

# (sequence, estimate file, expected rmse, expected max, expected min)
ATE_TABLE = [
    ("1018_00", "SuperPoint_SuperGlue_Stereo.txt", 0.777, 2.354, 0.165),
    ("1018_00", "SuperPoint_SuperGlue_Stereo_K10.txt", 0.613, 1.551, 0.162),
    ("1018_00", "SuperPoint_SuperGlue_Stereo_K20.txt", 1.498, 3.626, 0.467),
    ("1018_00", "ORB_BF_Stereo.txt", 1.156, 2.882, 0.272),
    ("1018_00", "ORB_BF_Stereo_K10.txt", 5.842, 13.760, 1.082),
    ("1018_00", "ORB_BF_Stereo_K20.txt", 11.726, 20.860, 6.518),
    ("1018_00", "SuperPoint_SuperGlue_Mono.txt", 1.168, 3.368, 0.216),
    ("1018_13", "SuperPoint_SuperGlue_Stereo.txt", 1.924, 5.775, 0.519),
    ("1018_13", "SuperPoint_SuperGlue_Mono.txt", 3.022, 5.335, 0.221),
    ("1005_00", "SuperPoint_SuperGlue_Stereo.txt", 16.645, 41.318, 2.357),
    ("1005_01", "SuperPoint_SuperGlue_Stereo.txt", 6.100, 12.668, 0.968),
    ("1005_07", "SuperPoint_SuperGlue_Stereo.txt", 11.071, 33.286, 0.549),
    ("1006_01", "SuperPoint_SuperGlue_Stereo.txt", 6.191, 11.150, 2.156),
    ("1008_03", "SuperPoint_SuperGlue_Stereo.txt", 10.467, 19.452, 1.511),
]


def gt_file(results_dir, seq):
    return os.path.join(results_dir, seq, f"{seq}_Ground_Truth.txt")


@pytest.mark.parametrize("seq,est_file,rmse,emax,emin", ATE_TABLE)
def test_ate_matches_baseline_table(
    reference_results_dir, seq, est_file, rmse, emax, emin
):
    est = read_tum(os.path.join(reference_results_dir, seq, est_file))
    ref = read_tum(gt_file(reference_results_dir, seq))
    stats = ape_translation(est, ref, align=True, with_scale=True)
    assert stats.rmse == pytest.approx(rmse, abs=2e-3)
    assert stats.max == pytest.approx(emax, abs=2e-3)
    assert stats.min == pytest.approx(emin, abs=2e-3)


def test_rpe_matches_reference_plots(reference_results_dir):
    """RPE parity: reproducing evo's exact pair-selection rule
    (filter_pairs_by_path on the aligned estimate, first partial segment
    dropped) recovers the stat lines printed on the reference's checked-in
    RPE plots (BASELINE.md: stereo rmse ~2.4 / mean ~1.65 / median ~0.8,
    mono ~5.0 / ~4.35 / ~5.8)."""
    gt = read_tum(gt_file(reference_results_dir, "1018_00"))
    stereo = read_tum(
        os.path.join(
            reference_results_dir, "1018_00", "SuperPoint_SuperGlue_Stereo.txt"
        )
    )
    mono = read_tum(
        os.path.join(
            reference_results_dir, "1018_00", "SuperPoint_SuperGlue_Mono.txt"
        )
    )
    s = rpe_distance_ratio(stereo, gt, delta_m=20.0)
    m = rpe_distance_ratio(mono, gt, delta_m=20.0)
    assert s.n > 3 and m.n > 3
    assert s.rmse < m.rmse
    assert s.rmse == pytest.approx(2.40, abs=0.1)
    assert s.mean == pytest.approx(1.66, abs=0.1)
    assert s.median == pytest.approx(0.82, abs=0.1)
    assert m.rmse == pytest.approx(5.00, abs=0.15)
    assert m.mean == pytest.approx(4.37, abs=0.15)
    assert m.median == pytest.approx(5.82, abs=0.15)

"""Plot sinks: reproduce the reference's evo plot set from TUM files."""

import os

import numpy as np
import pytest

from forest_slam_tpu.cli import main
from forest_slam_tpu.eval.plots import (
    plot_ape_colormap,
    plot_speeds,
    plot_trajectory_overlay,
    plot_xyz,
)
from forest_slam_tpu.io.tum import read_tum


def test_plot_cli_on_reference_goldens(reference_results_dir, tmp_path):
    base = os.path.join(reference_results_dir, "1018_00")
    rc = main(
        [
            "plot",
            "--est", os.path.join(base, "SuperPoint_SuperGlue_Stereo.txt"),
            "--gt", os.path.join(base, "1018_00_Ground_Truth.txt"),
            "--out-dir", str(tmp_path),
            "--prefix", "stereo-",
        ]
    )
    assert rc == 0
    for name in ["traj", "ape", "xyz", "speeds"]:
        p = tmp_path / f"stereo-{name}.png"
        assert p.exists() and p.stat().st_size > 5000, name


def test_ape_colormap_stats_match_eval(reference_results_dir, tmp_path):
    base = os.path.join(reference_results_dir, "1018_00")
    est = read_tum(os.path.join(base, "SuperPoint_SuperGlue_Stereo.txt"))
    gt = read_tum(os.path.join(base, "1018_00_Ground_Truth.txt"))
    stats = plot_ape_colormap(str(tmp_path / "ape.png"), est, gt)
    # BASELINE.md row: ATE RMSE 0.777, max 2.354, min 0.165
    assert abs(stats["rmse"] - 0.777) < 2e-3
    assert abs(stats["max"] - 2.354) < 2e-3
    assert abs(stats["min"] - 0.165) < 2e-3


def test_plot_helpers_on_synthetic(tmp_path):
    from forest_slam_tpu.io.tum import Trajectory

    ts = np.arange(50) * 0.1
    mats = np.tile(np.eye(4), (50, 1, 1))
    mats[:, 0, 3] = np.linspace(0, 5, 50)
    mats[:, 2, 3] = np.sin(np.linspace(0, 3, 50))
    gt = Trajectory.from_matrices(ts, mats)
    est_m = mats.copy()
    est_m[:, 0, 3] += np.random.default_rng(0).normal(0, 0.05, 50)
    est = Trajectory.from_matrices(ts, est_m)
    plot_trajectory_overlay(str(tmp_path / "t.png"), est, gt)
    plot_xyz(str(tmp_path / "x.png"), est, gt)
    plot_speeds(str(tmp_path / "s.png"), {"est": est}, gt=gt)
    for f in ["t.png", "x.png", "s.png"]:
        assert (tmp_path / f).exists()


def test_plot_matches_sink(tmp_path):
    from forest_slam_tpu.eval.plots import plot_matches

    rng = np.random.default_rng(1)
    img0 = rng.integers(0, 255, (60, 80)).astype(np.float32)
    img1 = rng.integers(0, 255, (60, 80)).astype(np.float32)
    K = 32
    xy0 = rng.uniform([0, 0], [80, 60], (K, 2))
    xy1 = rng.uniform([0, 0], [80, 60], (K, 2))
    matches0 = np.full(K, -1, np.int32)
    matches0[:10] = np.arange(10)
    valid0 = np.ones(K, bool)
    valid0[-4:] = False
    refined = xy1 + 1.5
    p = tmp_path / "m.png"
    stats = plot_matches(
        str(p), img0, img1, xy0, xy1, matches0=matches0,
        valid0=valid0, xy1_refined=refined, title="t",
    )
    assert p.exists() and p.stat().st_size > 5000
    assert stats["n_matches"] == 10
    assert stats["n_kpts0"] == K - 4


def test_debug_matches_cli_flag(tmp_path):
    out = tmp_path / "traj.txt"
    dbg = tmp_path / "dbg"
    rc = main(
        [
            "stereo", "--synthetic", "6", "--out", str(out),
            "--debug-matches", str(dbg), "--compose-mode", "odometry",
        ]
    )
    assert rc == 0
    pngs = list(dbg.glob("matches_*.png"))
    assert len(pngs) >= 1
    assert all(p.stat().st_size > 5000 for p in pngs)

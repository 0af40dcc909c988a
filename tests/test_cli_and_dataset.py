"""CLI + bag-backed dataset + GT tooling, end to end on synthetic bags."""

import json
import os

import numpy as np
import pytest

from forest_slam_tpu.io.rosbag import BagWriter
from forest_slam_tpu.cli import main as cli_main


@pytest.fixture(scope="module")
def stereo_bag(tmp_path_factory):
    """A small stereo bag rendered from the synthetic corridor, plus GT
    odometry and lidar scans — a miniature BotanicGarden."""
    from scipy.spatial.transform import Rotation

    from forest_slam_tpu.io.synthetic import render_sequence

    rng = np.random.default_rng(0)
    seq = render_sequence(n_frames=8, height=120, width=160, seed=21, speed=0.3)
    path = str(tmp_path_factory.mktemp("bags") / "mini.bag")
    w = BagWriter(path)
    T = np.asarray(seq.T_world_cam, np.float64)
    for i in range(8):
        t = float(seq.timestamps[i])
        il = np.asarray(seq.images_left[i]).astype(np.uint8)
        ir = np.asarray(seq.images_right[i]).astype(np.uint8)
        # store as bgr8 to exercise the color -> gray path
        il3 = np.repeat(il[:, :, None], 3, axis=2)
        ir3 = np.repeat(ir[:, :, None], 3, axis=2)
        w.write("/dalsa_rgb/left/image_raw", "sensor_msgs/Image",
                BagWriter.encode_image(il3, t, "bgr8"), t)
        w.write("/dalsa_rgb/right/image_raw", "sensor_msgs/Image",
                BagWriter.encode_image(ir3, t, "bgr8"), t)
        q = Rotation.from_matrix(T[i, :3, :3]).as_quat()
        w.write("/gt_poses", "nav_msgs/Odometry",
                BagWriter.encode_odometry(T[i, :3, 3], q, t), t)
        pts = rng.uniform(-5, 5, size=(200, 3)).astype(np.float32)
        w.write("/velodyne_points", "sensor_msgs/PointCloud2",
                BagWriter.encode_pointcloud2(pts, t), t)
    w.close()
    return path, seq


def test_load_stereo_from_bag(stereo_bag):
    from forest_slam_tpu.io.dataset import load_stereo_from_bag
    from forest_slam_tpu.io.synthetic import default_rig

    path, seq = stereo_bag
    rig = default_rig(120, 160)  # zero distortion: undistort = identity
    loaded = load_stereo_from_bag(path, rig)
    assert loaded.images_left.shape == (8, 120, 160)
    # gray(bgr of replicated gray) == original; undistort identity
    orig = np.asarray(seq.images_left[0]).astype(np.uint8).astype(np.float32)
    got = np.asarray(loaded.images_left[0])
    assert np.abs(got[2:-2, 2:-2] - orig[2:-2, 2:-2]).max() < 1.0


def test_frame_stride(stereo_bag):
    from forest_slam_tpu.io.dataset import load_stereo_from_bag
    from forest_slam_tpu.io.synthetic import default_rig

    path, _ = stereo_bag
    loaded = load_stereo_from_bag(path, default_rig(120, 160), frame_stride=2)
    assert loaded.images_left.shape[0] == 4
    np.testing.assert_allclose(np.diff(loaded.timestamps), 0.2, atol=1e-6)


def test_gt_trajectory_extraction(stereo_bag, tmp_path):
    from forest_slam_tpu.eval.groundtruth import extract_gt_trajectory

    path, seq = stereo_bag
    traj = extract_gt_trajectory(path, T_cam_sensor=np.eye(4))
    assert len(traj) == 7  # from the second frame, like the reference
    T = np.asarray(seq.T_world_cam, np.float64)
    np.testing.assert_allclose(traj.positions, T[1:, :3, 3], atol=1e-5)


def test_gt_map_extraction(stereo_bag):
    from forest_slam_tpu.eval.groundtruth import extract_gt_map

    path, _ = stereo_bag
    cloud = extract_gt_map(path, scan_stride=2, voxel_size=0.5)
    assert cloud.shape[0] > 100
    assert np.isfinite(cloud).all()


def test_cli_stereo_synthetic_and_eval(tmp_path, capsys):
    out = str(tmp_path / "est.txt")
    ply = str(tmp_path / "map.ply")
    rc = cli_main([
        "stereo", "--synthetic", "6", "--out", out, "--map-out", ply,
        "--compose-mode", "odometry",
    ])
    assert rc == 0
    assert os.path.exists(out) and os.path.exists(ply)

    # build GT TUM and evaluate via the CLI
    from forest_slam_tpu.io.synthetic import render_sequence
    from forest_slam_tpu.io.tum import Trajectory, write_tum

    seq = render_sequence(6, height=160, width=224, seed=0)
    gt = str(tmp_path / "gt.txt")
    write_tum(gt, Trajectory.from_matrices(
        seq.timestamps, np.asarray(seq.T_world_cam, np.float64)))
    capsys.readouterr()  # drop the stereo command's prints
    rc = cli_main(["eval", "--est", out, "--gt", gt, "--no-scale"])
    assert rc == 0
    payload = json.loads(capsys.readouterr().out)
    assert "ape" in payload
    assert payload["ape"]["rmse"] < 0.5


def test_cli_mono_bag(stereo_bag, tmp_path):
    path, _ = stereo_bag
    out = str(tmp_path / "mono.txt")
    # zero-distortion cam needed for the synthetic bag -> monkeypatch via
    # synthetic rig is not exposed; instead run with max-frames on the
    # BotanicGarden calibration: undistortion of an already-ideal image
    # shifts pixels, but the pipeline must still run end to end.
    rc = cli_main([
        "mono", "--bag", path, "--out", out, "--max-frames", "4",
        "--compose-mode", "odometry",
    ])
    assert rc == 0
    assert os.path.exists(out)


def test_cli_wide_baseline_preset():
    """--wide-baseline maps to the validated K=20 StereoConfig preset."""
    from forest_slam_tpu.cli import _apply_wide_baseline
    from forest_slam_tpu.pipelines.stereo import StereoConfig

    class A:
        wide_baseline = True
        match_refine_radius = 0

    cfg = _apply_wide_baseline(A(), StereoConfig())
    assert cfg.match_refine_radius == 24
    assert cfg.match_refine_scales == (1.0, 1.2, 1.44, 1.7)
    assert cfg.pnp_minimal == "p3p"
    A.wide_baseline = False
    cfg2 = _apply_wide_baseline(A(), StereoConfig())
    assert cfg2 == StereoConfig()


def test_cli_refine_radius_auto_default():
    """-1 resolves per front-end: learned gets the sub-pixel SAD
    alignment (bench.py's default), ORB corners run bare."""
    from forest_slam_tpu.cli import _resolve_refine_radius

    class A:
        frontend = "sp"
        match_refine_radius = -1

    _resolve_refine_radius(A)
    assert A.match_refine_radius == 12

    class B:
        frontend = "orb"
        match_refine_radius = -1

    _resolve_refine_radius(B)
    assert B.match_refine_radius == 0

    class C:  # explicit value wins
        frontend = "sp"
        match_refine_radius = 7

    _resolve_refine_radius(C)
    assert C.match_refine_radius == 7


@pytest.mark.slow
def test_cli_slam_synthetic_relocalize(tmp_path):
    """The slam subcommand end-to-end (VO + loop closure + pose graph with
    the relocalization option wired through)."""
    out = str(tmp_path / "slam.txt")
    rc = cli_main([
        "slam", "--synthetic", "12", "--out", out,
        "--compose-mode", "odometry", "--relocalize",
        "--keyframe-stride", "3", "--loop-separation", "4",
    ])
    assert rc == 0
    assert os.path.exists(out)
    from forest_slam_tpu.io.tum import read_tum

    assert len(read_tum(out)) == 11


def test_cli_slam_relocalize_needs_odometry(tmp_path):
    rc = cli_main([
        "slam", "--synthetic", "6", "--out", str(tmp_path / "x.txt"),
        "--relocalize",
    ])
    assert rc == 2

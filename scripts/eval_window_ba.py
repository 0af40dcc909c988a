"""Clean-corridor window-BA acceptance measurement (VERDICT r1 weak #4).

Runs stereo VO with and without windowed BA on the clean synthetic scene
at a given resolution and prints both ATEs. Round-1 state: clean 960x600
VO 0.10 m -> BA 0.85-0.92 m (2-observation tracks, weak conditioning).
Acceptance: with anchor re-matching (backend/window.py), BA ATE <= VO ATE
on clean data.

Usage: python scripts/eval_window_ba.py [--height 600 --width 960]
       [--frames 97] [--scene corridor] [--window 5]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=600)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--frames", type=int, default=97)
    ap.add_argument("--scene", default="corridor")
    ap.add_argument("--window", type=int, default=5)
    ap.add_argument("--speed", type=float, default=0.15)
    ap.add_argument("--no-rematch", action="store_true")
    ap.add_argument(
        "--pose-priors", type=float, nargs="+", default=None,
        help="sweep of VO pose-prior weights (default: the config default)",
    )
    ap.add_argument(
        "--depth-weights", type=float, nargs="+", default=None,
        help="sweep of stereo-depth residual weights (default: config)",
    )
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--gate-px", type=float, default=None)
    ap.add_argument("--huber-px", type=float, default=None)
    ap.add_argument(
        "--noise", type=float, default=0.0,
        help="pixel-noise sigma added to the rendered frames (degraded-VO "
        "regime: BA must still improve there)",
    )
    args = ap.parse_args()

    import jax

    from forest_slam_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from forest_slam_tpu.backend.window import (
        WindowBAConfig,
        refine_trajectory_ba,
    )
    from forest_slam_tpu.eval import ape_translation
    from forest_slam_tpu.frontend import OrbConfig
    from forest_slam_tpu.frontend.base import orb_frontend
    from forest_slam_tpu.io.synthetic import render_sequence
    from forest_slam_tpu.io.tum import Trajectory
    from forest_slam_tpu.pipelines.stereo import (
        StereoConfig,
        run_stereo_vo_batched,
    )

    H, W = args.height, args.width
    seq = render_sequence(
        args.frames, height=H, width=W, speed=args.speed, scene=args.scene
    )
    if args.noise > 0:
        rng = np.random.default_rng(7)
        add = lambda im: np.clip(
            np.asarray(im) + rng.normal(0, args.noise, im.shape), 0, 255
        ).astype(np.float32)
        seq = seq._replace(
            images_left=add(seq.images_left),
            images_right=add(seq.images_right),
        )
    cfg = StereoConfig(
        orb=OrbConfig(n_features=512, n_levels=8),
        n_hypotheses=1024,
        compose_mode="odometry",
    )
    fe = orb_frontend(cfg.orb, cfg.max_match_distance)
    outs, art = run_stereo_vo_batched(
        seq.images_left, seq.images_right, seq.rig, cfg,
        jax.random.PRNGKey(0), fe, None, return_artifacts=True,
    )
    gt = Trajectory.from_matrices(
        seq.timestamps, np.asarray(seq.T_world_cam, np.float64)
    )
    est = Trajectory.from_matrices(
        seq.timestamps[1:], np.asarray(outs.pose, np.float64)
    )
    ate_vo = ape_translation(est, gt, align=True, with_scale=False).rmse

    kw = {}
    if not args.no_rematch:
        kw = dict(frontend=fe, fparams=None, image_shape=(H, W))
    tag = "composed-only" if args.no_rematch else "anchor-rematch"
    priors = args.pose_priors
    if priors is None:
        priors = [WindowBAConfig().pose_prior_weight]
    print(
        f"{args.scene} {W}x{H} n={args.frames} ok="
        f"{int(np.asarray(outs.ok).sum())}/{args.frames - 1}: "
        f"VO ATE {ate_vo:.4f} m",
        flush=True,
    )
    base = WindowBAConfig(window=args.window)
    if args.gate_px is not None:
        base = base._replace(gate_px=args.gate_px)
    if args.huber_px is not None:
        base = base._replace(huber_px=args.huber_px)
    dws = args.depth_weights if args.depth_weights is not None else [
        base.depth_weight
    ]
    iters = args.iters if args.iters is not None else base.iters
    for dw in dws:
        for wp in priors:
            refined = refine_trajectory_ba(
                outs.pose, art, seq.rig.left,
                base._replace(
                    pose_prior_weight=wp, depth_weight=dw, iters=iters
                ),
                **kw,
            )
            est_ba = Trajectory.from_matrices(
                seq.timestamps[1:], np.asarray(refined, np.float64)
            )
            ate_ba = ape_translation(
                est_ba, gt, align=True, with_scale=False
            ).rmse
            verdict = "<= VO ok" if ate_ba <= ate_vo + 1e-6 else "WORSE than VO"
            print(
                f"  BA({tag}, prior={wp:g}, dw={dw:g}) ATE {ate_ba:.4f} m"
                f"  [{verdict}]",
                flush=True,
            )


if __name__ == "__main__":
    main()

"""K-interval ablation on the synthetic corridor (acceptance harness).

Reproduces the reference thesis's core experiment — stereo VO at keyframe
interval K=1/10/20 (BASELINE.md "Keyframe-interval ablation",
pose_estimation_results/1018_00/*_K{10,20}.txt) — on the in-repo synthetic
corridor, for both front-ends. Used to judge learned-frontend checkpoints:
the thesis headline is that SP+SG degrades gracefully with K while ORB+BF
collapses; a retrained checkpoint is accepted when it tracks at K>=10 where
the previous one lost.

Usage: python scripts/eval_k_ablation.py [--height 600 --width 960]
       [--frames 160] [--weights PATH] [--ks 1 10 20]
Prints one line per (frontend, K): ok frames, ATE RMSE.
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
    ap.add_argument("--frames", type=int, default=160)
    ap.add_argument("--per-k", type=int, default=16, help="frames used per K run")
    ap.add_argument("--ks", type=int, nargs="+", default=[1, 10, 20])
    ap.add_argument("--weights", type=str, default=None)
    ap.add_argument("--frontends", nargs="+", default=["orb", "sp"])
    ap.add_argument(
        "--scales", type=float, nargs="+", default=[1.0],
        help="learned-frontend extraction octaves (pyramid)",
    )
    ap.add_argument(
        "--min-inlier-ratio", type=float, default=None,
        help="override StereoConfig.min_inlier_ratio (-1 auto)",
    )
    ap.add_argument(
        "--subpixel", default=None, choices=["none", "com3"],
        help="override the checkpoint's sub-pixel readout meta",
    )
    ap.add_argument(
        "--refine-radius", type=int, default=0,
        help="post-match SAD refinement radius px (0 = off)",
    )
    ap.add_argument(
        "--no-refine-filter", action="store_true",
        help="keep matches that fail the refinement uniqueness gate",
    )
    ap.add_argument(
        "--refine-scales", type=float, nargs="+", default=[1.0],
        help="scale ratios the refiner searches (wide-baseline: 1.0 1.2 1.44)",
    )
    ap.add_argument(
        "--match-threshold", type=float, default=0.2,
        help="SuperGlue score threshold (reference default 0.2)",
    )
    ap.add_argument(
        "--hypotheses", type=int, default=1024,
        help="PnP-RANSAC hypothesis batch size",
    )
    ap.add_argument(
        "--minimal", default="dlt6", choices=["dlt6", "p3p"],
        help="PnP minimal solver",
    )
    ap.add_argument("--scene", default="corridor")
    ap.add_argument(
        "--render-cpu", action="store_true",
        help="ray-cast the sequence on the CPU backend and cache it to "
        "/tmp (the tunneled TPU worker intermittently dies under "
        "multi-minute forest render dispatches); VO still runs on TPU",
    )
    args = ap.parse_args()

    import jax

    from forest_slam_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from forest_slam_tpu.eval import ape_translation
    from forest_slam_tpu.frontend import OrbConfig
    from forest_slam_tpu.frontend.base import learned_frontend, orb_frontend
    from forest_slam_tpu.io.tum import Trajectory
    from forest_slam_tpu.pipelines.stereo import (
        StereoConfig,
        run_stereo_vo_batched,
    )

    H, W = args.height, args.width
    # one long 10 Hz walk; stride-K subsets share the compiled pipeline
    from _render_cache import cached_render_sequence

    seq = cached_render_sequence(
        args.frames, H, W, 0.15, args.scene, render_cpu=args.render_cpu
    )
    rig = seq.rig
    gt = np.asarray(seq.T_world_cam, np.float64)

    cfg = StereoConfig(
        orb=OrbConfig(n_features=512, n_levels=8),
        n_hypotheses=args.hypotheses,
        compose_mode="odometry",
        match_refine_radius=args.refine_radius,
        match_refine_filter=not args.no_refine_filter,
        match_refine_scales=tuple(args.refine_scales),
        pnp_minimal=args.minimal,
    )
    if args.min_inlier_ratio is not None:
        cfg = cfg._replace(min_inlier_ratio=args.min_inlier_ratio)

    frontends = {}
    if "orb" in args.frontends:
        frontends["orb"] = (orb_frontend(cfg.orb, cfg.max_match_distance), None)
    if "sp" in args.frontends:
        from forest_slam_tpu.frontend.weights import (
            DEFAULT_PATH,
            load_learned_frontend,
        )

        sp_overrides = (
            {"subpixel": args.subpixel} if args.subpixel is not None else {}
        )
        fe, fparams = load_learned_frontend(
            (H, W), args.weights or DEFAULT_PATH, max_keypoints=1024,
            scales=tuple(args.scales),
            superglue_overrides={"match_threshold": args.match_threshold},
            **sp_overrides,
        )
        frontends["sp"] = (learned_frontend(fe), fparams)

    for name, (fn, fparams) in frontends.items():
        for K in args.ks:
            idx = np.arange(0, args.frames, K)[: args.per_k].astype(np.int32)
            if len(idx) < 3:
                continue
            outs = run_stereo_vo_batched(
                seq.images_left,
                seq.images_right,
                rig,
                cfg,
                jax.random.PRNGKey(0),
                fn,
                fparams,
                frame_indices=idx,
            )
            n_ok = int(np.asarray(outs.ok).sum())
            n = len(idx) - 1
            if os.environ.get("KABL_VERBOSE"):
                ni = np.asarray(outs.n_inliers)
                nm = np.asarray(outs.n_matches)
                print(f"{name} K={K} inliers {list(ni)}")
                print(f"{name} K={K} matches {list(nm)}")
            ts = np.arange(len(idx)) * 0.1 * K
            est = Trajectory.from_matrices(
                ts[1:], np.asarray(outs.pose, np.float64)
            )
            ref = Trajectory.from_matrices(ts, gt[idx])
            try:
                stats = ape_translation(est, ref, align=True, with_scale=False)
                ate = f"{stats.rmse:.3f} m"
            except Exception:
                ate = "n/a"
            print(f"{name:4s} K={K:<3d} ok {n_ok}/{n}  ATE {ate}", flush=True)



if __name__ == "__main__":
    main()

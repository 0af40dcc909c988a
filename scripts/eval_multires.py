"""Resolution-robustness acceptance harness (VERDICT r1 weak #1).

Runs stereo VO at several resolutions with both front-ends on the synthetic
corridor and reports tracked fraction + ATE per (frontend, resolution).
The learned checkpoint was trained near full res (960x600) and its raw
features degrade at small inputs; upscaled extraction octaves
(--sp-scales-lowres, LearnedFrontendConfig.scales with s > 1) re-inflate
small imagery toward the statistics the weights know, and SAD refinement
absorbs the remaining sub-pixel error.

Usage: python scripts/eval_multires.py [--resolutions 600x960 300x480 160x224]
       [--frames 48] [--weights PATH]
Acceptance (BASELINE.md): >90% tracked at every listed resolution for the
learned path.
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
    ap.add_argument(
        "--resolutions", nargs="+", default=["600x960", "300x480", "160x224"],
        help="HxW list",
    )
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--weights", type=str, default=None)
    ap.add_argument("--frontends", nargs="+", default=["orb", "sp"])
    ap.add_argument("--scene", default="corridor")
    ap.add_argument("--speed", type=float, default=0.15)
    ap.add_argument(
        "--sp-scales", type=float, nargs="+", default=[1.0],
        help="extraction octaves at full resolution",
    )
    ap.add_argument(
        "--sp-scales-lowres", type=float, nargs="+", default=None,
        help="extraction octaves when H < 480 (default: auto upscale "
        "octaves toward ~600 rows)",
    )
    ap.add_argument("--refine-radius", type=int, default=12)
    ap.add_argument("--match-threshold", type=float, default=0.2)
    ap.add_argument(
        "--render-cpu", action="store_true",
        help="ray-cast on the CPU backend with an /tmp cache (keeps the "
        "long render off the flaky TPU tunnel)",
    )
    args = ap.parse_args()

    import jax

    from forest_slam_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    from forest_slam_tpu.eval import ape_translation
    from forest_slam_tpu.frontend import OrbConfig
    from forest_slam_tpu.frontend.base import learned_frontend, orb_frontend
    from forest_slam_tpu.io.tum import Trajectory
    from forest_slam_tpu.pipelines.stereo import (
        StereoConfig,
        run_stereo_vo_batched,
    )

    from _render_cache import cached_render_sequence

    for res in args.resolutions:
        H, W = (int(x) for x in res.split("x"))
        seq = cached_render_sequence(
            args.frames, H, W, args.speed, args.scene,
            render_cpu=args.render_cpu,
        )
        gt = np.asarray(seq.T_world_cam, np.float64)
        cfg = StereoConfig(
            orb=OrbConfig(n_features=512, n_levels=8),
            n_hypotheses=1024,
            compose_mode="odometry",
            match_refine_radius=args.refine_radius,
        )

        frontends = {}
        if "orb" in args.frontends:
            frontends["orb"] = (
                orb_frontend(cfg.orb, cfg.max_match_distance), None
            )
        if "sp" in args.frontends:
            from forest_slam_tpu.frontend.weights import (
                DEFAULT_PATH,
                load_learned_frontend,
            )

            if H >= 480:
                scales = tuple(args.sp_scales)
            elif args.sp_scales_lowres is not None:
                scales = tuple(args.sp_scales_lowres)
            else:
                # auto: add octaves until H * s ~ 600 (training-res appearance)
                scales, s = [1.0], 1.0
                while H * s < 420:
                    s *= 1.7
                    scales.append(round(min(s, 600.0 / H), 3))
                scales = tuple(scales)
            fe, fparams = load_learned_frontend(
                (H, W), args.weights or DEFAULT_PATH, max_keypoints=1024,
                scales=scales,
                superglue_overrides={
                    "match_threshold": args.match_threshold
                },
            )
            frontends["sp"] = (learned_frontend(fe), fparams)

        for name, (fn, fparams) in frontends.items():
            idx = np.arange(args.frames, dtype=np.int32)
            outs = run_stereo_vo_batched(
                seq.images_left,
                seq.images_right,
                seq.rig,
                cfg,
                jax.random.PRNGKey(0),
                fn,
                fparams,
                frame_indices=idx,
            )
            n_ok = int(np.asarray(outs.ok).sum())
            n = args.frames - 1
            ts = np.arange(args.frames) * 0.1
            est = Trajectory.from_matrices(
                ts[1:], np.asarray(outs.pose, np.float64)
            )
            ref = Trajectory.from_matrices(ts, gt[idx])
            try:
                stats = ape_translation(est, ref, align=True, with_scale=False)
                ate = f"{stats.rmse:.3f} m"
            except Exception:
                ate = "n/a"
            extra = ""
            if name == "sp":
                extra = f"  octaves={scales}"
            print(
                f"{res:>9s} {name:4s} ok {n_ok}/{n}  ATE {ate}{extra}",
                flush=True,
            )


if __name__ == "__main__":
    main()

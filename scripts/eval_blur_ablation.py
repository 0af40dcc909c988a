"""Motion-blur robustness ablation (the thesis's experimental knob).

The reference ships input-degradation machinery — random motion blur over a
percentage of image regions (stereo_slam.py:137-174) — configured off by
default (quirk B9, SURVEY.md §2.4); the thesis used it to probe front-end
robustness to degraded imagery. This harness runs stereo VO on the synthetic
scene with the rebuilt corruptor (utils/corrupt.py) at several blur
percentages for both front-ends and reports tracked fraction + ATE.

Usage: python scripts/eval_blur_ablation.py [--scene corridor|forest]
       [--percentages 0 25 50] [--kernel 15] [--frames 48]
Prints one line per (frontend, blur %).
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
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--percentages", type=float, nargs="+", default=[0, 25, 50])
    ap.add_argument("--kernel", type=int, default=15)
    ap.add_argument("--angle", type=float, default=45.0)
    ap.add_argument("--weights", type=str, default=None)
    ap.add_argument("--frontends", nargs="+", default=["orb", "sp"])
    ap.add_argument("--scene", default="corridor")
    ap.add_argument("--refine-radius", type=int, default=-1,
                    help="-1 = auto (12 for sp, 0 for orb)")
    ap.add_argument("--render-cpu", action="store_true")
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
    from forest_slam_tpu.utils.corrupt import BlurConfig, corrupt_stack

    from _render_cache import cached_render_sequence

    H, W = args.height, args.width
    seq = cached_render_sequence(
        args.frames, H, W, 0.15, args.scene, render_cpu=args.render_cpu
    )
    gt = np.asarray(seq.T_world_cam, np.float64)

    frontends = {}
    if "orb" in args.frontends:
        frontends["orb"] = None
    if "sp" in args.frontends:
        from forest_slam_tpu.frontend.weights import (
            DEFAULT_PATH,
            load_learned_frontend,
        )

        fe, fparams = load_learned_frontend(
            (H, W), args.weights or DEFAULT_PATH, max_keypoints=1024
        )
        frontends["sp"] = (fe, fparams)

    for pct in args.percentages:
        # corrupt on the CPU backend: the blur conv over full-res stacks is
        # a one-off preprocessing pass and keeps the TPU for the pipeline
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            bc = BlurConfig(
                blur_percentage=float(pct),
                kernel_size=args.kernel,
                angle_deg=args.angle,
            )
            il = np.asarray(
                corrupt_stack(
                    jnp.asarray(seq.images_left), jax.random.PRNGKey(7), bc
                )
            )
            ir = np.asarray(
                corrupt_stack(
                    jnp.asarray(seq.images_right), jax.random.PRNGKey(8), bc
                )
            )
        for name in frontends:
            refine = args.refine_radius
            if refine < 0:
                refine = 12 if name == "sp" else 0
            cfg = StereoConfig(
                orb=OrbConfig(n_features=512, n_levels=8),
                n_hypotheses=1024,
                compose_mode="odometry",
                match_refine_radius=refine,
            )
            if name == "orb":
                fn, fparams = orb_frontend(cfg.orb, cfg.max_match_distance), None
            else:
                fn, fparams = learned_frontend(frontends["sp"][0]), frontends["sp"][1]
            idx = np.arange(args.frames, dtype=np.int32)
            outs = run_stereo_vo_batched(
                il, ir, seq.rig, cfg, jax.random.PRNGKey(0), fn, fparams,
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
            print(
                f"{name:4s} blur={pct:>4.0f}%  ok {n_ok}/{n}  ATE {ate}",
                flush=True,
            )


if __name__ == "__main__":
    main()

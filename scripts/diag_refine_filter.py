"""Post-refine-filter precision at wide baselines.

Extends diag_match_threshold: after SuperGlue matching, runs the SAD
refinement (frontend/refine.py) and reports how many matches survive its
uniqueness gate and what fraction of the survivors are correct — i.e. the
effective inlier fraction PnP-RANSAC sees (success per 6-point DLT
hypothesis = p^6).

Usage: python scripts/diag_refine_filter.py --gaps 10 20 --scales 1.0 0.707 0.5
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
    ap.add_argument("--gaps", type=int, nargs="+", default=[10, 20])
    ap.add_argument("--scene", default="corridor")
    ap.add_argument("--weights", type=str, default=None)
    ap.add_argument("--scales", type=float, nargs="+", default=[1.0])
    ap.add_argument("--speed", type=float, default=0.15)
    ap.add_argument("--radii", type=int, nargs="+", default=[24])
    ap.add_argument(
        "--refine-scales", type=float, nargs="+", default=[1.0],
        help="template-to-window scale ratios searched by the refiner",
    )
    ap.add_argument(
        "--thresholds", type=float, nargs="+", default=[0.2, 0.4, 0.6]
    )
    args = ap.parse_args()

    import jax

    from forest_slam_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from forest_slam_tpu.frontend.refine import RefineConfig, refine_matches
    from forest_slam_tpu.frontend.weights import (
        DEFAULT_PATH,
        load_learned_frontend,
    )
    from forest_slam_tpu.io.synthetic import render_sequence

    H, W = args.height, args.width
    n = max(args.gaps) + 1
    seq = render_sequence(
        n, height=H, width=W, speed=args.speed, scene=args.scene
    )
    K = np.asarray(seq.rig.left.K, np.float64)
    gt = np.asarray(seq.T_world_cam, np.float64)
    depths = np.asarray(seq.depths_left, np.float32)

    fe, fp = load_learned_frontend(
        (H, W), args.weights or DEFAULT_PATH, max_keypoints=1024,
        scales=tuple(args.scales),
    )

    def reproject(xy, gap):
        xi = np.clip(np.round(xy[:, 0]).astype(int), 0, W - 1)
        yi = np.clip(np.round(xy[:, 1]).astype(int), 0, H - 1)
        z = depths[0][yi, xi].astype(np.float64)
        finite = np.isfinite(z)
        pts0 = (
            np.stack([xy[:, 0], xy[:, 1], np.ones(len(xy))], 1)
            @ np.linalg.inv(K).T
        ) * z[:, None]
        T = np.linalg.inv(gt[gap]) @ gt[0]
        p1 = pts0 @ T[:3, :3].T + T[:3, 3]
        uv = p1 @ K.T
        front = uv[:, 2] > 0.1
        uv = uv[:, :2] / np.maximum(uv[:, 2:3], 1e-9)
        inside = (
            (uv[:, 0] >= 0) & (uv[:, 0] < W) & (uv[:, 1] >= 0) & (uv[:, 1] < H)
        )
        return uv, finite & front & inside

    for gap in args.gaps:
        img0, img1 = seq.images_left[0], seq.images_left[gap]
        feats = fe.extract(fp, jnp.stack([img0, img1]))
        f0 = jax.tree.map(lambda a: a[0:1], feats)
        f1 = jax.tree.map(lambda a: a[1:2], feats)
        res = fe.match_features(fp, f0, f1, (H, W))
        m0 = np.asarray(res.matches0[0])
        sc = np.asarray(res.matching_scores0[0])
        xy0 = np.asarray(f0.xy[0])
        xy1 = np.asarray(f1.xy[0])
        v0 = np.asarray(f0.valid[0])
        uv, vis = reproject(xy0, gap)
        for thr in args.thresholds:
            base = (m0 >= 0) & v0 & (sc >= thr)
            idx = np.where(m0 >= 0, m0, 0)
            obs = xy1[idx]
            for R in args.radii:
                ref, ok_r = refine_matches(
                    jnp.asarray(img0), jnp.asarray(img1),
                    jnp.asarray(xy0), jnp.asarray(obs),
                    jnp.asarray(base),
                    RefineConfig(
                        radius=R, scales=tuple(args.refine_scales)
                    ),
                )
                ref = np.asarray(ref)
                ok_r = np.asarray(ok_r) & base
                kept = ok_r & vis
                if kept.sum() == 0:
                    print(f"gap={gap} thr={thr:.1f} R={R}: kept 0")
                    continue
                resid = np.linalg.norm(ref[kept] - uv[kept], axis=1)
                p2 = (resid < 2).mean()
                p24 = (resid < 24).mean()
                print(
                    f"gap={gap:<3d} thr={thr:.1f} R={R:<3d} "
                    f"pre {int(base.sum()):4d} kept {int(kept.sum()):4d} "
                    f"prec@2px {p2:5.2f} prec@24px {p24:5.2f} "
                    f"(p^6*1024 = {min(1024 * p2**6, 1024):7.2f} expected "
                    f"clean hypotheses)",
                    flush=True,
                )


if __name__ == "__main__":
    main()

"""Precision/recall of the learned matcher vs match-score threshold.

Companion to diag_wide_baseline.py: reports, per frame gap, how match
precision (fraction of emitted matches within r px of the GT reprojection)
and yield trade off as the SuperGlue mutual-argmax threshold rises —
whether the score separates correct from wrong assignments.

Usage: python scripts/diag_match_threshold.py [--gaps 1 10 20]
       [--scales 1.0 ...] [--weights PATH] [--scene corridor]
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
    ap.add_argument("--gaps", type=int, nargs="+", default=[1, 10, 20])
    ap.add_argument("--scene", default="corridor")
    ap.add_argument("--weights", type=str, default=None)
    ap.add_argument("--scales", type=float, nargs="+", default=[1.0])
    ap.add_argument("--speed", type=float, default=0.15)
    ap.add_argument(
        "--radius", type=float, default=24.0,
        help="correctness radius in px (a refine stage can recover this)",
    )
    args = ap.parse_args()

    import jax

    from forest_slam_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

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
        base = (m0 >= 0) & v0 & vis
        resid = np.full(len(m0), 1e9)
        resid[base] = np.linalg.norm(
            xy1[m0[base]] - uv[base], axis=1
        )
        for thr in (0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9):
            sel = base & (sc >= thr)
            n_sel = int(sel.sum())
            if n_sel == 0:
                print(f"gap={gap:<3d} thr={thr:.1f} matches 0")
                continue
            good = int((resid[sel] < args.radius).sum())
            good2 = int((resid[sel] < 2).sum())
            print(
                f"gap={gap:<3d} thr={thr:.1f} matches {n_sel:4d} "
                f"prec@{args.radius:.0f}px {good / n_sel:5.2f} ({good:4d}) "
                f"prec@2px {good2 / n_sel:5.2f}",
                flush=True,
            )


if __name__ == "__main__":
    main()

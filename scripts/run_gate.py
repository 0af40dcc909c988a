"""Run ONE bench thesis-gate configuration in isolation (gate debugging).

Replicates bench.py's gate clips (same cached renders, same configs) so a
single gate can be re-sampled with different seeds/weights without paying
a full bench run — used to distinguish a borderline-stochastic gate
failure from a real capability regression.

Usage:
  python scripts/run_gate.py --gate fwb_k20 --weights W [--seeds 0 1 2]
"""

from __future__ import annotations

import argparse
import contextlib
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gate", required=True,
                    choices=["wb_k10", "wb_k20", "fwb_k20", "plain_k10",
                             "plain_k20", "fplain_k10", "blur50",
                             "blur_wb_k10", "domain_shift"])
    ap.add_argument("--weights", required=True)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0])
    ap.add_argument("--subpixel", default=None,
                    choices=["none", "com3", "com5"],
                    help="override the checkpoint's sub-pixel readout")
    ap.add_argument("--pnp", default=None, choices=["dlt6", "p3p"],
                    help="override the PnP minimal solver for the gate")
    ap.add_argument("--photo-norm", action="store_true",
                    help="enable per-frame photometric normalization "
                         "(StereoConfig.photo_norm)")
    ap.add_argument("--no-refine-filter", action="store_true",
                    help="keep matches whose SAD refinement fails (the "
                         "filter starves matching under heavy blur)")
    ap.add_argument("--refine-scales", type=float, nargs="+", default=None,
                    help="override the WB refine scale ladder")
    ap.add_argument("--accept", default="odometry",
                    choices=["odometry", "reference"],
                    help="pose-acceptance semantics: 'odometry' = the "
                         "rebuild's ratio-OR-absolute inlier gate; "
                         "'reference' = the reference's bare >=6-points "
                         "accept-all (quirk B5, stereo_slam.py:292-294)")
    args = ap.parse_args()

    from forest_slam_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from bench import render_cache_name
    from forest_slam_tpu.eval import ape_translation
    from forest_slam_tpu.frontend.base import learned_frontend
    from forest_slam_tpu.frontend.weights import load_learned_frontend
    from forest_slam_tpu.io.synthetic import (
        RENDER_VERSION,
        corridor_trajectory,
        default_rig,
        make_corridor_world,
        make_forest_world,
        render_view,
    )
    from forest_slam_tpu.io.tum import Trajectory
    from forest_slam_tpu.pipelines.stereo import (
        StereoConfig,
        run_stereo_vo_batched,
    )
    from forest_slam_tpu.stereo import SgmConfig
    from forest_slam_tpu.utils.corrupt import BlurConfig, corrupt_stack

    H, W, n_kpts = 600, 960, 1024
    rig = default_rig(H, W, baseline=0.25)
    K = rig.left.K
    T_lr = rig.T_left_right
    cache_dir = os.environ.get(
        "FS_BENCH_RENDER_CACHE", "/root/.cache/fs_render"
    )

    spec = {
        "wb_k10": ("corridor", 16, 1.5, "wb"),
        "wb_k20": ("corridor", 8, 3.0, "wb"),
        "fwb_k20": ("forest", 8, 3.0, "wb"),
        "plain_k10": ("corridor", 16, 1.5, "plain"),
        "plain_k20": ("corridor", 8, 3.0, "plain"),
        "fplain_k10": ("forest", 16, 1.5, "plain"),
        "blur50": ("corridor", 24, 0.15, "blur"),
        "blur_wb_k10": ("corridor", 16, 1.5, "blur_wb"),
        "domain_shift": ("corridor", 16, 1.5, "shift_wb"),
    }[args.gate]
    scene, nF, speed, mode = spec

    Ts_k = corridor_trajectory(nF, speed=speed)
    name = render_cache_name(Ts_k, 0.25, nF, W, H, RENDER_VERSION).replace(
        "bench_corridor", f"bench_{scene}"
    )
    path = os.path.join(cache_dir, name)
    if os.path.exists(path):
        z = np.load(path)
        il, ir = jnp.asarray(z["il"]), jnp.asarray(z["ir"])
        print(f"# loaded cached clip {name}")
    else:
        if scene == "forest":
            world = make_forest_world(
                jax.random.PRNGKey(0), z_range=(-5.0, nF * speed + 20.0)
            )
        else:
            world = make_corridor_world(jax.random.PRNGKey(0))

        import functools

        @functools.partial(jax.jit, static_argnums=(4, 5))
        def render_chunk(world, Ts, Km, Tlr, Hh, Ww):
            def frame(T):
                im_l, _ = render_view(world, T, Km, Hh, Ww)
                im_r, _ = render_view(world, T @ Tlr, Km, Hh, Ww)
                return im_l, im_r

            return jax.vmap(frame)(Ts)

        parts = []
        for s in range(0, nF, 8):
            chunk = jnp.asarray(Ts_k[s : s + 8])
            if chunk.shape[0] < 8:
                chunk = jnp.concatenate(
                    [chunk, jnp.tile(chunk[-1:], (8 - chunk.shape[0], 1, 1))]
                )
            out = render_chunk(world, chunk, K, T_lr, H, W)
            jax.block_until_ready(out)
            parts.append(out)
        il = jnp.concatenate([p[0] for p in parts])[:nF]
        ir = jnp.concatenate([p[1] for p in parts])[:nF]
        with contextlib.suppress(OSError):
            os.makedirs(cache_dir, exist_ok=True)
            tmp = f"{path}.{os.getpid()}.tmp"
            np.savez(tmp, il=np.asarray(il, np.float32),
                     ir=np.asarray(ir, np.float32))
            os.replace(tmp + ".npz", path)

    base = StereoConfig(
        sgm=SgmConfig(num_disparities=96),
        n_hypotheses=1024,
        compose_mode="odometry",
        match_refine_radius=12,
    )
    if mode in ("wb", "blur_wb", "shift_wb"):
        cfg = base._replace(
            match_refine_radius=24,
            match_refine_scales=(1.0, 1.2, 1.44, 1.7),
            pnp_minimal="p3p",
        )
        scales = (1.0, 0.707, 0.5)
    elif mode == "plain":
        cfg = base._replace(match_refine_radius=0)
        if args.accept == "reference":
            cfg = cfg._replace(min_inlier_ratio=0.0)
        scales = (1.0,)
    else:
        cfg = base
        scales = (1.0,)
    if args.pnp is not None:
        cfg = cfg._replace(pnp_minimal=args.pnp)
    if args.photo_norm:
        cfg = cfg._replace(photo_norm=True)
    if args.no_refine_filter:
        cfg = cfg._replace(match_refine_filter=False)
    if args.refine_scales is not None:
        cfg = cfg._replace(match_refine_scales=tuple(args.refine_scales))
    if mode in ("blur", "blur_wb"):
        kb = (7, 8) if mode == "blur" else (17, 18)  # match bench keys
        bc = BlurConfig(blur_percentage=50.0, kernel_size=15, angle_deg=45.0)
        il = corrupt_stack(il, jax.random.PRNGKey(kb[0]), bc)
        ir = corrupt_stack(ir, jax.random.PRNGKey(kb[1]), bc)
    if mode == "shift_wb":
        from forest_slam_tpu.utils.corrupt import sensor_shift_stack

        il = sensor_shift_stack(il, jax.random.PRNGKey(27))
        ir = sensor_shift_stack(ir, jax.random.PRNGKey(28))

    overrides = {}
    if args.subpixel is not None:
        overrides["subpixel"] = args.subpixel
    fe, fp = load_learned_frontend(
        (H, W), path=args.weights, max_keypoints=n_kpts, scales=scales,
        superglue_overrides={"softmax_dtype": "bfloat16"}, **overrides,
    )
    for seed in args.seeds:
        outs = run_stereo_vo_batched(
            il, ir, rig, cfg, jax.random.PRNGKey(seed),
            learned_frontend(fe), fp, frame_chunk=nF, pair_chunk=nF,
        )
        okk = int(np.asarray(outs.ok).sum())
        ts = np.arange(nF) * 0.1
        st = ape_translation(
            Trajectory.from_matrices(
                ts[1:], np.asarray(outs.pose, np.float64)
            ),
            Trajectory.from_matrices(ts, np.asarray(Ts_k, np.float64)),
            align=True, with_scale=False,
        )
        print(
            f"{args.gate} seed={seed}: {okk}/{nF - 1} tracked, "
            f"ATE {st.rmse:.4f} m"
        )


if __name__ == "__main__":
    main()

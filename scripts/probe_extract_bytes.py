"""Bisect _extract_chunk's HBM bytes by stage (round-5 perf probe).

BENCH_r04 puts `extract_chunk` at 15.8 GB / 32-frame invocation
(~0.5 GB/frame) — the second remaining byte lever after PnP (VERDICT r4
weak #3). This probe compiles each stage standalone at bench shapes:
SuperPointNet forward, keypoint selection (NMS + top-k + com3 + descriptor
sampling), and the sparse stereo depth, and prints XLA cost totals.

Run (compile-only): python scripts/probe_extract_bytes.py
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cost(lowered):
    c = lowered.compile().cost_analysis()
    if isinstance(c, (list, tuple)):
        c = c[0] if c else {}
    c = dict(c or {})
    return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--kpts", type=int, default=1024)
    ap.add_argument("--height", type=int, default=600)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from forest_slam_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from forest_slam_tpu.frontend.base import learned_frontend
    from forest_slam_tpu.frontend.superpoint import (
        SuperPointNet,
        select_keypoints,
        _sample_coarse_descriptors,
        subpixel_com3,
    )
    from forest_slam_tpu.frontend.weights import (
        flagship_path,
        load_learned_frontend,
    )
    from forest_slam_tpu.io.synthetic import default_rig
    from forest_slam_tpu.pipelines.stereo import StereoConfig, _extract_chunk
    from forest_slam_tpu.stereo import SgmConfig
    from forest_slam_tpu.stereo.sparse import (
        sparse_depth_at_keypoints_batched,
    )

    H, W, B, K = args.height, args.width, args.frames, args.kpts
    rig = default_rig(H, W, baseline=0.25)
    fe, fparams = load_learned_frontend(
        (H, W), path=flagship_path(), max_keypoints=K,
        superglue_overrides={"softmax_dtype": "bfloat16"},
    )
    frontend = learned_frontend(fe)
    cfg = StereoConfig(
        sgm=SgmConfig(num_disparities=96), n_hypotheses=1024,
        compose_mode="odometry", match_refine_radius=12,
    )

    f32 = jnp.float32
    il = jax.ShapeDtypeStruct((B, H, W), f32)
    xy_s = jax.ShapeDtypeStruct((B, K, 2), f32)

    rows = []

    @jax.jit
    def full(l, r):
        return _extract_chunk(l, r, rig, cfg, frontend, fparams)

    rows.append(("extract_chunk (full)", *cost(full.lower(il, il))))

    spcfg = fe.cfg.superpoint
    net = SuperPointNet(spcfg)
    net_params = {"params": fparams["superpoint"]["params"]["net"]}

    @jax.jit
    def net_fwd(l):
        return net.apply(net_params, l / 255.0)

    rows.append(("  superpoint net fwd", *cost(net_fwd.lower(il))))

    raw_s = jax.eval_shape(lambda l: net.apply(net_params, l / 255.0), il)

    @jax.jit
    def select(heat, coarse):
        return select_keypoints(heat, coarse, spcfg)

    rows.append(
        ("  select (nms+topk+desc)",
         *cost(select.lower(raw_s.heat, raw_s.coarse_desc)))
    )

    @jax.jit
    def desc_sample(coarse, xy):
        return jax.vmap(
            lambda c, p: _sample_coarse_descriptors(
                c, p, sample_dtype=spcfg.desc_sample_dtype
            )
        )(coarse, xy)

    rows.append(
        ("    desc bilinear sample",
         *cost(desc_sample.lower(raw_s.coarse_desc, xy_s)))
    )

    if spcfg.subpixel == "com3":
        @jax.jit
        def com3(heat, xy):
            return jax.vmap(
                lambda h, p: subpixel_com3(h, p, jnp.ones(p.shape[0], bool))
            )(heat, xy)

        rows.append(("    com3 readout", *cost(com3.lower(raw_s.heat, xy_s))))

    @jax.jit
    def depth(l, r, xy):
        return sparse_depth_at_keypoints_batched(
            l, r, xy, rig.left.fx, rig.baseline, cfg.sparse
        )

    rows.append(("  sparse stereo depth", *cost(depth.lower(il, il, xy_s))))

    print(f"\n# B={B} frames, K={K}, {W}x{H}, stem={spcfg.stem_stride}")
    print(f"{'stage':<28} {'GFLOP':>10} {'GB':>9} {'MB/frame':>9}")
    for name, fl, by in rows:
        print(f"{name:<28} {fl/1e9:>10.1f} {by/1e9:>9.2f} {by/1e6/B:>9.1f}")


if __name__ == "__main__":
    main()

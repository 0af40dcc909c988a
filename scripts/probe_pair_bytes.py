"""Where do pair_chunk's HBM bytes go? Per-stage XLA cost breakdown.

BENCH_r03 records 127.8 GB accessed per 48-pair `_pair_chunk` invocation
(~2.7 GB/pair) — the binding resource of the whole pipeline (HBM 78%).
VERDICT r4 item #1 says "fuse the GNN layer", but before spending a week
in Pallas this probe asks XLA's cost model which stage actually owns the
bytes: the SuperGlue forward (match), the SAD refinement, or PnP-RANSAC.

Each stage is AOT-lowered + compiled standalone at the exact bench
shapes (B=48 pairs, K=1024 kpts, 960x600) and its `cost_analysis()`
totals printed next to the full pair_chunk's. Standalone compilation
fuses slightly differently than inside the full program, so the parts
won't sum exactly — but a 10x attribution signal is what we need.

Run on the TPU (compile-only, no execution; ~minutes with a warm cache):
    python scripts/probe_pair_bytes.py
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cost(lowered):
    c = lowered.compile().cost_analysis()
    if isinstance(c, (list, tuple)):
        c = c[0] if c else {}
    c = dict(c or {})
    return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=48)
    ap.add_argument("--kpts", type=int, default=1024)
    ap.add_argument("--height", type=int, default=600)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--sg-attention", default="auto")
    ap.add_argument("--refine-radius", type=int, default=12)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from forest_slam_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from forest_slam_tpu.frontend.base import learned_frontend
    from forest_slam_tpu.frontend.weights import (
        flagship_path,
        load_learned_frontend,
    )
    from forest_slam_tpu.io.synthetic import default_rig
    from forest_slam_tpu.pipelines.stereo import (
        StereoConfig,
        _extract_chunk,
        _FrameSlab,
        _pair_chunk,
    )
    from forest_slam_tpu.stereo import SgmConfig

    H, W, B, K = args.height, args.width, args.pairs, args.kpts
    rig = default_rig(H, W, baseline=0.25)
    fe, fparams = load_learned_frontend(
        (H, W), path=flagship_path(), max_keypoints=K,
        superglue_overrides={
            "softmax_dtype": "bfloat16", "attention_impl": args.sg_attention,
        },
    )
    frontend = learned_frontend(fe)
    cfg = StereoConfig(
        sgm=SgmConfig(num_disparities=96),
        n_hypotheses=1024,
        compose_mode="odometry",
        match_refine_radius=args.refine_radius,
    )

    f32 = jnp.float32
    il = jax.ShapeDtypeStruct((32, H, W), f32)
    feats_s, z_s, zok_s = jax.eval_shape(
        lambda l, r: _extract_chunk(l, r, rig, cfg, frontend, fparams), il, il
    )

    def lead(tree, n):
        return jax.tree.map(
            lambda a: jax.ShapeDtypeStruct((n,) + tuple(a.shape[1:]), a.dtype),
            tree,
        )

    prev = _FrameSlab(lead(feats_s, B), lead(z_s, B), lead(zok_s, B))
    cur = lead(feats_s, B)
    keys = jax.ShapeDtypeStruct((B, 2), jnp.uint32)
    ip = jax.ShapeDtypeStruct((B, H, W), f32)

    rows = []

    # ---- full pair chunk -------------------------------------------------
    pc_args = [prev, cur, keys, rig, cfg, frontend, fparams, (H, W)]
    if cfg.match_refine_radius > 0:
        pc_args += [ip, ip]
    fl, by = cost(_pair_chunk.lower(*pc_args))
    rows.append(("pair_chunk (full)", fl, by))

    # ---- match only ------------------------------------------------------
    import functools

    @functools.partial(jax.jit, static_argnums=(2,))
    def match_only(pf, cf, shape):
        return jax.vmap(
            lambda a, b: frontend.match(fparams, a, b, shape)
        )(pf, cf)

    fl, by = cost(match_only.lower(prev.feats, cur, (H, W)))
    rows.append(("match (SuperGlue fwd)", fl, by))

    # ---- refine only -----------------------------------------------------
    if cfg.match_refine_radius > 0:
        from forest_slam_tpu.frontend.refine import (
            RefineConfig,
            refine_matches_quality,
        )

        rcfg = RefineConfig(
            radius=cfg.match_refine_radius,
            scales=tuple(cfg.match_refine_scales),
            cost_path=cfg.match_refine_cost_path,
        )
        xy_s = jax.ShapeDtypeStruct((B, K, 2), f32)
        v_s = jax.ShapeDtypeStruct((B, K), jnp.bool_)

        @jax.jit
        def refine_only(ipv, icv, xy, obs, valid):
            return jax.vmap(
                lambda a, b, c, d, e: refine_matches_quality(
                    a, b, c, d, e, rcfg
                )
            )(ipv, icv, xy, obs, valid)

        fl, by = cost(refine_only.lower(ip, ip, xy_s, xy_s, v_s))
        rows.append((f"refine r{cfg.match_refine_radius}", fl, by))

    # ---- pnp only --------------------------------------------------------
    from forest_slam_tpu.geometry import solve_pnp_ransac

    p3_s = jax.ShapeDtypeStruct((B, K, 3), f32)
    xy_s = jax.ShapeDtypeStruct((B, K, 2), f32)
    v_s = jax.ShapeDtypeStruct((B, K), jnp.bool_)
    w_s = jax.ShapeDtypeStruct((B, K), f32)

    @jax.jit
    def pnp_only(p3, obs, valid, keys, w):
        return jax.vmap(
            lambda a, b, c, k, ww: solve_pnp_ransac(
                a, b, c, rig.left, k,
                n_hypotheses=cfg.n_hypotheses,
                weights=ww,
                minimal=cfg.pnp_minimal,
            )
        )(p3, obs, valid, keys, w)

    fl, by = cost(pnp_only.lower(p3_s, xy_s, v_s, keys, w_s))
    rows.append(("pnp (1024 hyp)", fl, by))

    # ---- superglue internals --------------------------------------------
    # the matcher = encoder + 9x(self,self,cross,cross) GNN + final proj +
    # sinkhorn decode; cost one GNN self layer and the decode separately
    from forest_slam_tpu.frontend.superglue import (
        SuperGlue,
        log_sinkhorn,
        match_from_couplings,
    )

    sgcfg = fe.cfg.superglue
    d_s = jax.ShapeDtypeStruct((B, K, 256), jnp.bfloat16)

    class OneLayer:
        pass

    from forest_slam_tpu.frontend.superglue import GnnLayer

    layer = GnnLayer(sgcfg)
    lp = jax.eval_shape(
        lambda: layer.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 8, 256), jnp.bfloat16),
            jnp.zeros((1, 8, 256), jnp.bfloat16),
            jnp.ones((1, 8), bool),
        )
    )
    layer_params = layer.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 8, 256), jnp.bfloat16),
        jnp.zeros((1, 8, 256), jnp.bfloat16),
        jnp.ones((1, 8), bool),
    )

    @jax.jit
    def one_layer(x, src, m):
        return layer.apply(layer_params, x, src, m)

    fl, by = cost(one_layer.lower(d_s, d_s, v_s))
    rows.append(("one GnnLayer (x36 per fwd)", fl, by))

    sc_s = jax.ShapeDtypeStruct((B, K, K), f32)
    a_s = jax.ShapeDtypeStruct((), f32)

    @jax.jit
    def sink_decode(scores, v0, v1, alpha):
        lp = log_sinkhorn(scores, v0, v1, alpha, sgcfg.sinkhorn_iterations)
        return match_from_couplings(lp, v0, v1, sgcfg.match_threshold)

    fl, by = cost(sink_decode.lower(sc_s, v_s, v_s, a_s))
    rows.append(("sinkhorn+decode (xla ref)", fl, by))

    try:
        from forest_slam_tpu.frontend.pallas_sinkhorn import match_decode

        @jax.jit
        def sink_pallas(scores, v0, v1, alpha):
            return match_decode(
                scores, v0, v1, alpha, sgcfg.sinkhorn_iterations,
                sgcfg.match_threshold,
            )

        fl, by = cost(sink_pallas.lower(sc_s, v_s, v_s, a_s))
        rows.append(("sinkhorn+decode (pallas)", fl, by))
    except Exception as e:
        print(f"# pallas sinkhorn lower failed: {e}")

    print(f"\n# B={B} pairs, K={K}, {W}x{H}, attention={args.sg_attention}")
    print(f"{'stage':<28} {'GFLOP':>10} {'GB':>9} {'GB/pair':>9}")
    for name, fl, by in rows:
        print(f"{name:<28} {fl/1e9:>10.1f} {by/1e9:>9.2f} {by/1e9/B:>9.3f}")


if __name__ == "__main__":
    main()

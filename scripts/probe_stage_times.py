"""Per-stage cost probe for the stereo VO hot path.

Times each pipeline stage at bench shapes (960x600, K=1024) by repeating
it inside ONE jitted ``lax.scan`` and fetching a scalar once — the only
honest timing mode on the tunneled TPU, where ``block_until_ready`` is a
no-op and per-dispatch host sync costs ~ms (BASELINE.md timing-honesty
note). A tiny output-dependent perturbation is threaded through the scan
carry so XLA cannot hoist the loop body.

Stages: front-end extract (orb / sp stem1 / any --weights), SuperGlue
match, sparse stereo depth, SAD refinement, PnP-RANSAC.

Usage: python scripts/probe_stage_times.py [--reps 64] [--weights PATH ...]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=64)
    ap.add_argument("--height", type=int, default=600)
    ap.add_argument("--width", type=int, default=960)
    ap.add_argument("--kpts", type=int, default=1024)
    ap.add_argument(
        "--weights", nargs="*", default=None,
        help="learned checkpoints to probe (default: flagship stem1)",
    )
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from forest_slam_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from forest_slam_tpu.frontend import OrbConfig
    from forest_slam_tpu.frontend.base import learned_frontend, orb_frontend
    from forest_slam_tpu.frontend.weights import (
        DEFAULT_PATH,
        load_learned_frontend,
    )
    from forest_slam_tpu.geometry import solve_pnp_ransac
    from forest_slam_tpu.io.synthetic import (
        corridor_trajectory,
        default_rig,
        make_corridor_world,
        render_view,
    )
    from forest_slam_tpu.stereo.sparse import (
        SparseStereoConfig,
        sparse_depth_at_keypoints,
    )
    from forest_slam_tpu.core.camera import backproject_depth

    H, W, K = args.height, args.width, args.kpts
    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {getattr(dev, 'device_kind', '')}")

    rig = default_rig(H, W, baseline=0.25)
    world = make_corridor_world(jax.random.PRNGKey(0))
    Ts = corridor_trajectory(4, speed=0.15)

    @jax.jit
    def render(world, T, Km):
        img, _ = render_view(world, T, Km, H, W)
        return img

    Km = jnp.asarray(rig.left.K)
    T_lr = jnp.asarray(rig.T_left_right)
    img0 = render(world, jnp.asarray(Ts[0]), Km)
    img1 = render(world, jnp.asarray(Ts[1]), Km)
    img0r = render(world, jnp.asarray(Ts[0] @ np.asarray(T_lr)), Km)
    np.asarray(img0), np.asarray(img1), np.asarray(img0r)

    def timed_scan(fn, *operands, reps=args.reps, scale=1e-30):
        """Scan fn(*operands + carry-perturbation) reps times; returns
        seconds/rep. fn must return an array pytree; its first leaf feeds
        the perturbation."""

        @jax.jit
        def run(ops):
            def body(c, _):
                perturbed = jax.tree.map(
                    lambda a: a + c.astype(a.dtype)
                    if jnp.issubdtype(a.dtype, jnp.floating) else a,
                    ops,
                )
                out = fn(*perturbed)
                leaf = jax.tree.leaves(out)[0]
                c2 = (scale * jnp.sum(leaf.astype(jnp.float32))).astype(
                    jnp.float32
                )
                return c2, None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
            return c

        out = run(operands)  # compile + warm
        float(np.asarray(out))
        t0 = time.time()
        out = run(operands)
        float(np.asarray(out))
        return (time.time() - t0) / reps

    results = {}

    # ---- classical extract -------------------------------------------------
    orb_fe = orb_frontend(OrbConfig(n_features=512, n_levels=8), 64)
    results["orb_extract"] = timed_scan(
        lambda im: orb_fe.extract(None, im).xy, img0
    )
    print(f"orb extract: {results['orb_extract']*1e3:.2f} ms")

    # ---- learned paths ----------------------------------------------------
    wpaths = args.weights if args.weights else [DEFAULT_PATH]
    feats_for_pnp = None
    for wp in wpaths:
        tag = os.path.splitext(os.path.basename(wp))[0]
        fe, fparams = load_learned_frontend(
            (H, W), path=wp, max_keypoints=K,
            superglue_overrides={"softmax_dtype": "bfloat16"},
        )
        lf = learned_frontend(fe)
        t = timed_scan(lambda im: lf.extract(fparams, im).xy, img0)
        results[f"sp_extract[{tag}]"] = t
        print(f"sp extract [{tag}]: {t*1e3:.2f} ms")

        f0 = jax.jit(lf.extract)(fparams, img0)
        f1 = jax.jit(lf.extract)(fparams, img1)
        jax.block_until_ready(np.asarray(f0.xy))

        def match_fn(xy0, xy1):
            g0 = f0._replace(xy=xy0)
            g1 = f1._replace(xy=xy1)
            return lf.match(fparams, g0, g1, (H, W)).astype(jnp.float32)

        t = timed_scan(match_fn, f0.xy, f1.xy)
        results[f"sg_match[{tag}]"] = t
        print(f"sg match [{tag}]: {t*1e3:.2f} ms")
        feats_for_pnp = (f0, f1)

    # ---- sparse stereo depth ----------------------------------------------
    f0 = feats_for_pnp[0] if feats_for_pnp else None
    xy = (
        f0.xy if f0 is not None
        else jax.jit(orb_fe.extract, static_argnums=())(None, img0).xy
    )
    sp_cfg = SparseStereoConfig()
    t = timed_scan(
        lambda l, r, p: sparse_depth_at_keypoints(
            l, r, p, rig.left.fx, rig.baseline, sp_cfg
        )[0],
        img0, img0r, xy,
    )
    results["sparse_depth"] = t
    print(f"sparse depth: {t*1e3:.2f} ms")

    # ---- refinement ---------------------------------------------------------
    from forest_slam_tpu.frontend.refine import (
        RefineConfig,
        refine_matches_quality,
    )

    valid = (
        f0.valid if f0 is not None else jnp.ones((xy.shape[0],), bool)
    )
    obs = xy + 1.5
    rcfg = RefineConfig(radius=12)
    t = timed_scan(
        lambda ip, ic, p, o: refine_matches_quality(
            ip, ic, p, o, valid, rcfg
        )[0],
        img0, img1, xy, obs,
    )
    results["refine_r12"] = t
    print(f"refine r12: {t*1e3:.2f} ms")

    # ---- PnP-RANSAC ---------------------------------------------------------
    z, z_ok = jax.jit(
        lambda l, r, p: sparse_depth_at_keypoints(
            l, r, p, rig.left.fx, rig.baseline, sp_cfg
        )
    )(img0, img0r, xy)
    pts3d = jax.jit(lambda p, zz: backproject_depth(p, zz, rig.left))(xy, z)
    pnp_valid = valid & z_ok & (z > 0.1) & (z < 1000.0)
    key = jax.random.PRNGKey(0)

    for nh in (1024, 512, 256):
        t = timed_scan(
            lambda p3, o, v: solve_pnp_ransac(
                p3, o, v, rig.left, key, n_hypotheses=nh
            ).t,
            pts3d, obs, pnp_valid,
        )
        results[f"pnp_{nh}"] = t
        print(f"pnp ({nh} hyp): {t*1e3:.2f} ms")

    print("\n# summary (ms):")
    for k, v in results.items():
        print(f"  {k}: {v*1e3:.3f}")


if __name__ == "__main__":
    main()

"""Bisect solve_pnp_ransac's HBM bytes by sub-stage (round-5 perf probe).

probe_pair_bytes.py attributes 13.5 GB / 48-pair chunk (~280 MB/pair) to
PnP-RANSAC — more than the whole fused SuperGlue forward. This probe
AOT-compiles each internal stage of the solver standalone at bench shapes
(B=48 pairs vmapped, K=1024 points, 1024 hypotheses) and prints XLA's
cost totals, so the byte hog inside the solver is measured, not guessed.

Run (compile-only): python scripts/probe_pnp_bytes.py
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
    ap.add_argument("--pairs", type=int, default=48)
    ap.add_argument("--kpts", type=int, default=1024)
    ap.add_argument("--hyp", type=int, default=1024)
    ap.add_argument("--minimal", default="dlt6")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from forest_slam_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from forest_slam_tpu.geometry import pnp as P
    from forest_slam_tpu.geometry.ransac import ransac_sample_indices
    from forest_slam_tpu.io.synthetic import default_rig

    B, K, H = args.pairs, args.kpts, args.hyp
    rig = default_rig(600, 960, baseline=0.25)
    cam = rig.left
    f32 = jnp.float32
    p3 = jax.ShapeDtypeStruct((B, K, 3), f32)
    p2 = jax.ShapeDtypeStruct((B, K, 2), f32)
    v = jax.ShapeDtypeStruct((B, K), jnp.bool_)
    w = jax.ShapeDtypeStruct((B, K), f32)
    keys = jax.ShapeDtypeStruct((B, 2), jnp.uint32)

    rows = []

    @jax.jit
    def full(p3, p2, v, k, w):
        return jax.vmap(
            lambda a, b, c, kk, ww: P.solve_pnp_ransac(
                a, b, c, cam, kk, n_hypotheses=H, weights=ww,
                minimal=args.minimal,
            )
        )(p3, p2, v, k, w)

    rows.append(("pnp full", *cost(full.lower(p3, p2, v, keys, w))))

    # stage 1: sampling + minimal solve -> raw hypotheses
    @jax.jit
    def hyps(p3, p2, v, k, w):
        def one(pts3d, pts2d, valid, key, ww):
            key, _ = jax.random.split(key)
            xn = P.undistort_points(pts2d, cam)
            idx = ransac_sample_indices(key, valid, H, 6, ww)
            A = P._dlt_rows(pts3d[idx], xn[idx])
            return P.nullspace_inverse_iteration(A, 12).reshape(-1, 3, 4)

        return jax.vmap(one)(p3, p2, v, k, w)

    rows.append(("  sample+dlt6 solve", *cost(hyps.lower(p3, p2, v, keys, w))))

    # stage 1b: just the gathers pts3d[idx] / xn[idx]
    @jax.jit
    def gathers(p3, p2, v, k, w):
        def one(pts3d, pts2d, valid, key, ww):
            key, _ = jax.random.split(key)
            idx = ransac_sample_indices(key, valid, H, 6, ww)
            return pts3d[idx], pts2d[idx]

        return jax.vmap(one)(p3, p2, v, k, w)

    rows.append(("  sample+gather only", *cost(gathers.lower(p3, p2, v, keys, w))))

    Ps_s = jax.ShapeDtypeStruct((B, H, 3, 4), f32)
    sub = jax.ShapeDtypeStruct((B, 2), jnp.uint32)

    # stage 2: preemptive subset scoring (1024 hyp x 128 pts) + top-64
    @jax.jit
    def preempt(Ps, p3, p2, v, k):
        def one(Psi, pts3d, pts2d, valid, sk):
            g = -jnp.log(-jnp.log(
                jax.random.uniform(sk, (K,), minval=1e-9, maxval=1.0)
            ))
            _, sub_idx = jax.lax.top_k(jnp.where(valid, g, -jnp.inf), 128)
            p3_s, p2_s, v_s = pts3d[sub_idx], pts2d[sub_idx], valid[sub_idx]
            errs = jax.vmap(
                lambda Pm: P._reproject_error(Pm, p3_s, p2_s, cam)
            )(Psi)
            counts = jnp.sum((errs < 1.0) & v_s[None, :], axis=1)
            _, keep = jax.lax.top_k(counts, 64)
            return Psi[keep]

        return jax.vmap(one)(Ps, p3, p2, v, k)

    rows.append(("  preemptive score", *cost(preempt.lower(Ps_s, p3, p2, v, sub))))

    Ps64 = jax.ShapeDtypeStruct((B, 64, 3, 4), f32)

    # stage 3: full scoring of 64 kept
    @jax.jit
    def full_score(Ps, p3, p2, v):
        def one(Psi, pts3d, pts2d, valid):
            errs = jax.vmap(
                lambda Pm: P._reproject_error(Pm, pts3d, pts2d, cam)
            )(Psi)
            inl = (errs < 1.0) & valid[None, :]
            return jnp.sum(inl, axis=1)

        return jax.vmap(one)(Ps, p3, p2, v)

    rows.append(("  full score x64", *cost(full_score.lower(Ps64, p3, p2, v))))

    T0 = jax.ShapeDtypeStruct((B, 4, 4), f32)

    # stage 4: one GN refine (x4-5 in the solver)
    @jax.jit
    def refine(T, p3, p2, v):
        return jax.vmap(
            lambda Ti, a, b, c: P._gauss_newton_refine(Ti, a, b, c, cam, 1.0)
        )(T, p3, p2, v)

    rows.append(("  one GN refine (x~4)", *cost(refine.lower(T0, p3, p2, v))))

    print(f"\n# B={B} pairs, K={K}, hyp={H}, minimal={args.minimal}")
    print(f"{'stage':<26} {'GFLOP':>10} {'GB':>9} {'MB/pair':>9}")
    for name, fl, by in rows:
        print(f"{name:<26} {fl/1e9:>10.1f} {by/1e9:>9.2f} {by/1e6/B:>9.1f}")


if __name__ == "__main__":
    main()

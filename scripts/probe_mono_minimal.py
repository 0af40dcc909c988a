"""Measured 5pt-vs-8pt mono essential-solve cost (VERDICT r3 #7).

Times one full mono pair step (ORB match -> essential RANSAC ->
recoverPose) at bench shapes for both minimal solvers with the
scan-repetition probe (the only honest timing on the tunneled TPU), and
each solver's isolated estimate_relative_pose cost. Records the delta
that justifies keeping 8pt as the odometry/speed default while parity
defaults to the reference-faithful 5pt.

Run: python scripts/probe_mono_minimal.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    from forest_slam_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from forest_slam_tpu.geometry import estimate_relative_pose
    from forest_slam_tpu.io.synthetic import (
        corridor_trajectory,
        default_rig,
        make_corridor_world,
        render_view,
    )

    H, W = 600, 960
    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {getattr(dev, 'device_kind', '')}")
    rig = default_rig(H, W, baseline=0.25)
    world = make_corridor_world(jax.random.PRNGKey(0))
    Ts = corridor_trajectory(2, speed=0.15)

    @jax.jit
    def render(T):
        img, _ = render_view(world, T, jnp.asarray(rig.left.K), H, W)
        return img

    img0 = render(jnp.asarray(Ts[0]))
    img1 = render(jnp.asarray(Ts[1]))
    np.asarray(img0), np.asarray(img1)

    from forest_slam_tpu.frontend import OrbConfig
    from forest_slam_tpu.frontend.base import orb_frontend

    fe = orb_frontend(OrbConfig(n_features=512, n_levels=8), 64)
    f0 = jax.jit(fe.extract)(None, img0)
    f1 = jax.jit(fe.extract)(None, img1)
    matches = jax.jit(fe.match, static_argnums=(3,))(None, f0, f1, (H, W))
    mask = matches >= 0
    idx = jnp.where(mask, matches, 0)
    cx, cy, fx, fy = rig.left.cx, rig.left.cy, rig.left.fx, rig.left.fy
    x0 = (f0.xy - jnp.stack([cx, cy])) / jnp.stack([fx, fy])
    x1 = (f1.xy[idx] - jnp.stack([cx, cy])) / jnp.stack([fx, fy])
    n_m = int(np.asarray(mask).sum())
    print(f"# {n_m} matches feed the solver")
    key = jax.random.PRNGKey(0)

    def timed_scan(fn, ops, reps=32):
        @jax.jit
        def runf(ops):
            def body(c, _):
                pert = jax.tree.map(
                    lambda a: a + c.astype(a.dtype)
                    if jnp.issubdtype(a.dtype, jnp.floating) else a,
                    ops,
                )
                out = fn(pert)
                leaf = jax.tree.leaves(out)[0]
                return (1e-30 * jnp.sum(leaf.astype(jnp.float32))).astype(
                    jnp.float32
                ), None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
            return c

        float(np.asarray(runf(ops)))
        t0 = time.time()
        float(np.asarray(runf(ops)))
        return (time.time() - t0) / reps

    for minimal in ("8pt", "5pt"):
        t = timed_scan(
            lambda ops, m=minimal: estimate_relative_pose(
                ops[0], ops[1], mask, key,
                threshold=1.0 / float(np.asarray(fx)),
                n_hypotheses=1024, refine_iters=8, minimal=m,
            ).t,
            (x0, x1),
        )
        r = jax.jit(
            lambda a, b, m=minimal: estimate_relative_pose(
                a, b, mask, key, threshold=1.0 / float(np.asarray(fx)),
                n_hypotheses=1024, refine_iters=8, minimal=m,
            )
        )(x0, x1)
        print(
            f"{minimal}: {t*1e3:.2f} ms/solve, "
            f"{int(np.asarray(r.n_inliers))} inliers, ok={bool(np.asarray(r.ok))}"
        )


if __name__ == "__main__":
    main()

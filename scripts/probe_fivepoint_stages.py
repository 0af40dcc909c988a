"""Time the 5-point solver's internal stages on the TPU (round 5).

probe_mono_minimal measures the whole solve (85.6 ms round 4, 73.6 after
the eigh->inverse-iteration change); this probe times each internal stage
by scan-repetition (one host fetch per measurement) at the same batch
shape (1024 hypotheses) so the remaining critical path is measured, not
guessed.

Run: python scripts/probe_fivepoint_stages.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from forest_slam_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    import forest_slam_tpu.geometry.fivepoint as FP
    from forest_slam_tpu.geometry.epipolar import _epipolar_rows

    H = 1024
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (H, 5, 2)) * 0.3
    # roughly consistent second view: small rotation + translation
    x1 = x0 + 0.05 * jax.random.normal(jax.random.PRNGKey(1), (H, 5, 2))

    def timed(fn, ops, reps=8, tag=""):
        @jax.jit
        def runf(ops):
            def body(c, _):
                perturbed = jax.tree.map(
                    lambda a: a + (c * 1e-20).astype(a.dtype), ops
                )
                out = fn(perturbed)
                leaf = jax.tree.leaves(out)[0]
                return jnp.sum(leaf.astype(jnp.float32)) * 1e-30, None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
            return c

        float(np.asarray(runf(ops)))
        t0 = time.time()
        float(np.asarray(runf(ops)))
        dt = (time.time() - t0) / reps
        print(f"{tag:<28} {dt * 1e3:8.2f} ms/batch")
        return dt

    # stage shapes
    A = jax.vmap(_epipolar_rows)(x0, x1)  # (H, 5, 9)
    AtA = jnp.einsum("hij,hik->hjk", A, A)
    basis = jax.vmap(FP._null4_subspace)(AtA).reshape(H, 4, 3, 3)
    C = jax.vmap(FP._constraint_matrix)(basis)
    Cn = C / jnp.maximum(jnp.max(jnp.abs(C), axis=-1, keepdims=True), 1e-30)

    timed(lambda o: jax.vmap(FP._null4_subspace)(o), AtA, tag="nullspace (invit)")
    timed(lambda o: jax.vmap(FP._constraint_matrix)(o.reshape(H, 4, 3, 3)),
          basis.reshape(H, 36), tag="constraint matrix")
    timed(lambda o: jnp.linalg.solve(o[..., :10], o[..., 10:]), Cn,
          tag="gauss-jordan solve 10x10")

    R = jnp.linalg.solve(Cn[..., :10], Cn[..., 10:])

    def build_det(Rm):
        L = -Rm

        def one(Lrow):
            def split(row):
                a = jnp.stack([row[2], row[1], row[0]], axis=-1)
                b = jnp.stack([row[5], row[4], row[3]], axis=-1)
                g = jnp.stack([row[9], row[8], row[7], row[6]], axis=-1)
                return a, b, g

            def z_shift(p):
                return jnp.concatenate(
                    [jnp.zeros_like(p[..., :1]), p], axis=-1
                )

            rows_m = (7, 8, 9)
            rows_mz = (4, 5, 6)
            Bx, By, Bc = [], [], []
            for m, mz in zip(rows_m, rows_mz):
                am, bm, gm = split(Lrow[m])
                az, bz, gz = split(Lrow[mz])
                Bx.append(z_shift(am) - jnp.pad(az, (0, 1)))
                By.append(z_shift(bm) - jnp.pad(bz, (0, 1)))
                Bc.append(z_shift(gm) - jnp.pad(gz, (0, 1)))
            Bx = jnp.stack(Bx)
            By = jnp.stack(By)
            Bc = jnp.stack(Bc)
            return FP._det_b_poly(Bx, By, Bc), Bx, By, Bc

        return jax.vmap(one)(L)

    det, Bx, By, Bc = build_det(R)
    timed(lambda o: build_det(o)[0], R, tag="B(z) + det poly")
    timed(lambda o: jax.vmap(FP._real_roots_deg10)(o), det,
          tag="root search (grid+bisect)")

    roots, valid = jax.vmap(FP._real_roots_deg10)(det)

    def recover(ops):
        basis_, Bx_, By_, Bc_, roots_ = ops

        def one(basis1, bx, by, bc, rts):
            def eval_poly(p, z):
                return jnp.polyval(p[..., ::-1], z)

            def e_from_root(z):
                rows = jnp.stack(
                    [jnp.stack([eval_poly(bx[i], z), eval_poly(by[i], z),
                                eval_poly(bc[i], z)]) for i in range(3)]
                )
                rows = rows / jnp.maximum(
                    jnp.linalg.norm(rows, axis=-1, keepdims=True), 1e-30
                )
                M = rows[:, :2]
                b = -rows[:, 2]
                H2 = M.T @ M + 1e-12 * jnp.eye(2)
                xy = jnp.linalg.solve(H2, M.T @ b)
                return xy

            return jax.vmap(e_from_root)(rts)

        return jax.vmap(one)(basis_, Bx_, By_, Bc_, roots_)

    timed(recover, (basis, Bx, By, Bc, roots), tag="root->xy recovery (no polish)")

    def full(ops):
        x0_, x1_ = ops
        return jax.vmap(FP.five_point_candidates)(x0_, x1_)[0]

    timed(full, (x0, x1), tag="FULL five_point_candidates")


if __name__ == "__main__":
    main()

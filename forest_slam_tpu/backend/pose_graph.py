"""SE(3) pose-graph optimization, fully vectorized (BASELINE config 5).

Beyond the reference (which has no back-end at all, SURVEY.md §0): given
keyframe poses and relative-pose constraints — odometry edges from VO plus
loop-closure edges from backend/loop_closure.py — minimize

    sum_e w_e * || log( Z_e^-1 * T_i^-1 * T_j ) ||^2

over the absolute poses ``T`` (world->keyframe convention T_wc; the error
is convention-agnostic as long as Z matches). Gauss-Newton with a fixed
iteration count and the first pose gauge-fixed.

TPU-first structure: a fixed-size edge table (E, ...) with a validity mask
instead of a dynamic graph; per-edge 6x12 Jacobians from one vmapped
``jacfwd``; the (6N, 6N) normal matrix is assembled with one
segment-sum-style scatter-add and solved densely — pose graphs here are
hundreds of keyframes, so 6N stays in the low thousands where one dense
Cholesky on the MXU beats any sparse scheme.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from forest_slam_tpu.core.lie import se3_compose, se3_exp, se3_inverse, se3_log

_HI = jax.lax.Precision.HIGHEST


class PoseGraph(NamedTuple):
    poses: jax.Array  # (N, 4, 4) initial absolute poses
    edge_i: jax.Array  # (E,) int32 source node
    edge_j: jax.Array  # (E,) int32 target node
    edge_T: jax.Array  # (E, 4, 4) measured relative T_i^-1 @ T_j
    edge_weight: jax.Array  # (E,) float32 (0 disables an edge)


class PoseGraphResult(NamedTuple):
    poses: jax.Array  # (N, 4, 4)
    initial_cost: jax.Array
    final_cost: jax.Array


def _edge_error(xi_i, xi_j, Ti, Tj, Zinv):
    """(6,) residual of one edge under left-multiplied updates."""
    Tip = se3_compose(se3_exp(xi_i), Ti)
    Tjp = se3_compose(se3_exp(xi_j), Tj)
    return se3_log(se3_compose(se3_compose(Zinv, se3_inverse(Tip)), Tjp))


def _cost(poses, ei, ej, Zinv, w):
    def one(i, j, Zi):
        return se3_log(se3_compose(se3_compose(Zi, se3_inverse(poses[i])), poses[j]))

    r = jax.vmap(one)(ei, ej, Zinv)  # (E, 6)
    return jnp.sum(w[:, None] * r * r)


def optimize_pose_graph(
    graph: PoseGraph,
    iters: int = 10,
    damping: float = 1e-6,
    fix_first: bool = True,
) -> PoseGraphResult:
    """Gauss-Newton on the edge table; returns refined poses + costs."""
    poses0, ei, ej, Z, w = graph
    N = poses0.shape[0]
    E = ei.shape[0]
    Zinv = jax.vmap(se3_inverse)(Z)
    zeros6 = jnp.zeros((6,), poses0.dtype)

    def gn_step(poses, _):
        def per_edge(i, j, Zi):
            Ti, Tj = poses[i], poses[j]
            f = lambda a, b: _edge_error(a, b, Ti, Tj, Zi)
            r = f(zeros6, zeros6)
            Ji = jax.jacfwd(f, argnums=0)(zeros6, zeros6)  # (6, 6)
            Jj = jax.jacfwd(f, argnums=1)(zeros6, zeros6)
            return r, Ji, Jj

        r, Ji, Jj = jax.vmap(per_edge)(ei, ej, Zinv)  # (E,6), (E,6,6) x2
        wv = w[:, None, None]
        Hii = jnp.einsum("eki,ekj->eij", Ji, Ji, precision=_HI) * wv
        Hjj = jnp.einsum("eki,ekj->eij", Jj, Jj, precision=_HI) * wv
        Hij = jnp.einsum("eki,ekj->eij", Ji, Jj, precision=_HI) * wv
        bi = -jnp.einsum("eki,ek->ei", Ji, r, precision=_HI) * w[:, None]
        bj = -jnp.einsum("eki,ek->ei", Jj, r, precision=_HI) * w[:, None]

        # scatter-add 6x6 blocks into the dense (N, N, 6, 6) normal matrix
        H = jnp.zeros((N, N, 6, 6), poses0.dtype)
        H = H.at[ei, ei].add(Hii)
        H = H.at[ej, ej].add(Hjj)
        H = H.at[ei, ej].add(Hij)
        H = H.at[ej, ei].add(jnp.swapaxes(Hij, -1, -2))
        b = jnp.zeros((N, 6), poses0.dtype)
        b = b.at[ei].add(bi)
        b = b.at[ej].add(bj)

        diag = damping * jnp.eye(6, dtype=poses0.dtype)
        H = H.at[jnp.arange(N), jnp.arange(N)].add(diag)

        Hf = H.transpose(0, 2, 1, 3).reshape(6 * N, 6 * N)
        bf = b.reshape(6 * N)
        if fix_first:
            # gauge: eliminate node 0 from the system (a huge soft prior
            # would wreck f32 conditioning); its update stays exactly zero
            dx_rest = jnp.linalg.solve(Hf[6:, 6:], bf[6:])
            dx = jnp.concatenate([jnp.zeros((6,), poses0.dtype), dx_rest])
        else:
            dx = jnp.linalg.solve(Hf, bf)
        dx = dx.reshape(N, 6)
        dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx, jnp.zeros_like(dx))
        return jax.vmap(lambda x, T: se3_compose(se3_exp(x), T))(dx, poses), None

    cost0 = _cost(poses0, ei, ej, Zinv, w)
    poses, _ = jax.lax.scan(gn_step, poses0, None, length=iters)
    return PoseGraphResult(
        poses=poses,
        initial_cost=cost0,
        final_cost=_cost(poses, ei, ej, Zinv, w),
    )


def odometry_edges(poses: jax.Array, weight: float = 1.0):
    """Consecutive-keyframe edge table from a pose chain (N, 4, 4)."""
    N = poses.shape[0]
    ei = jnp.arange(N - 1, dtype=jnp.int32)
    ej = ei + 1
    Z = jax.vmap(lambda a, b: se3_compose(se3_inverse(a), b))(poses[:-1], poses[1:])
    return ei, ej, Z, jnp.full((N - 1,), weight, jnp.float32)

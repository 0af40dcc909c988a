"""SE(3) pose-graph optimization (backend/pose_graph.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from forest_slam_tpu.backend.pose_graph import (
    PoseGraph,
    odometry_edges,
    optimize_pose_graph,
)
from forest_slam_tpu.core.lie import se3_exp, se3_log


def _square_loop(n_side=10, step=0.5):
    """GT square loop of 4*n_side poses (yaw turns at the corners)."""
    T = [np.eye(4)]
    for i in range(4 * n_side - 1):
        s = np.eye(4)
        s[:3, 3] = [step, 0, 0]
        if (i + 1) % n_side == 0:
            a = np.pi / 2
            s[:3, :3] = np.array(
                [[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]]
            )
        T.append(T[-1] @ s)
    return np.array(T)


def test_se3_log_jacobians_finite():
    # the graph solver differentiates through se3_log; it must be smooth at
    # identity (pure-translation edges) and at generic rotations
    J = jax.jacfwd(lambda xi: se3_log(se3_exp(xi)))(jnp.zeros(6))
    assert bool(jnp.isfinite(J).all())
    assert float(jnp.abs(J - jnp.eye(6)).max()) < 1e-4
    for seed in range(3):
        xi0 = jax.random.normal(jax.random.PRNGKey(seed), (6,)) * 0.5
        J = jax.jacfwd(lambda d: se3_log(se3_exp(d) @ se3_exp(xi0)))(jnp.zeros(6))
        assert bool(jnp.isfinite(J).all())


def test_loop_edge_reduces_drift():
    T_gt = _square_loop()
    N = len(T_gt)
    rng = np.random.default_rng(0)
    T_noisy = [np.eye(4)]
    for i in range(N - 1):
        rel = np.linalg.inv(T_gt[i]) @ T_gt[i + 1]
        xi = rng.normal(0, 0.01, 6)
        xi[3:] *= 0.5
        T_noisy.append(T_noisy[-1] @ (np.asarray(se3_exp(jnp.asarray(xi))) @ rel))
    T_noisy = np.array(T_noisy)

    ei, ej, Z, w = odometry_edges(jnp.asarray(T_noisy))
    Zl = jnp.asarray(np.linalg.inv(T_gt[0]) @ T_gt[-1])[None]
    graph = PoseGraph(
        poses=jnp.asarray(T_noisy),
        edge_i=jnp.concatenate([ei, jnp.array([0], jnp.int32)]),
        edge_j=jnp.concatenate([ej, jnp.array([N - 1], jnp.int32)]),
        edge_T=jnp.concatenate([Z, Zl]),
        edge_weight=jnp.concatenate([w, jnp.array([5.0])]),
    )
    res = optimize_pose_graph(graph, iters=10)
    assert float(res.final_cost) < 0.05 * float(res.initial_cost)

    P = np.asarray(res.poses)
    err0 = np.linalg.norm(T_noisy[:, :3, 3] - T_gt[:, :3, 3], axis=1).mean()
    err1 = np.linalg.norm(P[:, :3, 3] - T_gt[:, :3, 3], axis=1).mean()
    assert err1 < 0.5 * err0, (err0, err1)
    # gauge: first pose untouched
    assert np.allclose(P[0], T_noisy[0], atol=1e-6)


def test_zero_weight_edges_are_ignored():
    T_gt = _square_loop(n_side=4)
    N = len(T_gt)
    ei, ej, Z, w = odometry_edges(jnp.asarray(T_gt))
    # a wildly wrong loop edge with weight 0 must not move anything
    bogus = np.eye(4)
    bogus[:3, 3] = [100.0, 0, 0]
    graph = PoseGraph(
        poses=jnp.asarray(T_gt),
        edge_i=jnp.concatenate([ei, jnp.array([0], jnp.int32)]),
        edge_j=jnp.concatenate([ej, jnp.array([N - 1], jnp.int32)]),
        edge_T=jnp.concatenate([Z, jnp.asarray(bogus)[None]]),
        edge_weight=jnp.concatenate([w, jnp.array([0.0])]),
    )
    res = optimize_pose_graph(graph, iters=5)
    assert np.allclose(np.asarray(res.poses), T_gt, atol=1e-4)

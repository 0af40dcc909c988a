"""Batched multi-sequence evaluation sharded over the device mesh.

BASELINE config 5's multi-chip half: evaluate many sequences at once by
sharding the sequence axis over the mesh's ``data`` axis — each device
runs the full frame-parallel stereo VO on its local sequences
(pipelines/stereo.py `run_stereo_vo_device`, a pure jittable function), and
only the tiny pose outputs are gathered to the host for ATE scoring. The
reference processes sequences one at a time in separate manual runs
(SURVEY.md §2.3 — strictly single-device); this is the TPU-native scale-out
path, testable on a virtual 8-CPU mesh (tests/conftest.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from forest_slam_tpu.core.camera import StereoRig
from forest_slam_tpu.eval import ape_translation
from forest_slam_tpu.frontend.base import FrontendFns, orb_frontend
from forest_slam_tpu.io.tum import Trajectory
from forest_slam_tpu.pipelines.stereo import StereoConfig, run_stereo_vo_device


class SequenceResult(NamedTuple):
    ate_rmse: float
    ok_fraction: float
    n_frames: int


def run_batched_eval(
    images_l,
    images_r,
    gt_poses,
    rig: StereoRig,
    cfg: StereoConfig,
    mesh: Mesh,
    frontend: FrontendFns | None = None,
    fparams=None,
    seed: int = 0,
    frame_batch: int = 8,
    pair_batch: int = 8,
):
    """Evaluate S sequences (S, N, H, W) in parallel over ``mesh``.

    S must be divisible by the mesh's 'data' axis size. Returns
    (list[SequenceResult], poses (S, N-1, 4, 4)).
    """
    if frontend is None:
        frontend = orb_frontend(cfg.orb, cfg.max_match_distance)
    images_l = jnp.asarray(images_l, jnp.float32)
    images_r = jnp.asarray(images_r, jnp.float32)
    S, N = images_l.shape[:2]
    data = mesh.shape["data"]
    if S % data != 0:
        raise ValueError(f"{S} sequences not divisible by data axis {data}")
    keys = jax.random.split(jax.random.PRNGKey(seed), S)

    def one_seq(il, ir, key):
        outs = run_stereo_vo_device(
            il, ir, rig, cfg, key, frontend, fparams,
            frame_batch=frame_batch, pair_batch=pair_batch,
        )
        return outs.pose, outs.ok

    sharded = jax.jit(
        jax.shard_map(
            lambda il, ir, k: jax.vmap(one_seq)(il, ir, k),
            mesh=mesh,
            in_specs=(P("data"), P("data"), P("data")),
            out_specs=P("data"),
            check_vma=False,
        )
    )
    poses, ok = sharded(images_l, images_r, keys)
    poses = np.asarray(poses, np.float64)
    ok = np.asarray(ok)

    results = []
    ts = np.arange(N) * 0.1
    gt_np = np.asarray(gt_poses, np.float64)
    for s in range(S):
        est = Trajectory.from_matrices(ts[1:], poses[s])
        gt = Trajectory.from_matrices(ts, gt_np[s])
        stats = ape_translation(est, gt, align=True, with_scale=False)
        results.append(
            SequenceResult(
                ate_rmse=float(stats.rmse),
                ok_fraction=float(ok[s].mean()),
                n_frames=int(N),
            )
        )
    return results, poses

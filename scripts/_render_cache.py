"""Shared helper: render a synthetic sequence with an on-disk cache.

Used by the TPU eval harnesses (eval_k_ablation, eval_multires). The
960x600 forest ray-cast takes minutes and has repeatedly crashed the
tunneled TPU worker mid-dispatch, so the harnesses render on the CPU
backend and cache the stacks; repeated ablation sweeps then skip the
render entirely and the TPU only ever sees the VO pipeline.
"""

from __future__ import annotations

import os

import numpy as np


def cached_render_sequence(
    n_frames: int,
    height: int,
    width: int,
    speed: float,
    scene: str,
    seed: int = 0,
    render_cpu: bool = False,
    cache_dir: str = "/tmp/fs_render_cache",
):
    from forest_slam_tpu.io.synthetic import SyntheticSequence, default_rig, render_sequence

    if not render_cpu:
        return render_sequence(
            n_frames, height=height, width=width, speed=speed, scene=scene,
            seed=seed,
        )
    os.makedirs(cache_dir, exist_ok=True)
    key = f"{scene}_{n_frames}f_{height}x{width}_s{seed}_v{speed:g}"
    path = os.path.join(cache_dir, key + ".npz")
    if os.path.exists(path):
        z = np.load(path)
        return SyntheticSequence(
            images_left=z["il"],
            images_right=z["ir"],
            depths_left=z["dl"],
            T_world_cam=z["T"],
            timestamps=z["ts"],
            rig=default_rig(height, width),
        )
    seq = render_sequence(
        n_frames, height=height, width=width, speed=speed, scene=scene,
        seed=seed, device="cpu",
    )
    tmp = path + ".tmp.npz"
    np.savez(
        tmp[: -len(".npz")],
        il=np.asarray(seq.images_left, np.float32),
        ir=np.asarray(seq.images_right, np.float32),
        dl=np.asarray(seq.depths_left, np.float32),
        T=np.asarray(seq.T_world_cam, np.float64),
        ts=np.asarray(seq.timestamps, np.float64),
    )
    os.replace(tmp, path)
    return seq

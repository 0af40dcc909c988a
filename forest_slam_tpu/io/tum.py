"""TUM trajectory file I/O.

Format: rows of ``timestamp tx ty tz qx qy qz qw`` separated by single
spaces, written with ``%f`` (6 decimal places) to be bit-comparable with the
reference's output (``np.savetxt(..., delimiter=' ', fmt='%f')``,
stereo_slam.py:360). The reader tolerates duplicate timestamps — the
reference's mono trajectory for 1018_00 has every stamp duplicated
(SURVEY.md §2.4 B7) — as well as comment lines and comma separators.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import numpy as np


class Trajectory(NamedTuple):
    """A timestamped SE(3) trajectory (host-side, numpy).

    ``timestamps``: (N,) float64 seconds; ``positions``: (N, 3);
    ``quaternions``: (N, 4) in [x, y, z, w].
    """

    timestamps: np.ndarray
    positions: np.ndarray
    quaternions: np.ndarray

    def __len__(self) -> int:
        return int(self.timestamps.shape[0])

    def matrices(self) -> np.ndarray:
        """As (N, 4, 4) homogeneous transforms."""
        from scipy.spatial.transform import Rotation

        T = np.tile(np.eye(4), (len(self), 1, 1))
        T[:, :3, :3] = Rotation.from_quat(self.quaternions).as_matrix()
        T[:, :3, 3] = self.positions
        return T

    @classmethod
    def from_matrices(cls, timestamps, T) -> "Trajectory":
        from scipy.spatial.transform import Rotation

        T = np.asarray(T, np.float64)
        quats = Rotation.from_matrix(T[:, :3, :3]).as_quat()
        # match the reference's w >= 0 sign convention (tf.transformations)
        quats = quats * np.where(quats[:, 3:4] < 0, -1.0, 1.0)
        return cls(
            timestamps=np.asarray(timestamps, np.float64),
            positions=T[:, :3, 3].copy(),
            quaternions=quats,
        )


def read_tum(path: str) -> Trajectory:
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.replace(",", " ").split()
            if len(parts) < 8:
                continue
            rows.append([float(p) for p in parts[:8]])
    data = np.asarray(rows, np.float64)
    if data.size == 0:
        data = np.zeros((0, 8))
    return Trajectory(
        timestamps=data[:, 0],
        positions=data[:, 1:4],
        quaternions=data[:, 4:8],
    )


def write_tum(path: str, traj: Trajectory) -> None:
    """Write with ``%f`` formatting for byte parity with the reference."""
    parent = os.path.dirname(path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    data = np.column_stack(
        [traj.timestamps, traj.positions, traj.quaternions]
    )
    np.savetxt(path, data, delimiter=" ", fmt="%f")


class StreamingTumWriter:
    """Incremental TUM sink: rows are appended and flushed per chunk, so a
    crash loses at most the current chunk (the reference saves only at end
    of run and loses everything — SURVEY.md §5 checkpoint/resume row).

    Usage::

        with StreamingTumWriter(path) as w:
            for chunk in ...:
                w.append(timestamps, pose_matrices)   # flushed immediately
    """

    def __init__(self, path: str):
        parent = os.path.dirname(path)
        if parent:
            os.makedirs(parent, exist_ok=True)
        self._f = open(path, "w")

    def append(self, timestamps, matrices) -> None:
        traj = Trajectory.from_matrices(
            np.asarray(timestamps, np.float64),
            np.asarray(matrices, np.float64),
        )
        data = np.column_stack(
            [traj.timestamps, traj.positions, traj.quaternions]
        )
        np.savetxt(self._f, data, delimiter=" ", fmt="%f")
        self._f.flush()
        os.fsync(self._f.fileno())

    def close(self) -> None:
        if not self._f.closed:
            self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

"""Render-cache key integrity for bench.py (VERDICT r2 weak #4).

The bench's on-disk frame cache must be invalidated by any change to the
renderer code (RENDER_VERSION), the trajectory, or the rig baseline —
not only by the shape parameters that were keyed in round 2.
"""

import numpy as np

import bench


def _ts(seed=0):
    rng = np.random.default_rng(seed)
    Ts = np.tile(np.eye(4), (4, 1, 1))
    Ts[:, :3, 3] = rng.normal(size=(4, 3))
    return Ts


def test_render_version_invalidates_cache():
    Ts = _ts()
    a = bench.render_cache_name(Ts, 0.25, 64, 960, 600, render_version=1)
    b = bench.render_cache_name(Ts, 0.25, 64, 960, 600, render_version=2)
    assert a != b


def test_trajectory_and_baseline_invalidate_cache():
    a = bench.render_cache_name(_ts(0), 0.25, 64, 960, 600, 1)
    assert a != bench.render_cache_name(_ts(1), 0.25, 64, 960, 600, 1)
    assert a != bench.render_cache_name(_ts(0), 0.30, 64, 960, 600, 1)


def test_key_is_deterministic():
    a = bench.render_cache_name(_ts(), 0.25, 64, 960, 600, 1)
    b = bench.render_cache_name(_ts(), 0.25, 64, 960, 600, 1)
    assert a == b
    assert a.endswith(".npz")

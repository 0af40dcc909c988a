"""Parity: fused pallas selection (frontend/pallas_select.py) vs the XLA
reduce_window + block-max path in superpoint.select_keypoints.

Runs the pallas kernel in interpreter mode on CPU. Scores are drawn
without ties (random uniform) so both paths must produce the SAME
keypoint set (order may differ — compared as sets), per the
select_keypoints docstring's tie caveat.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from forest_slam_tpu.frontend.superpoint import (
    SuperPointConfig,
    select_keypoints,
)


def _kp_set(feats):
    xy = np.asarray(feats.xy[0])
    valid = np.asarray(feats.valid[0])
    score = np.asarray(feats.score[0])
    return {
        (int(x), int(y), round(float(s), 6))
        for (x, y), s, v in zip(xy, score, valid)
        if v
    }


@pytest.mark.parametrize("hw", [(64, 128), (96, 256)])
def test_pallas_select_matches_xla(hw):
    H, W = hw
    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    # sparse peaky heat: most mass tiny, some clear peaks
    heat = jax.random.uniform(k1, (1, H, W)) * 0.004
    peaks = jax.random.uniform(k2, (1, H, W))
    heat = jnp.where(peaks > 0.99, peaks, heat)
    coarse = jax.random.normal(key, (1, H // 8, W // 8, 32))
    coarse = coarse / jnp.linalg.norm(coarse, axis=-1, keepdims=True)

    base = dict(
        max_keypoints=64,
        descriptor_dim=32,
        topk_method="exact",
        desc_sample_dtype=None,
    )
    f_xla = select_keypoints(
        heat, coarse, SuperPointConfig(nms_backend="xla", **base)
    )
    f_pal = select_keypoints(
        heat, coarse, SuperPointConfig(nms_backend="pallas_interpret", **base)
    )
    assert _kp_set(f_xla) == _kp_set(f_pal)


def test_pallas_select_border_and_threshold():
    H, W = 64, 128
    heat = jnp.zeros((1, H, W))
    # a peak inside the border strip must be suppressed; a sub-threshold
    # peak must be dropped; one clean interior peak survives
    heat = heat.at[0, 2, 50].set(0.9)  # border strip (y < 4)
    heat = heat.at[0, 30, 60].set(0.004)  # below threshold 0.005
    heat = heat.at[0, 20, 40].set(0.8)  # keeper
    coarse = jnp.ones((1, H // 8, W // 8, 16))
    cfg = SuperPointConfig(
        max_keypoints=16,
        descriptor_dim=16,
        nms_backend="pallas_interpret",
        topk_method="exact",
    )
    f = select_keypoints(heat, coarse, cfg)
    kept = _kp_set(f)
    assert kept == {(40, 20, 0.8)}


def test_pallas_select_nested_vmap():
    """The lowres/multi-octave path stacks vmaps (frames x octaves) on top
    of select_keypoints' internal vmap; the custom_vmap rule must collapse
    every level into one flat pallas_call (regression: lowlevel pallas
    batching cannot handle ANY-memory-space blocks)."""
    from forest_slam_tpu.frontend.pallas_select import nms_pooled

    H, W = 64, 128
    heat = jax.random.uniform(jax.random.PRNGKey(0), (2, 3, H, W)) ** 12

    def one(h):
        vals, idx, _ = nms_pooled(h, interpret=True)
        return vals, idx

    v2, i2 = jax.vmap(jax.vmap(one))(heat)
    assert v2.shape == (2, 3, H // 4, W)
    # reference: flat batch through the same kernel
    from forest_slam_tpu.frontend.pallas_select import nms_pooled_batched

    vf, if_, _ = nms_pooled_batched(heat.reshape(6, H, W), interpret=True)
    np.testing.assert_array_equal(np.asarray(v2).reshape(6, H // 4, W), vf)
    np.testing.assert_array_equal(np.asarray(i2).reshape(6, H // 4, W), if_)

"""Fused Pallas detection kernel vs the XLA reference path (interpret
mode on CPU; the compiled kernel is exercised on real TPU by bench.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from forest_slam_tpu.frontend.fast import fast_score_map, harris_response
from forest_slam_tpu.frontend.pallas_detect import _CELL, detect_pooled
from forest_slam_tpu.utils.filters import maxpool2d_same


def _reference_pooled(img, threshold, block, margin, Wp, n_cells):
    H, W = img.shape
    fast = fast_score_map(img, threshold)
    harris = harris_response(img, block)
    ranked = jnp.where(fast > 0.0, harris, -jnp.inf)
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    interior = (
        (ys >= margin) & (ys < H - margin) & (xs >= margin) & (xs < W - margin)
    )
    ranked = jnp.where(interior, ranked, -jnp.inf)
    is_max = ranked >= maxpool2d_same(ranked, 3)
    kept = np.asarray(jnp.where(is_max & jnp.isfinite(ranked), ranked, -jnp.inf))
    keptP = np.full((n_cells[0] * _CELL, Wp), -np.inf, np.float32)
    keptP[:H, :W] = kept
    vals = np.full(n_cells, -np.inf, np.float32)
    idx = np.zeros(n_cells, np.int64)
    for cy in range(n_cells[0]):
        for cx in range(n_cells[1]):
            cell = keptP[cy * 8 : (cy + 1) * 8, cx * 8 : (cx + 1) * 8]
            k = np.argmax(cell)
            vals[cy, cx] = cell.flat[k]
            idx[cy, cx] = (cy * 8 + k // 8) * Wp + cx * 8 + k % 8
    return vals, idx


def test_pallas_detect_matches_xla_reference():
    img = jax.random.uniform(jax.random.PRNGKey(0), (96, 160)) * 255.0
    vals, idx, Wp = detect_pooled(img, margin=16, interpret=True)
    vals, idx = np.asarray(vals), np.asarray(idx)
    ref_v, ref_i = _reference_pooled(img, 20.0, 7, 16, Wp, vals.shape)
    fin = np.isfinite(ref_v)
    assert fin.sum() > 50
    assert (np.isfinite(vals) == fin).all()
    assert np.allclose(vals[fin], ref_v[fin], rtol=1e-5, atol=1e-6)
    assert np.array_equal(idx[fin], ref_i[fin])


def test_pallas_detect_vmaps():
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 160)) * 255.0
    f = lambda im: detect_pooled(im, interpret=True)
    v_b, i_b, _ = jax.vmap(f)(imgs)
    for b in range(2):
        v_s, i_s, _ = f(imgs[b])
        assert np.allclose(np.asarray(v_b[b]), np.asarray(v_s))
        assert np.array_equal(np.asarray(i_b[b]), np.asarray(i_s))


def test_orb_pallas_backend_matches_xla():
    """extract_orb with the (interpreted) pallas backend selects the same
    keypoints as the XLA path with cell_size=8."""
    from unittest import mock

    from forest_slam_tpu.frontend.orb import OrbConfig, extract_orb
    import forest_slam_tpu.frontend.pallas_detect as pd

    img = jax.random.uniform(jax.random.PRNGKey(2), (96, 160)) * 255.0
    orig = pd.detect_pooled

    def interp(image, **kw):
        kw["interpret"] = True
        return orig(image, **kw)

    with mock.patch.object(pd, "detect_pooled", interp):
        fp = extract_orb(img, OrbConfig(n_features=128, n_levels=2,
                                        detect_backend="pallas"))
    fx = extract_orb(img, OrbConfig(n_features=128, n_levels=2,
                                    detect_backend="xla"))
    # same keypoint sets (ordering may differ only among equal scores)
    assert np.asarray(fp.valid).sum() == np.asarray(fx.valid).sum()
    sp = {tuple(p) for p in np.asarray(fp.xy)[np.asarray(fp.valid)].round(3).tolist()}
    sx = {tuple(p) for p in np.asarray(fx.xy)[np.asarray(fx.valid)].round(3).tolist()}
    assert sp == sx

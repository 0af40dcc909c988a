"""Losses for the learned front-end.

- ``detector_loss``: 65-way cell-classification cross-entropy on the
  SuperPoint detector head (MagicPoint recipe) against known corner labels.
- ``descriptor_nce_loss``: symmetric InfoNCE over descriptors sampled at
  ground-truth correspondences — makes SuperPoint descriptors
  discriminative even without the matcher.
- ``matching_loss``: SuperGlue's negative log-likelihood of the ground-truth
  assignment (incl. dustbin rows/cols for unmatched keypoints) under the
  Sinkhorn couplings.

All losses take masked fixed-shape inputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def detector_labels(
    corners: jax.Array, valid: jax.Array, height: int, width: int
) -> jax.Array:
    """Corners (M, 2) -> (Hc, Wc) int labels in [0, 64]; 64 = no corner.

    If several corners land in one cell the last one wins (scatter order) —
    matching the standard training recipe's tie handling.
    """
    Hc, Wc = height // 8, width // 8
    labels = jnp.full((Hc * Wc,), 64, jnp.int32)
    x = jnp.clip(corners[:, 0].astype(jnp.int32), 0, width - 1)
    y = jnp.clip(corners[:, 1].astype(jnp.int32), 0, height - 1)
    cell = (y // 8) * Wc + (x // 8)
    sub = (y % 8) * 8 + (x % 8)
    # route invalid corners to a dump slot beyond the grid
    cell = jnp.where(valid, cell, Hc * Wc)
    labels = jnp.concatenate([labels, jnp.zeros((1,), jnp.int32)])
    labels = labels.at[cell].set(jnp.where(valid, sub, 0))
    return labels[:-1].reshape(Hc, Wc)


def detector_loss(
    logits: jax.Array, corners: jax.Array, valid: jax.Array
) -> jax.Array:
    """logits (B, Hc, Wc, 65); corners (B, M, 2); valid (B, M)."""
    B, Hc, Wc, _ = logits.shape
    labels = jax.vmap(
        lambda c, v: detector_labels(c, v, Hc * 8, Wc * 8)
    )(corners, valid)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    # re-balance: corner cells are rare vs the 'no corner' class
    is_corner = labels != 64
    w = jnp.where(is_corner, 10.0, 1.0)
    return jnp.sum(nll * w) / jnp.sum(w)


def detector_labels_soft(
    corners: jax.Array, valid: jax.Array, height: int, width: int
) -> jax.Array:
    """Corners (M, 2) float -> (Hc, Wc, 65) soft target distributions.

    Each corner's unit mass is split bilinearly over its 4 neighbouring
    pixels (crossing cell boundaries when it does); per cell the 65-way
    target is [pixel masses, leftover-to-dustbin], normalized. Unlike the
    hard labels (detector_labels — integer cast, winner-takes-the-cell),
    these targets are exact in the sub-pixel corner position, which makes
    the trained heatmap interpolable: the com3 sub-pixel readout
    (frontend/superpoint.py subpixel_com3) then recovers the fractional
    position at inference. This is the 'sub-pixel-aware detector targets'
    half of the VERDICT r2 wide-baseline plan.
    """
    Hc, Wc = height // 8, width // 8
    x = jnp.clip(corners[:, 0], 0.0, width - 1.001)
    y = jnp.clip(corners[:, 1], 0.0, height - 1.001)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    mass = jnp.zeros((height * width,), jnp.float32)
    vf = valid.astype(jnp.float32)
    for dx, dy, w in (
        (0, 0, (1 - fx) * (1 - fy)),
        (1, 0, fx * (1 - fy)),
        (0, 1, (1 - fx) * fy),
        (1, 1, fx * fy),
    ):
        xi = jnp.minimum(x0i + dx, width - 1)
        yi = jnp.minimum(y0i + dy, height - 1)
        mass = mass.at[yi * width + xi].add(w * vf)
    cells = (
        mass.reshape(Hc, 8, Wc, 8)
        .transpose(0, 2, 1, 3)
        .reshape(Hc, Wc, 64)
    )
    total = jnp.sum(cells, axis=-1, keepdims=True)
    dustbin = jnp.maximum(1.0 - total, 0.0)
    t = jnp.concatenate([cells, dustbin], axis=-1)
    return t / jnp.maximum(jnp.sum(t, axis=-1, keepdims=True), 1e-12)


def detector_loss_soft(
    logits: jax.Array, corners: jax.Array, valid: jax.Array
) -> jax.Array:
    """Soft cross-entropy against bilinear corner targets.

    logits (B, Hc, Wc, 65); corners (B, M, 2) float; valid (B, M).
    Corner cells re-weighted 10x like the hard loss.
    """
    B, Hc, Wc, _ = logits.shape
    targets = jax.vmap(
        lambda c, v: detector_labels_soft(c, v, Hc * 8, Wc * 8)
    )(corners, valid)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.sum(targets * logp, axis=-1)  # (B, Hc, Wc)
    has_corner = jnp.sum(targets[..., :64], axis=-1) > 1e-6
    w = jnp.where(has_corner, 10.0, 1.0)
    return jnp.sum(ce * w) / jnp.sum(w)


def descriptor_nce_loss(
    desc0: jax.Array,
    desc1: jax.Array,
    valid: jax.Array,
    temperature: float = 0.07,
) -> jax.Array:
    """Symmetric InfoNCE: desc0/desc1 (B, M, D) L2-normalized descriptors at
    corresponding points; valid (B, M)."""
    sim = jnp.einsum("bmd,bnd->bmn", desc0, desc1) / temperature
    mask = valid[:, :, None] & valid[:, None, :]
    sim = jnp.where(mask, sim, -1e9)
    labels = jnp.arange(sim.shape[1])[None, :]
    lp01 = jax.nn.log_softmax(sim, axis=2)
    lp10 = jax.nn.log_softmax(sim, axis=1)
    diag01 = jnp.take_along_axis(lp01, labels[..., None], axis=2)[..., 0]
    diag10 = jnp.take_along_axis(
        jnp.swapaxes(lp10, 1, 2), labels[..., None], axis=2
    )[..., 0]
    per = -(diag01 + diag10) * 0.5
    denom = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(jnp.where(valid, per, 0.0)) / denom


def matching_loss(
    log_p: jax.Array,
    gt_matches0: jax.Array,
    valid0: jax.Array,
    valid1: jax.Array,
) -> jax.Array:
    """NLL of the GT assignment under Sinkhorn couplings.

    log_p: (B, K0+1, K1+1); gt_matches0: (B, K0) index into set1 or -1 for
    dustbin. Unmatched set1 keypoints are charged to the dustbin row.
    """
    B, K0p, K1p = log_p.shape
    K0, K1 = K0p - 1, K1p - 1
    tgt = jnp.where(gt_matches0 >= 0, gt_matches0, K1)
    row_nll = -jnp.take_along_axis(log_p[:, :K0, :], tgt[..., None], axis=2)[..., 0]
    row_nll = jnp.where(valid0, row_nll, 0.0)
    n_row = jnp.maximum(jnp.sum(valid0), 1)

    # set1 keypoints not referenced by any GT match -> dustbin row K0
    matched1 = jnp.zeros((B, K1), bool)
    idx = jnp.where(gt_matches0 >= 0, gt_matches0, 0)
    matched1 = jax.vmap(
        lambda m1, i, has: m1.at[i].set(has, mode="drop")
    )(matched1, idx, gt_matches0 >= 0)
    unmatched1 = valid1 & ~matched1
    col_nll = -log_p[:, K0, :K1]
    col_nll = jnp.where(unmatched1, col_nll, 0.0)
    n_col = jnp.maximum(jnp.sum(unmatched1), 1)
    return jnp.sum(row_nll) / n_row + jnp.sum(col_nll) / n_col

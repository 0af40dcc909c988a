"""Pluggable front-end contract for the VO pipelines.

The reference hot-swaps front-ends by commenting code in and out
(SuperPoint/SuperGlue active at stereo_slam.py:210-229, ORB+BF commented at
:231-246). Here both are implementations of one small functional contract so
the mono/stereo pipelines are front-end agnostic:

- ``extract(fparams, image) -> features`` with ``.xy (K, 2)``, ``.valid
  (K,)`` and whatever matcher state the features need;
- ``match(fparams, feats0, feats1, image_shape) -> matches0 (K,) int32``
  (index into feats1 or -1 — the reference's SuperGlue contract).

``FrontendFns`` instances are static (hashable) jit arguments; ``fparams``
is a pytree (empty for ORB, network weights for the learned front-end).
Build each FrontendFns ONCE and reuse it — rebuilding creates new function
objects and forces a retrace.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp


class FrontendFns(NamedTuple):
    extract: Callable  # (fparams, image (H, W)) -> features
    match: Callable  # (fparams, f0, f1, (H, W)) -> (K,) int32
    name: str = "frontend"


def orb_frontend(orb_cfg, max_match_distance: int = 64) -> FrontendFns:
    """Classical path: ORB + mutual-NN Hamming (the reference's commented
    alternative, ``cv2.ORB_create`` + ``BFMatcher(NORM_HAMMING,
    crossCheck=True)``)."""
    from forest_slam_tpu.frontend.orb import extract_orb
    from forest_slam_tpu.frontend.matching import (
        hamming_distance_matrix,
        mutual_nn_match,
    )

    def extract(fparams, image):
        return extract_orb(image, orb_cfg)

    def match(fparams, f0, f1, image_shape):
        dist = hamming_distance_matrix(f0.desc, f1.desc)
        return mutual_nn_match(
            dist, f0.valid, f1.valid, max_distance=max_match_distance
        )

    return FrontendFns(extract=extract, match=match, name="orb")


def learned_frontend(fe) -> FrontendFns:
    """Learned path: SuperPoint + SuperGlue (``fe`` is a LearnedFrontend;
    fparams is its weight pytree)."""

    def extract(fparams, image):
        feats = fe.extract(fparams, image[None])
        return jax.tree.map(lambda a: a[0], feats)

    def match(fparams, f0, f1, image_shape):
        b = lambda t: jax.tree.map(lambda a: a[None], t)
        res = fe.match_features(fparams, b(f0), b(f1), image_shape)
        return res.matches0[0]

    return FrontendFns(extract=extract, match=match, name="superpoint_superglue")

"""Learned front-end bundle: SuperPoint extraction + SuperGlue matching.

The one-object equivalent of the reference's
``Matching(model_config).eval().to(device)`` (stereo_slam.py:81): call
``match_pair`` with two grayscale images and get the exact dict contract the
reference consumes (stereo_slam.py:210-218):
``keypoints0, keypoints1, matches0, matching_scores0`` — as fixed-shape
masked tensors (``valid0/valid1`` replace ragged keypoint lists).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from forest_slam_tpu.frontend.superpoint import (
    SuperPoint,
    SuperPointConfig,
    SuperPointFeatures,
)
from forest_slam_tpu.frontend.superglue import (
    SuperGlue,
    SuperGlueConfig,
    MatchResult,
)


def _gnn_fused_dispatch(cfg: SuperGlueConfig, K: int, S: int) -> bool:
    """Whole-layer fused GNN applies (pallas_gnn.py; inference only)."""
    impl = getattr(cfg, "gnn_impl", "xla")
    if impl == "fused_interpret":
        return True
    if impl not in ("fused", "auto"):
        return False
    from forest_slam_tpu.frontend.pallas_gnn import gnn_fused_ok

    ok = gnn_fused_ok(K, S, cfg.descriptor_dim, cfg.num_heads)
    if impl == "fused":
        return ok
    from forest_slam_tpu.utils import tpu_backend

    return tpu_backend() and ok


class LearnedFrontendConfig(NamedTuple):
    superpoint: SuperPointConfig = SuperPointConfig()
    superglue: SuperGlueConfig = SuperGlueConfig()
    # Extraction octaves. (1.0,) is the single-scale reference behavior.
    # Multi-scale (e.g. (1.0, 0.5, 0.25)) runs the extractor on downscaled
    # copies too and merges the per-scale keypoint sets by score into the
    # same fixed max_keypoints slots (coords mapped back to full-res) —
    # the learned analogue of ORB's image pyramid, giving the matcher
    # scale-covariant support under forward motion (the reference thesis's
    # K-interval robustness) without retraining. Costs sum(s^2) extra
    # extractor FLOPs (~1.31x at three octaves).
    scales: tuple = (1.0,)


class PairMatch(NamedTuple):
    feats0: SuperPointFeatures  # batch dim squeezed: (K, ...)
    feats1: SuperPointFeatures
    matches0: jax.Array  # (K,) int32 index into feats1 or -1
    matching_scores0: jax.Array  # (K,) float32


class LearnedFrontend:
    """Stateless apply wrapper; params are an explicit pytree argument."""

    def __init__(self, cfg: LearnedFrontendConfig = LearnedFrontendConfig()):
        self.cfg = cfg
        self.superpoint = SuperPoint(cfg.superpoint)
        self.superglue = SuperGlue(cfg.superglue)

    def init(self, key: jax.Array, image_shape: tuple[int, int]) -> dict:
        """Random-init params for a given (H, W)."""
        k1, k2 = jax.random.split(key)
        H, W = image_shape
        dummy = jnp.zeros((1, H, W), jnp.float32)
        sp_params = self.superpoint.init(k1, dummy)
        feats = self.superpoint.apply(sp_params, dummy)
        sg_params = self.superglue.init(
            k2,
            feats.xy, feats.score, feats.desc, feats.valid,
            feats.xy, feats.score, feats.desc, feats.valid,
            (H, W),
        )
        return {"superpoint": sp_params, "superglue": sg_params}

    def extract(self, params: dict, images: jax.Array) -> SuperPointFeatures:
        """images (B, H, W) in [0, 255] -> batched features.

        With cfg.scales beyond (1.0,), per-octave keypoint sets are merged
        by detector score into the same fixed slots (coords in full-res
        pixels), so downstream shapes are unchanged.
        """
        if tuple(self.cfg.scales) == (1.0,):
            return self.superpoint.apply(params["superpoint"], images / 255.0)
        B, H, W = images.shape
        s8 = self.cfg.superpoint.stem_stride * 8
        per_scale = []
        for s in self.cfg.scales:
            if s == 1.0:
                imgs_s = images
            else:
                Hs = max(int(round(H * s)) // s8 * s8, s8)
                Ws = max(int(round(W * s)) // s8 * s8, s8)
                imgs_s = jax.image.resize(images, (B, Hs, Ws), "linear")
            f = self.superpoint.apply(params["superpoint"], imgs_s / 255.0)
            Hs, Ws = imgs_s.shape[1:]
            scale_back = jnp.array([W / Ws, H / Hs], jnp.float32)
            per_scale.append(f._replace(xy=f.xy * scale_back))
        merged = jax.tree.map(
            lambda *xs: jnp.concatenate(xs, axis=1), *per_scale
        )
        # cross-scale near-duplicate suppression: the same corner detected
        # at several octaves would occupy several of the K slots and
        # compete against itself in the matcher's mutual-argmax. Quantize
        # coords to the NMS radius and keep the best-scoring instance per
        # cell (sort by (cell, -score); a run of equal cells keeps its
        # first element). Invalid slots get unique sentinel cells.
        r = max(self.cfg.superpoint.nms_radius, 1)
        Km = merged.xy.shape[1]
        cell = (
            jnp.round(merged.xy[..., 0] / r).astype(jnp.int32)
            + jnp.round(merged.xy[..., 1] / r).astype(jnp.int32) * 65536
        )
        cell = jnp.where(
            merged.valid, cell, -(jnp.arange(Km, dtype=jnp.int32) + 1)
        )

        def dup_mask(cell_row, score_row):
            order = jnp.lexsort((-score_row, cell_row))
            sc = cell_row[order]
            dup_sorted = jnp.concatenate(
                [jnp.zeros((1,), bool), sc[1:] == sc[:-1]]
            )
            return jnp.zeros((Km,), bool).at[order].set(dup_sorted)

        dup = jax.vmap(dup_mask)(cell, merged.score)
        merged = merged._replace(valid=merged.valid & ~dup)
        K = self.cfg.superpoint.max_keypoints
        score = jnp.where(merged.valid, merged.score, -jnp.inf)
        _, top = jax.lax.top_k(score, K)  # (B, K)
        take = lambda a: jnp.take_along_axis(
            a, top.reshape(top.shape + (1,) * (a.ndim - 2)), axis=1
        )
        out = SuperPointFeatures(
            xy=take(merged.xy),
            score=take(merged.score),
            desc=take(merged.desc),
            valid=take(merged.valid) & jnp.isfinite(jnp.take_along_axis(score, top, axis=1)),
        )
        return out

    def match_features(
        self,
        params: dict,
        f0: SuperPointFeatures,
        f1: SuperPointFeatures,
        image_shape: tuple[int, int],
    ) -> MatchResult:
        cfg = self.cfg.superglue
        # The fused whole-layer GNN kernel has no VJP (inference only); a
        # caller differentiating through match_features (e.g. a library
        # user fine-tuning on TPU at lane-aligned shapes) must get the
        # differentiable Flax path, not a missing-VJP trace error
        # (ADVICE r4). In-repo training differentiates SuperGlue.apply
        # directly, so this guard is purely for external callers.
        from jax._src.interpreters import ad as _ad

        _grad_tracers = tuple(
            t for t in (getattr(_ad, "JVPTracer", None),
                        getattr(_ad, "LinearizeTracer", None))
            if t is not None
        )
        under_grad = any(
            isinstance(x, _grad_tracers)
            for x in jax.tree.leaves((params, f0, f1))
        )
        if not under_grad and _gnn_fused_dispatch(
            cfg, f0.xy.shape[-2], f1.xy.shape[-2]
        ):
            from forest_slam_tpu.frontend.pallas_gnn import (
                superglue_forward_fused,
            )

            return superglue_forward_fused(
                params["superglue"], cfg,
                f0.xy, f0.score, f0.desc, f0.valid,
                f1.xy, f1.score, f1.desc, f1.valid,
                image_shape,
                interpret=cfg.gnn_impl == "fused_interpret",
            )
        return self.superglue.apply(
            params["superglue"],
            f0.xy, f0.score, f0.desc, f0.valid,
            f1.xy, f1.score, f1.desc, f1.valid,
            image_shape,
        )

    def match_pair(
        self, params: dict, img0: jax.Array, img1: jax.Array
    ) -> PairMatch:
        """Two (H, W) grayscale images in [0, 255] -> match contract.

        Both images run through the encoder as one batch of 2 (better MXU
        utilization than the reference's two sequential forwards).
        """
        H, W = img0.shape
        feats = self.extract(params, jnp.stack([img0, img1]))
        f0 = jax.tree.map(lambda a: a[0:1], feats)
        f1 = jax.tree.map(lambda a: a[1:2], feats)
        res = self.match_features(params, f0, f1, (H, W))
        squeeze = lambda a: a[0]
        return PairMatch(
            feats0=jax.tree.map(squeeze, f0),
            feats1=jax.tree.map(squeeze, f1),
            matches0=res.matches0[0],
            matching_scores0=res.matching_scores0[0],
        )

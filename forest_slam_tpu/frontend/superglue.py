"""SuperGlue-style attentional graph matcher (Flax).

Architecture-faithful rebuild of the matcher half of the reference's
``Matching`` wrapper (config at stereo_slam.py:73-77: ``weights='outdoor',
sinkhorn_iterations=20, match_threshold=0.2``): keypoint-position MLP
encoder, alternating self/cross multi-head attention GNN, final projection,
and Sinkhorn optimal transport with a learned dustbin, producing the exact
``matches0`` / ``matching_scores0`` output contract the reference consumes
(stereo_slam.py:210-218). Pretrained weights are not vendored in the
reference (empty submodule); ours come from train/.

TPU-first details:

- both keypoint sets are fixed-size (K = max_keypoints) masked tensors, so
  every attention matmul has static (K, K) shape on the MXU;
- padded slots are excluded via additive -1e9 logit masks (finite, so the
  log-domain Sinkhorn stays NaN-free) and routed to the dustbin by
  mask-aware marginals;
- attention runs in bfloat16 with float32 accumulation; Sinkhorn runs in
  float32 (20 iterations of logsumexp are precision-sensitive).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from forest_slam_tpu.utils import tpu_backend
import flax.linen as nn

NEG = -1e9


def _sinkhorn_pallas_ok(cfg, K0: int, K1: int) -> bool:
    """Fused Sinkhorn decode applies (see SuperGlueConfig.sinkhorn_impl)."""
    impl = cfg.sinkhorn_impl
    if impl in ("pallas", "pallas_interpret"):
        return True
    if impl != "auto":
        return False
    return (
        tpu_backend() and K0 % 128 == 0 and K1 % 128 == 0
    )


def _flash_ok(cfg, K: int, S: int, dh: int) -> bool:
    """Stock flash-attention applies: explicitly requested + aligned shapes."""
    if cfg.attention_impl != "flash":
        return False
    return (
        tpu_backend()
        and K % 128 == 0
        and S % 128 == 0
        and dh % 64 == 0
    )


def _fused_ok(cfg, K: int, S: int, dh: int) -> bool:
    """Own fused VMEM kernel applies (frontend/pallas_attention.py)."""
    impl = cfg.attention_impl
    if impl == "fused_interpret":
        return True
    if impl not in ("fused", "auto"):
        return False
    from forest_slam_tpu.frontend.pallas_attention import fused_ok

    if impl == "fused":
        return fused_ok(K, S, dh)
    return tpu_backend() and fused_ok(K, S, dh)


class SuperGlueConfig(NamedTuple):
    descriptor_dim: int = 256
    keypoint_encoder_dims: tuple = (32, 64, 128, 256)
    gnn_layers: int = 9  # 9 x (self + cross)
    num_heads: int = 4
    sinkhorn_iterations: int = 20  # stereo_slam.py:75
    match_threshold: float = 0.2  # stereo_slam.py:76
    dtype: type = jnp.bfloat16
    # "xla" (default): dense einsum+softmax attention. "fused": own
    # VMEM-resident kernel (pallas_attention.py) — one program per
    # (batch, head) computes logits+softmax+PV fully on-chip, ~12x fewer
    # HBM bytes than the dense path's materialized (B, h, K, S) logits
    # (the pipeline's binding resource, BASELINE.md round-3 roofline).
    # "fused_interpret" runs it interpreted (tests). "flash": the STOCK
    # Pallas flash-attention op — measured mis-tiled for these small
    # heads (94.8 pairs/s vs 175.1 dense at B=48, K=1024, h=4); kept for
    # comparison. "auto" (default): fused on TPU when shapes allow —
    # measured 175.1 -> 195.3 pairs/s on the full bench — else xla
    # (CPU tests/training and unaligned shapes fall back transparently).
    # The fused kernel carries a custom VJP (dense-recompute backward,
    # pallas_attention.py), so differentiating through SuperGlue is safe
    # even when a training config lands on lane-aligned shapes on TPU
    # (ADVICE r3).
    attention_impl: str = "auto"
    # Attention softmax dtype on the xla path. The f32 (B, h, K, K) logits
    # round-trip is the dominant HBM traffic of the GNN; "bfloat16" halves
    # it at ~1e-2 relative error on the attention weights (99.2% identical
    # matches; full-pipeline bench 101.9 -> 123.2 pairs/s at equal
    # tracking and ATE 0.155 vs 0.167 m — bench.py defaults to bfloat16
    # for inference; training keeps f32).
    softmax_dtype: str = "float32"
    # Sinkhorn + decode implementation. "xla": log-domain logsumexp loop
    # over the HBM-resident (B, K+1, K+1) table (always used for
    # return_couplings, i.e. training). "pallas": fused VMEM-resident
    # exp-domain kernel (pallas_sinkhorn.py) that never materializes the
    # couplings in HBM. "auto" (default): pallas on TPU when K % 128 == 0.
    # "pallas_interpret" runs the kernel interpreted (tests).
    sinkhorn_impl: str = "auto"
    # Whole-GNN-layer fusion (pallas_gnn.py): "fused" runs every
    # self/cross GnnLayer as ONE VMEM-resident kernel (QKV -> attention
    # -> merge -> MLP -> LayerNorm -> residual, no HBM round trips for
    # the intermediates — subsumes attention_impl for those layers);
    # "auto" (default) enables it on TPU for lane-aligned inference
    # shapes; "xla" disables; "fused_interpret" interprets (tests).
    # INFERENCE-ONLY: the dispatch lives in LearnedFrontend.
    # match_features — training (return_couplings) and direct
    # SuperGlue.apply calls always use the Flax module, where
    # attention_impl still applies.
    gnn_impl: str = "auto"


class MatchResult(NamedTuple):
    """The reference's SuperGlue output contract (stereo_slam.py:210-218)."""

    matches0: jax.Array  # (B, K) int32: index into kpts1 or -1
    matches1: jax.Array  # (B, K) int32: index into kpts0 or -1
    matching_scores0: jax.Array  # (B, K) float32 in [0, 1]
    matching_scores1: jax.Array  # (B, K) float32


class KeypointEncoder(nn.Module):
    cfg: SuperGlueConfig

    @nn.compact
    def __call__(self, xy_norm, score):
        # xy_norm: (B, K, 2) in [-1, 1]; score: (B, K)
        x = jnp.concatenate([xy_norm, score[..., None]], axis=-1)
        x = x.astype(self.cfg.dtype)
        for i, d in enumerate(self.cfg.keypoint_encoder_dims):
            x = nn.Dense(d, dtype=self.cfg.dtype, name=f"mlp_{i}")(x)
            x = nn.relu(x)
        x = nn.Dense(
            self.cfg.descriptor_dim, dtype=self.cfg.dtype, name="mlp_out"
        )(x)
        return x


class Attention(nn.Module):
    cfg: SuperGlueConfig

    @nn.compact
    def __call__(self, query_x, source_x, source_mask):
        """Multi-head attention message: (B, K, D) x (B, S, D) -> (B, K, D)."""
        cfg = self.cfg
        D = cfg.descriptor_dim
        h = cfg.num_heads
        dh = D // h
        dt = cfg.dtype
        q = nn.Dense(D, dtype=dt, name="q")(query_x)
        k = nn.Dense(D, dtype=dt, name="k")(source_x)
        v = nn.Dense(D, dtype=dt, name="v")(source_x)
        B, K, _ = q.shape
        S = k.shape[1]
        q = q.reshape(B, K, h, dh)
        k = k.reshape(B, S, h, dh)
        v = v.reshape(B, S, h, dh)
        if _fused_ok(cfg, K, S, dh):
            from forest_slam_tpu.frontend.pallas_attention import (
                fused_attention,
            )

            msg = fused_attention(
                q.transpose(0, 2, 1, 3),  # (B, h, K, dh)
                k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
                source_mask,
                scale=1.0 / dh ** 0.5,
                interpret=cfg.attention_impl == "fused_interpret",
            ).transpose(0, 2, 1, 3)
            msg = msg.astype(dt)
        elif _flash_ok(cfg, K, S, dh):
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                SegmentIds,
                flash_attention,
            )

            # invalid source slots are masked via segment ids (q segment 1
            # vs kv segment 0) — same semantics as the additive NEG mask:
            # every query attends over the valid sources only
            seg = SegmentIds(
                q=jnp.ones((B, K), jnp.int32),
                kv=source_mask.astype(jnp.int32),
            )
            msg = flash_attention(
                q.transpose(0, 2, 1, 3),  # (B, h, K, dh)
                k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
                segment_ids=seg,
                sm_scale=1.0 / dh ** 0.5,
            ).transpose(0, 2, 1, 3)
            msg = msg.astype(dt)
        else:
            sdt = (
                jnp.bfloat16
                if cfg.softmax_dtype == "bfloat16"
                else jnp.float32
            )
            logits = jnp.einsum("bkhd,bshd->bhks", q, k).astype(sdt)
            logits = logits / jnp.asarray(dh ** 0.5, sdt)
            logits = jnp.where(
                source_mask[:, None, None, :], logits, jnp.asarray(NEG, sdt)
            )
            attn = jax.nn.softmax(logits, axis=-1).astype(dt)
            msg = jnp.einsum("bhks,bshd->bkhd", attn, v)
        msg = msg.reshape(B, K, D)
        return nn.Dense(D, dtype=dt, name="merge")(msg)


class GnnLayer(nn.Module):
    cfg: SuperGlueConfig

    @nn.compact
    def __call__(self, x, source, source_mask):
        msg = Attention(self.cfg, name="attn")(x, source, source_mask)
        y = jnp.concatenate([x, msg], axis=-1)
        D = self.cfg.descriptor_dim
        dt = self.cfg.dtype
        y = nn.Dense(2 * D, dtype=dt, name="mlp0")(y)
        y = nn.LayerNorm(dtype=dt, name="ln")(y)
        y = nn.relu(y)
        y = nn.Dense(D, dtype=dt, name="mlp1")(y)
        return x + y


def log_sinkhorn(
    scores: jax.Array,
    valid0: jax.Array,
    valid1: jax.Array,
    alpha: jax.Array,
    iters: int,
) -> jax.Array:
    """Masked log-domain Sinkhorn with dustbin row/column.

    scores: (B, K0, K1); returns log-couplings (B, K0+1, K1+1) normalized so
    exp sums to ~1 per valid row/col (including dustbin mass).
    """
    B, K0, K1 = scores.shape
    # mask invalid pairs to NEG (finite)
    pair_mask = valid0[:, :, None] & valid1[:, None, :]
    s = jnp.where(pair_mask, scores, NEG)
    # augment with dustbin row/col at alpha (valid slots only)
    bin0 = jnp.where(valid0, alpha, NEG)[:, :, None]  # (B, K0, 1)
    bin1 = jnp.where(valid1, alpha, NEG)[:, None, :]  # (B, 1, K1)
    corner = jnp.full((B, 1, 1), alpha)
    top = jnp.concatenate([s, bin0], axis=2)  # (B, K0, K1+1)
    bottom = jnp.concatenate([bin1, corner], axis=2)  # (B, 1, K1+1)
    couplings = jnp.concatenate([top, bottom], axis=1)  # (B, K0+1, K1+1)

    n0 = jnp.sum(valid0, axis=1).astype(jnp.float32)  # (B,)
    n1 = jnp.sum(valid1, axis=1).astype(jnp.float32)
    # log marginals: each valid keypoint has mass 1; dustbins absorb the
    # other side's total mass; everything normalized by (n0 + n1)
    norm = jnp.log(jnp.maximum(n0 + n1, 1.0))[:, None]
    log_mu = jnp.concatenate(
        [jnp.where(valid0, 0.0, NEG), jnp.log(jnp.maximum(n1, 1.0))[:, None]],
        axis=1,
    ) - norm  # (B, K0+1)
    log_nu = jnp.concatenate(
        [jnp.where(valid1, 0.0, NEG), jnp.log(jnp.maximum(n0, 1.0))[:, None]],
        axis=1,
    ) - norm  # (B, K1+1)

    def body(carry, _):
        u, v = carry
        u = log_mu - jax.nn.logsumexp(couplings + v[:, None, :], axis=2)
        v = log_nu - jax.nn.logsumexp(couplings + u[:, :, None], axis=1)
        return (u, v), None

    u0 = jnp.zeros_like(log_mu)
    v0 = jnp.zeros_like(log_nu)
    (u, v), _ = jax.lax.scan(body, (u0, v0), None, length=iters)
    return couplings + u[:, :, None] + v[:, None, :] + norm[:, :, None]


class SuperGlue(nn.Module):
    """Match two fixed-size keypoint sets."""

    cfg: SuperGlueConfig = SuperGlueConfig()

    @nn.compact
    def __call__(
        self,
        xy0, score0, desc0, valid0,
        xy1, score1, desc1, valid1,
        image_shape,  # (H, W) for coordinate normalization
        return_couplings: bool = False,
    ):
        cfg = self.cfg
        H, W = image_shape
        scale = jnp.array([W, H], jnp.float32)

        def norm_xy(xy):
            return (2.0 * xy - scale) / jnp.maximum(scale[0], scale[1])

        enc = KeypointEncoder(cfg, name="kenc")
        x0 = desc0.astype(cfg.dtype) + enc(norm_xy(xy0), score0)
        x1 = desc1.astype(cfg.dtype) + enc(norm_xy(xy1), score1)

        for i in range(cfg.gnn_layers):
            self_l = GnnLayer(cfg, name=f"self_{i}")
            x0 = self_l(x0, x0, valid0)
            x1 = self_l(x1, x1, valid1)
            cross_l = GnnLayer(cfg, name=f"cross_{i}")
            x0n = cross_l(x0, x1, valid1)
            x1n = cross_l(x1, x0, valid0)
            x0, x1 = x0n, x1n

        proj = nn.Dense(cfg.descriptor_dim, dtype=cfg.dtype, name="final_proj")
        f0 = proj(x0).astype(jnp.float32)
        f1 = proj(x1).astype(jnp.float32)
        scores = jnp.einsum("bkd,bsd->bks", f0, f1) / cfg.descriptor_dim ** 0.25

        alpha = self.param("bin_score", nn.initializers.ones, ())
        if not return_couplings and _sinkhorn_pallas_ok(
            cfg, scores.shape[1], scores.shape[2]
        ):
            from forest_slam_tpu.frontend.pallas_sinkhorn import match_decode

            return match_decode(
                scores, valid0, valid1, alpha,
                cfg.sinkhorn_iterations, cfg.match_threshold,
                interpret=cfg.sinkhorn_impl == "pallas_interpret",
            )
        log_p = log_sinkhorn(
            scores, valid0, valid1, alpha, cfg.sinkhorn_iterations
        )
        if return_couplings:
            return log_p
        return match_from_couplings(
            log_p, valid0, valid1, cfg.match_threshold
        )


def match_from_couplings(
    log_p: jax.Array, valid0: jax.Array, valid1: jax.Array, threshold: float
) -> MatchResult:
    """Mutual-argmax + threshold decoding of Sinkhorn couplings — the
    reference implementation's decision rule."""
    p = log_p[:, :-1, :-1]  # drop dustbins
    B, K0, K1 = p.shape
    best1 = jnp.argmax(p, axis=2)  # (B, K0)
    best0 = jnp.argmax(p, axis=1)  # (B, K1)
    sc0 = jnp.exp(jnp.max(p, axis=2))
    sc1 = jnp.exp(jnp.max(p, axis=1))
    i0 = jnp.arange(K0)[None, :]
    i1 = jnp.arange(K1)[None, :]
    mutual0 = jnp.take_along_axis(best0, best1, axis=1) == i0
    mutual1 = jnp.take_along_axis(best1, best0, axis=1) == i1
    ok0 = mutual0 & (sc0 > threshold) & valid0
    ok1 = mutual1 & (sc1 > threshold) & valid1
    return MatchResult(
        matches0=jnp.where(ok0, best1, -1).astype(jnp.int32),
        matches1=jnp.where(ok1, best0, -1).astype(jnp.int32),
        matching_scores0=jnp.where(valid0, sc0, 0.0),
        matching_scores1=jnp.where(valid1, sc1, 0.0),
    )

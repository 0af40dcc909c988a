"""Fully-fused SuperGlue GNN layer (TPU Pallas) + fused inference forward.

VERDICT r3 #1: after the attention-only kernel (pallas_attention.py) the
pipeline is still HBM-bound — `pair_chunk` moves ~2.7 GB/pair, and the
non-attention GNN traffic (QKV/merge projections, message MLP, LayerNorm,
residuals — each a (B, K, 256) bf16 round trip through HBM, x36 layer
calls) is the remaining bulk. This module keeps the WHOLE GnnLayer
(superglue.py:GnnLayer) resident in VMEM: one grid program per batch
element loads x/src once, runs

    q/k/v proj -> per-head attention -> merge proj -> concat-MLP ->
    LayerNorm -> ReLU -> out proj -> residual

entirely on-chip, and writes only the updated (K, 256) descriptors.

HBM bytes per layer call at B pairs: B * (x + src + out) + weights
(~1.5 MB/pair + ~1.1 MB once — weight blocks use a constant index map, so
Mosaic fetches them once per call, not per program), vs the dense path's
~12 MB/pair (every projection/MLP intermediate round-trips).

Kernel-layout choices (pallas_guide.md):

- per-head weight slices are PRE-SPLIT on host to (h, D, dh) / (h, dh, D)
  arrays so the kernel indexes heads on the leading (sublane-major) axis —
  no sub-tile lane slicing of the (K, 256) activations is ever needed;
- the merge projection is accumulated per head (merged += o_h @ Wm_h), so
  the per-head messages are never concatenated;
- heads run in a ``jax.lax.fori_loop`` so only ONE (K, S) f32 logits
  block (4 MB at 1024x1024) is live at a time — peak VMEM ~11 MB;
- matmuls take bf16 operands with ``preferred_element_type=f32`` (full
  MXU rate, f32 accumulation), intermediate casts mirror the Flax module
  (nn.Dense(dtype=bf16)) so fused vs dense matches agree bit-closely;
- LayerNorm statistics in f32 with flax's epsilon (1e-6).

Numerics vs the module: softmax in f32 (the dense path's default), PV and
all projections cast to bf16 exactly where nn.Dense would. Equivalence is
locked by tests/test_learned_frontend.py (interpret vs xla) and
scripts/check_tpu_attention.py --gnn (compiled Mosaic vs xla on the TPU).

This path is INFERENCE-ONLY (no VJP — training and return_couplings stay
on the Flax module; see superglue_forward_fused's dispatch notes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9
_LN_EPS = 1e-6  # flax.linen.LayerNorm default


def gnn_fused_ok(K: int, S: int, D: int, num_heads: int) -> bool:
    """Shapes the fused layer kernel accepts.

    K == S is required because superglue_forward_fused batches the two
    images' descriptor sets along the leading axis (jnp.concatenate) —
    unequal slot counts would pass the per-axis alignment checks and then
    crash in the concatenate (ADVICE r4).
    """
    return (
        K == S
        and K % 128 == 0
        and S % 128 == 0
        and D % 128 == 0
        and D % num_heads == 0
        and (D // num_heads) % 8 == 0
        and K * S * 4 <= 8 * 1024 * 1024  # one f32 logits block in VMEM
    )


def _layer_kernel(
    x_ref,      # (1, K, D) bf16
    src_ref,    # (1, S, D) bf16
    mask_ref,   # (1, 1, S) f32
    wq_ref,     # (h, D, dh) bf16
    bq_ref,     # (h, 1, dh) bf16
    wk_ref, bk_ref,
    wv_ref, bv_ref,
    wm_ref,     # (h, dh, D) bf16
    bm_ref,     # (1, D) bf16
    w0a_ref,    # (D, 2D) bf16   mlp0 rows acting on x
    w0b_ref,    # (D, 2D) bf16   mlp0 rows acting on merged message
    b0_ref,     # (1, 2D) bf16
    lns_ref,    # (1, 2D) f32
    lnb_ref,    # (1, 2D) f32
    w1_ref,     # (2D, D) bf16
    b1_ref,     # (1, D) bf16
    out_ref,    # (1, K, D) bf16
    *,
    num_heads: int,
    scale: float,
):
    x = x_ref[0]        # (K, D)
    src = src_ref[0]    # (S, D)
    m = mask_ref[0]     # (1, S) f32
    K, D = x.shape

    def head_body(h, merged):
        # per-head projections: (K|S, D) @ (D, dh)
        qh = jnp.dot(
            x, wq_ref[h], preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16) + bq_ref[h]
        kh = jnp.dot(
            src, wk_ref[h], preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16) + bk_ref[h]
        vh = jnp.dot(
            src, wv_ref[h], preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16) + bv_ref[h]
        logits = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (K, S) f32
        logits = jnp.where(m > 0.5, logits, NEG)
        logits = logits - jnp.max(logits, axis=1, keepdims=True)
        p = jnp.exp(logits)
        p = p / jnp.maximum(jnp.sum(p, axis=1, keepdims=True), 1e-30)
        oh = jnp.dot(
            p.astype(jnp.bfloat16), vh, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)  # (K, dh)
        # merge projection, accumulated per head: msg @ Wm restricted to
        # this head's rows — never materializes the concatenated message
        return merged + jnp.dot(
            oh, wm_ref[h], preferred_element_type=jnp.float32
        )

    merged = jax.lax.fori_loop(
        0, num_heads, head_body, jnp.zeros((K, D), jnp.float32)
    )
    merged = merged.astype(jnp.bfloat16) + bm_ref[:]  # (K, D)

    # mlp0 over concat([x, merged]) == x @ W0[:D] + merged @ W0[D:]
    y = (
        jnp.dot(x, w0a_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(merged, w0b_ref[:], preferred_element_type=jnp.float32)
    ).astype(jnp.bfloat16) + b0_ref[:]  # (K, 2D)

    # LayerNorm (f32 stats, flax eps) + ReLU
    yf = y.astype(jnp.float32)
    mu = jnp.mean(yf, axis=1, keepdims=True)
    var = jnp.mean((yf - mu) * (yf - mu), axis=1, keepdims=True)
    yn = (yf - mu) * jax.lax.rsqrt(var + _LN_EPS)
    yn = yn * lns_ref[:] + lnb_ref[:]
    yr = jnp.maximum(yn, 0.0).astype(jnp.bfloat16)

    delta = jnp.dot(
        yr, w1_ref[:], preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16) + b1_ref[:]
    out_ref[0] = x + delta


def split_layer_params(lp: dict, num_heads: int) -> tuple:
    """GnnLayer param dict -> kernel-layout weight tuple (host-side).

    ``lp`` is the Flax param subtree {attn: {q,k,v,merge}, mlp0, ln, mlp1}
    of one superglue.py:GnnLayer. Per-head splits put the head index on
    the leading axis (see module docstring).
    """
    bf = jnp.bfloat16
    D = lp["attn"]["q"]["kernel"].shape[0]
    dh = D // num_heads

    def qkv(name):
        w = jnp.asarray(lp["attn"][name]["kernel"], bf)  # (D, D)
        b = jnp.asarray(lp["attn"][name]["bias"], bf)  # (D,)
        w = w.reshape(D, num_heads, dh).transpose(1, 0, 2)  # (h, D, dh)
        b = b.reshape(num_heads, 1, dh)
        return w, b

    wq, bq = qkv("q")
    wk, bk = qkv("k")
    wv, bv = qkv("v")
    wm = jnp.asarray(lp["attn"]["merge"]["kernel"], bf)  # (D, D)
    wm = wm.reshape(num_heads, dh, D)  # rows grouped by head
    bm = jnp.asarray(lp["attn"]["merge"]["bias"], bf).reshape(1, D)
    w0 = jnp.asarray(lp["mlp0"]["kernel"], bf)  # (2D, 2D)
    w0a, w0b = w0[:D], w0[D:]
    b0 = jnp.asarray(lp["mlp0"]["bias"], bf).reshape(1, 2 * D)
    lns = jnp.asarray(lp["ln"]["scale"], jnp.float32).reshape(1, 2 * D)
    lnb = jnp.asarray(lp["ln"]["bias"], jnp.float32).reshape(1, 2 * D)
    w1 = jnp.asarray(lp["mlp1"]["kernel"], bf)  # (2D, D)
    b1 = jnp.asarray(lp["mlp1"]["bias"], bf).reshape(1, D)
    return (wq, bq, wk, bk, wv, bv, wm, bm, w0a, w0b, b0, lns, lnb, w1, b1)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "interpret")
)
def fused_gnn_layer(
    x: jax.Array,       # (B, K, D) bf16
    src: jax.Array,     # (B, S, D) bf16
    src_mask: jax.Array,  # (B, S) bool
    weights: tuple,     # from split_layer_params
    num_heads: int,
    interpret: bool = False,
) -> jax.Array:  # (B, K, D) bf16
    B, K, D = x.shape
    S = src.shape[1]
    dh = D // num_heads
    mf = src_mask.astype(jnp.float32)[:, None, :]  # (B, 1, S)

    def const(shape):
        # whole-array block, same for every program -> fetched once
        nd = len(shape)
        return pl.BlockSpec(
            shape, lambda b: (0,) * nd, memory_space=pltpu.VMEM
        )

    (wq, bq, wk, bk, wv, bv, wm, bm, w0a, w0b, b0, lns, lnb, w1, b1) = weights
    out = pl.pallas_call(
        functools.partial(
            _layer_kernel, num_heads=num_heads, scale=1.0 / dh ** 0.5
        ),
        out_shape=jax.ShapeDtypeStruct((B, K, D), jnp.bfloat16),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, K, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            const(wq.shape), const(bq.shape),
            const(wk.shape), const(bk.shape),
            const(wv.shape), const(bv.shape),
            const(wm.shape), const(bm.shape),
            const(w0a.shape), const(w0b.shape), const(b0.shape),
            const(lns.shape), const(lnb.shape),
            const(w1.shape), const(b1.shape),
        ],
        out_specs=pl.BlockSpec((1, K, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        x.astype(jnp.bfloat16), src.astype(jnp.bfloat16), mf,
        wq, bq, wk, bk, wv, bv, wm, bm, w0a, w0b, b0, lns, lnb, w1, b1,
    )
    return out


def superglue_forward_fused(
    sg_params: dict,
    cfg,
    xy0, score0, desc0, valid0,
    xy1, score1, desc1, valid1,
    image_shape,
    interpret: bool = False,
):
    """Inference forward of superglue.py:SuperGlue using the fused layer
    kernel for all 2 x gnn_layers GNN blocks.

    Reads the SAME param tree the Flax module consumes (no re-export), so
    fused vs module outputs are directly comparable. Self layers batch
    both images' descriptor sets into one 2B-grid kernel call (shared
    weights, superglue.py:297-304); cross layers likewise with swapped
    sources. Encoder / final projection / score einsum stay in XLA (tiny
    byte counts); Sinkhorn decode dispatches exactly like the module
    (pallas match_decode on TPU, xla fallback elsewhere).

    INFERENCE-ONLY: pallas_call here has no VJP — training and
    return_couplings go through the Flax module (the caller gates on
    that; see LearnedFrontend.match_features).
    """
    from forest_slam_tpu.frontend.superglue import (
        _sinkhorn_pallas_ok,
        log_sinkhorn,
        match_from_couplings,
    )

    p = sg_params["params"]
    dt = cfg.dtype
    H, W = image_shape
    scale = jnp.array([W, H], jnp.float32)

    def norm_xy(xy):
        return (2.0 * xy - scale) / jnp.maximum(scale[0], scale[1])

    def dense(x, dp):
        # mirrors nn.Dense(dtype=bf16): operands in bf16, bf16 out
        return x.astype(dt) @ jnp.asarray(dp["kernel"], dt) + jnp.asarray(
            dp["bias"], dt
        )

    def kenc(xy, sc):
        x = jnp.concatenate([norm_xy(xy), sc[..., None]], axis=-1)
        x = x.astype(dt)
        for i in range(len(cfg.keypoint_encoder_dims)):
            x = jax.nn.relu(dense(x, p["kenc"][f"mlp_{i}"]))
        return dense(x, p["kenc"]["mlp_out"])

    x0 = desc0.astype(dt) + kenc(xy0, score0)
    x1 = desc1.astype(dt) + kenc(xy1, score1)
    B = x0.shape[0]
    h = cfg.num_heads

    for i in range(cfg.gnn_layers):
        ws = split_layer_params(p[f"self_{i}"], h)
        xs = jnp.concatenate([x0, x1])
        vs = jnp.concatenate([valid0, valid1])
        xs = fused_gnn_layer(xs, xs, vs, ws, h, interpret=interpret)
        x0, x1 = xs[:B], xs[B:]
        wc = split_layer_params(p[f"cross_{i}"], h)
        xq = jnp.concatenate([x0, x1])
        xsrc = jnp.concatenate([x1, x0])
        vsrc = jnp.concatenate([valid1, valid0])
        xc = fused_gnn_layer(xq, xsrc, vsrc, wc, h, interpret=interpret)
        x0, x1 = xc[:B], xc[B:]

    f0 = dense(x0, p["final_proj"]).astype(jnp.float32)
    f1 = dense(x1, p["final_proj"]).astype(jnp.float32)
    scores = jnp.einsum("bkd,bsd->bks", f0, f1) / cfg.descriptor_dim ** 0.25
    alpha = jnp.asarray(p["bin_score"])

    if _sinkhorn_pallas_ok(cfg, scores.shape[1], scores.shape[2]):
        from forest_slam_tpu.frontend.pallas_sinkhorn import match_decode

        return match_decode(
            scores, valid0, valid1, alpha,
            cfg.sinkhorn_iterations, cfg.match_threshold,
            interpret=cfg.sinkhorn_impl == "pallas_interpret",
        )
    log_p = log_sinkhorn(
        scores, valid0, valid1, alpha, cfg.sinkhorn_iterations
    )
    return match_from_couplings(log_p, valid0, valid1, cfg.match_threshold)

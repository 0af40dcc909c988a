"""Fused VMEM-resident attention for SuperGlue's GNN (TPU Pallas).

Roofline context (BASELINE.md round 3): the stereo pipeline is
HBM-bandwidth-bound at ~82% of peak, and the byte budget is dominated by
SuperGlue attention — the dense XLA path materializes the (B, h, K, S)
logits in HBM (48 pairs x 4 heads x 1024 x 1024 bf16 = 402 MB written,
then re-read by softmax and again by the PV matmul, per attention call,
x36 calls per pair chunk). The stock Pallas flash kernel is mis-tiled
for these small heads (measured 94.8 pairs/s vs 175.1 dense).

At SuperGlue's shapes the WHOLE per-(batch, head) attention fits in
VMEM: logits (1024, 1024) f32 = 4 MB, Q/K/V (1024, 64) bf16 = 128 KB
each. So no online-softmax streaming is needed — one grid program per
(batch, head) loads Q/K/V once, computes logits + masked softmax + PV
entirely on-chip, and writes only the (K, dh) message back:

    HBM bytes per call: B*h * (Q + K + V + O + mask)  ~ 98 MB
    vs the dense path's ~1.2 GB — a ~12x cut on the binding resource.

Numerics: logits and softmax run in float32 (an upgrade over the dense
path's optional bf16 softmax); the PV product casts the probabilities to
bf16 for the MXU, matching the dense path's `attn.astype(dtype)`.

Masking matches the dense path exactly: invalid SOURCE slots get NEG
before the softmax, so every query still produces a normalized message
over the valid sources.

Differentiation (ADVICE r3): ``pl.pallas_call`` has no VJP rule, so the
kernel carries a ``jax.custom_vjp`` whose backward recomputes the same
attention densely and differentiates that — gradients flow through
``attention_impl='auto'`` even when a training config hits lane-aligned
shapes on TPU (e.g. max_corners=128). The dense recompute mirrors the
kernel's numerics exactly (f32 logits/softmax, bf16 PV), so fwd/bwd are
consistent to kernel-vs-XLA rounding.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    # blocks (leading grid dim stripped): q (K, dh), k/v (S, dh), mask (1, S)
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (K, S)
    m = mask_ref[0].astype(jnp.float32)  # (1, S)
    logits = jnp.where(m > 0.5, logits, NEG)
    logits = logits - jnp.max(logits, axis=1, keepdims=True)
    p = jnp.exp(logits)
    p = p / jnp.maximum(jnp.sum(p, axis=1, keepdims=True), 1e-30)
    o_ref[0] = jnp.dot(
        p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def fused_ok(K: int, S: int, dh: int) -> bool:
    """Shapes the kernel accepts: lane-aligned K/S, VMEM-resident logits."""
    return (
        K % 128 == 0
        and S % 128 == 0
        and dh % 8 == 0
        and K * S * 4 <= 8 * 1024 * 1024  # f32 logits block
    )


def _dense_mirror(q, k, v, source_mask, scale):
    """Dense attention with the kernel's exact numerics (for the VJP)."""
    logits = jnp.einsum(
        "bhkd,bhsd->bhks",
        q.astype(jnp.float32),
        k.astype(jnp.float32),
    ) * scale
    logits = jnp.where(source_mask[:, None, None, :], logits, NEG)
    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits)
    p = p / jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
    return jnp.einsum(
        "bhks,bhsd->bhkd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _fused_attention(q, k, v, source_mask, scale, interpret):
    return _pallas_forward(q, k, v, source_mask, scale, interpret)


def _fused_fwd(q, k, v, source_mask, scale, interpret):
    out = _pallas_forward(q, k, v, source_mask, scale, interpret)
    return out, (q, k, v, source_mask)


def _fused_bwd(scale, interpret, res, g):
    q, k, v, mask = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _dense_mirror(q_, k_, v_, mask, scale), q, k, v
    )
    dq, dk, dv = vjp(g)
    # bool primal -> float0 cotangent
    dmask = np.zeros(mask.shape, dtype=jax.dtypes.float0)
    return dq, dk, dv, dmask


_fused_attention.defvjp(_fused_fwd, _fused_bwd)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def fused_attention(
    q: jax.Array,  # (B, h, K, dh)
    k: jax.Array,  # (B, h, S, dh)
    v: jax.Array,  # (B, h, S, dh)
    source_mask: jax.Array,  # (B, S) bool
    scale: float,
    interpret: bool = False,
) -> jax.Array:  # (B, h, K, dh)
    return _fused_attention(q, k, v, source_mask, scale, interpret)


def _pallas_forward(
    q: jax.Array,  # (B, h, K, dh)
    k: jax.Array,  # (B, h, S, dh)
    v: jax.Array,  # (B, h, S, dh)
    source_mask: jax.Array,  # (B, S) bool
    scale: float,
    interpret: bool = False,
) -> jax.Array:  # (B, h, K, dh)
    B, h, K, dh = q.shape
    S = k.shape[2]
    qf = q.reshape(B * h, K, dh)
    kf = k.reshape(B * h, S, dh)
    vf = v.reshape(B * h, S, dh)
    # one mask row per (batch, head) program
    mf = jnp.repeat(source_mask.astype(jnp.float32), h, axis=0)  # (B*h, S)
    mf = mf[:, None, :]  # (B*h, 1, S)

    grid = (B * h,)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B * h, K, dh), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, K, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, K, dh), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qf, kf, vf, mf)
    return out.reshape(B, h, K, dh)

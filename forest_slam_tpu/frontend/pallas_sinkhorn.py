"""Fused Sinkhorn + match decode kernel (Pallas/TPU).

The XLA path (superglue.log_sinkhorn) keeps the (B, K+1, K+1) log-coupling
table in HBM and each of the 20 iterations runs two logsumexp passes over
it — at B=64, K=1024 that is ~40 bandwidth-bound sweeps of a 269 MB tensor
(~24 ms per pair chunk, measured on v5e: the second-largest item in the
matcher after attention). This kernel keeps one pair's table VMEM-resident
and iterates in the EXP domain, where each Sinkhorn half-step is a single
masked matvec + divide instead of a logsumexp:

  log domain:  u_i = log mu_i - LSE_j(C_ij + v_j)
  exp domain:  A_i = mu_i / sum_j(Khat_ij * V_j)      Khat = exp(C - r_i)

with a per-row shift r_i = max(rowmax(C), alpha) making every table entry
exp(C - r) <= ~1 (masked entries underflow to exactly 0). The row scales
e^{r_i} cancel between the u- and v-updates (fold them into A), so the
20-iteration loop is pure multiplies/divides — no transcendentals at all —
and the table is read from HBM exactly once. The final couplings
P_ij = Khat_ij * A_i * V_j are never materialized in HBM either: the
mutual-argmax decode (match_from_couplings' max/argmax over rows and
columns) happens in VMEM and only four (B, K) vectors leave the kernel.

Iteration-for-iteration equivalent to log_sinkhorn (same update order:
u first from v0=0, v second; same marginals: each valid keypoint has mass
1, dustbins absorb the other side's count; the global 1/(n0+n1)
normalization of log_mu/log_nu cancels against the `+ norm` the log path
adds back at the end). Equivalence is locked by
tests/test_pallas_sinkhorn.py (interpret mode on CPU).

Reference semantics anchor: SuperGlue's sinkhorn_iterations=20 /
match_threshold=0.2 contract at stereo_slam.py:75-76, 210-218.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9
_TINY = 1e-30


def _sinkhorn_kernel(
    scores_ref,  # (1, K0, K1) f32 VMEM
    valid0_ref,  # (1, K0, 1) f32 VMEM
    valid1_ref,  # (1, 1, K1) f32 VMEM
    alpha_ref,  # (1, 1) f32 SMEM
    best1_ref,  # (1, K0, 1) i32 out
    sc0_ref,  # (1, K0, 1) f32 out
    best0_ref,  # (1, 1, K1) i32 out
    sc1_ref,  # (1, 1, K1) f32 out
    *,
    iters: int,
):
    K0, K1 = scores_ref.shape[1], scores_ref.shape[2]
    v0 = valid0_ref[0]  # (K0, 1)
    v1 = valid1_ref[0]  # (1, K1)
    alpha = alpha_ref[0, 0]

    pair = v0 * v1  # (K0, K1) 1/0
    s = jnp.where(pair > 0, scores_ref[0], NEG)
    # per-row shift: bounds both the score row and the dustbin entry, so
    # every exp() below is <= ~1; fully-masked rows get r = alpha and a
    # zero Khat row
    r = jnp.maximum(jnp.max(s, axis=1, keepdims=True), alpha)  # (K0, 1)
    khat = jnp.exp(s - r)  # (K0, K1), 0 at masked pairs
    binc = v0 * jnp.exp(alpha - r)  # (K0, 1): dustbin column, shifted

    n0 = jnp.sum(v0)
    n1 = jnp.sum(v1)

    def body(i, carry):
        A, V, Vbin = carry  # (K0, 1), (1, K1), (1, 1)
        # u half-step (row scaling, shift folded in)
        rowsum = (
            jnp.sum(khat * V, axis=1, keepdims=True) + binc * Vbin[0, 0]
        )  # (K0, 1)
        A = v0 / jnp.maximum(rowsum, _TINY)
        rsbin = jnp.sum(v1 * V) + Vbin[0, 0]
        Abin = n1 / jnp.maximum(rsbin, _TINY)
        # v half-step (column scaling)
        colsum = jnp.sum(khat * A, axis=0, keepdims=True) + v1 * Abin
        V = v1 / jnp.maximum(colsum, _TINY)
        csbin = jnp.sum(binc * A) + Abin
        Vbin = (n0 / jnp.maximum(csbin, _TINY)).reshape(1, 1)
        return A, V, Vbin

    A = jnp.ones((K0, 1), jnp.float32)
    V = jnp.ones((1, K1), jnp.float32)
    Vbin = jnp.ones((1, 1), jnp.float32)
    # the log path's scan ends on a v-update: its final u was computed from
    # the PREVIOUS v, so the decode must use the A carried out of the last
    # iteration's u half-step, not one recomputed from the final V
    A, V, Vbin = jax.lax.fori_loop(0, iters, body, (A, V, Vbin))

    # decode: P_ij = Khat_ij * A_i * V_j (dustbins excluded). argmax uses
    # the first-max-index rule (iota min over ties) to match jnp.argmax.
    M = khat * V  # row side: argmax_j, P factor A_i constant per row
    rowm = jnp.max(M, axis=1, keepdims=True)
    jidx = jax.lax.broadcasted_iota(jnp.int32, (K0, K1), 1)
    best1 = jnp.min(jnp.where(M >= rowm, jidx, K1), axis=1, keepdims=True)
    sc0 = A * rowm

    N = khat * A  # col side
    colm = jnp.max(N, axis=0, keepdims=True)
    iidx = jax.lax.broadcasted_iota(jnp.int32, (K0, K1), 0)
    best0 = jnp.min(jnp.where(N >= colm, iidx, K0), axis=0, keepdims=True)
    sc1 = V * colm

    best1_ref[0] = best1.astype(jnp.int32)
    sc0_ref[0] = sc0
    best0_ref[0] = best0.astype(jnp.int32)
    sc1_ref[0] = sc1


@functools.partial(jax.jit, static_argnums=(4, 5))
def sinkhorn_decode(
    scores: jax.Array,  # (B, K0, K1) f32
    valid0: jax.Array,  # (B, K0) bool
    valid1: jax.Array,  # (B, K1) bool
    alpha: jax.Array,  # () f32 dustbin score
    iters: int,
    interpret: bool = False,
):
    """Fused Sinkhorn(iters) + row/col argmax decode.

    Returns ``(best1, sc0, best0, sc1)``: per-row argmax index into kpts1
    and its coupling probability exp(log_p), and the column-side pair —
    exactly the quantities match_from_couplings derives from the full
    log-coupling table.
    """
    B, K0, K1 = scores.shape
    v0 = valid0.astype(jnp.float32)[:, :, None]
    v1 = valid1.astype(jnp.float32)[:, None, :]
    alpha2 = jnp.reshape(alpha.astype(jnp.float32), (1, 1))

    grid = (B,)
    kern = functools.partial(_sinkhorn_kernel, iters=iters)
    best1, sc0, best0, sc1 = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, K0, K1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K0, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, K1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda b: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, K0, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K0, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, K1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, K1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, K0, 1), jnp.int32),
            jax.ShapeDtypeStruct((B, K0, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, K1), jnp.int32),
            jax.ShapeDtypeStruct((B, 1, K1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(
                100 * 1024 * 1024, 4 * K0 * K1 * 4 + 8 * 1024 * 1024
            ),
        ),
        interpret=interpret,
    )(scores.astype(jnp.float32), v0, v1, alpha2)
    return (
        best1[:, :, 0],
        sc0[:, :, 0],
        best0[:, 0, :],
        sc1[:, 0, :],
    )


def match_decode(
    scores: jax.Array,
    valid0: jax.Array,
    valid1: jax.Array,
    alpha: jax.Array,
    iters: int,
    threshold: float,
    interpret: bool = False,
):
    """Drop-in fused equivalent of
    ``match_from_couplings(log_sinkhorn(...), ...)`` (superglue.py) — the
    inference decode path. Returns a superglue.MatchResult."""
    from forest_slam_tpu.frontend.superglue import MatchResult

    best1, sc0, best0, sc1 = sinkhorn_decode(
        scores, valid0, valid1, alpha, iters, interpret
    )
    B, K0 = best1.shape
    K1 = best0.shape[1]
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

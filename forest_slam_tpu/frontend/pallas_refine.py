"""Fused per-keypoint 2D SAD template-search kernel (Pallas/TPU).

The XLA cost-volume path in frontend/refine.py pays per-keypoint
dynamic-slice/gather overhead, which grows worse under the pipeline's
pair-chunk vmap (slices become gathers). This kernel removes the HBM
gathers the same way stereo/pallas_sparse.py does: both images are DMA'd
to VMEM once per (pair, keypoint-chunk) grid step and every per-keypoint
access is an in-VMEM aligned load + rotate.

Structure (deliberately restricted to the access patterns already proven
on this toolchain by stereo/pallas_sparse.py — an earlier draft using
multi-tile dynamic sublane rolls compiled 20 minutes and miscompiled):

  phase A (fori over k):  template (t x t) -> tpl_buf scratch (Kb, 8, 128)
  phase B (fori over k):  ONE aligned (LR, 256) window load + 2 rolls at
    (y1_k, x1_k), then for every template tap (ty, tx) a *static* slice
    of the resident window accumulates |W[dy+ty, dx+tx] - tpl[ty, tx]|
    over the whole (n_up, 128) cost block at once; one store per keypoint.

An earlier phase B looped (k, dy) pairs — a fresh dynamic (16, 256) load,
two dynamic rolls, and a dynamic-sublane row store per iteration: 25.6k
serialized dynamic ops per pair measured 5.7 ms/pair at R=12, K=1024.
The window-resident form does Kb dynamic loads instead of Kb*n and keeps
the inner t*t taps static (lane/sublane shifts, no roll units).

Cost semantics match refine.py's ``_cost_volume_xla`` (equivalence-tested
in tests/test_refine.py; summation order differs, so f32 agreement is to
rounding, not bit-exact).

Constraints: t <= 8 (one sublane tile holds the template) and
n + t - 1 <= 128 (lane rolls never wrap into the valid dx range), i.e.
R <= 60 at t = 8; the pipeline uses R = 8..24.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _refine_kernel(
    xi0_ref,  # (B, Kp) int32 SMEM (scalar prefetch) — frame-0 kpt cols
    yi0_ref,  # (B, Kp) int32 SMEM
    xi1_ref,  # (B, Kp) int32 SMEM — frame-1 match-estimate cols
    yi1_ref,  # (B, Kp) int32 SMEM
    nv_ref,  # (B,) int32 SMEM — keypoints to actually refine (rest zero)
    img0_ref,  # (B, Hp0, Wp0) f32 ANY — frame 0, padded
    img1_ref,  # (B, Hp1, Wp1) f32 ANY — frame 1, padded
    cost_ref,  # (1, Kb, n_up, 128) f32 out block (VMEM)
    v0,  # (Hp0, Wp0) VMEM scratch
    v1,  # (Hp1, Wp1) VMEM scratch
    tpl_buf,  # (Kb, 8, 128) VMEM scratch — phase-A templates
    sem0,
    sem1,
    *,
    Kb: int,
    t: int,
    R: int,
):
    b = pl.program_id(0)
    kc = pl.program_id(1)
    n = 2 * R + 1
    k0 = kc * Kb
    # per-chunk live count: callers compact valid keypoints to the front
    # (refine.py), so whole trailing chunks cost one zero-store and the
    # last live chunk bounds its loops — refine work scales with the
    # matched fraction, not the padded K
    kb_eff = jnp.clip(nv_ref[b] - k0, 0, Kb)

    @pl.when(kb_eff < Kb)
    def _zero_tail():
        cost_ref[...] = jnp.zeros_like(cost_ref)

    @pl.when(kb_eff > 0)
    def _live_chunk():
        # DMA the pair's images every live grid step (no reliance on
        # scratch persistence across steps; ~0.15 ms/pair of extra HBM
        # traffic at 960x600 x 16 chunks — small next to the gathers it
        # replaces)
        cp0 = pltpu.make_async_copy(img0_ref.at[b], v0, sem0)
        cp1 = pltpu.make_async_copy(img1_ref.at[b], v1, sem1)
        cp0.start()
        cp1.start()
        cp0.wait()
        cp1.wait()

        n_up = _round_up(n, 8)
        S = n + t - 1  # search-window side
        # window load covers rows ybase..ybase+LR (sublane base
        # r = y - ybase <= 7, plus S used rows, rounded up)
        LR = _round_up(S, 8) + 16

        def load8(vmem, y, x):
            # the proven aligned-load pattern: fetch the (16, 256)
            # super-tile containing (y, x), rotate the remainder offsets
            # away, keep the leading (8, 128) corner
            ybase = (y // 8) * 8
            xbase = (x // 128) * 128
            tile = vmem[pl.ds(ybase, 16), pl.ds(xbase, 256)]
            tile = pltpu.roll(tile, (16 - (y - ybase)) % 16, 0)
            tile = pltpu.roll(tile, (256 - (x - xbase)) % 256, 1)
            return tile[:8, :128]

        def phase_a(k, _):
            tpl = load8(v0, yi0_ref[b, k0 + k], xi0_ref[b, k0 + k])
            tpl_buf[pl.ds(k, 1)] = tpl[None]
            return 0

        jax.lax.fori_loop(0, kb_eff, phase_a, 0)

        # phase B, G lane-packed keypoints per iteration: each keypoint's
        # search window is only S = n + t - 1 lanes wide, so G = 128 //
        # Wg windows (Wg = smallest divisor of 128 >= S) ride the
        # 128-lane tap arithmetic together. Per member: ONE aligned
        # (LR, 256) window load whose lane roll lands window col 0 at
        # lane Wg*j. Tap (ty, tx) then adds |P[dy+ty, dx+tx] -
        # tpl_j[ty, tx]| for all G members at once — the global lane
        # shift by tx stays inside each segment because tx <= t - 1 =
        # Wg - n. Template values come from a packed splat table built
        # with vector ops only — sublane broadcast + one-hot lane mask +
        # log-rotate lane reduction (adds zeros to the single nonzero,
        # so it is EXACT in f32), then segment-masked into the shared
        # table. (History: a per-tap vector->scalar extract + splat
        # measured 7.1 ms/pair at t=8/R=12/K=1024 — the extracts were
        # ~100 ns each, the taps ~20 ns; the unpacked vector-splat form
        # measured 3.7; packing amortizes the taps G-fold.)
        Wg = next(d for d in (8, 16, 32, 64, 128) if d >= n + t - 1)
        G = 128 // Wg
        LRt = t - 1 + n_up  # rows the taps actually touch
        lane_t = jax.lax.broadcasted_iota(jnp.int32, (LRt, 128), 1)
        lane64 = jax.lax.broadcasted_iota(jnp.int32, (t * t, 128), 1)
        row64 = jax.lax.broadcasted_iota(jnp.int32, (t * t, 128), 0)

        def phase_b(g, _):
            kbase = g * G
            P = jnp.zeros((LRt, 128), jnp.float32)
            SP = jnp.zeros((t * t, 128), jnp.float32)
            for j in range(G):
                k = kbase + j
                y = yi1_ref[b, k0 + k]
                x = xi1_ref[b, k0 + k]
                ybase = (y // 8) * 8
                xbase = (x // 128) * 128
                tile = v1[pl.ds(ybase, LR), pl.ds(xbase, 256)]
                tile = pltpu.roll(tile, (LR - (y - ybase)) % LR, 0)
                tile = jax.lax.slice(tile, (0, 0), (LRt, 256))
                W = pltpu.roll(
                    tile, (256 - (x - xbase) + Wg * j) % 256, 1
                )[:, :128]
                seg = (lane_t >= Wg * j) & (lane_t < Wg * (j + 1))
                P = P + jnp.where(seg, W, 0.0)

                tpl = tpl_buf[k]  # (8, 128), template in lanes [0, t)
                spread = jnp.concatenate(
                    [
                        jnp.broadcast_to(tpl[ty : ty + 1, :], (t, 128))
                        for ty in range(t)
                    ],
                    axis=0,
                )  # (t*t, 128): row ty*t + tx holds template row ty
                splat = jnp.where(lane64 == row64 % t, spread, 0.0)
                for s in (1, 2, 4, 8, 16, 32, 64):
                    splat = splat + pltpu.roll(splat, s, 1)
                seg64 = (lane64 >= Wg * j) & (lane64 < Wg * (j + 1))
                SP = SP + jnp.where(seg64, splat, 0.0)

            acc = jnp.zeros((n_up, 128), jnp.float32)
            for tx in range(t):
                # hoist the (unaligned) lane offset: one lane-rotate per
                # template column instead of one per tap
                Ptx = pltpu.roll(P, (128 - tx) % 128, 1)
                for ty in range(t):
                    sub = jax.lax.slice(Ptx, (ty, 0), (ty + n_up, 128))
                    tval = jax.lax.slice(
                        SP, (ty * t + tx, 0), (ty * t + tx + 1, 128)
                    )  # (1, 128) -> sublane-only broadcast in the sub
                    acc = acc + jnp.abs(sub - tval)

            for j in range(G):
                # dead tail members (index arrays are zero-padded, so
                # their loads are in range) must not clobber the
                # zero-initialized rows past kb_eff
                @pl.when(kbase + j < kb_eff)
                def _store(j=j):
                    out = pltpu.roll(acc, (128 - Wg * j) % 128, 1)
                    cost_ref[0, pl.ds(kbase + j, 1), :, :] = out[None]

            return 0

        n_groups = (kb_eff + G - 1) // G
        jax.lax.fori_loop(0, n_groups, phase_b, 0)


def refine_cost_volume_pallas(
    img0: jax.Array,  # (B, H, W) frame 0
    img1: jax.Array,  # (B, H, W) frame 1
    xi0: jax.Array,  # (B, K) int32 frame-0 keypoint cols
    yi0: jax.Array,
    xi1: jax.Array,  # (B, K) int32 frame-1 estimate cols
    yi1: jax.Array,
    template: int,
    radius: int,
    interpret: bool = False,
    max_batch: int = 8,
    nvalid: jax.Array | None = None,  # (B,) int32; rows >= nvalid -> 0
) -> jax.Array:
    """(B, K, n, n) SAD cost, n = 2*radius + 1 — refine.py semantics.

    ``nvalid`` bounds the per-pair live keypoint count: callers that
    compact valid keypoints to the front (refine.py) get cost rows
    ``[nvalid:]`` as exact zeros at zero compute — chunk loops bound to
    the live count, fully-dead chunks skip even the image DMA.

    Scalar-prefetch operands live in SMEM (1 MB total): 4 index arrays of
    (B, K) int32 hit the ceiling at B*K = 64k, so batches above
    ``max_batch`` pairs are processed in chunks via lax.map (measured OOM:
    the VO pipeline's pair_chunk=64 vmap at K=1024 = exactly 1 MB).
    """
    B, H0, W0 = img0.shape
    H1, W1 = img1.shape[1:]  # frame 1 may be a downscaled copy
    if nvalid is None:
        nvalid = jnp.full((B,), xi0.shape[1], jnp.int32)
    if B > max_batch:
        Bp = _round_up(B, max_batch)
        pad = lambda a: jnp.pad(a, ((0, Bp - B),) + ((0, 0),) * (a.ndim - 1))
        chunked = jax.tree.map(
            lambda a: pad(a).reshape(
                (Bp // max_batch, max_batch) + a.shape[1:]
            ),
            (img0, img1, xi0, yi0, xi1, yi1, nvalid),
        )
        out = jax.lax.map(
            lambda c: refine_cost_volume_pallas(
                *c[:6], template, radius, interpret=interpret,
                max_batch=max_batch, nvalid=c[6],
            ),
            chunked,
        )
        return out.reshape((Bp,) + out.shape[2:])[:B]
    t = template
    R = radius
    ht = t // 2
    n = 2 * R + 1
    if t > 8 or n + t - 1 > 128:
        raise ValueError(f"pallas refine needs t<=8, 2R+t<=128; got {t}, {R}")
    K = xi0.shape[1]
    Kb = min(128, K)
    Kp = _round_up(K, Kb)
    if Kp != K:
        pad = ((0, 0), (0, Kp - K))
        xi0, yi0, xi1, yi1 = (jnp.pad(a, pad) for a in (xi0, yi0, xi1, yi1))
    n_up = _round_up(n, 8)

    # frame 0: template start (y0 - ht) + pad offset ht = y0; phase-B band
    # starts reach (y1 - ht - R) + (n - 1) + pad offset (ht + R) = y1 + n-1.
    # Aligned (16, 256) loads need +16 rows / +256 lanes past the largest
    # aligned base.
    Hp0 = _round_up(H0 + ht + 24, 8)
    Wp0 = _round_up(W0 + ht, 128) + 256
    p0 = jnp.zeros((B, Hp0, Wp0), jnp.float32)
    p0 = p0.at[:, ht : ht + H0, ht : ht + W0].set(img0.astype(jnp.float32))
    off1 = ht + R
    Hp1 = _round_up(H1 + off1 + n + 24, 8)
    Wp1 = _round_up(W1 + off1, 128) + 256
    p1 = jnp.zeros((B, Hp1, Wp1), jnp.float32)
    p1 = p1.at[:, off1 : off1 + H1, off1 : off1 + W1].set(
        img1.astype(jnp.float32)
    )

    kernel = functools.partial(_refine_kernel, Kb=Kb, t=t, R=R)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(B, Kp // Kb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, Kb, n_up, 128),
            lambda b, kc, *_: (b, kc, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((Hp0, Wp0), jnp.float32),
            pltpu.VMEM((Hp1, Wp1), jnp.float32),
            pltpu.VMEM((Kb, 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    # Scoped-VMEM budget: both padded frames + tpl scratch + the
    # double-buffered (1, Kb, n_up, 128) out block + the zero-store temp.
    # At 960x600 / R=24 that is ~16.3 MB — just past the compiler's 16 MB
    # default (v5e has 128 MB physical VMEM), so size the limit from the
    # actual buffers with headroom for spills instead of relying on the
    # default.
    n_bytes = 4 * (
        Hp0 * Wp0
        + Hp1 * Wp1
        + Kb * 8 * 128
        + 3 * Kb * n_up * 128  # out block x2 (pipelining) + zeros temp
    )
    vmem_limit = min(100 * 1024 * 1024, n_bytes + 4 * 1024 * 1024)
    cost = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Kp, n_up, 128), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
    )(
        xi0.astype(jnp.int32),
        yi0.astype(jnp.int32),
        xi1.astype(jnp.int32),
        yi1.astype(jnp.int32),
        nvalid.astype(jnp.int32),
        p0,
        p1,
    )
    return cost[:, :K, :n, :n]


def _make_single(t: int, R: int, interpret: bool):
    @jax.custom_batching.custom_vmap
    def f(img0, img1, xi0, yi0, xi1, yi1, nvalid):
        return refine_cost_volume_pallas(
            img0[None], img1[None], xi0[None], yi0[None], xi1[None],
            yi1[None], t, R, interpret=interpret, nvalid=nvalid[None],
        )[0]

    @f.def_vmap
    def f_vmap(axis_size, in_batched, img0, img1, xi0, yi0, xi1, yi1, nv):
        assert all(
            in_batched[:6]
        ), "refine_cost_volume: vmap needs all array args batched"
        if not in_batched[6]:  # nvalid defaulted to the static K
            nv = jnp.broadcast_to(nv, (axis_size,))
        out = refine_cost_volume_pallas(
            img0, img1, xi0, yi0, xi1, yi1, t, R, interpret=interpret,
            nvalid=nv,
        )
        return out, True

    return f


@functools.lru_cache(maxsize=None)
def _single_cached(t: int, R: int, interpret: bool):
    return _make_single(t, R, interpret)


def refine_cost_volume(
    img0: jax.Array,  # (H, W)
    img1: jax.Array,
    xi0: jax.Array,  # (K,) int32
    yi0: jax.Array,
    xi1: jax.Array,
    yi1: jax.Array,
    template: int,
    radius: int,
    interpret: bool = False,
    nvalid: jax.Array | None = None,  # () int32 — live keypoint count
) -> jax.Array:
    """Single-frame (K, n, n) cost; vmap-compatible (a vmapped call routes
    to the kernel's native batch grid, as in stereo/pallas_sparse.py)."""
    f = _single_cached(int(template), int(radius), bool(interpret))
    if nvalid is None:
        nvalid = jnp.int32(xi0.shape[0])
    return f(
        img0, img1,
        xi0.astype(jnp.int32), yi0.astype(jnp.int32),
        xi1.astype(jnp.int32), yi1.astype(jnp.int32),
        jnp.asarray(nvalid, jnp.int32),
    )

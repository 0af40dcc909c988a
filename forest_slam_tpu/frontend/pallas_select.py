"""Fused SuperPoint keypoint-selection kernel (Pallas).

The XLA selection stage (frontend/superpoint.py select_keypoints) runs the
9x9 NMS max-pool, the threshold/border mask, and the 4x4 block-max as
separate HBM-bound passes over the (H, W) heatmap — measured 0.39 ms
(NMS) + 0.57 ms (block-max + top_k) at 960x600 on v5e, on top of the
0.39 ms softmax/depth-to-space that materializes the heatmap. This kernel
fuses everything after the heatmap into ONE pass over VMEM-resident row
bands:

  HBM row band (+4-row halo) -> separable 9x9 max (8+8 shifted maxes)
                             -> NMS survivors + threshold + border mask
                             -> per-4-row max + argmax-row

writing only (H/4, W) pooled score/index maps back to HBM (4x less
traffic than the heat, and no intermediate NMS/kept maps). Column pooling
to 4x4 blocks plus the (approx) top-k run outside in XLA on the 4x-smaller
maps, identical semantics to the XLA block-max path (the same per-block
argmax recovery; equivalence-tested in tests/test_pallas_select.py).

Same masking semantics as the XLA path: survivors satisfy
``heat >= max(9x9 window)`` (ties coexist), ``heat > threshold`` and the
4 px border strip is suppressed (reference implementation's remove_borders;
superpoint.py select_keypoints).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HALO = 8  # rows of context above/below a band (NMS radius 4, 8-aligned)
_POOL = 4  # pooled block edge (matches select_keypoints' b=4)
_CO = 128  # column offset of true data inside the lane-padded scratch


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _select_kernel(
    heat_ref,  # (B, Hp + 2*HALO, W) f32 in ANY/HBM (rows padded by caller)
    vals_ref,  # (1, tile_h/POOL, W) f32 block
    idx_ref,  # (1, tile_h/POOL, W) i32 block
    scratch,  # (tile_h + 2*HALO, W + 2*CO) VMEM
    sem,
    *,
    tile_h: int,
    H: int,
    W: int,
    radius: int,
    threshold: float,
    border: int,
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    row0 = i * tile_h  # top output row, unpadded coords
    # zero the column margins once (rows are pre-padded in HBM; columns
    # are margin-filled here to avoid an XLA pass that re-materializes
    # the full heat just to pad it)
    scratch[:, : _CO] = jnp.zeros((tile_h + 2 * _HALO, _CO), jnp.float32)
    scratch[:, _CO + W :] = jnp.zeros(
        (tile_h + 2 * _HALO, _CO), jnp.float32
    )
    dma = pltpu.make_async_copy(
        heat_ref.at[b, pl.ds(row0, tile_h + 2 * _HALO), :],
        scratch.at[:, _CO : _CO + W],
        sem,
    )
    dma.start()
    dma.wait()
    Wp = W

    # separable 9x9 max: horizontal shifts first (full band incl. halo),
    # then vertical shifts of the horizontal maxima
    span = 2 * radius + 1
    hmax = scratch[:, _CO - radius : _CO - radius + Wp]
    for dx in range(1, span):
        hmax = jnp.maximum(
            hmax, scratch[:, _CO - radius + dx : _CO - radius + dx + Wp]
        )
    vmax = hmax[_HALO - radius : _HALO - radius + tile_h, :]
    for dy in range(1, span):
        vmax = jnp.maximum(
            vmax, hmax[_HALO - radius + dy : _HALO - radius + dy + tile_h, :]
        )

    center = scratch[_HALO : _HALO + tile_h, _CO : _CO + Wp]
    rows = jax.lax.broadcasted_iota(jnp.int32, center.shape, 0) + row0
    cols = jax.lax.broadcasted_iota(jnp.int32, center.shape, 1)
    interior = (
        (rows >= border)
        & (rows < H - border)
        & (cols >= border)
        & (cols < W - border)
    )
    kept = jnp.where(
        (center >= vmax) & (center > threshold) & interior, center, 0.0
    )

    # per-4-row max + argmax-row (column pooling happens outside in XLA on
    # the 4x-reduced maps — same split as pallas_detect.py)
    n_pool = tile_h // _POOL
    k3 = kept.reshape(n_pool, _POOL, Wp)
    rowmax = k3[:, 0, :]
    rowarg = jnp.zeros((n_pool, Wp), jnp.int32)
    for r in range(1, _POOL):
        v = k3[:, r, :]
        better = v > rowmax
        rowmax = jnp.where(better, v, rowmax)
        rowarg = jnp.where(better, r, rowarg)
    gy = (
        jax.lax.broadcasted_iota(jnp.int32, rowmax.shape, 0) * _POOL
        + row0
        + rowarg
    )
    gx = jax.lax.broadcasted_iota(jnp.int32, rowmax.shape, 1)
    vals_ref[:] = rowmax
    idx_ref[:] = gy * Wp + gx


def nms_pooled_batched(
    heat: jax.Array,
    radius: int = 4,
    threshold: float = 0.005,
    border: int = 4,
    interpret: bool = False,
):
    """Fused NMS + threshold + border + 4-row pooling over a (B, H, W)
    heat stack -> ((B, Hp/4, Wp) f32 pooled scores with 0 for empty rows,
    (B, Hp/4, Wp) i32 flat indices y * Wp + x), plus Wp.

    Suppressed/empty positions carry score 0 (selection keeps
    ``vals > 0``, matching the XLA path's ``kept`` zeros)."""
    B, H, W = heat.shape
    if radius > _HALO:
        raise ValueError(f"radius {radius} exceeds halo {_HALO}")
    if W % 128:
        raise ValueError(f"W must be lane-aligned (128), got {W}")
    tile_h = 64
    Hp = _round_up(H, tile_h)
    # rows only: a cheap contiguous concat (~(Hp-H+16)/H extra traffic),
    # vs re-materializing the whole heat for column pads — columns are
    # margin-filled inside the kernel instead
    zt = jnp.zeros((B, _HALO, W), jnp.float32)
    zb = jnp.zeros((B, Hp - H + _HALO, W), jnp.float32)
    padded = jnp.concatenate([zt, heat.astype(jnp.float32), zb], axis=1)

    kernel = functools.partial(
        _select_kernel,
        tile_h=tile_h,
        H=H,
        W=W,
        radius=radius,
        threshold=threshold,
        border=border,
    )
    out_spec = pl.BlockSpec(
        (None, tile_h // _POOL, W),
        lambda b, i: (b, i, 0),
        memory_space=pltpu.VMEM,
    )
    vals, idx = pl.pallas_call(
        kernel,
        grid=(B, Hp // tile_h),
        out_shape=(
            jax.ShapeDtypeStruct((B, Hp // _POOL, W), jnp.float32),
            jax.ShapeDtypeStruct((B, Hp // _POOL, W), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(out_spec, out_spec),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * _HALO, W + 2 * _CO), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(padded)
    return vals, idx, W


def _make_nms_pooled(radius, threshold, border, interpret):
    # fb is the (B, H, W) batched entry; its vmap rule collapses one
    # leading batch axis and calls fb again, so arbitrarily nested vmaps
    # (e.g. frames x octaves in the multi-scale extraction) all funnel
    # into ONE flat pallas_call instead of hitting pallas' default
    # batching rule (which cannot batch ANY-memory-space blocks).
    @jax.custom_batching.custom_vmap
    def fb(heats):
        vals, idx, _ = nms_pooled_batched(
            heats, radius, threshold, border, interpret
        )
        return vals, idx

    @fb.def_vmap
    def fb_vmap(axis_size, in_batched, heats):
        del axis_size, in_batched
        B2, B = heats.shape[0], heats.shape[1]
        vals, idx = fb(heats.reshape(B2 * B, *heats.shape[2:]))
        return (
            vals.reshape(B2, B, *vals.shape[1:]),
            idx.reshape(B2, B, *idx.shape[1:]),
        ), (True, True)

    def f(heat):
        vals, idx = fb(heat[None])
        return vals[0], idx[0]

    return f


@functools.lru_cache(maxsize=None)
def _nms_pooled_cached(radius, threshold, border, interpret):
    return _make_nms_pooled(radius, threshold, border, interpret)


def nms_pooled(
    heat: jax.Array,
    radius: int = 4,
    threshold: float = 0.005,
    border: int = 4,
    interpret: bool = False,
):
    """Fused selection pooling: (H, W) heat -> per-4-row (scores, flat
    indices, W). vmap-compatible (dispatches to nms_pooled_batched)."""
    W = heat.shape[-1]
    f = _nms_pooled_cached(
        int(radius), float(threshold), int(border), bool(interpret)
    )
    vals, idx = f(heat)
    return vals, idx, W

"""Fused FAST-9 + Harris + NMS + cell-pooling detection kernel (Pallas).

The XLA version of the detection stage (frontend/fast.py + the bucketed
selection in frontend/orb.py) round-trips ~40 full-image temporaries
through HBM (16 ring shifts, 24-stack arc mins, Harris products, NMS
pools): measured 3.1 ms/frame at 960x600 on v5e, the single largest cost
in the ORB front-end. This kernel computes the whole stage in ONE pass
over row tiles held in VMEM:

  HBM row-tile (+4-row halo) -> ring diffs -> FAST-9 arc score
                             -> Sobel/Harris -> rank = where(fast, harris)
                             -> 3x3 NMS -> per 8x8-cell max + argmax

and writes only the (H/8, W/8) pooled score/index maps back to HBM —
~64x less traffic than the dense maps. Keypoint selection is then a tiny
``top_k`` over cells (frontend/orb.py), identical semantics to the
XLA path (same formulas as frontend/fast.py; equivalence-tested).

The image is pre-padded on the host: 4 halo rows/cols of zeros (FAST ring
3 + Sobel 1; Harris' 7-box adds 3 more inside the tile) and lane-aligned
width. Pixels outside the true image are masked to -inf before pooling.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from forest_slam_tpu.frontend.fast import FAST_OFFSETS

_HALO = 8  # rows of context above/below a tile (ring 3 + sobel 1 + box 3 + nms 1)
_CELL = 8


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _fast_score(tile: jax.Array, threshold: float) -> jax.Array:
    """FAST-9 score for the centered (Hc, Wc) region of ``tile``.

    ``tile`` must have >= 3 rows/cols of context around the region.
    Identical math to fast.py:fast_score_map (16 ring diffs, best
    min-over-9-contiguous arc, bright/dark, threshold), but the windowed
    reductions use a shared log-tree (min9 via min1->min2->min4->min8) —
    ~3x fewer ops and live temporaries than the naive 16x8 chains, which
    also keeps the Mosaic program small."""
    Ht, Wt = tile.shape
    Hc, Wc = Ht - 6, Wt - 6
    center = tile[3 : 3 + Hc, 3 : 3 + Wc]
    diffs = []
    for dy, dx in FAST_OFFSETS:
        diffs.append(tile[3 + dy : 3 + dy + Hc, 3 + dx : 3 + dx + Wc] - center)
    d = diffs + diffs[:8]  # 24 circular entries

    def windowed9(vals, op):
        m2 = [op(vals[s], vals[s + 1]) for s in range(len(vals) - 1)]
        m4 = [op(m2[s], m2[s + 2]) for s in range(len(m2) - 2)]
        m8 = [op(m4[s], m4[s + 4]) for s in range(len(m4) - 4)]
        return [op(m8[s], vals[s + 8]) for s in range(16)]

    mins = windowed9(d, jnp.minimum)  # bright arc: min over the window
    maxs = windowed9(d, jnp.maximum)  # dark arc: min over -d = -max over d
    bright = functools.reduce(jnp.maximum, mins)
    dark = -functools.reduce(jnp.minimum, maxs)
    score = jnp.maximum(bright, dark)
    return jnp.where(score > threshold, score, 0.0)


def _harris(tile: jax.Array, block_size: int, k: float) -> jax.Array:
    """Harris response for the centered region (context >= 4 rows/cols).

    Same formulas as fast.py:harris_response (Sobel 3x3, unnormalized
    box sum over block_size, OpenCV's 1/(4*255*block) scaling)."""
    Ht, Wt = tile.shape
    r = block_size // 2
    # Sobel on the region grown by the box radius
    Hg, Wg = Ht - 2, Wt - 2  # after 3x3 sobel

    def shift(dy, dx):
        return tile[1 + dy : 1 + dy + Hg, 1 + dx : 1 + dx + Wg]

    # separable sobel: smooth [1,2,1] x deriv [-1,0,1]
    gx = (
        (shift(-1, 1) + 2 * shift(0, 1) + shift(1, 1))
        - (shift(-1, -1) + 2 * shift(0, -1) + shift(1, -1))
    )
    gy = (
        (shift(1, -1) + 2 * shift(1, 0) + shift(1, 1))
        - (shift(-1, -1) + 2 * shift(-1, 0) + shift(-1, 1))
    )
    scale = 1.0 / ((1 << 2) * block_size * 255.0)
    gx = gx * scale
    gy = gy * scale
    ixx, iyy, ixy = gx * gx, gy * gy, gx * gy

    def box(a):
        # separable: rows then cols — 2b adds instead of b^2
        Hc, Wc = Hg - 2 * r, Wg - 2 * r
        rows = None
        for dy in range(block_size):
            t = a[dy : dy + Hc]
            rows = t if rows is None else rows + t
        out = None
        for dx in range(block_size):
            t = rows[:, dx : dx + Wc]
            out = t if out is None else out + t
        return out

    bxx, byy, bxy = box(ixx), box(iyy), box(ixy)
    det = bxx * byy - bxy * bxy
    tr = bxx + byy
    return det - k * tr * tr


def _detect_kernel(
    img_ref,  # (B, Hp + 2*HALO, Wp + 256) f32 in ANY/HBM, data at [HALO, 128]
    vals_ref,  # (1, TILE/8, Wp) f32 block
    idx_ref,  # (1, TILE/8, Wp) i32 block
    scratch,  # (TILE + 2*HALO, Wp + 256) VMEM
    dref,  # (24, tile_h + 2, Wp + 2) VMEM — circular FAST ring diffs
    sem,
    *,
    tile_h: int,
    Wp: int,
    H: int,
    W: int,
    threshold: float,
    harris_block: int,
    harris_k: float,
    margin: int,
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    row0 = i * tile_h  # top output row, in unpadded coords
    dma = pltpu.make_async_copy(
        img_ref.at[b, pl.ds(row0, tile_h + 2 * _HALO), :], scratch, sem
    )
    dma.start()
    dma.wait()

    # target region for ranking: (tile_h + 2, Wp + 2) — one extra ring for
    # the 3x3 NMS. Harris needs 4 more rows/cols of context (Sobel 1 +
    # box 3) -> (tile_h+10, Wp+10); FAST needs 3 -> one less on each side.
    co = 128  # column offset of the true data inside the padded width
    f_tile = scratch[
        _HALO - 5 : _HALO + tile_h + 5, co - 5 : co + Wp + 5
    ]
    # FAST-9: the fully-unrolled arc min/max trees overflow the Mosaic
    # compiler (tpu_compile_helper crashes above ~100 live vector temps), so
    # the 24 circular ring diffs are materialized in VMEM and the windowed
    # reductions run as ROLLED fori_loops with dynamic leading-dim indexing
    # — a tiny program with the same arithmetic (frontend/fast.py parity).
    # (A log-tree through a second VMEM stage buffer was tried: the kernel
    # already sits at ~15.9 MB of scoped VMEM incl. spills, and the extra
    # 5.8 MB buffer overflows the 16 MB limit on hardware.)
    s = f_tile[1:-1, 1:-1]
    Hc, Wc = tile_h + 2, Wp + 2
    center = s[3 : 3 + Hc, 3 : 3 + Wc]
    for k, (dy, dx) in enumerate(FAST_OFFSETS):
        d = s[3 + dy : 3 + dy + Hc, 3 + dx : 3 + dx + Wc] - center
        dref[k] = d
        if k < 8:  # circular continuation for windows wrapping past 15
            dref[k + 16] = d
    big = jnp.float32(3.4e38)

    def arc_red(sidx, op, init):
        return jax.lax.fori_loop(
            0, 9, lambda k, acc: op(acc, dref[sidx + k]), init
        )

    bright = jax.lax.fori_loop(
        0, 16,
        lambda sx, best: jnp.maximum(
            best, arc_red(sx, jnp.minimum, jnp.full((Hc, Wc), big))
        ),
        jnp.full((Hc, Wc), -big),
    )
    dark = -jax.lax.fori_loop(
        0, 16,
        lambda sx, best: jnp.minimum(
            best, arc_red(sx, jnp.maximum, jnp.full((Hc, Wc), -big))
        ),
        jnp.full((Hc, Wc), big),
    )
    fast = jnp.maximum(bright, dark)
    fast = jnp.where(fast > threshold, fast, 0.0)
    harris = _harris(f_tile, harris_block, harris_k)  # (tile_h+2, Wp+2)

    neg = jnp.float32(-jnp.inf)
    rows = jax.lax.broadcasted_iota(jnp.int32, fast.shape, 0) + (row0 - 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, fast.shape, 1) - 1
    interior = (
        (rows >= margin)
        & (rows < H - margin)
        & (cols >= margin)
        & (cols < W - margin)
    )
    ranked = jnp.where((fast > 0.0) & interior, harris, neg)

    # 3x3 NMS on the inner (tile_h, Wp) region
    nbr = ranked[1:-1, 1:-1]
    for dy in range(3):
        for dx in range(3):
            if dy == 1 and dx == 1:
                continue
            nbr = jnp.maximum(nbr, ranked[dy : dy + tile_h, dx : dx + Wp])
    kept = jnp.where(ranked[1:-1, 1:-1] >= nbr, ranked[1:-1, 1:-1], neg)

    # row-pool within each 8-row band (sublane-dim reshape + elementwise
    # compare chain — Mosaic rejects strided/gather-style cell slicing; the
    # cheap per-column->per-cell pooling happens outside in XLA on the
    # 8x-smaller maps)
    nc_y = tile_h // _CELL
    k3 = kept.reshape(nc_y, _CELL, Wp)
    rowmax = k3[:, 0, :]
    rowarg = jnp.zeros((nc_y, Wp), jnp.int32)
    for r in range(1, _CELL):
        v = k3[:, r, :]
        better = v > rowmax
        rowmax = jnp.where(better, v, rowmax)
        rowarg = jnp.where(better, r, rowarg)
    gy = (jax.lax.broadcasted_iota(jnp.int32, rowmax.shape, 0) * _CELL
          + row0 + rowarg)
    gx = jax.lax.broadcasted_iota(jnp.int32, rowmax.shape, 1)
    vals_ref[:] = rowmax
    idx_ref[:] = gy * Wp + gx


def detect_pooled_batched(
    images: jax.Array,
    threshold: float = 20.0,
    harris_block: int = 7,
    harris_k: float = 0.04,
    margin: int = 16,
    interpret: bool = False,
):
    """Fused detection over a (B, H, W) stack -> per-8x8-cell
    ((B, Hp/8, Wp/8) f32 scores with -inf for empty cells,
    (B, Hp/8, Wp/8) i32 flat indices y * Wp + x).

    The batch is a leading grid dimension (pallas can't block an
    ANY-memory-space operand under vmap, so batching is explicit here and
    ``detect_pooled`` routes vmap to this function)."""
    B, H, W = images.shape
    # tile_h/8 is the output block's second-to-last dim — Mosaic requires
    # it divisible by 8, so the row tile must be 64
    tile_h = 64
    Hp = _round_up(H, tile_h)
    Wp = _round_up(W, 128)
    padded = jnp.zeros((B, Hp + 2 * _HALO, Wp + 256), jnp.float32)
    padded = padded.at[
        :, _HALO : _HALO + H, 128 : 128 + W
    ].set(images.astype(jnp.float32))

    kernel = functools.partial(
        _detect_kernel,
        tile_h=tile_h,
        Wp=Wp,
        H=H,
        W=W,
        threshold=threshold,
        harris_block=harris_block,
        harris_k=harris_k,
        margin=margin,
    )
    out_spec = pl.BlockSpec(
        (None, tile_h // _CELL, Wp),
        lambda b, i: (b, i, 0),
        memory_space=pltpu.VMEM,
    )
    rvals, ridx = pl.pallas_call(
        kernel,
        grid=(B, Hp // tile_h),
        out_shape=(
            jax.ShapeDtypeStruct((B, Hp // _CELL, Wp), jnp.float32),
            jax.ShapeDtypeStruct((B, Hp // _CELL, Wp), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(out_spec, out_spec),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * _HALO, Wp + 256), jnp.float32),
            pltpu.VMEM((24, tile_h + 2, Wp + 2), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(padded)
    # finish the pooling over columns in XLA on the 8x-reduced maps
    nc_y, nc_x = Hp // _CELL, Wp // _CELL
    rv = rvals.reshape(B, nc_y, nc_x, _CELL)
    ri = ridx.reshape(B, nc_y, nc_x, _CELL)
    sel = jnp.argmax(rv, axis=-1)
    vals = jnp.take_along_axis(rv, sel[..., None], axis=-1)[..., 0]
    idx = jnp.take_along_axis(ri, sel[..., None], axis=-1)[..., 0]
    return vals, idx


def _make_detect_pooled(threshold, harris_block, harris_k, margin, interpret):
    @jax.custom_batching.custom_vmap
    def f(image):
        vals, idx = detect_pooled_batched(
            image[None], threshold, harris_block, harris_k, margin, interpret
        )
        return vals[0], idx[0]

    @f.def_vmap
    def f_vmap(axis_size, in_batched, images):
        del axis_size, in_batched
        vals, idx = detect_pooled_batched(
            images, threshold, harris_block, harris_k, margin, interpret
        )
        return (vals, idx), (True, True)

    return f


@functools.lru_cache(maxsize=None)
def _detect_pooled_cached(threshold, harris_block, harris_k, margin, interpret):
    return _make_detect_pooled(threshold, harris_block, harris_k, margin, interpret)


def detect_pooled(
    image: jax.Array,
    threshold: float = 20.0,
    harris_block: int = 7,
    harris_k: float = 0.04,
    margin: int = 16,
    interpret: bool = False,
):
    """Fused detection: (H, W) image -> per-8x8-cell (scores, flat indices,
    Wp). vmap-compatible (dispatches to detect_pooled_batched)."""
    W = image.shape[-1]
    f = _detect_pooled_cached(
        float(threshold), int(harris_block), float(harris_k), int(margin),
        bool(interpret),
    )
    vals, idx = f(image)
    return vals, idx, _round_up(W, 128)

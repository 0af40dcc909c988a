"""SuperPoint-style keypoint detector + descriptor network (Flax).

Architecture-faithful rebuild of the SuperPoint model the reference drives
through its ``Matching`` wrapper (config at stereo_slam.py:67-77:
``nms_radius=4, keypoint_threshold=0.005, max_keypoints=1024``): a shared
VGG encoder, a 65-channel detector head (8x8 cells + dustbin), and a 256-d
descriptor head. The reference's pretrained weights ship in a git submodule
that is not vendored (SURVEY.md §7.3 item 3), so weights here are trained
in-repo (train/); the architecture and inference semantics match.

TPU-first details:

- all convs run in bfloat16 with float32 accumulation (MXU path); params
  stay float32;
- keypoint selection is dense NMS (reduce_window max-pool) + global
  ``top_k`` into **fixed** ``max_keypoints`` slots with a validity mask —
  no dynamic shapes anywhere (SURVEY.md §7.1);
- descriptor sampling is a batched bilinear gather on the coarse grid
  (equivalent to the reference implementation's grid_sample), then
  L2-normalized.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from forest_slam_tpu.utils import tpu_backend
import flax.linen as nn

from forest_slam_tpu.utils.filters import maxpool2d_same


class SuperPointConfig(NamedTuple):
    nms_radius: int = 4  # stereo_slam.py:69
    keypoint_threshold: float = 0.005  # stereo_slam.py:70
    max_keypoints: int = 1024  # stereo_slam.py:71
    descriptor_dim: int = 256
    channels: tuple = (64, 64, 128, 128)
    dtype: type = jnp.bfloat16
    # Space-to-depth factor applied to the input (1, 2, 4, or 8). The
    # classic VGG stem (stride 1) is HBM-bound on TPU: the two full-res
    # 64-channel conv activations dominate the network's memory traffic
    # (measured ~6.5 ms/frame at 960x600 on v5e, ~25x off roofline).
    # stem_stride s moves the first block to H/s x W/s and drops
    # log2(s) of the 2x2 pools so the heads still see (H/8, W/8) cells;
    # total downsample stays 8 and the detector/descriptor contracts are
    # unchanged. Checkpoints are tied to this value.
    stem_stride: int = 1
    # Keypoint selection: "approx" uses lax.approx_max_k over the
    # per-block maxima (TPU-native partial-reduce PartialReduce op;
    # recall 0.99 of the weakest-scoring slots is harmless for matching
    # — measured 0.68 -> ~0.2 ms at 960x600). "exact" is full top_k.
    topk_method: str = "approx"
    # Descriptor bilinear sampling reads the coarse grid in this dtype
    # (bandwidth: 4 gathers x K x 256; bf16 halves it). Accumulation and
    # the final L2 normalization stay float32.
    desc_sample_dtype: type = jnp.bfloat16
    # NMS + block pooling backend: "auto" fuses them into one VMEM pass
    # (frontend/pallas_select.py) on TPU and keeps the XLA reduce_window
    # path elsewhere; "xla" / "pallas" / "pallas_interpret" force a path.
    nms_backend: str = "auto"
    # Sub-pixel keypoint readout: "com3" refines each selected peak by the
    # 3x3 center of mass of the detector heatmap (two separable 3x3
    # convolutions + one gather per keypoint — dense, TPU-cheap). Only
    # meaningful for checkpoints trained with bilinear-soft detector
    # targets (train/losses.py detector_labels_soft), which make the
    # heatmap interpolable; hard-label checkpoints keep "none" via their
    # stored meta. Motivation: PnP's 1 px reference gate rejects plain
    # SuperGlue matches at wide baselines almost entirely for sub-pixel
    # localization reasons (VERDICT r2 missing #1 diagnostics).
    subpixel: str = "none"


class SuperPointFeatures(NamedTuple):
    """Fixed-size keypoint set (batched). Invalid slots: valid=False."""

    xy: jax.Array  # (B, K, 2) float32 pixel coords (x, y)
    score: jax.Array  # (B, K) float32 detector confidence
    desc: jax.Array  # (B, K, D) float32 L2-normalized descriptors
    valid: jax.Array  # (B, K) bool


def _vgg_block(x, ch, dtype, name_prefix, n=2):
    for i in range(n):
        x = nn.Conv(ch, (3, 3), padding="SAME", dtype=dtype, name=f"{name_prefix}_{i}")(x)
        x = nn.relu(x)
    return x


class SuperPointRaw(NamedTuple):
    """Dense network outputs (training consumes logits, inference the heat)."""

    heat: jax.Array  # (B, H, W) keypoint probability
    coarse_desc: jax.Array  # (B, H/8, W/8, D) L2-normalized
    det_logits: jax.Array  # (B, H/8, W/8, 65) pre-softmax detector head


class SuperPointNet(nn.Module):
    """Raw network: image -> SuperPointRaw."""

    cfg: SuperPointConfig = SuperPointConfig()

    @nn.compact
    def __call__(self, image: jax.Array):
        # image: (B, H, W) float32 in [0, 1]
        cfg = self.cfg
        dt = cfg.dtype
        s = cfg.stem_stride
        if s not in (1, 2, 4, 8):
            raise ValueError(f"stem_stride must be 1/2/4/8, got {s}")
        x = image[..., None].astype(dt)
        if s > 1:  # space-to-depth: (B, H, W, 1) -> (B, H/s, W/s, s*s)
            B, H, W, _ = x.shape
            x = x.reshape(B, H // s, s, W // s, s)
            x = x.transpose(0, 1, 3, 2, 4).reshape(B, H // s, W // s, s * s)
        n_pools = 3 - {1: 0, 2: 1, 4: 2, 8: 3}[s]
        c1, c2, c3, c4 = cfg.channels
        x = _vgg_block(x, c1, dt, "enc1")
        if n_pools >= 1:
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = _vgg_block(x, c2, dt, "enc2")
        if n_pools >= 2:
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = _vgg_block(x, c3, dt, "enc3")
        if n_pools >= 3:
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = _vgg_block(x, c4, dt, "enc4")  # (B, H/8, W/8, c4)

        # detector head: 65 = 8x8 cell pixels + dustbin
        det = nn.Conv(256, (3, 3), padding="SAME", dtype=dt, name="det_conv")(x)
        det = nn.relu(det)
        logits = nn.Conv(65, (1, 1), dtype=dt, name="det_out")(det)
        logits = logits.astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)[..., :64]  # drop dustbin
        B, Hc, Wc, _ = probs.shape
        # depth-to-space: (B, Hc, Wc, 64) -> (B, Hc*8, Wc*8)
        heat = probs.reshape(B, Hc, Wc, 8, 8)
        heat = heat.transpose(0, 1, 3, 2, 4).reshape(B, Hc * 8, Wc * 8)

        # descriptor head
        dsc = nn.Conv(256, (3, 3), padding="SAME", dtype=dt, name="desc_conv")(x)
        dsc = nn.relu(dsc)
        dsc = nn.Conv(cfg.descriptor_dim, (1, 1), dtype=dt, name="desc_out")(dsc)
        dsc = dsc.astype(jnp.float32)
        dsc = dsc / jnp.maximum(
            jnp.linalg.norm(dsc, axis=-1, keepdims=True), 1e-8
        )
        return SuperPointRaw(heat=heat, coarse_desc=dsc, det_logits=logits)


def _sample_coarse_descriptors(
    coarse: jax.Array, xy: jax.Array, cell: int = 8, sample_dtype=None
) -> jax.Array:
    """Bilinear-sample (Hc, Wc, D) coarse descriptors at pixel coords
    (K, 2); returns L2-normalized float32 (K, D). ``sample_dtype``
    controls the gather read dtype (bf16 halves the 4xKxD bandwidth);
    interpolation weights and normalization run float32."""
    Hc, Wc, D = coarse.shape
    if sample_dtype is not None:
        coarse = coarse.astype(sample_dtype)
    # pixel -> coarse grid coords (cell centres at cell/2 - 0.5 offsets)
    u = (xy[:, 0] + 0.5) / cell - 0.5
    v = (xy[:, 1] + 0.5) / cell - 0.5
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = (u - u0)[:, None]
    fv = (v - v0)[:, None]
    u0 = jnp.clip(u0.astype(jnp.int32), 0, Wc - 1)
    v0 = jnp.clip(v0.astype(jnp.int32), 0, Hc - 1)
    u1 = jnp.clip(u0 + 1, 0, Wc - 1)
    v1 = jnp.clip(v0 + 1, 0, Hc - 1)
    d = (
        coarse[v0, u0].astype(jnp.float32) * (1 - fu) * (1 - fv)
        + coarse[v0, u1].astype(jnp.float32) * fu * (1 - fv)
        + coarse[v1, u0].astype(jnp.float32) * (1 - fu) * fv
        + coarse[v1, u1].astype(jnp.float32) * fu * fv
    )
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)


def subpixel_com(
    heat: jax.Array, xy: jax.Array, valid: jax.Array, radius: int = 1
) -> jax.Array:
    """Refine integer peak coords by the (2r+1)^2 heat center of mass.

    Dense formulation: the numerator/denominator fields are separable
    convolutions of the heatmap, so per keypoint only 3 gathers remain.
    ``radius=1`` is the com3 readout trained in round 3; ``radius=2``
    (com5) integrates a wider mass support — under forward-motion scale
    change the detector's soft peak spreads beyond 3x3, and the wider
    window tracks the true corner with less truncation bias. Offsets are
    clipped to (-0.5, 0.5) for r=1 (a true corner farther than half a
    pixel from the peak would have made the neighbouring pixel the peak)
    and (-1.0, 1.0) for wider windows (neighbouring-cell mass can
    legitimately pull past the half-pixel line when the peak is broad).
    """
    from forest_slam_tpu.utils.filters import conv2d_separable

    H, W = heat.shape
    n = 2 * radius + 1
    k_sum = jnp.ones((n,), jnp.float32)
    k_off = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    den = conv2d_separable(heat, k_sum, k_sum)
    num_x = conv2d_separable(heat, k_off, k_sum)
    num_y = conv2d_separable(heat, k_sum, k_off)
    xi = jnp.clip(xy[:, 0].astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(xy[:, 1].astype(jnp.int32), 0, H - 1)
    d = jnp.maximum(den[yi, xi], 1e-12)
    off = jnp.stack([num_x[yi, xi] / d, num_y[yi, xi] / d], axis=-1)
    lim = 0.5 if radius == 1 else 1.0
    off = jnp.clip(off, -lim, lim)
    return xy + off * valid[:, None]


def subpixel_com3(heat: jax.Array, xy: jax.Array, valid: jax.Array) -> jax.Array:
    """3x3 center-of-mass readout (see :func:`subpixel_com`)."""
    return subpixel_com(heat, xy, valid, radius=1)


def select_keypoints(
    heat: jax.Array, coarse_desc: jax.Array, cfg: SuperPointConfig
) -> SuperPointFeatures:
    """Dense heatmaps -> fixed-size keypoint sets (batched over B).

    top_k over the full H*W map is a sizeable fraction of extraction time
    (~3 ms/frame at 960x600). After NMS with radius r, two survivors are
    more than r apart in at least one axis, so a b x b block with
    b <= r + 1 holds at most one survivor (ties excepted) — top_k can run
    over per-block maxima (16x fewer elements at b=4) and recover the
    in-block position afterwards. Results match the dense top_k except on
    exactly-tied scores: the >= NMS comparison lets two equal survivors
    coexist, and when both land in one block only the argmax-first one is
    kept, while tie *ordering* across blocks can also differ from the
    dense path. Real heatmap scores tie with probability ~0; the fixture
    tests use distinct scores.

    With ``cfg.topk_method == "approx"`` (the default) the block-max
    top_k runs through ``lax.approx_max_k`` (the TPU PartialReduce op,
    recall_target 0.99): up to ~1% of the *weakest-scoring* slots may be
    swapped for near-ties — harmless for matching, and the bench/ablation
    accuracy gates run with it on. Set ``topk_method="exact"`` for the
    fully deterministic path.
    """
    b = 4
    use_blocks = cfg.nms_radius >= b - 1
    backend = cfg.nms_backend
    if backend == "auto":
        # the fused kernel requires a lane-aligned width (multi-octave
        # resizes aren't in general); those fall back to the XLA path
        lane_ok = heat.shape[-1] % 128 == 0
        backend = (
            "pallas"
            if tpu_backend() and lane_ok
            else "xla"
        )

    def topk(scores):
        if cfg.topk_method == "approx":
            vals, i = jax.lax.approx_max_k(
                scores, cfg.max_keypoints, recall_target=0.99
            )
            return vals, i.astype(jnp.int32)
        return jax.lax.top_k(scores, cfg.max_keypoints)

    def one_fused(h, d):
        """Fused pallas path: NMS+threshold+border+4-row pooling in one
        VMEM pass, then 4-col pooling + top-k on the 16x-reduced maps."""
        from forest_slam_tpu.frontend.pallas_select import nms_pooled

        H, W = h.shape
        vals4, idx4, Wp = nms_pooled(
            h,
            radius=cfg.nms_radius,
            threshold=cfg.keypoint_threshold,
            border=4,
            interpret=backend == "pallas_interpret",
        )
        Hq, _ = vals4.shape  # (Hp/4, Wp)
        rv = vals4.reshape(Hq, Wp // b, b)
        ri = idx4.reshape(Hq, Wp // b, b)
        # column pooling as a compare chain (gather-free; the TPU gather
        # unit would dominate a take_along_axis over the full block map)
        bvals, bidx = rv[..., 0], ri[..., 0]
        for j in range(1, b):
            better = rv[..., j] > bvals
            bvals = jnp.where(better, rv[..., j], bvals)
            bidx = jnp.where(better, ri[..., j], bidx)
        vals, t = topk(bvals.reshape(-1))
        flat = bidx.reshape(-1)[t]
        valid = vals > 0.0
        xy = jnp.stack(
            [
                (flat % Wp).astype(jnp.float32),
                (flat // Wp).astype(jnp.float32),
            ],
            axis=-1,
        )
        xy = xy * valid[:, None]
        if cfg.subpixel in ("com3", "com5"):
            xy = subpixel_com(
                h, xy, valid, radius=1 if cfg.subpixel == "com3" else 2
            )
        desc = _sample_coarse_descriptors(
            d, xy, sample_dtype=cfg.desc_sample_dtype
        )
        return xy, vals, desc, valid

    def one(h, d):
        H, W = h.shape
        nms = maxpool2d_same(h, 2 * cfg.nms_radius + 1)
        kept = jnp.where((h >= nms) & (h > cfg.keypoint_threshold), h, 0.0)
        # suppress the image border (matches the reference impl's 4px strip)
        ys = jnp.arange(H)[:, None]
        xs = jnp.arange(W)[None, :]
        bb = 4
        interior = (ys >= bb) & (ys < H - bb) & (xs >= bb) & (xs < W - bb)
        kept = jnp.where(interior, kept, 0.0)
        if (
            use_blocks
            and H % b == 0
            and W % b == 0
            and (H // b) * (W // b) >= cfg.max_keypoints
        ):
            Hb, Wb = H // b, W // b
            blocks = (
                kept.reshape(Hb, b, Wb, b)
                .transpose(0, 2, 1, 3)
                .reshape(Hb * Wb, b * b)
            )
            bmax = jnp.max(blocks, axis=1)  # (Hb*Wb,)
            vals, bidx = topk(bmax)
            local = jnp.argmax(blocks[bidx], axis=1)  # (K,) in-block argmax
            by = bidx // Wb
            bx = bidx % Wb
            yy = by * b + local // b
            xx = bx * b + local % b
            idx = yy * W + xx
        else:
            vals, idx = jax.lax.top_k(kept.reshape(-1), cfg.max_keypoints)
        valid = vals > 0.0
        xy = jnp.stack(
            [(idx % W).astype(jnp.float32), (idx // W).astype(jnp.float32)],
            axis=-1,
        )
        xy = xy * valid[:, None]
        if cfg.subpixel in ("com3", "com5"):
            xy = subpixel_com(
                h, xy, valid, radius=1 if cfg.subpixel == "com3" else 2
            )
        desc = _sample_coarse_descriptors(
            d, xy, sample_dtype=cfg.desc_sample_dtype
        )
        return xy, vals, desc, valid

    fn = one_fused if backend.startswith("pallas") else one
    xy, score, desc, valid = jax.vmap(fn)(heat, coarse_desc)
    return SuperPointFeatures(xy=xy, score=score, desc=desc, valid=valid)


class SuperPoint(nn.Module):
    """Full extractor: batched images -> SuperPointFeatures."""

    cfg: SuperPointConfig = SuperPointConfig()

    @nn.compact
    def __call__(self, image: jax.Array) -> SuperPointFeatures:
        raw = SuperPointNet(self.cfg, name="net")(image)
        return select_keypoints(raw.heat, raw.coarse_desc, self.cfg)

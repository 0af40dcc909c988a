"""Self-supervised training data for the learned front-end.

The reference's SuperPoint/SuperGlue weights are not vendored (empty
submodule, SURVEY.md §7.3 item 3), so the models are trained in-repo with
the standard self-supervised recipe: synthetic geometric images with known
corner ground truth (MagicPoint-style) warped by random homographies to
produce correspondence-labelled pairs. Everything is pure jnp and jit-able —
batches are generated on-device, so the input pipeline never bottlenecks
the TPU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from forest_slam_tpu.core.camera import remap_bilinear


def random_corner_image(
    key: jax.Array,
    height: int,
    width: int,
    n_shapes: int = 12,
    max_corners: int = 48,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One synthetic scene of rotated rectangles on a noise background.

    Returns (image (H, W) [0,255], corners (max_corners, 2) xy, corner_valid
    (max_corners,)). Corners of later (over-painting) shapes win; corners of
    earlier shapes may be occluded — tolerable label noise, as in
    homographic-adaptation pipelines.
    """
    keys = jax.random.split(key, 6)
    bg = jax.random.uniform(keys[0], (height, width)) * 40.0 + 60.0

    centers = jax.random.uniform(
        keys[1], (n_shapes, 2),
        minval=jnp.array([width * 0.1, height * 0.1]),
        maxval=jnp.array([width * 0.9, height * 0.9]),
    )
    sizes = jax.random.uniform(
        keys[2], (n_shapes, 2), minval=min(height, width) * 0.08,
        maxval=min(height, width) * 0.35,
    )
    angles = jax.random.uniform(keys[3], (n_shapes,), minval=0.0, maxval=jnp.pi)
    intensities = jax.random.uniform(keys[4], (n_shapes,), minval=0.0, maxval=255.0)

    ys = jnp.arange(height, dtype=jnp.float32)[:, None]
    xs = jnp.arange(width, dtype=jnp.float32)[None, :]

    def paint(img, shape):
        c, s, a, val = shape
        ca, sa = jnp.cos(a), jnp.sin(a)
        dx = xs - c[0]
        dy = ys - c[1]
        u = ca * dx + sa * dy
        v = -sa * dx + ca * dy
        inside = (jnp.abs(u) <= s[0] / 2) & (jnp.abs(v) <= s[1] / 2)
        return jnp.where(inside, val, img), None

    img, _ = jax.lax.scan(
        paint, bg, (centers, sizes, angles, intensities)
    )

    # corners: 4 per shape = center + R^T(+-w/2, +-h/2)
    signs = jnp.array([[1, 1], [1, -1], [-1, 1], [-1, -1]], jnp.float32)
    ca, sa = jnp.cos(angles), jnp.sin(angles)
    R = jnp.stack(
        [jnp.stack([ca, -sa], -1), jnp.stack([sa, ca], -1)], axis=-2
    )  # (S, 2, 2) maps local->image
    local = signs[None, :, :] * (sizes[:, None, :] / 2)  # (S, 4, 2)
    corners = centers[:, None, :] + jnp.einsum("sij,scj->sci", R, local)
    corners = corners.reshape(-1, 2)  # (S*4, 2)
    in_bounds = (
        (corners[:, 0] >= 4) & (corners[:, 0] < width - 4)
        & (corners[:, 1] >= 4) & (corners[:, 1] < height - 4)
    )
    n = corners.shape[0]
    if n >= max_corners:
        # keep a random subset (static shape): prioritize in-bounds corners
        scores = in_bounds.astype(jnp.float32) + jax.random.uniform(keys[5], (n,))
        _, keep = jax.lax.top_k(scores, max_corners)
        corners = corners[keep]
        in_bounds = in_bounds[keep]
    else:
        pad = max_corners - n
        corners = jnp.concatenate([corners, jnp.zeros((pad, 2))])
        in_bounds = jnp.concatenate([in_bounds, jnp.zeros((pad,), bool)])
    return img, corners, in_bounds


def random_homography(
    key: jax.Array, height: int, width: int,
    max_rotation: float = 0.35,
    max_scale: float = 0.25,
    max_translation: float = 0.12,
    max_perspective: float = 3e-4,
) -> jax.Array:
    """Random (3, 3) homography mapping image0 coords -> image1 coords,
    composed about the image centre."""
    ks = jax.random.split(key, 4)
    a = jax.random.uniform(ks[0], (), minval=-max_rotation, maxval=max_rotation)
    s = jnp.exp(jax.random.uniform(ks[1], (), minval=-max_scale, maxval=max_scale))
    t = jax.random.uniform(
        ks[2], (2,), minval=-max_translation, maxval=max_translation
    ) * jnp.array([width, height])
    p = jax.random.uniform(
        ks[3], (2,), minval=-max_perspective, maxval=max_perspective
    )
    ca, sa = jnp.cos(a), jnp.sin(a)
    cx, cy = width / 2.0, height / 2.0
    C = jnp.array([[1, 0, -cx], [0, 1, -cy], [0, 0, 1]], jnp.float32)
    Cinv = jnp.array([[1, 0, cx], [0, 1, cy], [0, 0, 1]], jnp.float32)
    A = jnp.array(
        [[s * ca, -s * sa, t[0]], [s * sa, s * ca, t[1]], [0.0, 0.0, 1.0]]
    )
    P = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [p[0], p[1], 1.0]])
    return Cinv @ P @ A @ C


def apply_homography(Hm: jax.Array, pts: jax.Array) -> jax.Array:
    """(3, 3) x (N, 2) -> (N, 2)."""
    ph = jnp.concatenate([pts, jnp.ones_like(pts[:, :1])], axis=1)
    q = ph @ Hm.T
    return q[:, :2] / jnp.maximum(jnp.abs(q[:, 2:3]), 1e-9) * jnp.sign(q[:, 2:3])


def warp_image(image: jax.Array, Hm: jax.Array) -> jax.Array:
    """Warp so that warped(H(p)) = image(p): inverse-map each destination
    pixel through H^-1 and bilinearly sample (zeros outside)."""
    height, width = image.shape
    Hinv = jnp.linalg.inv(Hm)
    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)
    dst = jnp.stack([gx, gy], axis=-1).reshape(-1, 2)
    src = apply_homography(Hinv, dst).reshape(height, width, 2)
    return remap_bilinear(image, src)


def random_texture_image(
    key: jax.Array,
    height: int,
    width: int,
    max_corners: int = 48,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One natural-texture scene labelled by a classical teacher.

    Rectangle scenes alone leave a domain gap: a front-end trained on them
    matches rectangle corners (38/48 measured) but fails on the smoothed-
    noise textures the synthetic corridor (io/synthetic.py) — and forest
    imagery — are made of (8 matches/frame pair measured). This generator
    produces multi-octave value-noise textures and labels interest points
    with the repo's own Harris detector (homographic adaptation with a
    classical teacher): descriptor/matching losses then get correspondence
    supervision on exactly the texture statistics the pipelines see.
    """
    from forest_slam_tpu.frontend.fast import harris_response, nms_topk

    keys = jax.random.split(key, 3)
    # multi-octave value noise: coarse blobs + fine grain
    coarse = jax.random.uniform(keys[0], (height // 8, width // 8))
    coarse = jax.image.resize(coarse, (height, width), "bilinear")
    mid = jax.random.uniform(keys[1], (height // 2, width // 2))
    mid = jax.image.resize(mid, (height, width), "bilinear")
    fine = jax.random.uniform(keys[2], (height, width))
    img = (0.55 * coarse + 0.3 * mid + 0.15 * fine) * 255.0

    score = harris_response(img, 7)
    # keep teacher points away from the border (warp margin)
    ys = jnp.arange(height)[:, None]
    xs = jnp.arange(width)[None, :]
    interior = (ys >= 8) & (ys < height - 8) & (xs >= 8) & (xs < width - 8)
    score = jnp.where(interior, score, 0.0)
    xy, vals, valid = nms_topk(score, max_corners)
    return img, xy, valid


class TrainingBatch(NamedTuple):
    image0: jax.Array  # (B, H, W) [0, 255]
    image1: jax.Array  # (B, H, W)
    corners0: jax.Array  # (B, M, 2) xy in image0
    corners1: jax.Array  # (B, M, 2) xy in image1 (= H @ corners0)
    valid0: jax.Array  # (B, M) corner visible in image0
    valid1: jax.Array  # (B, M) corner visible in image1
    # matchable = valid0 & valid1; valid0-only corners are dustbin GT


def make_training_batch(
    key: jax.Array,
    batch: int,
    height: int,
    width: int,
    max_corners: int = 48,
    texture_fraction: float = 0.5,
) -> TrainingBatch:
    """Batched homography pairs with correspondence ground truth.

    A ``texture_fraction`` share of the batch uses teacher-labelled natural
    textures (see random_texture_image); the rest uses corner scenes with
    exact geometric labels."""

    n_tex = int(round(batch * texture_fraction))

    def one(k, is_texture: bool):
        k1, k2, k3 = jax.random.split(k, 3)
        if is_texture:
            img0, corners, cvalid = random_texture_image(
                k1, height, width, max_corners=max_corners
            )
        else:
            img0, corners, cvalid = random_corner_image(
                k1, height, width, max_corners=max_corners
            )
        Hm = random_homography(k2, height, width)
        img1 = warp_image(img0, Hm)
        corners1 = apply_homography(Hm, corners)
        in1 = (
            (corners1[:, 0] >= 4) & (corners1[:, 0] < width - 4)
            & (corners1[:, 1] >= 4) & (corners1[:, 1] < height - 4)
        )
        noise = jax.random.normal(k3, img0.shape) * 2.0
        return TrainingBatch(
            image0=jnp.clip(img0 + noise, 0, 255),
            image1=jnp.clip(img1 + noise[::-1], 0, 255),
            corners0=corners,
            corners1=corners1,
            valid0=cvalid,
            valid1=cvalid & in1,
        )

    keys = jax.random.split(key, batch)
    parts = []
    if n_tex:
        parts.append(jax.vmap(lambda k: one(k, True))(keys[:n_tex]))
    if batch - n_tex:
        parts.append(jax.vmap(lambda k: one(k, False))(keys[n_tex:]))
    if len(parts) == 1:
        return parts[0]
    return jax.tree.map(lambda *xs: jnp.concatenate(xs), *parts)

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


def corridor_pair(
    key: jax.Array,
    height: int,
    width: int,
    max_corners: int = 48,
    min_forward: float = 0.15,
    max_forward: float = 3.0,
    noise_sigma: float = 2.0,
    scene: str = "corridor",
) -> "TrainingBatch":
    """One 3D-supervised pair from the corridor renderer (io/synthetic.py).

    Homography pairs cannot express the *depth-dependent* scale change of
    forward motion — the dominant distortion between frames K steps apart in
    the BotanicGarden-style clips (the reference's K-interval ablation,
    BASELINE.md). This generator renders two views of a random corridor
    separated by a random forward step of ``min_forward..max_forward``
    metres (K=1..20 at the 0.15 m/frame walking pace), labels interest
    points on view 0 with the repo's Harris teacher, and transfers them to
    view 1 through the *true* depth + relative pose, with an occlusion
    check against the rendered depth of view 1. Matching supervision then
    covers exactly the viewpoint statistics large-K VO sees.
    """
    from forest_slam_tpu.core.camera import backproject_depth, project_points
    from forest_slam_tpu.core.lie import so3_exp
    from forest_slam_tpu.frontend.fast import harris_response, nms_topk
    from forest_slam_tpu.io.synthetic import (
        default_rig,
        make_corridor_world,
        make_forest_world,
        render_view,
    )

    ks = jax.random.split(key, 8)
    if scene == "forest":
        world = make_forest_world(ks[0])
    else:
        world = make_corridor_world(ks[0])
    cam = default_rig(height, width).left

    # view 0: random station in the corridor, mild attitude jitter
    p0 = jnp.array([0.0, 0.0, 0.0]) + jax.random.uniform(
        ks[1], (3,),
        minval=jnp.array([-2.0, -0.4, 0.0]),
        maxval=jnp.array([2.0, 0.4, 20.0]),
    )
    w0 = jax.random.uniform(
        ks[2], (3,),
        minval=jnp.array([-0.08, -0.3, -0.05]),
        maxval=jnp.array([0.08, 0.3, 0.05]),
    )
    R0 = so3_exp(w0)
    # view 1: forward step along the view-0 optical axis + small jitter
    d = jax.random.uniform(ks[3], (), minval=min_forward, maxval=max_forward)
    lat = jax.random.uniform(ks[4], (2,), minval=-0.15, maxval=0.15)
    p1 = p0 + R0 @ jnp.stack([lat[0], lat[1], d])
    w1 = jax.random.uniform(ks[5], (3,), minval=-0.06, maxval=0.06)
    R1 = R0 @ so3_exp(w1)

    T0 = jnp.eye(4).at[:3, :3].set(R0).at[:3, 3].set(p0)
    T1 = jnp.eye(4).at[:3, :3].set(R1).at[:3, 3].set(p1)
    img0, depth0 = render_view(world, T0, jnp.asarray(cam.K), height, width)
    img1, depth1 = render_view(world, T1, jnp.asarray(cam.K), height, width)

    # Harris-teacher interest points on view 0 (interior only)
    score = harris_response(img0, 7)
    ys = jnp.arange(height)[:, None]
    xs = jnp.arange(width)[None, :]
    interior = (ys >= 8) & (ys < height - 8) & (xs >= 8) & (xs < width - 8)
    xy0, _, valid0 = nms_topk(jnp.where(interior, score, 0.0), max_corners)

    xi = jnp.clip(xy0[:, 0].astype(jnp.int32), 0, width - 1)
    yi = jnp.clip(xy0[:, 1].astype(jnp.int32), 0, height - 1)
    z0 = depth0[yi, xi]
    valid0 = valid0 & jnp.isfinite(z0) & (z0 > 0.1) & (z0 < 60.0)
    z0 = jnp.where(valid0, z0, 1.0)

    # transfer through true depth + relative pose
    pts_cam0 = backproject_depth(xy0, z0, cam)
    pts_world = pts_cam0 @ R0.T + p0
    pts_cam1 = (pts_world - p1) @ R1
    xy1 = project_points(pts_cam1, cam, with_distortion=False)
    z1 = pts_cam1[:, 2]
    in1 = (
        (xy1[:, 0] >= 4) & (xy1[:, 0] < width - 4)
        & (xy1[:, 1] >= 4) & (xy1[:, 1] < height - 4)
        & (z1 > 0.05)
    )
    # occlusion: the rendered view-1 depth at the projected pixel must agree
    x1i = jnp.clip(jnp.round(xy1[:, 0]).astype(jnp.int32), 0, width - 1)
    y1i = jnp.clip(jnp.round(xy1[:, 1]).astype(jnp.int32), 0, height - 1)
    z1_seen = depth1[y1i, x1i]
    visible = jnp.abs(z1_seen - z1) < jnp.maximum(0.05, 0.03 * z1)
    valid1 = valid0 & in1 & visible

    k6, k7 = jax.random.split(ks[6])
    noise0 = jax.random.normal(k6, img0.shape) * noise_sigma
    noise1 = jax.random.normal(k7, img1.shape) * noise_sigma
    return TrainingBatch(
        image0=jnp.clip(img0 + noise0, 0, 255),
        image1=jnp.clip(img1 + noise1, 0, 255),
        corners0=xy0,
        corners1=xy1,
        valid0=valid0,
        valid1=valid1,
    )


def make_corridor_pool(
    key: jax.Array,
    n_pairs: int,
    height: int,
    width: int,
    max_corners: int = 48,
    chunk: int = 32,
    scene: str = "corridor",
    forest_share: float = 0.5,
    min_forward: float = 0.15,
    max_forward: float = 3.0,
) -> "TrainingBatch":
    """Pre-rendered 3D-supervised forward-motion pairs, stacked on axis 0.

    Rendering inside the train step costs ~3 s/step (a fresh world plus
    two ray-cast views per sample); a pool rendered once and sampled per
    step amortizes that away. Each pool entry is a distinct world +
    viewpoint + forward gap; per-step photometric noise is re-drawn at
    sampling time (make_training_batch). ``scene``: "corridor", "forest"
    (the BotanicGarden-domain proxy world: trunks, occlusion, clutter),
    or "mix" (alternating chunks of both).
    """
    n_pairs = -(-n_pairs // chunk) * chunk  # round up to whole chunks
    # pool entries are rendered noise-free: the per-step photometric noise
    # is added once at sampling time (make_training_batch), so pooled and
    # on-the-fly corridor samples see the same noise distribution
    fns = {}
    for sc in ("corridor", "forest"):
        fns[sc] = jax.jit(
            lambda ks, sc=sc: jax.vmap(
                lambda k: corridor_pair(
                    k, height, width, max_corners, noise_sigma=0.0, scene=sc,
                    min_forward=min_forward, max_forward=max_forward,
                )
            )(ks)
        )
    import sys
    import time

    keys = jax.random.split(key, n_pairs)
    outs = []
    n_chunks = n_pairs // chunk
    # "mix": deterministic forest/corridor interleave hitting the requested
    # forest_share over the whole pool (errors < 1 chunk)
    forest_cum = 0
    t0 = time.time()
    for ci, s in enumerate(range(0, n_pairs, chunk)):
        if scene == "mix":
            want = int(round((ci + 1) * forest_share))
            sc = "forest" if forest_cum < want else "corridor"
            forest_cum += sc == "forest"
        else:
            sc = scene
        out = fns[sc](keys[s : s + chunk])
        # host fetch: block_until_ready is a no-op on the tunneled axon
        # platform; without a real barrier the whole pool queues and a
        # stall is invisible (round-5 note: a 4096-pair pool showed zero
        # progress for an hour with no way to tell compile from wedge)
        float(jnp.sum(out.image0[-1, ::37, ::37]))
        outs.append(out)
        if ci % 8 == 0 or ci == n_chunks - 1:
            print(
                f"# pool chunk {ci + 1}/{n_chunks} ({sc}) "
                f"{time.time() - t0:.0f}s",
                file=sys.stderr, flush=True,
            )
    return jax.tree.map(lambda *xs: jnp.concatenate(xs), *outs)


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
    corridor_fraction: float = 0.0,
    corridor_pool: TrainingBatch | None = None,
) -> TrainingBatch:
    """Batched correspondence-labelled training pairs.

    Three sources: a ``corridor_fraction`` share of 3D-supervised corridor
    pairs (true forward-motion scale change, see corridor_pair) — drawn
    from ``corridor_pool`` with fresh photometric noise when given,
    rendered on the fly otherwise — a ``texture_fraction`` share of
    teacher-labelled natural-texture homography pairs
    (random_texture_image), and the rest corner scenes with exact
    geometric labels."""

    n_cor = int(round(batch * corridor_fraction))
    n_tex = min(int(round(batch * texture_fraction)), batch - n_cor)

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
    if n_cor and corridor_pool is not None:
        k_idx, k_n0, k_n1 = jax.random.split(keys[0], 3)
        idx = jax.random.randint(
            k_idx, (n_cor,), 0, corridor_pool.image0.shape[0]
        )
        drawn = jax.tree.map(lambda a: a[idx], corridor_pool)
        parts.append(
            drawn._replace(
                image0=jnp.clip(
                    drawn.image0
                    + jax.random.normal(k_n0, drawn.image0.shape) * 2.0,
                    0, 255,
                ),
                image1=jnp.clip(
                    drawn.image1
                    + jax.random.normal(k_n1, drawn.image1.shape) * 2.0,
                    0, 255,
                ),
            )
        )
    elif n_cor:
        parts.append(
            jax.vmap(
                lambda k: corridor_pair(k, height, width, max_corners)
            )(keys[:n_cor])
        )
    if n_tex:
        parts.append(
            jax.vmap(lambda k: one(k, True))(keys[n_cor : n_cor + n_tex])
        )
    if batch - n_cor - n_tex:
        parts.append(jax.vmap(lambda k: one(k, False))(keys[n_cor + n_tex :]))
    if len(parts) == 1:
        return parts[0]
    return jax.tree.map(lambda *xs: jnp.concatenate(xs), *parts)

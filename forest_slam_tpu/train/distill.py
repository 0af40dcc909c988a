"""Dense distillation of the SuperPoint network into a faster stem.

The accuracy checkpoint runs the classic stride-1 VGG stem — HBM-bound at
960x600 (the two full-res 64-channel conv activations dominate memory
traffic; superpoint.py stem_stride note). The space-to-depth stem_stride=2
variant is ~2.4x faster to extract but, trained from scratch on the
synthetic recipe, trades ATE (BASELINE.md: 0.473 m vs 0.0385 m on the
corridor bench). This module closes that gap by *distilling* the trained
stride-1 teacher into a stride-2 student on dense network outputs:

- detector: cross-entropy between the teacher's 65-way cell distribution
  (8x8 pixel slots + dustbin, softmax) and the student's logits — both
  heads live on the same (H/8, W/8) cell grid regardless of stem stride;
- descriptors: weighted cosine loss on the L2-normalized coarse
  descriptor grids, cells weighted by the teacher's keypoint-ness
  (1 - dustbin probability) plus a uniform floor, so descriptor capacity
  concentrates where keypoints actually get sampled.

Because the student is trained to reproduce the teacher's descriptor
*space* (not just its matches), the teacher's SuperGlue weights remain
compatible: the saved checkpoint pairs the distilled SuperPoint with the
teacher's unchanged SuperGlue subtree.

Distillation needs images, not labels. The mix is random crops of
native-scale corridor/forest renders (io/synthetic.py — the pipelines'
texture statistics at the scale the teacher was trained for) plus the
synthetic texture/corner scenes of train/data.py for diversity.

Reference anchor: the reference ships pretrained weights via a submodule
(`weights='outdoor'`, stereo_slam.py:74) and has no training system; this
speed/accuracy checkpoint work has no upstream counterpart (SURVEY.md
§7.3 item 3).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from forest_slam_tpu.frontend.superpoint import SuperPointConfig, SuperPointNet
from forest_slam_tpu.frontend.weights import DEFAULT_PATH


class DistillConfig(NamedTuple):
    teacher_path: str = DEFAULT_PATH
    stem_stride: int = 2
    # architecture (must match the teacher checkpoint's encoder; the
    # committed checkpoints use the defaults — overridable for tests)
    channels: tuple = (64, 64, 128, 128)
    descriptor_dim: int = 256
    height: int = 240  # training crop size (cells: H/8 x W/8)
    width: int = 320
    batch_size: int = 8
    learning_rate: float = 1e-3
    weight_decay: float = 1e-5
    w_det: float = 1.0
    w_desc: float = 4.0
    # share of the per-cell descriptor weighting given uniformly to all
    # cells (the rest follows the teacher's keypoint-ness)
    desc_floor: float = 0.25
    # batch mix: remainder after these two is rendered-scene crops
    texture_fraction: float = 0.3
    corner_fraction: float = 0.2
    # rendered-scene pool: full native-scale frames, cropped per step
    pool_frames: int = 256
    pool_height: int = 600  # render at the teacher's native scale
    pool_width: int = 960
    # photometric jitter applied per step
    noise_sigma: float = 2.0
    max_gain: float = 0.25  # log-uniform contrast jitter
    max_bias: float = 16.0  # brightness jitter (gray levels)
    # cross-scale descriptor consistency: the student also sees a central
    # zoom-in of each image (apparent scale of forward motion — a K=20
    # keyframe gap is ~1.6x on the corridor/forest clips) and must
    # reproduce the teacher's scale-1.0 descriptors at the corresponding
    # source locations. This is what makes the distilled descriptor space
    # survive wide-baseline matching, where the plain distilled checkpoint
    # mis-assigned (BASELINE.md K-ablation notes). w_scale=0 disables.
    w_scale: float = 2.0
    scale_min: float = 1.2
    scale_max: float = 2.0
    # Blur-robustness consistency (round 4, VERDICT r3 #4): the student
    # also sees each image under the thesis's motion-blur corruptor
    # (utils/corrupt.py — random regions, line kernel; quirk B9
    # machinery) and must reproduce the teacher's CLEAN-image detector
    # distribution and descriptors at the same cells (blur moves no
    # pixels, so no geometric warp is needed). This is what makes the
    # distilled checkpoint's matching survive the blur50 bench gate —
    # the stem-4 flagship distilled WITHOUT it measured 21/23 / 0.162 m
    # where the stem-1 teacher scored 31/31 / 0.002 m. w_blur=0 disables.
    w_blur: float = 0.0
    blur_kernel: int = 15
    blur_pct_min: float = 25.0  # per-image region percentage range
    blur_pct_max: float = 75.0
    # Sub-pixel-preserving distillation (round 4, VERDICT r3 #3): the
    # com3 readout (frontend/superpoint.py) recovers fractional keypoint
    # positions from the heatmap's local mass distribution — the property
    # that carries plain-config wide-baseline tracking. Plain CE on the
    # 65-way cell distribution preserves WHERE mass goes only to cell
    # granularity; this term matches the student's in-cell expected
    # offset (center of mass of the 64 position bins) to the teacher's,
    # kp-weighted, in pixels^2 — round 3's stem-4 students distilled
    # without it dropped plain K=10 from 15/15 to 9/15. 0 disables.
    w_subpix: float = 0.0


class DistillState(NamedTuple):
    params: Any  # student SuperPointNet params
    opt_state: Any
    step: jax.Array


def _make_optimizer(cfg: DistillConfig):
    return optax.adamw(cfg.learning_rate, weight_decay=cfg.weight_decay)


def load_teacher(cfg: DistillConfig):
    """(teacher_net, teacher_params, checkpoint_state, meta) from the
    trained stride-1 checkpoint. ``checkpoint_state`` keeps the full tree
    (including the SuperGlue subtree the distilled checkpoint re-exports).
    """
    from flax import serialization

    from forest_slam_tpu.frontend.weights import load_meta

    with open(cfg.teacher_path, "rb") as f:
        state = serialization.msgpack_restore(f.read())
    meta = load_meta(cfg.teacher_path)
    if isinstance(state, dict) and "__meta__" in state:
        state = state["params"]
    t_stride = int(meta.get("stem_stride", 1))
    teacher = SuperPointNet(
        SuperPointConfig(
            stem_stride=t_stride,
            channels=cfg.channels,
            descriptor_dim=cfg.descriptor_dim,
        )
    )
    return teacher, jax.device_put(state["superpoint"]), state, meta


def _student_net(cfg: DistillConfig) -> SuperPointNet:
    return SuperPointNet(
        SuperPointConfig(
            stem_stride=cfg.stem_stride,
            channels=cfg.channels,
            descriptor_dim=cfg.descriptor_dim,
        )
    )


def create_student_state(key: jax.Array, cfg: DistillConfig) -> DistillState:
    student = _student_net(cfg)
    dummy = jnp.zeros((1, cfg.height, cfg.width), jnp.float32)
    params = student.init(key, dummy)
    return DistillState(
        params=params,
        opt_state=_make_optimizer(cfg).init(params),
        step=jnp.zeros((), jnp.int32),
    )


def make_scene_pool(key: jax.Array, cfg: DistillConfig) -> jax.Array:
    """(N, pool_H, pool_W) rendered frames: half corridor, half forest
    worlds, a handful of camera stations each (distinct world per chunk)."""
    from forest_slam_tpu.core.lie import so3_exp
    from forest_slam_tpu.io.synthetic import (
        default_rig,
        make_corridor_world,
        make_forest_world,
        render_view,
    )

    H, W = cfg.pool_height, cfg.pool_width
    cam_K = jnp.asarray(default_rig(H, W).left.K)
    per_world = 8  # frames per rendered world

    @functools.partial(jax.jit, static_argnums=(2,))
    def render_world(k, K, forest: bool):
        kw, kp = jax.random.split(k)
        world = (
            make_forest_world(kw) if forest else make_corridor_world(kw)
        )
        ks = jax.random.split(kp, per_world)

        def one(kk):
            k1, k2 = jax.random.split(kk)
            p = jax.random.uniform(
                k1, (3,),
                minval=jnp.array([-1.5, -0.4, 0.0]),
                maxval=jnp.array([1.5, 0.4, 40.0]),
            )
            w = jax.random.uniform(
                k2, (3,),
                minval=jnp.array([-0.08, -0.5, -0.06]),
                maxval=jnp.array([0.08, 0.5, 0.06]),
            )
            T = jnp.eye(4).at[:3, :3].set(so3_exp(w)).at[:3, 3].set(p)
            img, _ = render_view(world, T, K, H, W)
            return img

        return jax.lax.map(one, ks)

    n_worlds = -(-cfg.pool_frames // per_world)
    keys = jax.random.split(key, n_worlds)
    parts = [
        render_world(keys[i], cam_K, i % 2 == 1) for i in range(n_worlds)
    ]
    return jnp.concatenate(parts)[: cfg.pool_frames]


def _distill_batch(key: jax.Array, cfg: DistillConfig, pool: jax.Array):
    """One (B, H, W) image batch: scene crops + texture + corner scenes,
    with photometric jitter."""
    from forest_slam_tpu.train.data import (
        random_corner_image,
        random_texture_image,
    )

    B, H, W = cfg.batch_size, cfg.height, cfg.width
    n_tex = int(round(B * cfg.texture_fraction))
    n_cor = int(round(B * cfg.corner_fraction))
    n_scene = B - n_tex - n_cor
    k_scene, k_tex, k_cor, k_jit = jax.random.split(key, 4)

    parts = []
    if n_scene:
        ki, ky, kx = jax.random.split(k_scene, 3)
        idx = jax.random.randint(ki, (n_scene,), 0, pool.shape[0])
        oy = jax.random.randint(ky, (n_scene,), 0, pool.shape[1] - H + 1)
        ox = jax.random.randint(kx, (n_scene,), 0, pool.shape[2] - W + 1)
        crops = jax.vmap(
            lambda i, y, x: jax.lax.dynamic_slice(pool[i], (y, x), (H, W))
        )(idx, oy, ox)
        parts.append(crops)
    if n_tex:
        parts.append(
            jax.vmap(
                lambda k: random_texture_image(k, H, W)[0]
            )(jax.random.split(k_tex, n_tex))
        )
    if n_cor:
        parts.append(
            jax.vmap(
                lambda k: random_corner_image(k, H, W)[0]
            )(jax.random.split(k_cor, n_cor))
        )
    imgs = parts[0] if len(parts) == 1 else jnp.concatenate(parts)

    kn, kg, kb = jax.random.split(k_jit, 3)
    gain = jnp.exp(
        jax.random.uniform(
            kg, (B, 1, 1), minval=-cfg.max_gain, maxval=cfg.max_gain
        )
    )
    bias = jax.random.uniform(
        kb, (B, 1, 1), minval=-cfg.max_bias, maxval=cfg.max_bias
    )
    noise = jax.random.normal(kn, imgs.shape) * cfg.noise_sigma
    return jnp.clip((imgs - 127.5) * gain + 127.5 + bias + noise, 0, 255)


def _zoom_batch(key: jax.Array, images: jax.Array, cfg: DistillConfig):
    """Per-image central zoom-in by a random ratio in [scale_min,
    scale_max] (bilinear, same canvas). The zoomed view is what the same
    scene looks like ~s x closer — the forward-motion scale change a
    wide keyframe gap produces."""
    from jax.scipy.ndimage import map_coordinates

    B, H, W = images.shape
    s = jax.random.uniform(
        key, (B,), minval=cfg.scale_min, maxval=cfg.scale_max
    )
    yy, xx = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32),
        jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0

    def one(img, si):
        sy = cy + (yy - cy) / si
        sx = cx + (xx - cx) / si
        return map_coordinates(img, [sy, sx], order=1, mode="nearest")

    return jax.vmap(one)(images, s), s


def _blur_batch(key: jax.Array, images: jax.Array, cfg: DistillConfig):
    """Per-image random motion blur (random region percentage and angle),
    the reference corruptor's semantics (utils/corrupt.py: seed pixels at
    the requested density dilated to kernel-size boxes select blurred
    regions) with traced per-image percentage/angle."""
    from jax import lax as _lax

    from forest_slam_tpu.utils.corrupt import apply_motion_blur

    B = images.shape[0]
    k = cfg.blur_kernel
    kp, ka, km = jax.random.split(key, 3)
    pcts = jax.random.uniform(
        kp, (B,), minval=cfg.blur_pct_min / 100.0,
        maxval=cfg.blur_pct_max / 100.0,
    )
    angles = jax.random.uniform(ka, (B,), minval=0.0, maxval=180.0)
    mkeys = jax.random.split(km, B)

    def one(img, pct, ang, mk):
        blurred = apply_motion_blur(img, k, ang)
        seeds = jax.random.uniform(mk, img.shape) < pct
        mask = _lax.reduce_window(
            seeds.astype(jnp.float32), 0.0, _lax.max,
            window_dimensions=(k, k), window_strides=(1, 1),
            padding="SAME",
        )
        return jnp.where(mask > 0, blurred, img)

    return jax.vmap(one)(images, pcts, angles, mkeys)


def _sample_cells_at_zoom(grid: jax.Array, s: jax.Array) -> jax.Array:
    """Bilinearly sample a (B, Hc, Wc, C) cell grid of the *source* image
    at the source positions of the zoomed image's cell centers. Cell
    (i, j) covers pixels [8i, 8i+8) so its center is 8i+3.5; zoomed pixel
    y maps back to cy + (y - cy)/s."""
    from jax.scipy.ndimage import map_coordinates

    B, Hc, Wc, C = grid.shape
    H, W = Hc * 8, Wc * 8
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    ci = jnp.arange(Hc, dtype=jnp.float32) * 8.0 + 3.5
    cj = jnp.arange(Wc, dtype=jnp.float32) * 8.0 + 3.5
    yy, xx = jnp.meshgrid(ci, cj, indexing="ij")

    def one(g, si):
        sy = (cy + (yy - cy) / si - 3.5) / 8.0  # cell coords in source grid
        sx = (cx + (xx - cx) / si - 3.5) / 8.0
        return jax.vmap(
            lambda c: map_coordinates(c, [sy, sx], order=1, mode="nearest")
        )(jnp.moveaxis(g, -1, 0))

    return jnp.moveaxis(jax.vmap(one)(grid, s), 1, -1)  # (B, Hc, Wc, C)


def distill_loss(
    student_params, teacher_out, images, cfg: DistillConfig, zoom=None,
    blurred=None,
):
    """Teacher raw outputs + images -> (loss, metrics). ``zoom``, when
    given, is ``(images_z, s)`` from :func:`_zoom_batch`; the student's
    descriptors on the zoomed view are pulled toward the teacher's
    scale-1.0 descriptors at the corresponding source cells. ``blurred``
    (from :func:`_blur_batch`) adds the blur-robustness term: the
    student's detector AND descriptors on the corrupted view must match
    the teacher's clean-image targets cell-for-cell."""
    student = _student_net(cfg)
    s = student.apply(student_params, images / 255.0)

    t_logits = jax.lax.stop_gradient(teacher_out.det_logits)
    t_desc = jax.lax.stop_gradient(teacher_out.coarse_desc)
    t_probs = jax.nn.softmax(t_logits, axis=-1)  # (B, Hc, Wc, 65)

    # detector: CE against the teacher's full 65-way cell distribution
    logp = jax.nn.log_softmax(s.det_logits, axis=-1)
    l_det = -jnp.mean(jnp.sum(t_probs * logp, axis=-1))

    # descriptors: cosine loss, keypoint-ness-weighted cells + uniform floor
    cos = jnp.sum(s.coarse_desc * t_desc, axis=-1)  # (B, Hc, Wc)
    kp = 1.0 - t_probs[..., 64]  # 1 - dustbin prob
    kp = kp / jnp.maximum(jnp.mean(kp), 1e-6)
    w = cfg.desc_floor + (1.0 - cfg.desc_floor) * kp
    l_desc = jnp.mean(w * (1.0 - cos))

    total = cfg.w_det * l_det + cfg.w_desc * l_desc
    metrics = {
        "det": l_det,
        "desc": l_desc,
        "cos_kp": jnp.sum(kp * cos) / jnp.maximum(jnp.sum(kp), 1e-6),
    }

    if cfg.w_subpix > 0:
        # in-cell center of mass of the 64 position bins (8x8 within the
        # cell), in pixels — the quantity the com3 readout consumes
        pos = jnp.arange(64)
        py = (pos // 8).astype(jnp.float32)
        px = (pos % 8).astype(jnp.float32)

        def cell_com(logits):
            p = jax.nn.softmax(logits[..., :64], axis=-1)
            return jnp.stack(
                [jnp.sum(p * px, axis=-1), jnp.sum(p * py, axis=-1)],
                axis=-1,
            )  # (B, Hc, Wc, 2)

        com_err = jnp.sum(
            (cell_com(s.det_logits) - cell_com(t_logits)) ** 2, axis=-1
        )  # (B, Hc, Wc) px^2
        l_subpix = jnp.mean(w * com_err)
        total = total + cfg.w_subpix * l_subpix
        metrics["subpix"] = l_subpix

    if zoom is not None:
        images_z, ratios = zoom
        s_z = student.apply(student_params, images_z / 255.0)
        t_desc_z = jax.lax.stop_gradient(
            _sample_cells_at_zoom(t_desc, ratios)
        )
        # bilinear blends of unit vectors are sub-unit: renormalize
        t_desc_z = t_desc_z / jnp.maximum(
            jnp.linalg.norm(t_desc_z, axis=-1, keepdims=True), 1e-6
        )
        kp_z = jax.lax.stop_gradient(
            _sample_cells_at_zoom(kp[..., None], ratios)[..., 0]
        )
        kp_z = kp_z / jnp.maximum(jnp.mean(kp_z), 1e-6)
        w_z = cfg.desc_floor + (1.0 - cfg.desc_floor) * kp_z
        cos_z = jnp.sum(s_z.coarse_desc * t_desc_z, axis=-1)
        l_scale = jnp.mean(w_z * (1.0 - cos_z))
        total = total + cfg.w_scale * l_scale
        metrics["scale"] = l_scale

    if blurred is not None:
        s_b = student.apply(student_params, blurred / 255.0)
        logp_b = jax.nn.log_softmax(s_b.det_logits, axis=-1)
        l_bdet = -jnp.mean(jnp.sum(t_probs * logp_b, axis=-1))
        cos_b = jnp.sum(s_b.coarse_desc * t_desc, axis=-1)
        l_bdesc = jnp.mean(w * (1.0 - cos_b))
        l_blur = l_bdet + cfg.w_desc / cfg.w_det * l_bdesc \
            if cfg.w_det > 0 else l_bdesc
        total = total + cfg.w_blur * l_blur
        metrics["blur"] = l_blur

    metrics["loss"] = total
    return total, metrics


def _distill_step_raw(
    state: DistillState,
    teacher,
    teacher_params,
    images,
    cfg: DistillConfig,
    zoom=None,
    blurred=None,
):
    t_out = teacher.apply(teacher_params, images / 255.0)
    grads, metrics = jax.grad(distill_loss, has_aux=True)(
        state.params, t_out, images, cfg, zoom, blurred
    )
    updates, opt_state = _make_optimizer(cfg).update(
        grads, state.opt_state, state.params
    )
    params = optax.apply_updates(state.params, updates)
    return DistillState(params, opt_state, state.step + 1), metrics


@functools.partial(jax.jit, static_argnums=(1, 4, 5))
def distill_steps_scan(
    state: DistillState,
    teacher,
    teacher_params,
    key: jax.Array,
    cfg: DistillConfig,
    n_steps: int,
    pool: jax.Array,
):
    """``n_steps`` distillation steps in one dispatch (batch generation
    on-device inside lax.scan, as train_steps_scan)."""

    def one(st, bk):
        bk, zk, blk = jax.random.split(bk, 3)
        images = _distill_batch(bk, cfg, pool)
        zoom = _zoom_batch(zk, images, cfg) if cfg.w_scale > 0 else None
        blurred = (
            _blur_batch(blk, images, cfg) if cfg.w_blur > 0 else None
        )
        return _distill_step_raw(
            st, teacher, teacher_params, images, cfg, zoom, blurred
        )

    def body(carry, _):
        st, k = carry
        k, bk = jax.random.split(k)
        st, _ = one(st, bk)
        return (st, k), None

    (state, key), _ = jax.lax.scan(
        body, (state, key), None, length=n_steps - 1
    )
    key, bk = jax.random.split(key)
    state, metrics = one(state, bk)
    return state, key, metrics


def distill(
    cfg: DistillConfig,
    n_steps: int,
    seed: int = 0,
    log_every: int = 100,
    state: DistillState | None = None,
    pool: jax.Array | None = None,
    verbose: bool = False,
):
    """Run distillation; returns (state, history, checkpoint_payload).

    ``checkpoint_payload`` is the full parameter tree to save: the distilled
    SuperPoint plus the teacher's SuperGlue subtree (compatible because the
    student reproduces the teacher's descriptor space).
    """
    import time

    teacher, teacher_params, ckpt_state, _meta = load_teacher(cfg)
    key = jax.random.PRNGKey(seed)
    if state is None:
        key, ik = jax.random.split(key)
        state = create_student_state(ik, cfg)
    if pool is None:
        key, pk = jax.random.split(key)
        t0 = time.time()
        pool = make_scene_pool(pk, cfg)
        pool.block_until_ready()
        if verbose:
            print(
                f"# scene pool: {pool.shape[0]} frames "
                f"@ {pool.shape[2]}x{pool.shape[1]} in {time.time()-t0:.1f}s"
            )
    history = []
    done = 0
    while done < n_steps:
        chunk = min(log_every, n_steps - done)
        t0 = time.time()
        state, key, metrics = distill_steps_scan(
            state, teacher, teacher_params, key, cfg, chunk, pool
        )
        done += chunk
        m = {k: float(v) for k, v in metrics.items()}
        history.append((done - 1, m))
        if verbose:
            line = " ".join(f"{k}={v:.4f}" for k, v in m.items())
            print(
                f"# step {done}/{n_steps} ({time.time()-t0:.1f}s): {line}",
                flush=True,
            )
    payload = {
        "superpoint": state.params,
        "superglue": ckpt_state["superglue"],
    }
    return state, history, payload


def save_distilled(payload, cfg: DistillConfig, path: str, teacher_meta: dict):
    """Write the distilled checkpoint with architecture meta (the student's
    stem_stride + the teacher's SuperGlue knobs)."""
    from forest_slam_tpu.frontend.weights import save_params

    meta = dict(teacher_meta)
    # legacy teacher checkpoints carry no meta — record the loader defaults
    # explicitly so the distilled file is self-describing
    meta.setdefault("gnn_layers", 9)
    meta.setdefault("sinkhorn_iterations", 20)
    meta["stem_stride"] = cfg.stem_stride
    save_params(payload, path, meta=meta)

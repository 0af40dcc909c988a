"""Training loop for the learned front-end (SuperPoint + SuperGlue jointly).

One jitted ``train_step`` computes: detector cell-CE on both images of a
homography pair, descriptor InfoNCE at ground-truth correspondences, and
the SuperGlue Sinkhorn NLL — then an AdamW update. ``make_sharded_train_step``
wraps the same step for a ('data', 'model') mesh: batch sharded over data,
large kernels tensor-sharded over model (parallel/mesh.py), which is the
multi-chip training path exercised by ``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from forest_slam_tpu.frontend.superpoint import (
    SuperPointConfig,
    SuperPointNet,
    _sample_coarse_descriptors,
)
from forest_slam_tpu.frontend.superglue import SuperGlue, SuperGlueConfig
from forest_slam_tpu.parallel.mesh import (
    batch_shardings,
    param_shardings,
    replicated,
)
from forest_slam_tpu.train.data import TrainingBatch, make_training_batch
from forest_slam_tpu.train.losses import (
    descriptor_nce_loss,
    detector_loss,
    detector_loss_soft,
    matching_loss,
)


class TrainConfig(NamedTuple):
    superpoint: SuperPointConfig = SuperPointConfig()
    superglue: SuperGlueConfig = SuperGlueConfig()
    height: int = 120
    width: int = 160
    batch_size: int = 8
    max_corners: int = 48
    learning_rate: float = 1e-3
    weight_decay: float = 1e-5
    w_detector: float = 1.0
    w_descriptor: float = 1.0
    w_matching: float = 0.5
    texture_fraction: float = 0.5
    corridor_fraction: float = 0.0  # 3D corridor pairs (large-K robustness)
    # corridor pairs are drawn from a pool pre-rendered once per run
    # (train/data.py make_corridor_pool): in-step rendering costs ~3 s/step
    corridor_pool_size: int = 4096
    # pool world mix: "corridor", "forest", or "mix" (the BotanicGarden-
    # proxy trunked forest adds occlusion + depth discontinuities to the
    # scale-gap supervision); ``forest_share`` sets the forest fraction
    # of a "mix" pool (round 5: the forest plain-K=10 gate needs more
    # bark/occlusion statistics than the original half/half mix gave)
    corridor_scene: str = "corridor"
    forest_share: float = 0.5
    # forward-gap range of the 3D-supervised pairs, metres (0.15 m/frame
    # walking pace -> K = gap/0.15). Round 5 biases the plain-tier runs
    # toward the large-gap regime (VERDICT r4 #1: plain K=20 needs
    # sub-pixel precision at ~2x apparent scale, which uniform 0.15-3.0
    # sampling under-weights).
    corridor_min_forward: float = 0.15
    corridor_max_forward: float = 3.0
    # Sub-pixel recipe (VERDICT r2 missing #1): bilinear-soft detector
    # targets (losses.detector_labels_soft) make the heatmap interpolable
    # for the com3 readout; checkpoints trained with this flag store
    # subpixel="com3" in their meta.
    detector_soft: bool = False
    # Scale-equivariance descriptor term (the distillation w_scale idea,
    # generalized to direct training): each image0 is also seen through a
    # random 1.2-2.0x central zoom and its descriptors at corresponding
    # positions must match (InfoNCE) — direct supervision for the
    # forward-motion apparent-scale growth of wide-baseline tracking.
    w_zoom: float = 0.0
    zoom_min: float = 1.2
    zoom_max: float = 2.0
    # Motion-blur input augmentation (round 4): the stem2-subpix plain
    # tier trained WITHOUT it collapses under the bench's blur50 gate
    # (0/23 — the thesis's robustness knob, quirk B9). A ``blur_fraction``
    # share of all training images (both views, independent draws) get
    # the reference corruptor's random-region line blur (kernel 15,
    # random angle, region share 25-75%); the geometric GT labels are
    # blur-invariant, so supervision is unchanged — the front-end simply
    # learns to detect/describe through the degradation. 0 disables.
    blur_fraction: float = 0.0
    blur_kernel: int = 15


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def _make_modules(cfg: TrainConfig):
    return SuperPointNet(cfg.superpoint), SuperGlue(cfg.superglue)


def _make_optimizer(cfg: TrainConfig):
    return optax.adamw(cfg.learning_rate, weight_decay=cfg.weight_decay)


def create_train_state(key: jax.Array, cfg: TrainConfig) -> TrainState:
    sp, sg = _make_modules(cfg)
    k1, k2 = jax.random.split(key)
    dummy_img = jnp.zeros((1, cfg.height, cfg.width), jnp.float32)
    sp_params = sp.init(k1, dummy_img)
    M = cfg.max_corners
    dummy_xy = jnp.zeros((1, M, 2))
    dummy_sc = jnp.zeros((1, M))
    dummy_d = jnp.zeros((1, M, cfg.superglue.descriptor_dim))
    dummy_v = jnp.ones((1, M), bool)
    sg_params = sg.init(
        k2,
        dummy_xy, dummy_sc, dummy_d, dummy_v,
        dummy_xy, dummy_sc, dummy_d, dummy_v,
        (cfg.height, cfg.width),
    )
    params = {"superpoint": sp_params, "superglue": sg_params}
    opt_state = _make_optimizer(cfg).init(params)
    return TrainState(params=params, opt_state=opt_state, step=jnp.zeros((), jnp.int32))


def loss_fn(params, batch: TrainingBatch, cfg: TrainConfig):
    sp, sg = _make_modules(cfg)
    B = batch.image0.shape[0]
    images = jnp.concatenate([batch.image0, batch.image1]) / 255.0  # (2B,H,W)
    raw = sp.apply(params["superpoint"], images)

    det_fn = detector_loss_soft if cfg.detector_soft else detector_loss
    l_det = det_fn(
        raw.det_logits,
        jnp.concatenate([batch.corners0, batch.corners1]),
        jnp.concatenate([batch.valid0, batch.valid1]),
    )

    # descriptors at GT correspondences (differentiable bilinear sampling)
    desc0 = jax.vmap(_sample_coarse_descriptors)(
        raw.coarse_desc[:B], batch.corners0
    )
    desc1 = jax.vmap(_sample_coarse_descriptors)(
        raw.coarse_desc[B:], batch.corners1
    )
    matchable = batch.valid0 & batch.valid1
    l_desc = descriptor_nce_loss(desc0, desc1, matchable)

    # SuperGlue on GT-corner keypoint sets
    score = jnp.ones_like(batch.valid0, jnp.float32)
    log_p = sg.apply(
        params["superglue"],
        batch.corners0, score, desc0, batch.valid0,
        batch.corners1, score, desc1, batch.valid1,
        (cfg.height, cfg.width),
        return_couplings=True,
    )
    M = batch.valid0.shape[1]
    gt = jnp.where(matchable, jnp.arange(M)[None, :], -1)
    l_match = matching_loss(log_p, gt, batch.valid0, batch.valid1)

    metrics = {
        "detector": l_det,
        "descriptor": l_desc,
        "matching": l_match,
    }
    total = (
        cfg.w_detector * l_det
        + cfg.w_descriptor * l_desc
        + cfg.w_matching * l_match
    )

    if cfg.w_zoom > 0:
        from forest_slam_tpu.core.camera import remap_bilinear

        H, W = cfg.height, cfg.width
        ctr = jnp.array([(W - 1) / 2.0, (H - 1) / 2.0])
        # per-sample zoom factor derived from the batch content (cheap
        # stand-in for a threaded rng key; any spread in [zoom_min,
        # zoom_max] serves)
        u = (jnp.sum(batch.image0, axis=(1, 2)) * 1e-3) % 1.0
        s = cfg.zoom_min + (cfg.zoom_max - cfg.zoom_min) * u  # (B,)

        def zoom_one(img, si):
            ys = jnp.arange(H, dtype=jnp.float32)
            xs = jnp.arange(W, dtype=jnp.float32)
            gx, gy = jnp.meshgrid(xs, ys)
            src = jnp.stack(
                [(gx - ctr[0]) / si + ctr[0], (gy - ctr[1]) / si + ctr[1]],
                axis=-1,
            )
            return remap_bilinear(img, src)

        zoomed = jax.vmap(zoom_one)(batch.image0 / 255.0, s)
        raw_z = sp.apply(params["superpoint"], zoomed)
        cz = (batch.corners0 - ctr) * s[:, None, None] + ctr
        in_z = (
            (cz[..., 0] >= 4) & (cz[..., 0] < W - 4)
            & (cz[..., 1] >= 4) & (cz[..., 1] < H - 4)
        )
        desc_z = jax.vmap(_sample_coarse_descriptors)(raw_z.coarse_desc, cz)
        l_zoom = descriptor_nce_loss(
            desc0, desc_z, batch.valid0 & in_z
        )
        metrics["zoom"] = l_zoom
        total = total + cfg.w_zoom * l_zoom

    metrics["loss"] = total
    return total, metrics


def _train_step_raw(state: TrainState, batch: TrainingBatch, cfg: TrainConfig):
    grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params, batch, cfg)
    updates, opt_state = _make_optimizer(cfg).update(
        grads, state.opt_state, state.params
    )
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), metrics


train_step = functools.partial(jax.jit, static_argnums=(2,))(_train_step_raw)


def _blur_training_batch(
    key: jax.Array, batch: TrainingBatch, cfg: TrainConfig
) -> TrainingBatch:
    """Blur a ``cfg.blur_fraction`` share of both views (independent
    draws; random region percentage 25-75% and angle) — the reference
    corruptor's semantics. Labels are untouched (blur moves no pixels)."""
    from forest_slam_tpu.utils.corrupt import apply_motion_blur

    k = cfg.blur_kernel

    def blur_stack(sk, images):
        B = images.shape[0]
        ksel, kp, ka, km = jax.random.split(sk, 4)
        sel = jax.random.uniform(ksel, (B,)) < cfg.blur_fraction
        pcts = jax.random.uniform(kp, (B,), minval=0.25, maxval=0.75)
        angles = jax.random.uniform(ka, (B,), minval=0.0, maxval=180.0)
        mkeys = jax.random.split(km, B)

        def one(img, on, pct, ang, mk):
            blurred = apply_motion_blur(img, k, ang)
            seeds = jax.random.uniform(mk, img.shape) < pct
            mask = jax.lax.reduce_window(
                seeds.astype(jnp.float32), 0.0, jax.lax.max,
                window_dimensions=(k, k), window_strides=(1, 1),
                padding="SAME",
            )
            return jnp.where(on & (mask > 0), blurred, img)

        return jax.vmap(one)(images, sel, pcts, angles, mkeys)

    k0, k1 = jax.random.split(key)
    return batch._replace(
        image0=blur_stack(k0, batch.image0),
        image1=blur_stack(k1, batch.image1),
    )


@functools.partial(jax.jit, static_argnums=(2, 3))
def train_steps_scan(
    state: TrainState, key: jax.Array, cfg: TrainConfig, n_steps: int,
    corridor_pool=None,
):
    """Run ``n_steps`` train steps in ONE dispatch (batch generation
    on-device inside a lax.scan). Per-step host dispatch dominates wall
    clock on a tunneled TPU (axon), so the outer loop should call this
    with a few hundred steps at a time. Returns (state, next_key, metrics
    of the last step)."""

    def one(st, bk):
        bk, blk = jax.random.split(bk)
        batch = make_training_batch(
            bk, cfg.batch_size, cfg.height, cfg.width, cfg.max_corners,
            cfg.texture_fraction, cfg.corridor_fraction, corridor_pool,
        )
        if cfg.blur_fraction > 0:
            batch = _blur_training_batch(blk, batch, cfg)
        return _train_step_raw(st, batch, cfg)

    def body(carry, _):
        st, k = carry
        k, bk = jax.random.split(k)
        st, _ = one(st, bk)
        return (st, k), None

    (state, key), _ = jax.lax.scan(body, (state, key), None, length=n_steps - 1)
    key, bk = jax.random.split(key)
    state, metrics = one(state, bk)
    return state, key, metrics


def make_sharded_train_step(mesh, state: TrainState, cfg: TrainConfig):
    """Return (sharded_step, sharded_state): the same train step jitted with
    explicit dp/tp shardings for ``mesh``. Use for multi-chip training and
    the driver's multichip dry-run."""
    rep = replicated(mesh)
    state_sh = TrainState(
        # AdamW moments mirror the param tree (same nested keys incl.
        # 'kernel'), so the same TP sharding rule applies to both.
        params=param_shardings(state.params, mesh),
        opt_state=param_shardings(state.opt_state, mesh),
        step=rep,
    )
    sharded_state = jax.device_put(state, state_sh)

    def step_fn(st, batch):
        return train_step(st, batch, cfg)

    dummy_batch = jax.eval_shape(
        lambda k: make_training_batch(
            k, cfg.batch_size, cfg.height, cfg.width, cfg.max_corners,
            cfg.texture_fraction, cfg.corridor_fraction,
        ),
        jax.random.PRNGKey(0),
    )
    b_sh = batch_shardings(dummy_batch, mesh)
    sharded_step = jax.jit(
        step_fn,
        in_shardings=(state_sh, b_sh),
        out_shardings=(state_sh, rep),
    )
    return sharded_step, sharded_state


def load_train_state(path: str, cfg: TrainConfig, key: jax.Array) -> TrainState:
    """Warm-start a TrainState from a saved checkpoint (optimizer reset).

    The checkpoint must architecturally match ``cfg`` (same stem stride /
    channels / gnn layers); restoring into the freshly-initialized
    template raises on shape mismatch. Used for continuation runs that
    push an existing recipe further (round 5: plain-tier wide-gap
    training continues from the stem2-subpix checkpoint)."""
    from flax import serialization

    state = create_train_state(key, cfg)
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    if isinstance(raw, dict) and "__meta__" in raw:
        raw = raw["params"]
    params = serialization.from_state_dict(state.params, raw)
    params = jax.device_put(params)
    return TrainState(
        params=params,
        opt_state=_make_optimizer(cfg).init(params),
        step=jnp.zeros((), jnp.int32),
    )


def _cached_corridor_pool(pk: jax.Array, cfg: TrainConfig):
    """Disk-cached corridor pool: the 4096-pair ray-cast render costs
    ~25 min on the tunneled TPU and fully dominates a training
    experiment's wall clock (the 16k-step optimization itself runs at
    ~28 steps/s = 10 min) — caching it makes recipe iteration cheap.
    Keyed on every input that shapes the rendered pairs."""
    import hashlib
    import os

    import numpy as np

    from forest_slam_tpu.io.synthetic import RENDER_VERSION
    from forest_slam_tpu.train.data import TrainingBatch, make_corridor_pool

    cache_dir = os.environ.get(
        "FS_BENCH_RENDER_CACHE", "/root/.cache/fs_render"
    )
    digest = hashlib.sha256(
        repr((
            np.asarray(pk).tolist(), cfg.corridor_pool_size, cfg.height,
            cfg.width, cfg.max_corners, cfg.corridor_scene,
            cfg.forest_share, cfg.corridor_min_forward,
            cfg.corridor_max_forward, RENDER_VERSION,
        )).encode()
    ).hexdigest()[:16]
    path = os.path.join(cache_dir, f"train_pool_{digest}.npz")
    if os.path.exists(path):
        try:
            z = np.load(path)
            print(f"# corridor pool loaded from cache {path}", flush=True)
            return TrainingBatch(**{k: jnp.asarray(z[k]) for k in z.files})
        except Exception as e:
            print(f"# pool cache unreadable ({e}); re-rendering", flush=True)
    pool = make_corridor_pool(
        pk, cfg.corridor_pool_size, cfg.height, cfg.width,
        cfg.max_corners, scene=cfg.corridor_scene,
        forest_share=cfg.forest_share,
        min_forward=cfg.corridor_min_forward,
        max_forward=cfg.corridor_max_forward,
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        tmp = f"{path}.{os.getpid()}.tmp"
        np.savez(tmp, **{
            k: np.asarray(v) for k, v in pool._asdict().items()
        })
        os.replace(tmp + ".npz", path)
    except OSError as e:
        print(f"# pool cache write skipped: {e}", flush=True)
    return pool


def train(
    cfg: TrainConfig,
    n_steps: int,
    seed: int = 0,
    log_every: int = 50,
    state: TrainState | None = None,
):
    """Simple single-host training loop. Steps run in ``log_every``-sized
    scanned chunks (one device dispatch each, see train_steps_scan)."""
    import time

    from forest_slam_tpu.train.data import make_corridor_pool  # noqa: F401

    key = jax.random.PRNGKey(seed)
    if state is None:
        key, init_key = jax.random.split(key)
        state = create_train_state(init_key, cfg)
    pool = None
    if cfg.corridor_fraction > 0 and cfg.corridor_pool_size > 0:
        key, pk = jax.random.split(key)
        t0 = time.time()
        pool = _cached_corridor_pool(pk, cfg)
        # block_until_ready is a NO-OP on the tunneled axon platform
        # (bench.py timing-honesty note) — a host fetch is the only real
        # completion barrier, so the printed render time is honest and the
        # first train step does not queue behind ~100 in-flight renders
        float(jax.numpy.sum(pool.image0[-1, ::37, ::37]))
        print(
            f"# corridor pool: {pool.image0.shape[0]} pairs ready "
            f"in {time.time() - t0:.1f}s",
            flush=True,
        )
    history = []
    done = 0
    t_run = time.time()
    while done < n_steps:
        chunk = min(log_every, n_steps - done)
        state, key, metrics = train_steps_scan(state, key, cfg, chunk, pool)
        done += chunk
        m = {k: float(v) for k, v in metrics.items()}
        history.append((done - 1, m))
        # live progress (flushed): a multi-hour run must be monitorable
        # and a diverging loss visible long before the end
        print(
            f"# step {done}/{n_steps} "
            + " ".join(f"{k}={v:.4f}" for k, v in sorted(m.items()))
            + f" ({done / max(time.time() - t_run, 1e-9):.1f} steps/s)",
            flush=True,
        )
    return state, history

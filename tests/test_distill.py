"""Distillation-subsystem tests (train/distill.py): loss mechanics, a few
optimization steps against a tiny fake teacher, and checkpoint round-trip
with the teacher's SuperGlue subtree re-exported."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from forest_slam_tpu.frontend.superpoint import SuperPointConfig, SuperPointNet
from forest_slam_tpu.frontend.weights import load_meta, save_params
from forest_slam_tpu.train.distill import (
    DistillConfig,
    create_student_state,
    distill,
    distill_loss,
    load_teacher,
    save_distilled,
)

CH = (8, 8, 16, 16)
DD = 32


@pytest.fixture(scope="module")
def teacher_ckpt(tmp_path_factory):
    """A tiny stride-1 'teacher' checkpoint with the trainer's layout
    (superpoint + superglue subtrees + architecture meta)."""
    path = str(tmp_path_factory.mktemp("distill") / "teacher.msgpack")
    net = SuperPointNet(
        SuperPointConfig(stem_stride=1, channels=CH, descriptor_dim=DD)
    )
    params = net.init(jax.random.PRNGKey(3), jnp.zeros((1, 48, 64)))
    fake_sg = {"params": {"proj": jnp.ones((4, 4), jnp.float32)}}
    save_params(
        {"superpoint": params, "superglue": fake_sg},
        path,
        meta={"stem_stride": 1, "gnn_layers": 2, "sinkhorn_iterations": 5},
    )
    return path


def tiny_cfg(teacher_ckpt, **kw):
    base = dict(
        teacher_path=teacher_ckpt,
        channels=CH,
        descriptor_dim=DD,
        height=48,
        width=64,
        batch_size=2,
        learning_rate=2e-3,
        pool_frames=2,
        pool_height=96,
        pool_width=128,
    )
    base.update(kw)
    return DistillConfig(**base)


def make_pool(cfg):
    rng = np.random.RandomState(0)
    return jnp.asarray(
        rng.uniform(0, 255, (cfg.pool_frames, cfg.pool_height, cfg.pool_width)),
        jnp.float32,
    )


def test_distill_loss_zero_for_identical_nets(teacher_ckpt):
    """A stride-1 'student' holding the teacher's own params reaches the
    loss floor: CE equals the teacher distribution's entropy (KL = 0) and
    the weighted cosine term vanishes."""
    cfg = tiny_cfg(teacher_ckpt, stem_stride=1)
    teacher, t_params, _, _ = load_teacher(cfg)
    imgs = jnp.asarray(
        np.random.RandomState(1).uniform(0, 255, (2, 48, 64)), jnp.float32
    )
    t_out = teacher.apply(t_params, imgs / 255.0)
    loss, metrics = distill_loss(t_params, t_out, imgs, cfg)
    probs = jax.nn.softmax(t_out.det_logits, axis=-1)
    entropy = -jnp.mean(
        jnp.sum(probs * jnp.log(jnp.maximum(probs, 1e-20)), axis=-1)
    )
    assert float(metrics["desc"]) < 1e-5
    assert abs(float(metrics["det"]) - float(entropy)) < 1e-4
    assert float(metrics["cos_kp"]) > 0.9999


def test_distill_steps_reduce_loss(teacher_ckpt):
    cfg = tiny_cfg(teacher_ckpt)
    pool = make_pool(cfg)
    state, history, payload = distill(
        cfg, 8, log_every=4, pool=pool, seed=1
    )
    assert int(state.step) == 8
    first, last = history[0][1], history[-1][1]
    assert np.isfinite(last["loss"])
    assert last["loss"] < first["loss"]
    assert set(payload) == {"superpoint", "superglue"}


def test_distilled_checkpoint_roundtrip(teacher_ckpt, tmp_path):
    """Saved distilled checkpoint: student stem meta + the teacher's
    SuperGlue subtree byte-identical."""
    cfg = tiny_cfg(teacher_ckpt)
    state = create_student_state(jax.random.PRNGKey(0), cfg)
    _, _, ckpt_state, teacher_meta = load_teacher(cfg)
    payload = {
        "superpoint": state.params,
        "superglue": ckpt_state["superglue"],
    }
    out = str(tmp_path / "distilled.msgpack")
    save_distilled(payload, cfg, out, teacher_meta)
    meta = load_meta(out)
    assert meta["stem_stride"] == cfg.stem_stride
    assert meta["gnn_layers"] == 2
    from flax import serialization

    with open(out, "rb") as f:
        restored = serialization.msgpack_restore(f.read())
    sg = restored["params"]["superglue"]["params"]["proj"]
    np.testing.assert_array_equal(np.asarray(sg), np.ones((4, 4)))
    # student subtree loads back into a stride-2 net template
    net = SuperPointNet(
        SuperPointConfig(
            stem_stride=cfg.stem_stride, channels=CH, descriptor_dim=DD
        )
    )
    template = net.init(jax.random.PRNGKey(1), jnp.zeros((1, 48, 64)))
    loaded = serialization.from_state_dict(
        template, restored["params"]["superpoint"]
    )
    out_s = net.apply(loaded, jnp.zeros((1, 48, 64)))
    assert out_s.heat.shape == (1, 48, 64)


def test_scale_consistency_term(teacher_ckpt):
    """With zoom given: a stride-1 student holding the teacher's params
    has near-zero scale loss at ratio 1.0 (sampling is the identity) and
    a finite, larger one at real zoom ratios."""
    from forest_slam_tpu.train.distill import _zoom_batch, distill_loss as dl

    cfg = tiny_cfg(teacher_ckpt, stem_stride=1)
    teacher, t_params, _, _ = load_teacher(cfg)
    imgs = jnp.asarray(
        np.random.RandomState(2).uniform(0, 255, (2, 48, 64)), jnp.float32
    )
    t_out = teacher.apply(t_params, imgs / 255.0)
    ident = (imgs, jnp.ones((2,)))
    _, m_id = dl(t_params, t_out, imgs, cfg, zoom=ident)
    assert float(m_id["scale"]) < 1e-5
    zoom = _zoom_batch(jax.random.PRNGKey(0), imgs, cfg)
    _, m_z = dl(t_params, t_out, imgs, cfg, zoom=zoom)
    assert np.isfinite(float(m_z["scale"]))
    assert float(m_z["scale"]) > float(m_id["scale"])


def test_distill_steps_with_scale_term(teacher_ckpt):
    cfg = tiny_cfg(teacher_ckpt, w_scale=1.0)
    pool = make_pool(cfg)
    state, history, _ = distill(cfg, 4, log_every=4, pool=pool, seed=1)
    assert int(state.step) == 4
    assert np.isfinite(history[-1][1]["loss"])
    assert "scale" in history[-1][1]


def test_blur_consistency_term(teacher_ckpt):
    """With blurred given: a student holding the teacher's params has
    near-zero blur loss on an UNBLURRED copy (targets are the clean
    teacher outputs) and a finite, larger one on real blurred views."""
    from forest_slam_tpu.train.distill import _blur_batch, distill_loss as dl

    cfg = tiny_cfg(teacher_ckpt, stem_stride=1, w_blur=1.0)
    teacher, t_params, _, _ = load_teacher(cfg)
    imgs = jnp.asarray(
        np.random.RandomState(4).uniform(0, 255, (2, 48, 64)), jnp.float32
    )
    t_out = teacher.apply(t_params, imgs / 255.0)
    # identity "blur": student-on-clean == teacher-on-clean -> only the
    # CE self-entropy floor remains in the detector part
    _, m_id = dl(t_params, t_out, imgs, cfg, blurred=imgs)
    blurred = _blur_batch(jax.random.PRNGKey(0), imgs, cfg)
    assert blurred.shape == imgs.shape
    assert float(jnp.abs(blurred - imgs).max()) > 0  # something changed
    _, m_b = dl(t_params, t_out, imgs, cfg, blurred=blurred)
    assert np.isfinite(float(m_b["blur"]))
    assert float(m_b["blur"]) > float(m_id["blur"]) - 1e-6


def test_distill_steps_with_blur_term(teacher_ckpt):
    cfg = tiny_cfg(teacher_ckpt, w_blur=1.0, blur_kernel=5)
    pool = make_pool(cfg)
    state, history, _ = distill(cfg, 4, log_every=4, pool=pool, seed=1)
    assert int(state.step) == 4
    assert np.isfinite(history[-1][1]["loss"])
    assert "blur" in history[-1][1]


def test_subpix_preservation_term(teacher_ckpt):
    """w_subpix: zero when the student IS the teacher; finite positive
    for a random student."""
    cfg = tiny_cfg(teacher_ckpt, stem_stride=1, w_subpix=1.0)
    teacher, t_params, _, _ = load_teacher(cfg)
    imgs = jnp.asarray(
        np.random.RandomState(5).uniform(0, 255, (2, 48, 64)), jnp.float32
    )
    t_out = teacher.apply(t_params, imgs / 255.0)
    _, m_id = distill_loss(t_params, t_out, imgs, cfg)
    assert float(m_id["subpix"]) < 1e-8
    rand = create_student_state(jax.random.PRNGKey(9), cfg)
    _, m_r = distill_loss(rand.params, t_out, imgs, cfg)
    assert np.isfinite(float(m_r["subpix"]))
    assert float(m_r["subpix"]) > 1e-4

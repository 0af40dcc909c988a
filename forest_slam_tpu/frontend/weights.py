"""Weight loading for the learned front-end.

The reference loads pretrained SuperPoint/SuperGlue weights from its (not
vendored) submodule (``weights='outdoor'``, stereo_slam.py:74). Ours are
trained in-repo (train/trainer.py) and stored as a flax msgpack checkpoint
under ``weights/``. If no checkpoint exists yet, falls back to random
initialization with a warning — throughput benchmarks remain valid (same
FLOPs), accuracy ones do not.
"""

from __future__ import annotations

import os
import sys

import jax
from flax import serialization

_WEIGHTS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "weights",
)

# The stride-1 training/teacher checkpoint: where train-frontend saves by
# default and what distill-frontend distills from.
DEFAULT_PATH = os.path.join(_WEIGHTS_DIR, "learned_frontend.msgpack")

# The flagship inference checkpoint (round 4): the wide-baseline stem-2
# teacher distilled into the space-to-depth stem-4 student with the
# cross-scale consistency term AND the blur-robustness term
# (train/distill.py w_scale + w_blur, 20k steps) — the round-3 flagship
# distilled without w_blur failed the blur50 gate (21/23 / 0.162 m),
# and a 12k-step w_blur=1.0 variant traded away one forest K=20 frame;
# 20k steps at w_blur=0.7 recovers both. Benched (BENCH round 4,
# device runner): 300.2 pairs/s / ATE 0.0316 m at 960x600 K=1, lowres
# 23/23 / 0.0221, wb_k10 15/15 / 0.0083, wb_k20 7/7 / 0.0126, fwb_k20
# 7/7 / 0.0467, blur50 23/23 / 0.007 — every thesis gate green on one
# checkpoint. The stem-2 distilled checkpoint is the fallback tier.
FLAGSHIP_PATH = os.path.join(
    _WEIGHTS_DIR, "learned_frontend_stem4_wb_blur2.msgpack"
)
_FLAGSHIP_FALLBACK = os.path.join(
    _WEIGHTS_DIR, "learned_frontend_stem2_distilled.msgpack"
)

# The directly-trained stem-2 run: the teacher of the flagship
# distillation — its descriptor space survives the ~1.6x forward-motion
# scale gap of K=20 keyframing, which the stride-1 teacher's does not
# (gap-20 assignments land at 197 px median residual,
# scripts/diag_wide_baseline.py). Kept as the reproducible teacher;
# inference should use the flagship.
WIDE_BASELINE_PATH = os.path.join(
    _WEIGHTS_DIR, "learned_frontend_stem2.msgpack"
)

# The sub-pixel (round-3) stem-2 checkpoint: trained with bilinear-soft
# detector targets + the com3 readout + a zoom scale-equivariance term
# (train/losses.py detector_labels_soft, trainer w_zoom). The first
# in-repo checkpoint whose PLAIN configuration — single octave, no SAD
# refinement, reference thresholds — tracks K=10 keyframe gaps:
# 15/15 / ATE 0.075 m on the 960x600 corridor (VERDICT r2 missing #1;
# scripts/eval_k_ablation.py, measured 2026-08-20). Doubles plain gap-10
# sub-2px matches vs the flagship (69 vs 33 of ~250,
# scripts/diag_wide_baseline.py). K=20 plain still needs the
# wide-baseline stack. Distilling it into stem-4 loses the sub-pixel
# margin (9/15 at K=10), so this tier stays stem-2.
_PLAIN_TIERS = (
    # round 5: the subpix checkpoint continued 12k steps at lr 3e-5 on a
    # wide-gap (0.9-3.2 m forward) forest-heavy pool — plain K=10 improves
    # to 15/15 / 0.037-0.042 m on BOTH bench seeds (the r3/r4 tier was
    # seed-flaky: 14/15 / 0.70 at seed 1) and forest plain K=10 climbs
    # 1/15 -> 7/15 (full campaign table in BASELINE.md round-5 section).
    # Aggressive continuation (lr 3e-4) measurably DESTROYS the tier
    # (0/15) — the low LR is load-bearing.
    "learned_frontend_stem2_subpix_wide.msgpack",
    "learned_frontend_stem2_subpix.msgpack",
)
PLAIN_WB_PATH = next(
    (p for n in _PLAIN_TIERS
     if os.path.exists(p := os.path.join(_WEIGHTS_DIR, n))),
    os.path.join(_WEIGHTS_DIR, _PLAIN_TIERS[-1]),
)


def flagship_path() -> str:
    """Default checkpoint for *loading* (CLI/bench): the distilled
    flagship when committed, else the distilled stem-2 tier, else the
    stride-1 training checkpoint."""
    for p in (FLAGSHIP_PATH, _FLAGSHIP_FALLBACK):
        if os.path.exists(p):
            return p
    return DEFAULT_PATH


def wide_baseline_path() -> str:
    """Default checkpoint for the --wide-baseline preset. The flagship
    now wins at every K (it is distilled FROM the wide-baseline teacher
    with a cross-scale consistency term), so the preset and the default
    path share one checkpoint."""
    return flagship_path()


def save_params(params, path: str = DEFAULT_PATH, meta: dict | None = None) -> None:
    """Write a checkpoint; ``meta`` records the architecture knobs that
    parameter shapes depend on (e.g. superpoint stem_stride) so loaders can
    rebuild a matching model without out-of-band knowledge."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    payload = params if meta is None else {"__meta__": meta, "params": params}
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(payload))


def load_meta(path: str = DEFAULT_PATH) -> dict:
    """Architecture meta stored in a checkpoint ({} for legacy files)."""
    if not os.path.exists(path):
        return {}
    with open(path, "rb") as f:
        state = serialization.msgpack_restore(f.read())
    if isinstance(state, dict) and "__meta__" in state:
        return {k: _scalar(v) for k, v in state["__meta__"].items()}
    return {}


def _scalar(v):
    try:
        return v.item()
    except AttributeError:
        return v


def load_learned_frontend(
    image_shape,
    path: str = DEFAULT_PATH,
    scales=(1.0,),
    superglue_overrides: dict | None = None,
    **overrides,
):
    """Build a LearnedFrontend matching a checkpoint's architecture meta and
    load its weights. ``overrides`` are extra SuperPointConfig fields that do
    not affect parameter shapes (max_keypoints, thresholds);
    ``superglue_overrides`` likewise for SuperGlueConfig (softmax_dtype,
    attention_impl, match_threshold); ``scales`` are the extraction octaves
    (LearnedFrontendConfig.scales)."""
    from forest_slam_tpu.frontend.learned import (
        LearnedFrontend,
        LearnedFrontendConfig,
    )
    from forest_slam_tpu.frontend.superglue import SuperGlueConfig
    from forest_slam_tpu.frontend.superpoint import SuperPointConfig

    meta = load_meta(path)
    # subpixel readout follows the checkpoint's training recipe: "com3"
    # only helps heatmaps trained on bilinear-soft targets (meta records
    # it); hard-label legacy checkpoints default to "none".
    overrides.setdefault("subpixel", str(meta.get("subpixel", "none")))
    sp = SuperPointConfig(
        stem_stride=int(meta.get("stem_stride", 1)), **overrides
    )
    sg = SuperGlueConfig(
        gnn_layers=int(meta.get("gnn_layers", 9)),
        sinkhorn_iterations=int(meta.get("sinkhorn_iterations", 20)),
        **(superglue_overrides or {}),
    )
    fe = LearnedFrontend(
        LearnedFrontendConfig(
            superpoint=sp, superglue=sg, scales=tuple(scales)
        )
    )
    return fe, load_pretrained(fe, image_shape, path)


def load_pretrained(fe, image_shape, path: str = DEFAULT_PATH, seed: int = 0):
    """Load checkpoint into the template produced by ``fe.init``.

    Training checkpoints (train/trainer.py) store the bare ``SuperPointNet``
    parameters, while the inference wrapper nests them as
    ``SuperPoint(name='net')`` — the layouts are adapted transparently.
    """
    template = fe.init(jax.random.PRNGKey(seed), image_shape)
    if not os.path.exists(path):
        print(
            f"# warning: no learned-frontend checkpoint at {path}; "
            "using random init",
            file=sys.stderr,
        )
        return template
    with open(path, "rb") as f:
        raw = f.read()
    state = serialization.msgpack_restore(raw)
    if isinstance(state, dict) and "__meta__" in state:
        state = state["params"]
    sp = state.get("superpoint", {})
    if isinstance(sp, dict) and "params" in sp and "net" not in sp["params"]:
        state["superpoint"] = {"params": {"net": sp["params"]}}
    params = serialization.from_state_dict(template, state)
    # msgpack restore yields HOST numpy leaves; left as-is, every jitted call
    # re-uploads the full weight tree (on a tunneled TPU that is ~2 s per
    # dispatch — measured 400x slowdown on the SuperGlue step). Commit the
    # tree to the default device once.
    return jax.device_put(params)

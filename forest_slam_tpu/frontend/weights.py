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

DEFAULT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "weights",
    "learned_frontend.msgpack",
)


def save_params(params, path: str = DEFAULT_PATH) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


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
    try:
        params = serialization.from_bytes(template, raw)
    except ValueError:
        state = serialization.msgpack_restore(raw)
        sp = state.get("superpoint", {})
        if isinstance(sp, dict) and "params" in sp and "net" not in sp["params"]:
            state["superpoint"] = {"params": {"net": sp["params"]}}
        params = serialization.from_state_dict(template, state)
    # msgpack restore yields HOST numpy leaves; left as-is, every jitted call
    # re-uploads the full weight tree (on a tunneled TPU that is ~2 s per
    # dispatch — measured 400x slowdown on the SuperGlue step). Commit the
    # tree to the default device once.
    return jax.device_put(params)

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
    """Load checkpoint into the template produced by ``fe.init``."""
    template = fe.init(jax.random.PRNGKey(seed), image_shape)
    if os.path.exists(path):
        with open(path, "rb") as f:
            return serialization.from_bytes(template, f.read())
    print(
        f"# warning: no learned-frontend checkpoint at {path}; "
        "using random init",
        file=sys.stderr,
    )
    return template

"""Dataset layer: rosbag streams -> preprocessed device-ready image stacks.

The reference interleaves decode + preprocess + SLAM in one host loop
(stereo_slam.py:177-204: cv_bridge decode -> cv2.undistort -> BGR2GRAY per
message). Here ingestion is split TPU-style: the host decodes raw bag bytes
to arrays, and the whole preprocessing chain (BGR->gray + undistort remap)
runs as one jitted batched program on device — per-frame host<->device hops
become one transfer per chunk.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from forest_slam_tpu.core.camera import (
    PinholeCamera,
    StereoRig,
    bgr_to_gray,
    remap_bilinear,
    undistort_map,
)
from forest_slam_tpu.io.rosbag import BagReader


@functools.partial(jax.jit, static_argnums=(2,))
def _preprocess_batch(images: jax.Array, src_map: jax.Array, is_color: bool):
    """(B, H, W[, 3]) raw -> (B, H, W) float32 gray, undistorted."""

    def one(img):
        g = bgr_to_gray(img) if is_color else img.astype(jnp.float32)
        return remap_bilinear(g, src_map)

    return jax.vmap(one)(images)


def preprocess_frames(
    frames: np.ndarray, cam: PinholeCamera, chunk: int = 64
) -> jax.Array:
    """Host frames -> undistorted grayscale stack on device."""
    src_map = undistort_map(cam)
    is_color = frames.ndim == 4
    outs = []
    for i in range(0, frames.shape[0], chunk):
        outs.append(_preprocess_batch(jnp.asarray(frames[i : i + chunk]), src_map, is_color))
    return jnp.concatenate(outs) if len(outs) > 1 else outs[0]


def _native_read(bag_path, topic, max_frames, stride):
    """Images via the C++ reader (forest_slam_tpu/native), or None to fall
    back to the pure-Python parser."""
    from forest_slam_tpu import native

    if not native.available():
        return None
    try:
        imgs, stamps, _ = native.read_image_topic(
            bag_path, topic, max_frames=max_frames, stride=stride
        )
        return imgs, stamps
    except RuntimeError:
        return None


class StereoSequence(NamedTuple):
    images_left: jax.Array  # (N, H, W) float32, undistorted gray
    images_right: jax.Array
    timestamps: np.ndarray  # (N,)


class MonoSequence(NamedTuple):
    images: jax.Array
    timestamps: np.ndarray


def load_stereo_from_bag(
    bag_path: str,
    rig: StereoRig,
    left_topic: str = "/dalsa_rgb/left/image_raw",
    right_topic: str = "/dalsa_rgb/right/image_raw",
    max_frames: int | None = None,
    frame_stride: int = 1,
) -> StereoSequence:
    """Read + pair + preprocess a stereo bag (the reference's topics,
    stereo_slam.py:177). Pairs are aligned by stream order; ``frame_stride``
    subsamples pairs (the K-interval ablation knob, quirk B2 made sane).

    The C++ reader (forest_slam_tpu/native) is used when available (pairs
    by per-topic index, equivalent for lockstep stereo streams); otherwise
    the pure-Python parser."""
    nat_l = _native_read(bag_path, left_topic, max_frames, frame_stride)
    nat_r = _native_read(bag_path, right_topic, max_frames, frame_stride)
    if nat_l is not None and nat_r is not None:
        lefts, times = nat_l
        rights, _ = nat_r
        n = min(len(lefts), len(rights))
        return StereoSequence(
            images_left=preprocess_frames(lefts[:n], rig.left),
            images_right=preprocess_frames(rights[:n], rig.right),
            timestamps=np.asarray(times[:n]),
        )
    lefts, rights, times = [], [], []
    pend_l = None
    for topic, msg, t in BagReader(bag_path).read_messages(
        topics=[left_topic, right_topic]
    ):
        arr = msg.to_array()
        if topic == left_topic:
            pend_l = (arr, msg.stamp)
        elif pend_l is not None:
            lefts.append(pend_l[0])
            times.append(pend_l[1])
            rights.append(arr)
            pend_l = None
            if max_frames is not None and len(lefts) >= max_frames * frame_stride:
                break
    lefts = np.stack(lefts)[::frame_stride]
    rights = np.stack(rights)[::frame_stride]
    times = np.asarray(times)[::frame_stride]
    if max_frames is not None:
        lefts, rights, times = lefts[:max_frames], rights[:max_frames], times[:max_frames]
    return StereoSequence(
        images_left=preprocess_frames(lefts, rig.left),
        images_right=preprocess_frames(rights, rig.right),
        timestamps=times,
    )


def load_mono_from_bag(
    bag_path: str,
    cam: PinholeCamera,
    topic: str = "/dalsa_rgb/left/image_raw",
    max_frames: int | None = None,
    frame_stride: int = 1,
) -> MonoSequence:
    nat = _native_read(bag_path, topic, max_frames, frame_stride)
    if nat is not None:
        arr, times = nat
        return MonoSequence(
            images=preprocess_frames(arr, cam), timestamps=np.asarray(times)
        )
    frames, times = [], []
    for tpc, msg, t in BagReader(bag_path).read_messages(topics=[topic]):
        frames.append(msg.to_array())
        times.append(msg.stamp)
        if max_frames is not None and len(frames) >= max_frames * frame_stride:
            break
    arr = np.stack(frames)[::frame_stride]
    times = np.asarray(times)[::frame_stride]
    if max_frames is not None:
        arr, times = arr[:max_frames], times[:max_frames]
    return MonoSequence(images=preprocess_frames(arr, cam), timestamps=times)

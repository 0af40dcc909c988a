"""Native (C++) runtime components, loaded through ctypes.

Currently: the accelerated ROS1-bag image reader (rosbag_reader.cpp),
replacing the reference's rosbag C++ stack on the hot ingestion path. The
shared library is compiled on first use with the system toolchain and
cached next to the source; everything degrades gracefully to the pure
Python parser (io/rosbag.py) when a compiler is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "rosbag_reader.cpp")
_SO = os.path.join(_DIR, "_rosbag_reader.so")

_lock = threading.Lock()
_lib = None
_load_failed = False


def _build() -> bool:
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC,
        "-o", _SO, "-l:libbz2.so.1",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # missing toolchain / lib — fall back to Python
        print(f"# native rosbag reader build failed: {e}", file=sys.stderr)
        return False


def _load():
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        ):
            if not _build():
                _load_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as e:
            print(f"# native rosbag reader load failed: {e}", file=sys.stderr)
            _load_failed = True
            return None
        lib.fsbag_open.restype = ctypes.c_void_p
        lib.fsbag_open.argtypes = [ctypes.c_char_p]
        lib.fsbag_close.argtypes = [ctypes.c_void_p]
        lib.fsbag_count.restype = ctypes.c_long
        lib.fsbag_count.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.fsbag_image_info.restype = ctypes.c_int
        lib.fsbag_image_info.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.c_char_p,
        ]
        lib.fsbag_read_images.restype = ctypes.c_long
        lib.fsbag_read_images.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_double),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    """True if the native reader can be built/loaded on this machine."""
    return _load() is not None


def read_image_topic(
    path: str,
    topic: str,
    max_frames: int | None = None,
    stride: int = 1,
) -> tuple[np.ndarray, np.ndarray, str]:
    """Read every ``stride``-th sensor_msgs/Image on ``topic``.

    Returns (images (N, H, W) or (N, H, W, C) uint8, stamps (N,) float64,
    encoding). Raises RuntimeError if the native reader is unavailable or
    the bag cannot be parsed.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native rosbag reader unavailable")
    h = lib.fsbag_open(path.encode())
    if not h:
        raise RuntimeError(f"failed to open/parse bag {path!r}")
    try:
        n = lib.fsbag_count(h, topic.encode())
        if n == 0:
            raise RuntimeError(f"no Image messages on topic {topic!r}")
        H = ctypes.c_int()
        W = ctypes.c_int()
        C = ctypes.c_int()
        enc = ctypes.create_string_buffer(32)
        rc = lib.fsbag_image_info(h, topic.encode(), H, W, C, enc)
        if rc != 0:
            raise RuntimeError(f"image info failed rc={rc}")
        n_take = (n + stride - 1) // stride
        if max_frames is not None:
            n_take = min(n_take, max_frames)
        out = np.empty((n_take, H.value, W.value, C.value), np.uint8)
        stamps = np.empty((n_take,), np.float64)
        got = lib.fsbag_read_images(
            h, topic.encode(),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            n_take, stride,
            stamps.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        if got < 0:
            raise RuntimeError(f"read_images failed rc={got}")
        out = out[:got]
        stamps = stamps[:got]
        if C.value == 1:
            out = out[..., 0]
        return out, stamps, enc.value.decode()
    finally:
        lib.fsbag_close(h)

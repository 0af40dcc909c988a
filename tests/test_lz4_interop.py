"""Interop of the vendored LZ4 frame codec with the REAL lz4 library.

ADVICE r3: io/lz4f.py was only round-trip tested against itself; frames
produced by roslz4/the lz4 CLI use features our writer never emits
(linked blocks, block checksums, content size + content checksum). Here
the reference encoder is the system ``liblz4.so`` driven over ctypes
(LZ4F_compressFrame) — a genuinely independent implementation — plus a
checked-in fixture produced by it (tests/fixtures/linked_bc.lz4) so the
interop surface stays covered even where the shared library is absent.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import os
import struct

import pytest

from forest_slam_tpu.io.lz4f import _xxh32, compress, decompress

FIXTURE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "fixtures", "linked_bc.lz4"
)

# data long enough to span several 64 KiB blocks, with long-range
# repetition so linked-block matches cross block boundaries
PAYLOAD = (
    b"forest-slam tpu rebuild lz4 interop payload " * 4096
    + bytes(range(256)) * 512
    + b"tail-that-does-not-repeat-0123456789"
)


class _FrameInfo(ctypes.Structure):
    _fields_ = [
        ("blockSizeID", ctypes.c_int),
        ("blockMode", ctypes.c_int),  # 0 = linked, 1 = independent
        ("contentChecksumFlag", ctypes.c_int),
        ("frameType", ctypes.c_int),
        ("contentSize", ctypes.c_ulonglong),
        ("dictID", ctypes.c_uint),
        ("blockChecksumFlag", ctypes.c_int),
    ]


class _Preferences(ctypes.Structure):
    _fields_ = [
        ("frameInfo", _FrameInfo),
        ("compressionLevel", ctypes.c_int),
        ("autoFlush", ctypes.c_uint),
        ("favorDecSpeed", ctypes.c_uint),
        ("reserved", ctypes.c_uint * 3),
    ]


def _load_liblz4():
    for name in ("liblz4.so.1", "liblz4.so", ctypes.util.find_library("lz4")):
        if not name:
            continue
        try:
            return ctypes.CDLL(name)
        except OSError:
            continue
    return None


def _real_lz4_frame(data: bytes, *, linked: bool, block_checksum: bool,
                    content_checksum: bool, content_size: bool,
                    block_kb: int = 64) -> bytes:
    lib = _load_liblz4()
    if lib is None:
        pytest.skip("liblz4 shared library not available")
    lib.LZ4F_compressFrameBound.restype = ctypes.c_size_t
    lib.LZ4F_compressFrame.restype = ctypes.c_size_t
    lib.LZ4F_isError.restype = ctypes.c_uint
    prefs = _Preferences()
    prefs.frameInfo.blockSizeID = {64: 4, 256: 5, 1024: 6, 4096: 7}[block_kb]
    prefs.frameInfo.blockMode = 0 if linked else 1
    prefs.frameInfo.contentChecksumFlag = 1 if content_checksum else 0
    prefs.frameInfo.blockChecksumFlag = 1 if block_checksum else 0
    prefs.frameInfo.contentSize = len(data) if content_size else 0
    bound = lib.LZ4F_compressFrameBound(
        ctypes.c_size_t(len(data)), ctypes.byref(prefs)
    )
    dst = ctypes.create_string_buffer(bound)
    n = lib.LZ4F_compressFrame(
        dst, ctypes.c_size_t(bound), data, ctypes.c_size_t(len(data)),
        ctypes.byref(prefs),
    )
    assert not lib.LZ4F_isError(ctypes.c_size_t(n)), "LZ4F_compressFrame failed"
    return dst.raw[:n]


def test_decode_real_linked_block_checksum_frame():
    """Linked blocks + block checksums + content size + content checksum,
    straight from liblz4."""
    frame = _real_lz4_frame(
        PAYLOAD, linked=True, block_checksum=True, content_checksum=True,
        content_size=True,
    )
    flg = frame[4]
    assert (flg >> 5) & 1 == 0, "frame must be linked-block"
    assert (flg >> 4) & 1 == 1, "frame must carry block checksums"
    assert decompress(frame) == PAYLOAD


def test_decode_real_independent_frame():
    frame = _real_lz4_frame(
        PAYLOAD, linked=False, block_checksum=False, content_checksum=True,
        content_size=False,
    )
    assert decompress(frame) == PAYLOAD


def test_corruption_detected_via_checksums():
    frame = bytearray(
        _real_lz4_frame(
            PAYLOAD, linked=True, block_checksum=True, content_checksum=True,
            content_size=True,
        )
    )
    # flip one byte inside the first data block (header is 4+1+1+8+1 = 15
    # bytes with content size present; +4 block size word)
    frame[40] ^= 0xFF
    with pytest.raises(ValueError):
        decompress(bytes(frame))
    # and silently passes (or errors structurally) when told not to verify
    try:
        decompress(bytes(frame), verify_checksums=False)
    except ValueError:
        pass  # corrupt stream may still break block parsing — fine


def test_checked_in_fixture_decodes():
    """The committed liblz4-produced frame (block checksums + linked
    blocks + content checksum) decodes bit-exactly — covered even where
    liblz4 is absent."""
    assert os.path.exists(FIXTURE), "run scripts/make_lz4_fixture.py"
    with open(FIXTURE, "rb") as f:
        frame = f.read()
    flg = frame[4]
    assert (flg >> 5) & 1 == 0 and (flg >> 4) & 1 == 1
    out = decompress(frame)
    assert _xxh32(out) == struct.unpack("<I", frame[-4:])[0]
    assert out == PAYLOAD


def test_real_lz4_decodes_our_frames():
    """Our encoder's output must be readable by the REAL decoder too."""
    lib = _load_liblz4()
    if lib is None:
        pytest.skip("liblz4 shared library not available")
    frame = compress(PAYLOAD[: 256 * 1024])
    lib.LZ4F_createDecompressionContext.restype = ctypes.c_size_t
    lib.LZ4F_decompress.restype = ctypes.c_size_t
    lib.LZ4F_isError.restype = ctypes.c_uint
    VERSION = 100
    ctx = ctypes.c_void_p()
    err = lib.LZ4F_createDecompressionContext(
        ctypes.byref(ctx), ctypes.c_uint(VERSION)
    )
    assert not lib.LZ4F_isError(ctypes.c_size_t(err))
    out = bytearray()
    src = ctypes.create_string_buffer(frame, len(frame))
    src_off = 0
    dst_cap = 1 << 20
    dst = ctypes.create_string_buffer(dst_cap)
    while src_off < len(frame):
        src_sz = ctypes.c_size_t(len(frame) - src_off)
        dst_sz = ctypes.c_size_t(dst_cap)
        r = lib.LZ4F_decompress(
            ctx,
            dst, ctypes.byref(dst_sz),
            ctypes.byref(src, src_off), ctypes.byref(src_sz),
            None,
        )
        assert not lib.LZ4F_isError(ctypes.c_size_t(r)), "real decoder rejected our frame"
        out += dst.raw[: dst_sz.value]
        src_off += src_sz.value
        if r == 0:
            break
    lib.LZ4F_freeDecompressionContext(ctx)
    assert bytes(out) == PAYLOAD[: 256 * 1024]

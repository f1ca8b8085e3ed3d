"""ctypes loader for the native C++ data helpers (avsr_native.cpp).

Builds the shared library on first use (g++ -O3, cached next to the
source); every entry point has a pure-Python fallback (data/audio_io.py),
so the framework works without a toolchain — the native path is the
performance tier for batch host decode.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

log = logging.getLogger("avsr.native")

_HERE = Path(__file__).parent
_SRC = _HERE / "avsr_native.cpp"
_LIB = _HERE / "libavsr_native.so"
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
           "-o", str(_LIB), str(_SRC), "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError) as e:
        log.warning("native build failed (%s); using Python fallback", e)
        return False


def load() -> ctypes.CDLL | None:
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("AVSR_NO_NATIVE"):
            return None
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError as e:
            log.warning("native load failed: %s", e)
            return None
        lib.avsr_decode_wav.restype = ctypes.c_int64
        lib.avsr_decode_wav.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64]
        lib.avsr_decode_wav_batch.restype = ctypes.c_int
        lib.avsr_decode_wav_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int]
        lib.avsr_resize_crop_frames.restype = None
        lib.avsr_resize_crop_frames.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.c_int]
        lib.avsr_rgb_to_yuv420.restype = None
        lib.avsr_rgb_to_yuv420.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int]
        if lib.avsr_native_abi_version() != 3:
            log.warning("native ABI mismatch; using Python fallback")
            return None
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def decode_wav(path: str | Path, target_sr: int = 16_000,
               max_samples: int = 480_000) -> np.ndarray | None:
    """Native single-file decode -> float32 [n], or None on failure."""
    lib = load()
    if lib is None:
        return None
    buf = np.empty(max_samples, np.float32)
    n = lib.avsr_decode_wav(
        str(path).encode(), target_sr,
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_samples)
    if n < 0:
        return None
    return buf[:n].copy()


def decode_wav_batch(paths: list[str | Path], target_sr: int = 16_000,
                     max_samples: int = 480_000, num_threads: int = 0,
                     out: np.ndarray | None = None,
                     ) -> tuple[np.ndarray, np.ndarray] | None:
    """Native multithreaded batch decode -> ([B, max_samples] f32, lens).

    ``out`` may be a preallocated C-contiguous [B, max_samples] f32 buffer
    (e.g. the collate pad buffer — decode writes straight into it). Failed
    rows come back zero-length (the caller applies the dataset retry-walk);
    returns None only when the library itself is unavailable.
    """
    lib = load()
    if lib is None:
        return None
    B = len(paths)
    if out is None:
        out = np.zeros((B, max_samples), np.float32)
    assert out.shape == (B, max_samples) and out.dtype == np.float32 \
        and out.flags.c_contiguous
    lens = np.zeros(B, np.int32)
    c_paths = (ctypes.c_char_p * B)(*[str(p).encode() for p in paths])
    lib.avsr_decode_wav_batch(
        c_paths, B, target_sr,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), max_samples,
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), num_threads)
    return out, lens


def resize_crop_frames(frames: np.ndarray, size: int,
                       num_threads: int = 0) -> np.ndarray | None:
    """Native shortest-side bilinear resize + center crop:
    u8 [T, H, W, 3] -> u8 [T, size, size, 3], threaded over frames.
    Replaces the per-frame cv2 Python loop (ref simple_dataset.py:213-249)."""
    lib = load()
    if lib is None:
        return None
    T, H, W, C = frames.shape
    assert C == 3 and frames.dtype == np.uint8
    if H == size and W == size:
        return frames
    frames = np.ascontiguousarray(frames)
    out = np.empty((T, size, size, 3), np.uint8)
    lib.avsr_resize_crop_frames(
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), T, H, W,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), size, num_threads)
    return out


def rgb_to_yuv420(frames: np.ndarray,
                  num_threads: int = 0) -> tuple[np.ndarray, np.ndarray] | None:
    """Native planar YUV420 packing for the host->device link:
    u8 [..., S, S, 3] RGB -> (Y u8 [..., S, S], UV u8 [..., S/2, S/2, 2]) —
    1.5 B/px instead of 3 (data.compact_transfer). Leading dims flatten into
    the threaded frame loop. ops.image.rgb_to_yuv420_np is the fallback."""
    lib = load()
    if lib is None:
        return None
    *lead, S, S2, C = frames.shape
    assert C == 3 and S == S2 and S % 2 == 0 and frames.dtype == np.uint8
    T = int(np.prod(lead)) if lead else 1
    frames = np.ascontiguousarray(frames)
    y = np.empty((*lead, S, S), np.uint8)
    uv = np.empty((*lead, S // 2, S // 2, 2), np.uint8)
    lib.avsr_rgb_to_yuv420(
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), T, S,
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        uv.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), num_threads)
    return y, uv

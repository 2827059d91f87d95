"""ctypes binding for the native MJPEG-AVI video writer (native/video_writer.cpp).

Headless TPU hosts ship no ffmpeg, so imageio cannot write the orbit mp4 the
reference produces (/root/reference/mlx_nerf/entrypoints/__test_nerf.py:326-341).
This binding provides a dependency-free real-video path: baseline JPEG frames
(encoded across hardware threads in C++) in a RIFF/AVI container with the
MJPG fourcc. Falls back transparently (returns None) if the toolchain or
library is unavailable — utils/video.py then degrades to GIF/PNG output.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "build" / "libvideo_writer.so"
_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    if not _LIB_PATH.exists() and (_NATIVE_DIR / "Makefile").exists():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    if not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.avi_write_mjpeg.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.avi_write_mjpeg.restype = ctypes.c_int
        lib.jpeg_encode_rgb.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_long,
        ]
        lib.jpeg_encode_rgb.restype = ctypes.c_long
        _lib = lib
    except OSError:
        return None
    return _lib


def write_avi(path, frames: np.ndarray, fps: int = 30, quality: int = 90) -> Optional[Path]:
    """Write u8 RGB frames [N, H, W, 3] as an MJPEG AVI. Returns the path on
    success, None if the native library is unavailable or writing failed."""
    lib = _load_lib()
    if lib is None:
        return None
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    if frames.ndim != 4 or frames.shape[-1] != 3:
        raise ValueError(f"expected [N, H, W, 3] u8 frames, got {frames.shape}")
    n, h, w, _ = frames.shape
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    rc = lib.avi_write_mjpeg(
        str(path).encode(),
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w, int(fps), int(quality),
    )
    return path if rc == 0 else None


def encode_jpeg(frame: np.ndarray, quality: int = 90) -> Optional[bytes]:
    """Encode one u8 RGB frame [H, W, 3] to baseline JPEG bytes (or None if
    the native library is unavailable)."""
    lib = _load_lib()
    if lib is None:
        return None
    frame = np.ascontiguousarray(frame, dtype=np.uint8)
    h, w, _ = frame.shape
    cap = h * w * 3 + 65536
    out = np.empty(cap, np.uint8)
    nbytes = lib.jpeg_encode_rgb(
        frame.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, int(quality),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        cap,
    )
    if nbytes <= 0:
        return None
    return out[:nbytes].tobytes()

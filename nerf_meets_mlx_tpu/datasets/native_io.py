"""ctypes binding for the native multi-threaded PNG loader (native/).

Replaces the reference's serial per-file imageio decode loop
(/root/reference/mlx_nerf/dataset/dataloader.py:44-50) on the hot path.
The shared library is built on demand (`make -C native`) and every call
falls back to imageio transparently if the build or a decode fails, so the
Python-only path always works.
"""

from __future__ import annotations

import ctypes
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from nerf_meets_mlx_tpu.utils.native_lib import load_native_lib


def _register(lib: ctypes.CDLL) -> None:
    lib.png_probe.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.png_probe.restype = ctypes.c_int
    lib.png_decode_batch.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
    ]
    lib.png_decode_batch.restype = ctypes.c_int


def _load_lib() -> Optional[ctypes.CDLL]:
    return load_native_lib("libpng_loader.so", _register)


def native_available() -> bool:
    return _load_lib() is not None


def load_png_batch(paths: Sequence[str | Path], n_threads: int = 0) -> np.ndarray:
    """Decode PNGs (identical dims) -> float32 [N, H, W, 4] in [0, 1].

    Uses the native threaded decoder when available, else imageio."""
    paths = [str(p) for p in paths]
    if not paths:
        return np.zeros((0, 0, 0, 4), np.float32)

    lib = _load_lib()
    if lib is not None:
        w = ctypes.c_int()
        h = ctypes.c_int()
        if lib.png_probe(paths[0].encode(), ctypes.byref(w), ctypes.byref(h)) == 0:
            out = np.empty((len(paths), h.value, w.value, 4), np.float32)
            blob = b"\0".join(p.encode() for p in paths) + b"\0"
            rc = lib.png_decode_batch(
                blob,
                len(paths),
                w.value,
                h.value,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                n_threads,
            )
            if rc == 0:
                return out
            # fall through to imageio on any decode error

    import imageio.v2 as imageio

    imgs = []
    for p in paths:
        img = np.asarray(imageio.imread(p)).astype(np.float32) / 255.0
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, axis=-1)
        if img.shape[-1] == 3:
            img = np.concatenate([img, np.ones_like(img[..., :1])], axis=-1)
        imgs.append(img)
    return np.stack(imgs)

"""Video / image output helpers (reference: __test_nerf.py:326-341 orbit mp4,
to8b at __test_nerf.py:197)."""

from __future__ import annotations

from pathlib import Path
from typing import Iterable

import numpy as np


def to8b(x) -> np.ndarray:
    return (np.clip(np.asarray(x), 0.0, 1.0) * 255.0).astype(np.uint8)


def write_video(path: str | Path, frames: Iterable[np.ndarray], fps: int = 30) -> Path:
    """Write an mp4 (falls back to per-frame PNGs if no ffmpeg backend)."""
    import imageio.v2 as imageio

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    try:
        writer = imageio.get_writer(path, fps=fps)
    except Exception:
        out_dir = path.with_suffix("")
        out_dir.mkdir(parents=True, exist_ok=True)
        for i, fr in enumerate(frames):
            imageio.imwrite(out_dir / f"frame_{i:04d}.png", fr)
        return out_dir
    with writer:
        for fr in frames:
            writer.append_data(fr)
    return path

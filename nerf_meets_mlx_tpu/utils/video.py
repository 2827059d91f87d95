"""Video / image output helpers (reference: __test_nerf.py:326-341 orbit mp4,
to8b at __test_nerf.py:197)."""

from __future__ import annotations

from pathlib import Path
from typing import Iterable

import numpy as np


def to8b(x) -> np.ndarray:
    return (np.clip(np.asarray(x), 0.0, 1.0) * 255.0).astype(np.uint8)


def write_video(path: str | Path, frames: Iterable[np.ndarray], fps: int = 30) -> Path:
    """Write a real video for the orbit render (reference writes an mp4 via
    the ffmpeg binary, __test_nerf.py:326-341). Fallback chain for headless
    TPU hosts with no ffmpeg:

      1. mp4 via imageio (only if an ffmpeg backend exists),
      2. MJPEG AVI via the native multi-threaded encoder (utils/native_video),
      3. animated GIF via PIL,
      4. per-frame PNGs.
    """
    import imageio.v2 as imageio

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    try:
        writer = imageio.get_writer(path, fps=fps)
    except Exception:
        from nerf_meets_mlx_tpu.utils import native_video

        # one contiguous u8 array, shared by all fallbacks (no list + stack
        # double-materialization — a 160-frame 800x800 orbit is ~300 MB);
        # u8 frames pass through, floats are [0,1] by framework convention
        arr = np.stack(
            [fr if np.asarray(fr).dtype == np.uint8 else to8b(fr) for fr in frames]
        )
        try:
            avi = native_video.write_avi(path.with_suffix(".avi"), arr, fps=fps)
        except Exception:
            avi = None
        if avi is not None:
            return avi
        try:
            from PIL import Image

            gif = path.with_suffix(".gif")
            imgs = [Image.fromarray(fr) for fr in arr]
            imgs[0].save(
                gif, save_all=True, append_images=imgs[1:],
                duration=max(1, int(1000 / fps)), loop=0,
            )
            return gif
        except Exception:
            out_dir = path.with_suffix("")
            out_dir.mkdir(parents=True, exist_ok=True)
            for i, fr in enumerate(arr):
                imageio.imwrite(out_dir / f"frame_{i:04d}.png", fr)
            return out_dir
    with writer:
        for fr in frames:
            writer.append_data(fr)
    return path

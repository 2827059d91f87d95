"""2-D image dataset for the image-learning workload.

Counterpart of the reference's ``load_mx_img_gt`` + pixel-batch iterator
(/root/reference/mlx_nerf/entrypoints/__viser_image_learning.py:86-162):
loads (or procedurally generates) an RGB image and exposes normalized pixel
coordinates + colors for MLP regression.
"""

from __future__ import annotations

from pathlib import Path
from typing import Tuple

import numpy as np


def make_test_image(size: int = 400, seed: int = 0) -> np.ndarray:
    """Procedural target image [H, W, 3] float32 in [0,1]: smooth low-freq
    gradients + rings + a few sharp edges, so it exercises both low and high
    frequency bands of the encoding."""
    H = W = size
    y, x = np.mgrid[0:H, 0:W].astype(np.float32)
    u, v = x / W, y / H
    rng = np.random.default_rng(seed)
    r = np.sqrt((u - 0.5) ** 2 + (v - 0.5) ** 2)
    img = np.stack(
        [
            0.5 + 0.5 * np.sin(6.0 * np.pi * u) * np.cos(4.0 * np.pi * v),
            0.5 + 0.5 * np.cos(10.0 * np.pi * r),
            np.clip(1.5 * v - 0.5 * np.sin(8.0 * np.pi * u), 0, 1),
        ],
        axis=-1,
    )
    # sharp checker patch in one corner
    checker = ((x // 16 + y // 16) % 2)[..., None]
    mask = ((u < 0.3) & (v < 0.3))[..., None]
    img = np.where(mask, checker * np.array([1.0, 0.2, 0.2]) + (1 - checker) * 0.1, img)
    img += rng.normal(0, 0.005, img.shape)  # slight noise
    return np.clip(img, 0.0, 1.0).astype(np.float32)


def load_image_2d(path: str | Path | None = None, size: int = 400) -> np.ndarray:
    """Load an RGB image as [H, W, 3] float32 in [0,1]; procedural fallback
    when no path is given."""
    if path is None:
        return make_test_image(size)
    import imageio.v2 as imageio

    img = np.asarray(imageio.imread(path)).astype(np.float32) / 255.0
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=-1)
    return img[..., :3]


def pixel_dataset(img: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Flatten an image into (coords [N,2] in [0,1], colors [N,3]).

    Coordinates are (x, y) normalized — matching the reference's pixel-grid
    input to the sinusoidal encoding."""
    H, W = img.shape[:2]
    y, x = np.mgrid[0:H, 0:W].astype(np.float32)
    coords = np.stack([x.ravel() / W, y.ravel() / H], axis=-1)
    colors = img.reshape(-1, 3).astype(np.float32)
    return coords, colors

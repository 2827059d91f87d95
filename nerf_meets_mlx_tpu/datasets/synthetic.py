"""Procedural Blender-format scene generator.

The reference trains on the downloaded ``nerf_synthetic/lego`` scene; this
environment has no network egress, so tests/benchmarks use an analytic
emission-absorption volume (colored Gaussian blobs) rendered to ground-truth
images by dense ray marching. The generator can return an in-memory
BlenderDataset or write a real ``transforms_*.json`` + PNG directory so the
file loader (datasets/blender.py) is exercised end-to-end.

The scene is a genuine 3-D radiance field (view-consistent, alpha-composited
onto white), so a NeRF trained on its renders must learn real geometry —
PSNR on held-out views is a meaningful end-to-end convergence signal.
"""

from __future__ import annotations

import functools
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from nerf_meets_mlx_tpu.cameras.pose import pose_spherical, orbit_poses
from nerf_meets_mlx_tpu.cameras.rays import get_rays
from nerf_meets_mlx_tpu.datasets.blender import BlenderDataset

# blob scene: centers [K,3], radii [K], colors [K,3], peak densities [K]
_BLOBS = dict(
    centers=np.array(
        [
            [0.0, 0.0, 0.0],
            [0.55, 0.0, 0.25],
            [-0.45, 0.35, -0.2],
            [0.0, -0.55, 0.3],
            [-0.2, -0.15, 0.55],
        ],
        np.float32,
    ),
    radii=np.array([0.38, 0.22, 0.25, 0.2, 0.16], np.float32),
    colors=np.array(
        [
            [0.9, 0.25, 0.2],
            [0.2, 0.7, 0.95],
            [0.95, 0.85, 0.2],
            [0.3, 0.85, 0.35],
            [0.7, 0.3, 0.85],
        ],
        np.float32,
    ),
    densities=np.array([28.0, 40.0, 35.0, 38.0, 45.0], np.float32),
)

CAMERA_ANGLE_X = 0.6911112070083618  # lego's fov


def scene_density_color(pts: jnp.ndarray):
    """Analytic sigma(x) [..., ] and color(x) [..., 3] for the blob scene."""
    c = jnp.asarray(_BLOBS["centers"])  # [K,3]
    r = jnp.asarray(_BLOBS["radii"])
    col = jnp.asarray(_BLOBS["colors"])
    den = jnp.asarray(_BLOBS["densities"])
    d2 = jnp.sum((pts[..., None, :] - c) ** 2, axis=-1)  # [..., K]
    g = den * jnp.exp(-0.5 * d2 / (r**2))  # [..., K]
    sigma = jnp.sum(g, axis=-1)
    color = jnp.sum(g[..., None] * col, axis=-2) / (sigma[..., None] + 1e-8)
    return sigma, jnp.clip(color, 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("H", "W", "n_samples"))
def _render_gt(H: int, W: int, K: jnp.ndarray, c2w: jnp.ndarray, n_samples: int = 256):
    """Dense ray-march of the analytic scene; returns [H, W, 4] RGBA."""
    rays_o, rays_d = get_rays(H, W, K, c2w)
    near, far = 2.0, 6.0
    t = jnp.linspace(near, far, n_samples)
    pts = rays_o[..., None, :] + t[:, None] * rays_d[..., None, :]  # [H,W,S,3]
    sigma, color = scene_density_color(pts)
    delta = (far - near) / (n_samples - 1) * jnp.linalg.norm(
        rays_d, axis=-1, keepdims=True
    )
    alpha = 1.0 - jnp.exp(-sigma * delta)
    trans = jnp.exp(
        jnp.concatenate(
            [
                jnp.zeros_like(alpha[..., :1]),
                jnp.cumsum(jnp.log(1.0 - alpha + 1e-10), axis=-1)[..., :-1],
            ],
            axis=-1,
        )
    )
    w = alpha * trans
    rgb = jnp.sum(w[..., None] * color, axis=-2)
    acc = jnp.sum(w, axis=-1, keepdims=True)
    return jnp.concatenate([rgb, acc], axis=-1)


def render_gt_image(H: int, W: int, K, c2w, n_samples: int = 256) -> np.ndarray:
    """Ground-truth RGBA render of the analytic scene (float32 in [0,1])."""
    out = _render_gt(H, W, jnp.asarray(K, jnp.float32), jnp.asarray(c2w, jnp.float32), n_samples)
    return np.asarray(out, dtype=np.float32)


def _split_poses(n: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    thetas = rng.uniform(-180.0, 180.0, n)
    phis = rng.uniform(-60.0, -10.0, n)
    return np.stack([pose_spherical(t, p, 4.0) for t, p in zip(thetas, phis)])


def make_synthetic_scene(
    n_train: int = 20,
    n_val: int = 4,
    n_test: int = 4,
    resolution: int = 64,
    seed: int = 0,
    white_bkgd: bool = True,
) -> BlenderDataset:
    """Build an in-memory BlenderDataset of the analytic scene."""
    H = W = resolution
    focal = 0.5 * W / np.tan(0.5 * CAMERA_ANGLE_X)
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]], np.float32)

    poses = np.concatenate(
        [_split_poses(n_train, seed), _split_poses(n_val, seed + 1), _split_poses(n_test, seed + 2)]
    )
    rgba = np.stack([render_gt_image(H, W, K, p[:3, :4]) for p in poses])
    if white_bkgd:
        images = rgba[..., :3] + (1.0 - rgba[..., 3:])
    else:
        images = rgba[..., :3]

    n = n_train + n_val + n_test
    return BlenderDataset(
        images=np.ascontiguousarray(images, np.float32),
        poses=poses,
        render_poses=orbit_poses(160),
        H=H,
        W=W,
        focal=float(focal),
        i_train=np.arange(n_train),
        i_val=np.arange(n_train, n_train + n_val),
        i_test=np.arange(n_train + n_val, n),
    )


def write_blender_dataset(
    out_dir: str | Path,
    n_train: int = 4,
    n_val: int = 2,
    n_test: int = 2,
    resolution: int = 32,
    seed: int = 0,
) -> Path:
    """Write the analytic scene as an on-disk Blender dataset
    (transforms_*.json + RGBA PNGs) for exercising the file loader."""
    import imageio.v2 as imageio

    out_dir = Path(out_dir)
    H = W = resolution
    focal = 0.5 * W / np.tan(0.5 * CAMERA_ANGLE_X)
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]], np.float32)

    counts = {"train": n_train, "val": n_val, "test": n_test}
    for si, (split, n) in enumerate(counts.items()):
        (out_dir / split).mkdir(parents=True, exist_ok=True)
        poses = _split_poses(n, seed + si)
        frames = []
        for i, pose in enumerate(poses):
            rgba = render_gt_image(H, W, K, pose[:3, :4])
            png = (np.clip(rgba, 0, 1) * 255).astype(np.uint8)
            rel = f"./{split}/r_{i}"
            imageio.imwrite(out_dir / f"{rel}.png", png)
            frames.append(
                {"file_path": rel, "transform_matrix": pose.tolist()}
            )
        meta = {"camera_angle_x": CAMERA_ANGLE_X, "frames": frames}
        (out_dir / f"transforms_{split}.json").write_text(json.dumps(meta))
    return out_dir

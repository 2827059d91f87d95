"""Full-frame renderer: shapes, chunk invariance, e2e overfit sanity."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from nerf_meets_mlx_tpu.config import lego_coarse
from nerf_meets_mlx_tpu.datasets import make_synthetic_scene
from nerf_meets_mlx_tpu.models import create_nerf
from nerf_meets_mlx_tpu.rendering import render_image, render_orbit


def _tiny_model():
    cfg = lego_coarse()
    cfg = cfg.replace(
        mlp=dataclasses.replace(cfg.mlp, net_depth=2, net_width=32, skips=()),
        render=dataclasses.replace(cfg.render, n_samples=8),
    )
    model = create_nerf(cfg)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_render_image_shapes():
    model, params = _tiny_model()
    ds = make_synthetic_scene(n_train=1, n_val=1, n_test=1, resolution=16)
    out = render_image(model, params, 16, 16, ds.K, ds.poses[0, :3, :4], chunk=64)
    assert out["rgb_map"].shape == (16, 16, 3)
    assert out["disp_map"].shape == (16, 16)
    assert out["acc_map"].shape == (16, 16)
    assert np.isfinite(np.asarray(out["rgb_map"])).all()


def test_render_image_chunk_invariance():
    """Chunk size is a tiling choice — results must not depend on it
    (reference batchify_rays property, render.py:243-266)."""
    model, params = _tiny_model()
    ds = make_synthetic_scene(n_train=1, n_val=1, n_test=1, resolution=16)
    c2w = ds.poses[0, :3, :4]
    a = render_image(model, params, 16, 16, ds.K, c2w, chunk=256)
    b = render_image(model, params, 16, 16, ds.K, c2w, chunk=64)
    c = render_image(model, params, 16, 16, ds.K, c2w, chunk=100)  # non-divisor
    np.testing.assert_allclose(
        np.asarray(a["rgb_map"]), np.asarray(b["rgb_map"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(a["rgb_map"]), np.asarray(c["rgb_map"]), atol=1e-5
    )


def test_render_orbit_yields_frames():
    model, params = _tiny_model()
    ds = make_synthetic_scene(n_train=1, n_val=1, n_test=1, resolution=8)
    frames = list(render_orbit(model, params, 8, 8, ds.K, ds.render_poses[:3]))
    assert len(frames) == 3
    assert frames[0].shape == (8, 8, 3) and frames[0].dtype == np.uint8

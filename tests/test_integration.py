"""Cross-module integration: text-config -> training, NDC rendering path."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from nerf_meets_mlx_tpu.config import config_from_text, lego_hierarchical
from nerf_meets_mlx_tpu.datasets import make_synthetic_scene
from nerf_meets_mlx_tpu.engine.train_state import create_train_state
from nerf_meets_mlx_tpu.engine.trainer import make_nerf_train_step
from nerf_meets_mlx_tpu.models import create_nerf
from nerf_meets_mlx_tpu.rendering import render_image


def test_text_config_drives_training(tmp_path):
    """A reference-format lego.txt overlay flows through to a runnable step."""
    p = tmp_path / "lego.txt"
    p.write_text(
        "expname = parity_check\n"
        "N_samples = 8\n"
        "N_importance = 8\n"
        "N_rand = 64\n"
        "lrate_decay = 250\n"
        "precrop_iters = 0\n"
        "precrop_frac = 0.5\n"
        "white_bkgd = True\n"
    )
    cfg = config_from_text(p)
    cfg = cfg.replace(
        mlp=dataclasses.replace(cfg.mlp, net_depth=2, net_width=32, skips=()),
        mlp_fine=dataclasses.replace(cfg.mlp, net_depth=2, net_width=32, skips=()),
    )
    assert cfg.render.n_samples == 8 and cfg.train.n_rand == 64
    assert cfg.train.exp_name == "parity_check"

    model = create_nerf(cfg)
    ds = make_synthetic_scene(2, 1, 1, 16)
    step = make_nerf_train_step(model, ds.H, ds.W, ds.focal)
    state = create_train_state(model.init(jax.random.PRNGKey(0)), cfg.train)
    state, aux = step(
        state,
        jnp.asarray(ds.images[ds.i_train]),
        jnp.asarray(ds.poses[ds.i_train, :3, :4]),
        jax.random.PRNGKey(1),
    )
    assert np.isfinite(float(aux["loss"]))


def test_ndc_render_path():
    """render_image with ndc=True runs the NDC reprojection end-to-end
    (the LLFF forward-facing ray path, cameras/rays.py:ndc_rays)."""
    cfg = lego_hierarchical()
    cfg = cfg.replace(
        mlp=dataclasses.replace(cfg.mlp, net_depth=2, net_width=32, skips=()),
        mlp_fine=None,
        render=dataclasses.replace(
            cfg.render, n_samples=8, n_importance=0, ndc=True, near=0.0, far=1.0
        ),
    )
    model = create_nerf(cfg)
    params = model.init(jax.random.PRNGKey(0))
    H = W = 16
    focal = 12.0
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]], np.float32)
    # forward-facing camera at z=1 looking down -z (LLFF-style)
    c2w = np.eye(4, dtype=np.float32)[:3]
    c2w[2, 3] = 1.0
    out = render_image(model, params, H, W, K, c2w, chunk=64)
    assert out["rgb_map"].shape == (16, 16, 3)
    assert np.isfinite(np.asarray(out["rgb_map"])).all()

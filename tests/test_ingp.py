"""Instant-NGP variant end-to-end: hash encoding + SH dirs + small MLP
trains on the synthetic scene (BASELINE config 5)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from nerf_meets_mlx_tpu.config import lego_ingp
from nerf_meets_mlx_tpu.datasets import make_synthetic_scene
from nerf_meets_mlx_tpu.engine.train_state import create_train_state
from nerf_meets_mlx_tpu.engine.trainer import make_nerf_train_step
from nerf_meets_mlx_tpu.models import create_nerf


def _tiny_ingp():
    cfg = lego_ingp()
    pos = dataclasses.replace(
        cfg.pos_encoding, hash_n_levels=4, hash_min_res=4, hash_max_res=32,
        hash_log2_table_size=10,
    )
    return cfg.replace(
        pos_encoding=pos,
        render=dataclasses.replace(cfg.render, n_samples=16, n_importance=16),
        train=dataclasses.replace(cfg.train, n_rand=256, lrate=5e-3),
    )


def test_ingp_model_builds_and_runs():
    cfg = _tiny_ingp()
    model = create_nerf(cfg)
    params = model.init(jax.random.PRNGKey(0))
    assert "tables" in params["pos_enc"]
    assert params["pos_enc"]["tables"].shape == (4, 1024, 2)
    B = 8
    rays_o = jnp.zeros((B, 3)).at[:, 2].set(4.0)
    rays_d = -jnp.ones((B, 3)) * jnp.asarray([0.0, 0.0, 1.0])
    out = model.render_rays(params, rays_o, rays_d, jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(out["rgb_map"])).all()


def test_ingp_trains_and_tables_update():
    cfg = _tiny_ingp()
    model = create_nerf(cfg)
    ds = make_synthetic_scene(n_train=4, n_val=1, n_test=1, resolution=32)
    images = jnp.asarray(ds.images[ds.i_train])
    poses = jnp.asarray(ds.poses[ds.i_train, :3, :4])
    step = make_nerf_train_step(model, ds.H, ds.W, ds.focal)
    state = create_train_state(model.init(jax.random.PRNGKey(0)), cfg.train)
    t0 = np.asarray(state.params["pos_enc"]["tables"]).copy()
    key = jax.random.PRNGKey(1)
    first = None
    for i in range(100):
        state, aux = step(state, images, poses, key)
        if i == 0:
            first = float(aux["loss"])
    last = float(aux["loss"])
    assert np.isfinite(last) and last < first
    t1 = np.asarray(state.params["pos_enc"]["tables"])
    assert np.abs(t1 - t0).max() > 1e-5, "hash tables did not receive gradients"

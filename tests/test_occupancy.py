"""Learned occupancy grid (acceleration/occupancy.py): update rule, interval
tightening, warmup gating, and end-to-end training integration."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_meets_mlx_tpu.acceleration.occupancy import (
    init_occupancy_grid,
    occupancy_binary,
    tighten_near_far,
    update_occupancy_grid,
)

AABB = (-1.0, -1.0, -1.0, 1.0, 1.0, 1.0)


def _ray(origin, direction):
    o = jnp.asarray([origin], jnp.float32)
    d = jnp.asarray([direction], jnp.float32)
    return o, d


def _grid_with_box(res, lo, hi, value=1.0):
    """Float grid occupied inside the world-space box [lo, hi] (AABB above)."""
    g = np.zeros((res, res, res), np.float32)
    idx = np.arange(res)
    centers = -1.0 + (idx + 0.5) * (2.0 / res)
    mx = (centers >= lo[0]) & (centers <= hi[0])
    my = (centers >= lo[1]) & (centers <= hi[1])
    mz = (centers >= lo[2]) & (centers <= hi[2])
    g[np.ix_(mx, my, mz)] = value
    return jnp.asarray(g)


def test_tighten_brackets_occupied_region():
    res = 32
    grid = _grid_with_box(res, (-0.2, -0.2, -0.2), (0.2, 0.2, 0.2))
    o, d = _ray((0.0, 0.0, -3.0), (0.0, 0.0, 1.0))
    near = jnp.full((1, 1), 0.5)
    far = jnp.full((1, 1), 6.0)
    n2, f2 = tighten_near_far(grid, o, d, near, far, AABB, 0.5, 64)
    # occupied span along the ray is z in [-0.2, 0.2] -> t in [2.8, 3.2];
    # dilation adds one cell (2/32) and the margin one probe spacing each side
    assert float(n2[0, 0]) > 2.4
    assert float(f2[0, 0]) < 3.6
    assert float(n2[0, 0]) < 2.81
    assert float(f2[0, 0]) > 3.19


def test_tighten_empty_grid_keeps_interval():
    grid = init_occupancy_grid(16)
    o, d = _ray((0.0, 0.0, -3.0), (0.0, 0.0, 1.0))
    near = jnp.full((1, 1), 0.5)
    far = jnp.full((1, 1), 6.0)
    n2, f2 = tighten_near_far(grid, o, d, near, far, AABB, 0.01, 32)
    np.testing.assert_allclose(np.asarray(n2), 0.5)
    np.testing.assert_allclose(np.asarray(f2), 6.0)


def test_tighten_inactive_keeps_interval():
    grid = _grid_with_box(16, (-0.5, -0.5, -0.5), (0.5, 0.5, 0.5))
    o, d = _ray((0.0, 0.0, -3.0), (0.0, 0.0, 1.0))
    near = jnp.full((1, 1), 0.5)
    far = jnp.full((1, 1), 6.0)
    n2, f2 = tighten_near_far(grid, o, d, near, far, AABB, 0.5, 32, active=False)
    np.testing.assert_allclose(np.asarray(n2), 0.5)
    np.testing.assert_allclose(np.asarray(f2), 6.0)
    # traced-gate variant (as used in the train step)
    n3, f3 = tighten_near_far(
        grid, o, d, near, far, AABB, 0.5, 32, active=jnp.asarray(False)
    )
    np.testing.assert_allclose(np.asarray(n3), 0.5)


def test_tighten_miss_ray_keeps_interval():
    """A ray that never crosses the occupied box falls back to [near, far]."""
    grid = _grid_with_box(32, (-0.2, -0.2, -0.2), (0.2, 0.2, 0.2))
    o, d = _ray((0.9, 0.9, -3.0), (0.0, 0.0, 1.0))
    near = jnp.full((1, 1), 0.5)
    far = jnp.full((1, 1), 6.0)
    n2, f2 = tighten_near_far(grid, o, d, near, far, AABB, 0.5, 64)
    np.testing.assert_allclose(np.asarray(n2), 0.5)
    np.testing.assert_allclose(np.asarray(f2), 6.0)


def test_dilation_is_conservative():
    res = 16
    g = np.zeros((res, res, res), np.float32)
    g[8, 8, 8] = 1.0
    occ = np.asarray(occupancy_binary(jnp.asarray(g), 0.5))
    # the cell itself plus its 6-neighborhood (separable 3^3 dilation)
    assert occ[8, 8, 8] and occ[7, 8, 8] and occ[9, 8, 8]
    assert occ[8, 7, 8] and occ[8, 9, 8] and occ[8, 8, 7] and occ[8, 8, 9]
    assert not occ[5, 8, 8]
    assert occ.sum() >= 7


def _occ_model(n_samples=8, n_importance=8, res=16):
    from nerf_meets_mlx_tpu.config import lego_occ
    from nerf_meets_mlx_tpu.models.factory import create_nerf

    cfg = lego_occ()
    cfg = cfg.replace(
        render=dataclasses.replace(
            cfg.render,
            n_samples=n_samples,
            n_importance=n_importance,
            occ_resolution=res,
            occ_update_every=2,
            occ_warmup=4,
        ),
        mlp=dataclasses.replace(cfg.mlp, net_depth=2, net_width=32),
        mlp_fine=dataclasses.replace(cfg.mlp_fine, net_depth=2, net_width=32),
        train=dataclasses.replace(cfg.train, n_rand=64, precrop_iters=0),
        data=dataclasses.replace(
            cfg.data, dataset_type="synthetic", synth_resolution=16,
            synth_n_train=2, synth_n_val=1, synth_n_test=1,
        ),
    )
    return create_nerf(cfg), cfg


def test_update_occupancy_grid_ema():
    model, cfg = _occ_model()
    params = model.init(jax.random.PRNGKey(0))
    grid = init_occupancy_grid(cfg.render.occ_resolution)
    g1 = update_occupancy_grid(model, params, grid, jax.random.PRNGKey(1), decay=0.9)
    assert g1.shape == grid.shape
    # softplus density is strictly positive -> every cell gets a value
    assert float(g1.min()) > 0.0
    # EMA-max: a cell can only decay by `decay` between updates
    g2 = update_occupancy_grid(model, params, g1, jax.random.PRNGKey(2), decay=0.9)
    assert bool(jnp.all(g2 >= g1 * 0.9 - 1e-6))


def test_train_step_updates_grid_and_runs():
    """Full fused train step with occupancy on: grid EMA populates, losses
    stay finite, and the state round-trips through the step."""
    from nerf_meets_mlx_tpu.engine.trainer import Trainer, make_nerf_train_step
    from nerf_meets_mlx_tpu.entrypoints.train_nerf import _load_dataset

    model, cfg = _occ_model()
    ds = _load_dataset(cfg)
    images = jnp.asarray(ds.images[ds.i_train])
    poses = jnp.asarray(ds.poses[ds.i_train, :3, :4])
    step_fn = make_nerf_train_step(model, ds.H, ds.W, ds.focal)
    trainer = Trainer(cfg, model, step_fn, (images, poses), log_dir="/tmp/occ_test")
    assert trainer.state.occ_grid is not None
    metrics = trainer.run(6, log_every=0)
    assert np.isfinite(metrics["loss"])
    grid = np.asarray(trainer.state.occ_grid)
    assert grid.max() > 0.0, "grid should have been EMA-updated by step 6"


def test_eval_render_with_grid_matches_probe_free_on_empty():
    """With an empty grid the occupancy path must be a no-op on renders."""
    from nerf_meets_mlx_tpu.rendering.renderer import render_image
    from nerf_meets_mlx_tpu.entrypoints.train_nerf import _load_dataset

    model, cfg = _occ_model()
    ds = _load_dataset(cfg)
    params = model.init(jax.random.PRNGKey(0))
    grid = init_occupancy_grid(cfg.render.occ_resolution)
    a = render_image(model, params, 8, 8, ds.K / (ds.H // 8), ds.poses[0, :3, :4], chunk=32)
    b = render_image(
        model, params, 8, 8, ds.K / (ds.H // 8), ds.poses[0, :3, :4], chunk=32,
        occ_grid=grid,
    )
    np.testing.assert_allclose(
        np.asarray(a["rgb_map"]), np.asarray(b["rgb_map"]), atol=1e-6
    )


def test_sharded_step_with_occupancy():
    """Occupancy grid through the GSPMD-sharded train step on the 8-way mesh."""
    from nerf_meets_mlx_tpu.engine.train_state import create_train_state
    from nerf_meets_mlx_tpu.entrypoints.train_nerf import _load_dataset
    from nerf_meets_mlx_tpu.parallel.mesh import make_mesh
    from nerf_meets_mlx_tpu.parallel.sharded_train import (
        make_sharded_nerf_train_step,
        replicate_state,
    )

    model, cfg = _occ_model()
    ds = _load_dataset(cfg)
    mesh = make_mesh()
    params = model.init(jax.random.PRNGKey(0))
    state = create_train_state(
        params, cfg.train, occ_grid=init_occupancy_grid(cfg.render.occ_resolution)
    )
    state = replicate_state(state, mesh)
    step_fn = make_sharded_nerf_train_step(model, ds.H, ds.W, ds.focal, mesh)
    images = jnp.asarray(ds.images[ds.i_train])
    poses = jnp.asarray(ds.poses[ds.i_train, :3, :4])
    with mesh:
        for _ in range(3):
            state, metrics = step_fn(state, images, poses, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    assert float(jnp.max(state.occ_grid)) > 0.0


def test_checkpoint_roundtrip_with_grid(tmp_path):
    from nerf_meets_mlx_tpu.engine.checkpoint import restore_checkpoint, save_checkpoint
    from nerf_meets_mlx_tpu.engine.train_state import create_train_state

    model, cfg = _occ_model()
    params = model.init(jax.random.PRNGKey(0))
    grid = update_occupancy_grid(
        model, params, init_occupancy_grid(cfg.render.occ_resolution),
        jax.random.PRNGKey(1),
    )
    state = create_train_state(params, cfg.train, occ_grid=grid)
    save_checkpoint(tmp_path / "ckpt", state, 0)
    template = create_train_state(
        params, cfg.train, occ_grid=init_occupancy_grid(cfg.render.occ_resolution)
    )
    restored = restore_checkpoint(tmp_path / "ckpt", template, 0)
    np.testing.assert_allclose(np.asarray(restored.occ_grid), np.asarray(grid))


def test_update_occupancy_grid_sharded_matches_replicated():
    """The mesh-sharded cell forward must produce the SAME grid as the
    replicated one (cell points are drawn once at the global shape, so the
    only difference is where the density forward runs)."""
    from nerf_meets_mlx_tpu.parallel.mesh import make_mesh

    model, cfg = _occ_model()
    params = model.init(jax.random.PRNGKey(0))
    grid = init_occupancy_grid(cfg.render.occ_resolution)
    key = jax.random.PRNGKey(7)
    g_rep = update_occupancy_grid(model, params, grid, key, decay=0.9)
    g_shard = update_occupancy_grid(
        model, params, grid, key, decay=0.9, mesh=make_mesh()
    )
    np.testing.assert_allclose(
        np.asarray(g_shard), np.asarray(g_rep), rtol=1e-6, atol=1e-7
    )


def test_update_occupancy_grid_indivisible_falls_back():
    """R^3 not divisible by the mesh -> replicated fallback, same result."""
    from nerf_meets_mlx_tpu.parallel.mesh import make_mesh

    model, cfg = _occ_model(res=3)  # 27 cells, 8 devices
    params = model.init(jax.random.PRNGKey(0))
    grid = init_occupancy_grid(3)
    key = jax.random.PRNGKey(7)
    g_rep = update_occupancy_grid(model, params, grid, key, decay=0.9)
    g_shard = update_occupancy_grid(
        model, params, grid, key, decay=0.9, mesh=make_mesh()
    )
    np.testing.assert_allclose(np.asarray(g_shard), np.asarray(g_rep))

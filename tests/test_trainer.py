"""Training engine: fused step, convergence on tiny problems, lr schedule,
checkpoint round-trip."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from nerf_meets_mlx_tpu.config import (
    image2d,
    lego_hierarchical,
    TrainConfig,
)
from nerf_meets_mlx_tpu.datasets import make_synthetic_scene, make_test_image
from nerf_meets_mlx_tpu.datasets.image import pixel_dataset
from nerf_meets_mlx_tpu.engine import (
    Trainer,
    make_image_train_step,
    make_nerf_train_step,
    lr_schedule,
)
from nerf_meets_mlx_tpu.engine.train_state import create_train_state
from nerf_meets_mlx_tpu.engine.checkpoint import (
    save_checkpoint,
    restore_checkpoint,
    latest_step,
)
from nerf_meets_mlx_tpu.models import create_nerf


def _tiny_nerf_cfg():
    cfg = lego_hierarchical()
    cfg = cfg.replace(
        mlp=dataclasses.replace(cfg.mlp, net_depth=3, net_width=64, skips=()),
        mlp_fine=dataclasses.replace(cfg.mlp, net_depth=3, net_width=64, skips=()),
        render=dataclasses.replace(cfg.render, n_samples=16, n_importance=16),
        train=dataclasses.replace(cfg.train, n_rand=256, lrate=5e-3, i_weights=0, i_print=0),
    )
    return cfg


def test_lr_schedule_matches_reference_formula():
    cfg = TrainConfig(lrate=5e-4, lrate_decay=250)
    sched = lr_schedule(cfg)
    for step in [0, 1000, 50_000, 250_000]:
        expected = 5e-4 * 0.1 ** (step / 250_000)
        np.testing.assert_allclose(float(sched(step)), expected, rtol=1e-5)


def test_lr_schedule_disabled():
    assert lr_schedule(TrainConfig(lrate=1e-3, lrate_decay=0)) == 1e-3


def test_image_step_converges():
    cfg = image2d()
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, n_rand=512, i_weights=0))
    model = create_nerf(cfg)
    step = make_image_train_step(model)
    img = make_test_image(32)
    coords, colors = pixel_dataset(img)
    coords, colors = jnp.asarray(coords), jnp.asarray(colors)
    state = create_train_state(model.init(jax.random.PRNGKey(0)), cfg.train)
    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(200):
        state, aux = step(state, coords, colors, key)
        losses.append(float(aux["loss"]))
    assert losses[-1] < losses[0] * 0.25, f"no convergence: {losses[0]} -> {losses[-1]}"
    assert losses[-1] < 0.02


def test_nerf_step_runs_and_improves():
    cfg = _tiny_nerf_cfg()
    model = create_nerf(cfg)
    ds = make_synthetic_scene(n_train=4, n_val=1, n_test=1, resolution=32)
    images = jnp.asarray(ds.images[ds.i_train])
    poses = jnp.asarray(ds.poses[ds.i_train, :3, :4])
    step = make_nerf_train_step(model, ds.H, ds.W, ds.focal)
    state = create_train_state(model.init(jax.random.PRNGKey(0)), cfg.train)
    key = jax.random.PRNGKey(1)
    first = None
    for i in range(150):
        state, aux = step(state, images, poses, key)
        if i == 0:
            first = float(aux["loss"])
    last = float(aux["loss"])
    assert np.isfinite(last)
    assert last < first, f"loss did not improve: {first} -> {last}"
    assert int(state.step) == 150
    assert "loss_fine" in aux and "psnr" in aux


def test_checkpoint_roundtrip(tmp_path):
    cfg = _tiny_nerf_cfg()
    model = create_nerf(cfg)
    state = create_train_state(model.init(jax.random.PRNGKey(0)), cfg.train)
    state = state.replace(step=jnp.asarray(42, jnp.int32))
    save_checkpoint(tmp_path / "ckpt", state, 42)
    assert latest_step(tmp_path / "ckpt") == 42
    template = create_train_state(model.init(jax.random.PRNGKey(7)), cfg.train)
    restored = restore_checkpoint(tmp_path / "ckpt", template, 42)
    assert int(restored.step) == 42
    w0 = np.asarray(state.params["coarse"]["pos_linears"][0]["w"])
    w1 = np.asarray(restored.params["coarse"]["pos_linears"][0]["w"])
    np.testing.assert_array_equal(w0, w1)


def test_trainer_orchestration(tmp_path):
    cfg = image2d()
    cfg = cfg.replace(
        train=dataclasses.replace(
            cfg.train, n_rand=256, i_print=10, i_weights=20, log_dir=str(tmp_path)
        )
    )
    model = create_nerf(cfg)
    img = make_test_image(16)
    coords, colors = pixel_dataset(img)
    trainer = Trainer(
        cfg,
        model,
        make_image_train_step(model),
        (jnp.asarray(coords), jnp.asarray(colors)),
        log_dir=tmp_path / "run",
    )
    metrics = trainer.run(25)
    assert trainer.step == 25
    assert "loss" in metrics
    assert (tmp_path / "run" / "metrics.jsonl").exists()
    # checkpoint was written at step 20
    assert latest_step(tmp_path / "run" / "ckpt") == 20
    # resume path restores the saved step
    trainer2 = Trainer(
        cfg,
        model,
        make_image_train_step(model),
        (jnp.asarray(coords), jnp.asarray(colors)),
        log_dir=tmp_path / "run",
    )
    assert trainer2.restore() == 20


def test_multi_step_scan_matches_sequential():
    """n_inner=K in one dispatch == K sequential single steps (same keys)."""
    cfg = _tiny_nerf_cfg()
    from nerf_meets_mlx_tpu.datasets import make_synthetic_scene

    model = create_nerf(cfg)
    ds = make_synthetic_scene(n_train=2, n_val=1, n_test=1, resolution=16)
    images = jnp.asarray(ds.images[ds.i_train])
    poses = jnp.asarray(ds.poses[ds.i_train, :3, :4])
    key = jax.random.PRNGKey(1)

    step1 = make_nerf_train_step(model, ds.H, ds.W, ds.focal, n_inner=1)
    s = create_train_state(model.init(jax.random.PRNGKey(0)), cfg.train)
    for _ in range(4):
        s, aux_seq = step1(s, images, poses, key)

    step4 = make_nerf_train_step(model, ds.H, ds.W, ds.focal, n_inner=4)
    s4 = create_train_state(model.init(jax.random.PRNGKey(0)), cfg.train)
    s4, aux_scan = step4(s4, images, poses, key)

    assert int(s4.step) == 4 == int(s.step)
    np.testing.assert_allclose(
        float(aux_seq["loss"]), float(aux_scan["loss"]), rtol=1e-5
    )
    w_a = np.asarray(s.params["coarse"]["pos_linears"][0]["w"])
    w_b = np.asarray(s4.params["coarse"]["pos_linears"][0]["w"])
    np.testing.assert_allclose(w_a, w_b, rtol=1e-5, atol=1e-7)


def test_wall_clock_checkpointing(tmp_path):
    """save_secs cadence writes checkpoints even when i_weights never fires."""
    cfg = image2d()
    cfg = cfg.replace(
        train=dataclasses.replace(cfg.train, n_rand=64, i_print=0, i_weights=10_000)
    )
    model = create_nerf(cfg)
    img = make_test_image(8)
    coords, colors = pixel_dataset(img)
    trainer = Trainer(
        cfg,
        model,
        make_image_train_step(model),
        (jnp.asarray(coords), jnp.asarray(colors)),
        log_dir=tmp_path / "run",
        save_secs=0.01,  # force an immediate wall-clock save
    )
    trainer.run(3)
    assert latest_step(tmp_path / "run" / "ckpt") is not None


def test_no_replacement_pixel_sampling():
    """pixel_sampling="no_replacement" must draw unique pixels inside the
    precrop window (reference: np.random.choice(..., replace=False),
    __test_nerf.py:213-236)."""
    import dataclasses

    import numpy as np

    from nerf_meets_mlx_tpu.config import lego_hierarchical
    from nerf_meets_mlx_tpu.engine.trainer import sample_train_rays

    cfg = lego_hierarchical()
    cfg = cfg.replace(
        train=dataclasses.replace(
            cfg.train, n_rand=256, pixel_sampling="no_replacement",
            precrop_iters=10, precrop_frac=0.5,
        )
    )
    H = W = 32
    focal = 30.0
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]], np.float32)
    images = jnp.asarray(np.random.default_rng(0).uniform(size=(2, H, W, 3)), jnp.float32)
    poses = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None, :3, :4], (2, 1, 1))

    # inside the precrop window: all pixels unique AND within the crop
    ro, rd, tgt, _ = sample_train_rays(
        cfg, jnp.int32(0), images, poses, K, H, W, 256, jax.random.PRNGKey(1)
    )
    # recover pixel ids from the targets by matching rays: rerun to get px/py
    # directly through a tiny shim — ray dirs are injective in (px, py)
    dirs = np.asarray(rd)
    uniq = np.unique(dirs.round(6), axis=0)
    assert uniq.shape[0] == 256  # no duplicates (with replacement: ~15% dup at 256/256)

    # after the window: crop n_rand == full-frame pixel count works too
    cfg2 = cfg.replace(train=dataclasses.replace(cfg.train, precrop_iters=0, n_rand=H * W))
    ro, rd, tgt, _ = sample_train_rays(
        cfg2, jnp.int32(50), images, poses, K, H, W, H * W, jax.random.PRNGKey(2)
    )
    dirs = np.asarray(rd)
    assert np.unique(dirs.round(6), axis=0).shape[0] == H * W  # exact cover


def test_no_replacement_respects_precrop_window():
    import dataclasses

    import numpy as np

    from nerf_meets_mlx_tpu.config import lego_hierarchical
    from nerf_meets_mlx_tpu.engine.trainer import sample_train_rays

    H = W = 16
    cfg = lego_hierarchical()
    cfg = cfg.replace(
        train=dataclasses.replace(
            cfg.train, n_rand=16, pixel_sampling="no_replacement",
            precrop_iters=100, precrop_frac=0.5,
        )
    )
    focal = 20.0
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]], np.float32)
    # image encodes its own pixel coords so targets reveal sampled pixels
    coords = np.zeros((1, H, W, 3), np.float32)
    coords[0, ..., 0] = np.arange(H)[:, None] / H  # y
    coords[0, ..., 1] = np.arange(W)[None, :] / W  # x
    images = jnp.asarray(coords)
    poses = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None, :3, :4], (1, 1, 1))
    _, _, tgt, _ = sample_train_rays(
        cfg, jnp.int32(0), images, poses, K, H, W, 16, jax.random.PRNGKey(0)
    )
    ys = np.asarray(tgt[:, 0]) * H
    xs = np.asarray(tgt[:, 1]) * W
    assert ys.min() >= H * 0.25 - 1e-3 and ys.max() < H * 0.75
    assert xs.min() >= W * 0.25 - 1e-3 and xs.max() < W * 0.75


def test_encoding_weight_decay_targets_tables_only():
    """encoding_weight_decay shrinks pos_enc params and leaves the MLP
    untouched (zero-gradient update isolates the decay term)."""
    import dataclasses

    import numpy as np

    from nerf_meets_mlx_tpu.config import lego_ingp
    from nerf_meets_mlx_tpu.engine.train_state import make_optimizer
    from nerf_meets_mlx_tpu.models import create_nerf
    import optax

    cfg = lego_ingp()
    assert cfg.train.encoding_weight_decay > 0
    cfg = cfg.replace(
        pos_encoding=dataclasses.replace(
            cfg.pos_encoding, hash_n_levels=2, hash_log2_table_size=8
        )
    )
    model = create_nerf(cfg)
    params = model.init(jax.random.PRNGKey(0))
    tx = make_optimizer(cfg.train)
    opt_state = tx.init(params)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    updates, _ = tx.update(zeros, opt_state, params)
    new = optax.apply_updates(params, updates)

    t0 = np.asarray(params["pos_enc"]["tables"])
    t1 = np.asarray(new["pos_enc"]["tables"])
    np.testing.assert_allclose(t1, t0 * (1 - cfg.train.encoding_weight_decay), rtol=1e-5)
    w0 = np.asarray(params["coarse"]["pos_linears"][0]["w"])
    w1 = np.asarray(new["coarse"]["pos_linears"][0]["w"])
    np.testing.assert_array_equal(w0, w1)


def test_nerf_step_n_inner_matches_sequential():
    """n_inner=K (one dispatch = K scanned optimizer steps) must follow the
    exact same training trajectory as K sequential single-step dispatches:
    the scan body folds the PRNG key with state.step, so the streams are
    identical by construction."""
    cfg = _tiny_nerf_cfg()
    model = create_nerf(cfg)
    ds = make_synthetic_scene(n_train=2, n_val=1, n_test=1, resolution=16)
    images = jnp.asarray(ds.images[ds.i_train])
    poses = jnp.asarray(ds.poses[ds.i_train, :3, :4])
    key = jax.random.PRNGKey(3)

    step1 = make_nerf_train_step(model, ds.H, ds.W, ds.focal)
    sA = create_train_state(model.init(jax.random.PRNGKey(0)), cfg.train)
    for _ in range(4):
        sA, auxA = step1(sA, images, poses, key)

    stepK = make_nerf_train_step(model, ds.H, ds.W, ds.focal, n_inner=4)
    sB = create_train_state(model.init(jax.random.PRNGKey(0)), cfg.train)
    sB, auxB = stepK(sB, images, poses, key)

    assert int(sB.step) == int(sA.step) == 4
    np.testing.assert_allclose(float(auxB["loss"]), float(auxA["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(sA.params), jax.tree_util.tree_leaves(sB.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6)

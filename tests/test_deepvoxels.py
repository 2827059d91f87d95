"""DeepVoxels loader + preset.

The reference exposes ``--dataset_type deepvoxels`` and ``--shape``
(config_parser.py:53-57) with no loader behind them; these tests cover the
real capability: the train/validation/test layout, intrinsics parsing,
OpenCV→NeRF pose conversion, testskip, hemisphere-derived bounds, and the
train-step wiring.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_meets_mlx_tpu.config import PRESETS
from nerf_meets_mlx_tpu.datasets.deepvoxels import (
    _cv_to_nerf,
    load_deepvoxels_data,
)

FOCAL, H, W = 48.0, 24, 32


def _cv_look_at(pos, target=np.zeros(3)):
    """OpenCV-convention c2w (x right, y down, z FORWARD) at pos → target."""
    fwd = target - pos
    fwd = fwd / np.linalg.norm(fwd)
    world_up = np.array([0.0, 0.0, 1.0])
    x = np.cross(fwd, world_up)
    x = x / np.linalg.norm(x)
    y = np.cross(fwd, x)  # points "down" for an upright camera
    c2w = np.eye(4)
    c2w[:3, :3] = np.stack([x, y, fwd], axis=1)
    c2w[:3, 3] = pos
    return c2w


def _write_fake_deepvoxels(root, shape="greek", n_train=6, n_val=4, n_test=4, radius=3.0):
    import imageio.v2 as imageio

    rng = np.random.default_rng(0)
    for mode, n in (("train", n_train), ("validation", n_val), ("test", n_test)):
        d = root / mode / shape
        (d / "pose").mkdir(parents=True)
        (d / "rgb").mkdir(parents=True)
        (d / "intrinsics.txt").write_text(
            f"{FOCAL} {W / 2} {H / 2} 0.\n0. 0. 0.\n1.0\n1.0\n{H} {W}\n"
        )
        for i in range(n):
            th = 2 * np.pi * (i + (0.3 if mode != "train" else 0)) / n
            pos = radius * np.array([np.cos(th), np.sin(th), 0.5])
            pos = pos / np.linalg.norm(pos) * radius
            c2w = _cv_look_at(pos)
            np.savetxt(d / "pose" / f"{i:06d}.txt", c2w.reshape(1, 16))
            img = (rng.uniform(size=(H, W, 3)) * 255).astype(np.uint8)
            imageio.imwrite(d / "rgb" / f"{i:06d}.png", img)


@pytest.fixture()
def dv_dir(tmp_path):
    _write_fake_deepvoxels(tmp_path)
    return tmp_path


def test_cv_to_nerf_convention():
    """Column relabel: forward becomes back, down becomes up, position keeps."""
    pos = np.array([2.0, 1.0, 1.5])
    cv = _cv_look_at(pos)
    nerf = _cv_to_nerf(cv)
    np.testing.assert_allclose(nerf[:3, 3], pos)
    # NeRF back column = normalize(pos - target), target = origin
    np.testing.assert_allclose(nerf[:3, 2], pos / np.linalg.norm(pos), atol=1e-12)
    # still a rotation
    np.testing.assert_allclose(nerf[:3, :3] @ nerf[:3, :3].T, np.eye(3), atol=1e-12)
    # up component of the y column is non-negative (upright camera)
    assert nerf[2, 1] > 0


def test_load_deepvoxels_shapes_splits_and_bounds(dv_dir):
    ds = load_deepvoxels_data(dv_dir, shape="greek", testskip=2)
    # 6 train + 4/2 val + 4/2 test
    assert ds.images.shape == (6 + 2 + 2, H, W, 3)
    assert ds.images.dtype == np.float32
    np.testing.assert_array_equal(ds.i_train, np.arange(6))
    np.testing.assert_array_equal(ds.i_val, [6, 7])
    np.testing.assert_array_equal(ds.i_test, [8, 9])
    assert ds.focal == pytest.approx(FOCAL)
    # hemisphere radius 3 → near/far = R ∓ 1
    assert ds.near == pytest.approx(2.0, abs=1e-5)
    assert ds.far == pytest.approx(4.0, abs=1e-5)
    # all poses are NeRF-convention look-at-origin: back ∝ position
    origins = ds.poses[:, :3, 3]
    back = ds.poses[:, :3, 2]
    cos = np.sum(origins * back, -1) / np.linalg.norm(origins, axis=-1)
    np.testing.assert_allclose(cos, 1.0, atol=1e-6)
    assert ds.render_poses.shape == (120, 4, 4)
    # orbit at the capture radius
    np.testing.assert_allclose(
        np.linalg.norm(ds.render_poses[:, :3, 3], axis=-1), 3.0, rtol=1e-5
    )


def test_deepvoxels_preset_train_step(dv_dir):
    from nerf_meets_mlx_tpu.engine.train_state import create_train_state
    from nerf_meets_mlx_tpu.engine.trainer import make_nerf_train_step
    from nerf_meets_mlx_tpu.models import create_nerf

    cfg = PRESETS["deepvoxels"]()
    cfg = cfg.replace(
        mlp=dataclasses.replace(cfg.mlp, net_depth=2, net_width=32, skips=()),
        mlp_fine=dataclasses.replace(cfg.mlp, net_depth=2, net_width=32, skips=()),
        render=dataclasses.replace(cfg.render, n_samples=8, n_importance=8),
        train=dataclasses.replace(cfg.train, n_rand=16),
    )
    ds = load_deepvoxels_data(dv_dir, shape="greek", testskip=2)
    cfg = cfg.replace(
        render=dataclasses.replace(cfg.render, near=ds.near, far=ds.far)
    )
    model = create_nerf(cfg)
    state = create_train_state(model.init(jax.random.PRNGKey(0)), cfg.train)
    step = make_nerf_train_step(model, ds.H, ds.W, ds.focal)
    images = jnp.asarray(ds.images[ds.i_train])
    poses = jnp.asarray(ds.poses[ds.i_train, :3, :4])
    p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
    state, aux = step(state, images, poses, jax.random.PRNGKey(1))
    assert np.isfinite(float(aux["loss"]))
    assert not np.allclose(p0, jax.tree_util.tree_leaves(state.params)[0])


def test_deepvoxels_requires_data_dir():
    from nerf_meets_mlx_tpu.entrypoints import train_nerf

    with pytest.raises(ValueError, match="deepvoxels"):
        train_nerf(preset="deepvoxels")

"""Parity gates for the fused image-learning train kernel
(kernels/fused_image.py) vs the standard XLA path (model.query + MSE)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from nerf_meets_mlx_tpu.config import image2d
from nerf_meets_mlx_tpu.engine.trainer import make_image_train_step
from nerf_meets_mlx_tpu.engine.train_state import create_train_state
from nerf_meets_mlx_tpu.kernels.fused_image import (
    FusedImageSpec,
    fused_image_apply,
    fused_image_train,
    pack_image_inputs,
    pack_image_params,
)
from nerf_meets_mlx_tpu.models import create_nerf


def _setup(n=200, depth=4, width=64, skips=(2,), include_input=False, seed=0):
    cfg = image2d()
    cfg = cfg.replace(
        mlp=dataclasses.replace(
            cfg.mlp, net_depth=depth, net_width=width, skips=skips
        ),
        pos_encoding=dataclasses.replace(
            cfg.pos_encoding, include_input=include_input
        ),
    )
    model = create_nerf(cfg)
    params = model.init(jax.random.PRNGKey(seed))
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(-1, 1, size=(n, 2)), jnp.float32)
    y = jnp.asarray(rng.uniform(size=(n, 3)), jnp.float32)
    return cfg, model, params, x, y


def test_forward_matches_query():
    cfg, model, params, x, y = _setup()
    spec = FusedImageSpec.from_configs(cfg.mlp, cfg.pos_encoding, block=128)
    packed = pack_image_params(spec, params["coarse"])
    got = fused_image_apply(spec, packed, pack_image_inputs(x))[:, :3]
    ref = model.query(params, "coarse", x[:, None, :], None)[:, 0, :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_forward_include_input_variant():
    cfg, model, params, x, y = _setup(include_input=True, depth=3, skips=(1,))
    spec = FusedImageSpec.from_configs(cfg.mlp, cfg.pos_encoding, block=128)
    packed = pack_image_params(spec, params["coarse"])
    got = fused_image_apply(spec, packed, pack_image_inputs(x))[:, :3]
    ref = model.query(params, "coarse", x[:, None, :], None)[:, 0, :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_train_loss_and_grads_match_xla():
    cfg, model, params, x, y = _setup(n=300)
    spec = FusedImageSpec.from_configs(cfg.mlp, cfg.pos_encoding, block=128)

    def loss_fused(p):
        packed = pack_image_params(spec, p["coarse"])
        return fused_image_train(spec, packed, pack_image_inputs(x), y) / y.size

    def loss_xla(p):
        pred = model.query(p, "coarse", x[:, None, :], None)[:, 0, :]
        return jnp.mean((pred - y) ** 2)

    lf, gf = jax.value_and_grad(loss_fused)(params)
    lx, gx = jax.value_and_grad(loss_xla)(params)
    np.testing.assert_allclose(float(lf), float(lx), rtol=1e-5)
    flat_x = dict(jax.tree_util.tree_leaves_with_path(gx))
    for path, leaf_f in jax.tree_util.tree_leaves_with_path(gf):
        np.testing.assert_allclose(
            np.asarray(leaf_f), np.asarray(flat_x[path]), rtol=1e-3, atol=1e-6,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_padding_rows_excluded_from_sse():
    """n not a multiple of block: padded rows must not contribute."""
    cfg, model, params, x, y = _setup(n=130)  # pads to 256 at block=128
    spec = FusedImageSpec.from_configs(cfg.mlp, cfg.pos_encoding, block=128)
    packed = pack_image_params(spec, params["coarse"])
    sse = float(fused_image_train(spec, packed, pack_image_inputs(x), y))
    pred = model.query(params, "coarse", x[:, None, :], None)[:, 0, :]
    ref = float(jnp.sum((pred - y) ** 2))
    np.testing.assert_allclose(sse, ref, rtol=1e-5)


def test_image_step_uses_fused_and_converges():
    """make_image_train_step with use_fused_kernel trains (interpret mode
    off-TPU) and reduces the loss like the XLA step."""
    cfg, model, params, x, y = _setup(n=256, depth=2, width=32, skips=())
    cfg_f = cfg.replace(use_fused_kernel=True)
    model_f = create_nerf(cfg_f)

    import dataclasses as dc

    cfg_small = dc.replace(cfg_f, train=dc.replace(cfg_f.train, n_rand=128))
    model_small = create_nerf(cfg_small)
    step = make_image_train_step(model_small)
    state = create_train_state(params, cfg_small.train)
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(8):
        state, aux = step(state, x, y, key)
        losses.append(float(aux["loss"]))
    assert losses[-1] < losses[0]

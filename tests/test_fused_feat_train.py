"""Fused FEATURE-train kernel (kernels/fused_feat_train.py): one launch per
level doing small-MLP forward → compositing → MSE cotangent → backward →
dW + dL/dfeats, for the hash/CP fast-field presets.

Off-TPU the pallas_call runs in interpreter mode, so the kernel logic
executes. Checks mirror tests/test_fused_train.py:

1. kernel vs its differentiable jnp twin — values AND grads, including the
   dfeats cotangent that chains into the encoding backward;
2. twin vs the standard rendering pipeline (raw2outputs semantics);
3. full train steps (hash + CP presets) with fused_train on vs off:
   identical losses and updated parameters (including hash tables / CP
   factor grads through the chained encode VJP).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_meets_mlx_tpu.config import MLPConfig, lego_ingp, lego_cp
from nerf_meets_mlx_tpu.engine.train_state import create_train_state
from nerf_meets_mlx_tpu.engine.trainer import make_nerf_train_step
from nerf_meets_mlx_tpu.kernels.fused_feat_train import (
    FeatMLPSpec,
    fused_feat_train_apply,
    fused_feat_train_reference,
    pack_feat_inputs,
    pack_feat_params,
)
from nerf_meets_mlx_tpu.kernels.fused_train import TrainSpec
from nerf_meets_mlx_tpu.models import create_nerf
from nerf_meets_mlx_tpu.models.nerf_mlp import init_nerf_mlp
from nerf_meets_mlx_tpu.rendering.volume import raw2outputs


def _setup(R=10, S=16, P=16, D=25, depth=2, skips=(), noise=0.0, seed=0):
    mlp = MLPConfig(net_depth=depth, net_width=64, skips=skips, use_viewdirs=True)
    params = init_nerf_mlp(jax.random.PRNGKey(seed), mlp, P, D)
    spec = FeatMLPSpec.from_configs(mlp, P, D)
    rng = np.random.default_rng(seed)
    feats = jnp.asarray(rng.normal(size=(R, S, P)) * 0.5, jnp.float32)
    sh = jnp.asarray(rng.normal(size=(R, D)) * 0.5, jnp.float32)
    deltas = jnp.asarray(rng.uniform(0.01, 0.1, size=(R, S)), jnp.float32)
    nz = jnp.asarray(rng.normal(size=(R, S)) * noise, jnp.float32)
    target = jnp.asarray(rng.uniform(size=(R, 3)), jnp.float32)
    return mlp, params, spec, feats, sh, deltas, nz, target


@pytest.mark.parametrize(
    "mode,act,white,depth,skips",
    [
        ("canonical", "softplus", True, 2, ()),
        ("canonical", "relu", False, 2, ()),
        ("reference", "softplus", False, 2, ()),
        ("reference", "softplus", True, 3, (0,)),  # skip-concat layer
    ],
)
def test_kernel_matches_twin_values_and_grads(mode, act, white, depth, skips):
    R, S = 10, 16  # R=10 with rays_block=4: exercises the padded-ray mask
    mlp, params, spec, feats, sh, deltas, nz, target = _setup(
        R=R, S=S, depth=depth, skips=skips, noise=0.01
    )
    tspec = TrainSpec(
        n_samples=S, rays_block=4, n_rays=R, mode=mode,
        density_activation=act, white_bkgd=white,
    )

    def loss(fn):
        def f(p, feats_in):
            x = pack_feat_inputs(feats_in, sh, deltas, nz)
            sse, rgb, wts = fn(spec, tspec, pack_feat_params(spec, p), x, target)
            return sse / (R * 3), (rgb, wts)

        return f

    (lk, (rgbk, wtsk)), gk = jax.value_and_grad(
        loss(fused_feat_train_apply), argnums=(0, 1), has_aux=True
    )(params, feats)
    (lt, (rgbt, wtst)), gt = jax.value_and_grad(
        loss(fused_feat_train_reference), argnums=(0, 1), has_aux=True
    )(params, feats)
    np.testing.assert_allclose(lk, lt, rtol=1e-5)
    np.testing.assert_allclose(rgbk, rgbt, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(wtsk, wtst, rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(gk), jax.tree_util.tree_leaves(gt)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)


@pytest.mark.parametrize("mode", ["canonical", "reference"])
def test_twin_matches_raw2outputs(mode):
    """The twin's compositing == rendering/volume.py's raw2outputs."""
    R, S = 6, 12
    mlp, params, spec, feats, sh, deltas, nz, target = _setup(R=R, S=S)
    deltas = deltas.at[:, -1].set(1e10)
    tspec = TrainSpec(
        n_samples=S, rays_block=2, n_rays=R, mode=mode,
        density_activation="softplus", white_bkgd=True,
    )
    packed = pack_feat_params(spec, params)
    x = pack_feat_inputs(feats, sh, deltas, nz)
    sse, rgb, wts = fused_feat_train_reference(spec, tspec, packed, x, target)

    # same raw outputs through the standard MLP + compositor
    from nerf_meets_mlx_tpu.models.nerf_mlp import nerf_mlp_apply

    shb = jnp.broadcast_to(sh[:, None, :], (R, S, sh.shape[-1]))
    raw = nerf_mlp_apply(params, mlp, feats, shb)  # [R, S, 4]
    raw = raw.at[..., 3].add(nz)
    z = jnp.cumsum(jnp.concatenate([jnp.zeros((R, 1)), deltas[:, :-1]], 1), 1)
    out = raw2outputs(
        raw, z, jnp.tile(jnp.array([[1.0, 0, 0]]), (R, 1)), mode=mode,
        white_bkgd=True, density_activation="softplus",
    )
    np.testing.assert_allclose(wts, out["weights"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(rgb, out["rgb_map"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        sse, jnp.sum((out["rgb_map"] - target) ** 2), rtol=1e-5
    )


def _tiny_preset(preset_fn):
    cfg = preset_fn()
    cfg = cfg.replace(
        # lrate pinned low: at the presets' lr=1e-2 Adam's first-step update
        # (~lr*sign(g)) amplifies float-level grad differences between the
        # two paths into percent-level param deltas
        train=dataclasses.replace(
            cfg.train, n_rand=33, precrop_iters=0, lrate=5e-4
        ),
        render=dataclasses.replace(cfg.render, n_samples=8, n_importance=8),
    )
    if cfg.pos_encoding.kind == "hash_grid":
        # log2_table_size=18 keeps hi > 1024 so vmem_ok is False and the
        # config routes to the "feats" mode this file tests (r5: small
        # VMEM-resident hash configs route to the fully-fused "ingp" mode,
        # tests/test_fused_ingp_train.py)
        cfg = cfg.replace(
            pos_encoding=dataclasses.replace(
                cfg.pos_encoding, hash_n_levels=2, hash_log2_table_size=18,
                hash_max_res=32,
            )
        )
    return cfg


@pytest.mark.parametrize("preset_fn", [lego_ingp])
def test_train_step_fused_vs_standard(preset_fn):
    """End-to-end: one optimizer step through the feat-fused path vs
    value_and_grad through render_rays — same losses, same updated params
    (incl. the encoding's own parameters through the chained dfeats).
    Hash-only since r5: cp_grid routes to the unfused XLA path (the feat
    kernel measured 2.5x SLOWER for CP — factory._fused_train_mode)."""
    H = W = 32
    focal = 30.0
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(2, H, W, 3)), jnp.float32)
    poses = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None, :3, :4], (2, 1, 1))
    poses = poses.at[:, 2, 3].set(4.0)

    def one_step(use_ft):
        cfg = _tiny_preset(preset_fn).replace(
            use_fused_kernel=True, use_fused_train=use_ft
        )
        model = create_nerf(cfg)
        assert model.supports_fused_train == use_ft
        if use_ft:
            assert model._fused_train_mode == "feats"
        state = create_train_state(model.init(jax.random.PRNGKey(0)), cfg.train)
        step = make_nerf_train_step(model, H, W, focal)
        state, aux = step(state, images, poses, jax.random.PRNGKey(7))
        return state, {k: float(v) for k, v in aux.items()}

    s1, a1 = one_step(True)
    s0, a0 = one_step(False)
    for k in a0:
        np.testing.assert_allclose(a1[k], a0[k], rtol=5e-4, atol=1e-6)
    for x, y in zip(
        jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s0.params)
    ):
        np.testing.assert_allclose(x, y, rtol=5e-3, atol=1e-4)


def test_feat_gate():
    """_fused_train_mode: big-table hash+SH configs route to 'feats';
    cp_grid routes to None (r5 measured negative: the feat kernel ran
    lego_cp 2.5x slower than the plain XLA path — 123k vs 312k rays/s)."""
    cfg = _tiny_preset(lego_ingp).replace(
        use_fused_kernel=True, use_fused_train=True
    )
    assert create_nerf(cfg)._fused_train_mode == "feats"
    assert not create_nerf(
        cfg.replace(use_fused_train=False)
    ).supports_fused_train
    # no SH dir encoding -> unfused
    assert (
        create_nerf(cfg.replace(dir_encoding=None))._fused_train_mode is None
    )
    cp = _tiny_preset(lego_cp).replace(
        use_fused_kernel=True, use_fused_train=True
    )
    assert create_nerf(cp)._fused_train_mode is None

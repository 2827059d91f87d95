"""Fully-fused INGP train kernel (kernels/fused_ingp_train.py): in-kernel
points → hash encode → small MLP → ray-major compositing → backward with
dW and dG, one launch. Off-TPU the pallas_call runs in interpreter mode.

Checks: kernel vs the differentiable jnp twin (gather-based hash encode +
feat-MLP twin) — values AND grads for both the MLP params and the hash
tables — across modes, group>1, and ray counts that don't divide the
block; plus the factory integration (fused "ingp" mode vs unfused path).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_meets_mlx_tpu.config import lego_ingp
from nerf_meets_mlx_tpu.encoding.hash_grid import HashGridEncoding
from nerf_meets_mlx_tpu.encoding.spherical_harmonics import (
    SphericalHarmonicsEncoding,
)
from nerf_meets_mlx_tpu.kernels.fused_feat_train import (
    FeatMLPSpec,
    pack_feat_params,
)
from nerf_meets_mlx_tpu.kernels.fused_ingp_train import (
    fused_ingp_train_apply,
    fused_ingp_train_reference,
    unpack_tables,
)
from nerf_meets_mlx_tpu.kernels.fused_train import TrainSpec
from nerf_meets_mlx_tpu.kernels.hash_encode import HashEncodeSpec, pack_tables
from nerf_meets_mlx_tpu.models.nerf_mlp import init_nerf_mlp


def _setup(R=10, S=8, seed=0, n_levels=4, log2_t=9):
    enc = HashGridEncoding(
        n_levels=n_levels, min_res=4, max_res=16,
        features_per_level=2, log2_table_size=log2_t,
    )
    hspec = HashEncodeSpec.from_encoding(enc)
    sh_enc = SphericalHarmonicsEncoding(in_dim=3, degree=4)
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed)
    import dataclasses as dc

    from nerf_meets_mlx_tpu.config import MLPConfig

    mlp_cfg = MLPConfig(net_depth=2, net_width=32, skips=(), use_viewdirs=True)
    fspec = FeatMLPSpec.from_configs(mlp_cfg, enc.out_dim, sh_enc.out_dim)
    mlp_params = init_nerf_mlp(key, mlp_cfg, enc.out_dim, sh_enc.out_dim)
    tables = enc.init_params(jax.random.PRNGKey(seed + 1))["tables"]
    # non-trivial table values so grads flow visibly
    tables = tables + jnp.asarray(
        rng.normal(scale=0.1, size=tables.shape), jnp.float32
    )
    rays_o = jnp.asarray(rng.uniform(-0.3, 0.3, (R, 3)), jnp.float32)
    rays_d = jnp.asarray(rng.normal(size=(R, 3)), jnp.float32)
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    sh = sh_enc.apply({}, viewdirs)
    z = jnp.sort(
        jnp.asarray(rng.uniform(0.1, 1.5, (R, S)), jnp.float32), axis=-1
    )
    deltas = jnp.asarray(rng.uniform(0.01, 0.1, (R, S)), jnp.float32)
    noise = jnp.asarray(rng.normal(size=(R, S)) * 0.01, jnp.float32)
    target = jnp.asarray(rng.uniform(size=(R, 3)), jnp.float32)
    return (enc, hspec, sh_enc, fspec, mlp_cfg, mlp_params, tables,
            (rays_o, rays_d, sh, z, deltas, noise, target))


@pytest.mark.parametrize(
    "mode,white,group,R",
    [
        ("canonical", True, 1, 10),
        ("canonical", False, 2, 10),
        ("reference", True, 2, 25),
    ],
)
def test_kernel_matches_twin(mode, white, group, R):
    S = 8
    (enc, hspec, sh_enc, fspec, mlp_cfg, mlp_params, tables, args) = _setup(
        R=R, S=S
    )
    tspec = TrainSpec(
        n_samples=S, rays_block=8, n_rays=R, mode=mode,
        density_activation="softplus", white_bkgd=white, group=group,
    )

    def loss_k(p, t):
        g = pack_tables(hspec, t)
        sse, rgb, wts = fused_ingp_train_apply(
            fspec, hspec, tspec, pack_feat_params(fspec, p), g, *args
        )
        return sse / (R * 3), (rgb, wts)

    def loss_t(p, t):
        g = pack_tables(hspec, t)
        sse, rgb, wts = fused_ingp_train_reference(
            fspec, hspec, tspec, pack_feat_params(fspec, p), g, enc, *args
        )
        return sse / (R * 3), (rgb, wts)

    (lk, (rgbk, wtsk)), gk = jax.value_and_grad(
        loss_k, argnums=(0, 1), has_aux=True
    )(mlp_params, tables)
    (lt, (rgbt, wtst)), gt = jax.value_and_grad(
        loss_t, argnums=(0, 1), has_aux=True
    )(mlp_params, tables)
    np.testing.assert_allclose(lk, lt, rtol=1e-5)
    np.testing.assert_allclose(rgbk, rgbt, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(wtsk, wtst, rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(gk), jax.tree_util.tree_leaves(gt)):
        np.testing.assert_allclose(a, b, rtol=3e-4, atol=5e-6)


def test_unpack_inverts_pack():
    enc = HashGridEncoding(
        n_levels=3, min_res=4, max_res=16, features_per_level=2,
        log2_table_size=9,
    )
    hspec = HashEncodeSpec.from_encoding(enc)
    rng = np.random.default_rng(0)
    t = jnp.asarray(
        rng.normal(size=(3, hspec.table_size, 2)), jnp.float32
    )
    np.testing.assert_array_equal(unpack_tables(hspec, pack_tables(hspec, t)), t)


def test_train_step_ingp_fused_vs_unfused():
    """End-to-end: one optimizer step on the lego_ingp config (shrunk),
    fully-fused ingp path vs the unfused XLA path — same losses and
    updated params (tables included)."""
    from nerf_meets_mlx_tpu.engine.train_state import create_train_state
    from nerf_meets_mlx_tpu.engine.trainer import make_nerf_train_step
    from nerf_meets_mlx_tpu.models import create_nerf

    H = W = 16
    focal = 15.0
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(2, H, W, 3)), jnp.float32)
    poses = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None, :3, :4], (2, 1, 1))
    poses = poses.at[:, 2, 3].set(4.0)

    def one_step(fused, n_importance):
        cfg = lego_ingp()
        cfg = cfg.replace(
            # lrate pinned low: at the preset's lr=1e-2 Adam's first-step
            # update (~lr*sign(g)) amplifies float-level grad differences
            # between the two paths into percent-level param deltas
            train=dataclasses.replace(
                cfg.train, n_rand=21, precrop_iters=0, lrate=5e-4
            ),
            render=dataclasses.replace(
                cfg.render, n_samples=8, n_importance=n_importance
            ),
            pos_encoding=dataclasses.replace(
                cfg.pos_encoding, hash_n_levels=4, hash_log2_table_size=9,
                hash_min_res=4, hash_max_res=16,
            ),
            use_fused_kernel=fused,
            use_fused_train=fused,
        )
        model = create_nerf(cfg)
        if fused:
            assert model._fused_train_mode == "ingp"
        state = create_train_state(model.init(jax.random.PRNGKey(0)), cfg.train)
        step = make_nerf_train_step(model, H, W, focal)
        state, aux = step(state, images, poses, jax.random.PRNGKey(7))
        return state, {k: float(v) for k, v in aux.items()}

    # coarse-only: strict parity. (With importance sampling, float-rounding
    # diffs in the coarse weights shift a few inverse-CDF samples, and hash
    # lookups are DISCONTINUOUS in position — unlike the smooth sinusoidal
    # case — so fused-vs-unfused param comparison amplifies unboundedly;
    # precise grad parity is covered by the kernel-vs-twin tests above.)
    s1, a1 = one_step(True, 0)
    s0, a0 = one_step(False, 0)
    for k in a0:
        np.testing.assert_allclose(a1[k], a0[k], rtol=5e-4, atol=1e-6)
    for x, y in zip(
        jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s0.params)
    ):
        np.testing.assert_allclose(x, y, rtol=5e-3, atol=1e-4)

    # hierarchical: the fused path runs end-to-end with matching coarse loss
    s1, a1 = one_step(True, 8)
    s0, a0 = one_step(False, 8)
    np.testing.assert_allclose(a1["loss_coarse"], a0["loss_coarse"], rtol=5e-4)
    assert np.isfinite(a1["loss_fine"]) and np.isfinite(a0["loss_fine"])


def test_eval_fused_ingp_matches_standard_path():
    """render_rays(train=False) for the VMEM-resident hash preset routes
    through the forward-only INGP kernel (points + hash encode + MLP +
    composite, one launch per level) and matches the standard
    hash_encode + XLA-MLP + raw2outputs eval path on every map."""
    from nerf_meets_mlx_tpu.models import create_nerf

    cfg = lego_ingp().replace(use_fused_kernel=True, use_fused_train=True)
    cfg = cfg.replace(
        render=dataclasses.replace(cfg.render, n_samples=16, n_importance=16)
    )
    model = create_nerf(cfg)
    assert model._fused_train_mode == "ingp"
    params = model.init(jax.random.PRNGKey(0))
    B = 21  # not a block multiple: exercises the pad/slice
    ro = jax.random.normal(jax.random.PRNGKey(2), (B, 3)) * 0.1
    rd = jax.random.normal(jax.random.PRNGKey(3), (B, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True) * 1.3

    out_fused = model.render_rays(params, ro, rd, train=False)
    std = create_nerf(cfg.replace(use_fused_kernel=False, use_fused_train=False))
    out_std = std.render_rays(params, ro, rd, train=False)

    assert set(out_fused) == set(out_std)
    for k in out_std:
        np.testing.assert_allclose(
            out_fused[k], out_std[k], rtol=2e-4, atol=2e-5, err_msg=k
        )

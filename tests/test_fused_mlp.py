"""Fused encode+MLP kernel: parity vs the plain pipeline (outputs AND grads).

Off-TPU the pallas_call runs in interpreter mode, so these tests execute the
actual kernel logic. The jnp twin (fused_apply_reference) is checked against
the unfused model path first, then the Pallas kernels against the twin.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_meets_mlx_tpu.config import EncodingConfig, MLPConfig, lego_hierarchical
from nerf_meets_mlx_tpu.kernels.fused_mlp import (
    FusedMLPSpec,
    fused_apply,
    fused_apply_reference,
    pack_inputs,
    pack_params,
)
from nerf_meets_mlx_tpu.models import create_nerf, init_nerf_mlp, nerf_mlp_apply
from nerf_meets_mlx_tpu.encoding.sinusoidal import frequency_bands, sinusoidal_encode


def _setup(depth=4, width=64, skips=(2,), pos_f=6, dir_f=3, block=128):
    mlp = MLPConfig(net_depth=depth, net_width=width, skips=skips)
    pos = EncodingConfig(kind="sinusoidal", in_dim=3, n_freqs=pos_f, include_input=True)
    dir_ = EncodingConfig(kind="sinusoidal", in_dim=3, n_freqs=dir_f, include_input=True)
    spec = FusedMLPSpec.from_configs(mlp, pos, dir_, block=block)
    params = init_nerf_mlp(jax.random.PRNGKey(0), mlp, pos.out_dim, dir_.out_dim)
    return mlp, pos, dir_, spec, params


def _unfused(params, mlp, pos, dir_, pts, viewdirs):
    bp = frequency_bands(pos.n_freqs, pos.min_freq_exp, None, pos.frequency_bands)
    bd = frequency_bands(dir_.n_freqs, dir_.min_freq_exp, None, dir_.frequency_bands)
    x_pos = sinusoidal_encode(pts, bp, include_input=True)
    dirs = jnp.broadcast_to(viewdirs[:, None, :], pts.shape)
    x_dir = sinusoidal_encode(dirs, bd, include_input=True)
    return nerf_mlp_apply(params, mlp, x_pos, x_dir)


def _rand_inputs(B=16, S=4, seed=1):
    kp, kd = jax.random.split(jax.random.PRNGKey(seed))
    pts = jax.random.normal(kp, (B, S, 3))
    viewdirs = jax.random.normal(kd, (B, 3))
    viewdirs = viewdirs / jnp.linalg.norm(viewdirs, axis=-1, keepdims=True)
    return pts, viewdirs


def test_twin_matches_unfused_pipeline():
    mlp, pos, dir_, spec, params = _setup()
    pts, viewdirs = _rand_inputs()
    ref = _unfused(params, mlp, pos, dir_, pts, viewdirs)  # [B, S, 4]
    x = pack_inputs(pts, viewdirs)
    packed = pack_params(spec, params)
    out = fused_apply_reference(spec, packed, x)[:, :4].reshape(ref.shape)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_twin_matches_unfused_deep_skip():
    # lego-shaped: depth 8, width 256 (small batch), skip at 4, 10/4 freqs
    mlp, pos, dir_, spec, params = _setup(
        depth=8, width=256, skips=(4,), pos_f=10, dir_f=4, block=64
    )
    pts, viewdirs = _rand_inputs(B=8, S=8)
    ref = _unfused(params, mlp, pos, dir_, pts, viewdirs)
    x = pack_inputs(pts, viewdirs)
    packed = pack_params(spec, params)
    out = fused_apply_reference(spec, packed, x)[:, :4].reshape(ref.shape)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_twin_wide_packed_tile():
    """Frequencies large enough that the packed encode tile spans two
    128-lane tiles (pos 17*6 + dir 4*6 + 6 passthrough = 132 -> sw 256):
    offsets/sin-mask must stay correct across the lane boundary."""
    mlp, pos, dir_, spec, params = _setup(
        depth=4, width=64, skips=(2,), pos_f=17, dir_f=4, block=64
    )
    assert spec.sw == 256
    pts, viewdirs = _rand_inputs(B=8, S=4)
    ref = _unfused(params, mlp, pos, dir_, pts, viewdirs)
    x = pack_inputs(pts, viewdirs)
    packed = pack_params(spec, params)
    out = fused_apply_reference(spec, packed, x)[:, :4].reshape(ref.shape)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)
    # and through the Pallas kernel (interpreter off-TPU)
    kout = fused_apply(spec, packed, x)[:, :4].reshape(ref.shape)
    np.testing.assert_allclose(np.asarray(kout), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_pallas_forward_matches_twin():
    mlp, pos, dir_, spec, params = _setup(block=128)
    pts, viewdirs = _rand_inputs(B=32, S=8)  # 256 points = 2 blocks
    x = pack_inputs(pts, viewdirs)
    packed = pack_params(spec, params)
    twin = fused_apply_reference(spec, packed, x)
    out = fused_apply(spec, packed, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(twin), rtol=1e-4, atol=1e-5)


def test_pallas_forward_nondivisible_batch():
    mlp, pos, dir_, spec, params = _setup(block=128)
    pts, viewdirs = _rand_inputs(B=10, S=7)  # 70 points, pads to 128
    x = pack_inputs(pts, viewdirs)
    packed = pack_params(spec, params)
    twin = fused_apply_reference(spec, packed, x)
    out = fused_apply(spec, packed, x)
    assert out.shape == (70, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(twin), rtol=1e-4, atol=1e-5)


def test_pallas_grads_match_twin():
    mlp, pos, dir_, spec, params = _setup(block=128)
    pts, viewdirs = _rand_inputs(B=32, S=8)
    x = pack_inputs(pts, viewdirs)

    def loss_pallas(p, x):
        packed = pack_params(spec, p)
        return jnp.sum(fused_apply(spec, packed, x)[:, :4] ** 2)

    def loss_twin(p, x):
        packed = pack_params(spec, p)
        return jnp.sum(fused_apply_reference(spec, packed, x)[:, :4] ** 2)

    gp, gxp = jax.grad(loss_pallas, argnums=(0, 1))(params, x)
    gt, gxt = jax.grad(loss_twin, argnums=(0, 1))(params, x)

    flat_p, _ = jax.tree_util.tree_flatten_with_path(gp)
    flat_t, _ = jax.tree_util.tree_flatten_with_path(gt)
    for (path, a), (_, b) in zip(flat_p, flat_t):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-4,
            err_msg=jax.tree_util.keystr(path),
        )
    np.testing.assert_allclose(np.asarray(gxp), np.asarray(gxt), rtol=5e-3, atol=1e-4)


def test_pallas_no_dx_param_grads_match():
    """compute_dx=False (the model path): identical parameter grads, zero dX."""
    mlp, pos, dir_, spec, params = _setup(block=128)
    spec_nodx = dataclasses.replace(spec, compute_dx=False)
    pts, viewdirs = _rand_inputs(B=32, S=8)
    x = pack_inputs(pts, viewdirs)

    def loss(s):
        def f(p, x):
            return jnp.sum(fused_apply(s, pack_params(s, p), x)[:, :4] ** 2)
        return f

    gp, gx = jax.grad(loss(spec), argnums=(0, 1))(params, x)
    gp0, gx0 = jax.grad(loss(spec_nodx), argnums=(0, 1))(params, x)

    flat_a, _ = jax.tree_util.tree_flatten_with_path(gp)
    flat_b, _ = jax.tree_util.tree_flatten_with_path(gp0)
    for (path, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7,
            err_msg=jax.tree_util.keystr(path),
        )
    assert np.all(np.asarray(gx0) == 0.0)
    assert np.abs(np.asarray(gx)).max() > 0.0  # sanity: the dX path is real


def test_fused_model_query_matches_plain():
    cfg = lego_hierarchical()
    cfg = cfg.replace(
        mlp=dataclasses.replace(cfg.mlp, net_depth=4, net_width=64, skips=(2,)),
        mlp_fine=dataclasses.replace(cfg.mlp, net_depth=4, net_width=64, skips=(2,)),
    )
    model_plain = create_nerf(cfg)
    model_fused = create_nerf(cfg.replace(use_fused_kernel=True))
    params = model_plain.init(jax.random.PRNGKey(0))
    pts, viewdirs = _rand_inputs(B=16, S=4)
    a = model_plain.query(params, "coarse", pts, viewdirs)
    b = model_fused.query(params, "coarse", pts, viewdirs)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_fused_bfloat16_close():
    mlp, pos, dir_, spec, params = _setup(block=128)
    spec16 = dataclasses.replace(spec, compute_dtype="bfloat16")
    pts, viewdirs = _rand_inputs(B=16, S=8)
    x = pack_inputs(pts, viewdirs)
    packed = pack_params(spec, params)
    f32 = fused_apply_reference(spec, packed, x)
    bf16 = fused_apply_reference(spec16, packed, x)
    assert np.abs(np.asarray(f32) - np.asarray(bf16)).max() < 0.1


def test_fused_reference_squared_bands():
    """The fused kernel honors the reference's squared-linspace band quirk."""
    mlp = MLPConfig(net_depth=3, net_width=64, skips=())
    pos = EncodingConfig(
        kind="sinusoidal", in_dim=3, n_freqs=5, include_input=True,
        frequency_bands="reference_squared",
    )
    dir_ = EncodingConfig(
        kind="sinusoidal", in_dim=3, n_freqs=3, include_input=True,
        frequency_bands="reference_squared",
    )
    spec = FusedMLPSpec.from_configs(mlp, pos, dir_, block=128)
    assert spec.pos_band_mode == "reference_squared"
    params = init_nerf_mlp(jax.random.PRNGKey(0), mlp, pos.out_dim, dir_.out_dim)
    pts, viewdirs = _rand_inputs(B=16, S=4)

    bp = frequency_bands(pos.n_freqs, 0.0, None, "reference_squared")
    bd = frequency_bands(dir_.n_freqs, 0.0, None, "reference_squared")
    x_pos = sinusoidal_encode(pts, bp, include_input=True)
    dirs = jnp.broadcast_to(viewdirs[:, None, :], pts.shape)
    x_dir = sinusoidal_encode(dirs, bd, include_input=True)
    ref = nerf_mlp_apply(params, mlp, x_pos, x_dir)

    x = pack_inputs(pts, viewdirs)
    packed = pack_params(spec, params)
    out = fused_apply(spec, packed, x)[:, :4].reshape(ref.shape)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)

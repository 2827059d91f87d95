"""Parity gates for the Pallas CP-encode kernel (kernels/cp_encode.py)
against the XLA path (encoding/cp_grid.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_meets_mlx_tpu.encoding.cp_grid import CPGridEncoding
from nerf_meets_mlx_tpu.kernels.cp_encode import CPEncodeSpec, cp_encode_apply, pack_lines


def make_enc(n_levels=3, min_res=8, max_res=40, c=16, dtype="bfloat16"):
    return CPGridEncoding(
        n_levels=n_levels, min_res=min_res, max_res=max_res,
        n_components=c, compute_dtype=dtype,
    )


def rand_inputs(enc, n=300, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    params = enc.init_params(k1)
    x = jax.random.uniform(k2, (n, 3), minval=enc.bbox_min * 0.95, maxval=enc.bbox_max * 0.95)
    return params, x


def test_forward_matches_xla_path():
    enc = make_enc()
    params, x = rand_inputs(enc)
    ref = enc.apply(params, x)
    got = cp_encode_apply(enc, params, x, block=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-3, atol=1e-5)


def test_forward_f32_exactish():
    """In f32 compute the only difference is GEMM accumulation order."""
    enc = make_enc(dtype="float32")
    params, x = rand_inputs(enc, n=257)  # padding path
    ref = enc.apply(params, x)
    got = cp_encode_apply(enc, params, x, block=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_line_grads_match_xla_path():
    enc = make_enc(dtype="float32")
    params, x = rand_inputs(enc, n=200)
    co = jax.random.normal(jax.random.PRNGKey(3), (200, enc.out_dim))

    def loss_ref(p):
        return jnp.sum(enc.apply(p, x) * co)

    def loss_kernel(p):
        return jnp.sum(cp_encode_apply(enc, p, x, block=128) * co)

    g_ref = jax.grad(loss_ref)(params)["lines"]
    g_got = jax.grad(loss_kernel)(params)["lines"]
    assert len(g_got) == len(g_ref)
    for a, b in zip(g_got, g_ref):
        assert a.shape == b.shape  # per-level unpadded shapes survive the VJP
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=2e-5)


def test_grads_bf16_tolerance():
    enc = make_enc(dtype="bfloat16")
    params, x = rand_inputs(enc, n=160)

    def loss_ref(p):
        return jnp.sum(enc.apply(p, x) ** 2)

    def loss_kernel(p):
        return jnp.sum(cp_encode_apply(enc, p, x, block=128) ** 2)

    g_ref = jax.grad(loss_ref)(params)["lines"]
    g_got = jax.grad(loss_kernel)(params)["lines"]
    for a, b in zip(g_got, g_ref):
        scale = max(float(jnp.abs(b).max()), 1e-6)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-2, atol=2e-2 * scale
        )


def test_padded_rows_zero_weight():
    """Factor rows past each level's resolution must never contribute."""
    enc = make_enc(n_levels=2, min_res=5, max_res=9)  # r_max pads 9 -> 128
    spec = CPEncodeSpec.from_encoding(enc)
    params, x = rand_inputs(enc, n=64)
    base = cp_encode_apply(enc, params, x, block=64)
    # poison the padded region; output must not change
    poisoned = [l for l in params["lines"]]
    g = pack_lines(spec, poisoned)
    assert spec.r_max == 128
    got2 = cp_encode_apply(enc, {"lines": poisoned}, x, block=64)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(got2))


def test_model_path_uses_kernel():
    """lego_cp model with use_fused_kernel routes the encode through the
    kernel and still trains (loss decreases)."""
    import dataclasses

    from nerf_meets_mlx_tpu.config import lego_cp
    from nerf_meets_mlx_tpu.engine.train_state import create_train_state
    from nerf_meets_mlx_tpu.engine.trainer import make_nerf_train_step
    from nerf_meets_mlx_tpu.models import create_nerf

    cfg = lego_cp()
    cfg = cfg.replace(
        use_fused_kernel=True,
        render=dataclasses.replace(cfg.render, n_samples=8, n_importance=8),
        mlp=dataclasses.replace(cfg.mlp, net_depth=2, net_width=32),
        mlp_fine=dataclasses.replace(cfg.mlp_fine, net_depth=2, net_width=32),
        train=dataclasses.replace(cfg.train, n_rand=64, precrop_iters=0),
    )
    model = create_nerf(cfg)
    H = W = 16
    focal = 20.0
    import numpy as onp

    K = onp.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]], onp.float32)
    step = make_nerf_train_step(model, H, W, focal)
    state = create_train_state(model.init(jax.random.PRNGKey(0)), cfg.train)
    rng = onp.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(2, H, W, 3)), jnp.float32)
    poses = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None, :3, :4], (2, 1, 1))
    poses = poses.at[:, 2, 3].set(4.0)
    losses = []
    for _ in range(6):
        state, aux = step(state, images, poses, jax.random.PRNGKey(1))
        losses.append(float(aux["loss"]))
    assert losses[-1] < losses[0]

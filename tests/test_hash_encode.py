"""Parity gates for the Pallas hash-encode kernel (kernels/hash_encode.py)
against the XLA-gather reference path (encoding/hash_grid.py), which is
itself the fixed transcription of the reference's MultiHashEncoding
(/root/reference/mlx_nerf/encoding/multi_hash.py:61-131)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_meets_mlx_tpu.encoding.hash_grid import HashGridEncoding
from nerf_meets_mlx_tpu.kernels.hash_encode import (
    HashEncodeSpec,
    hash_encode,
    hash_encode_apply,
    pack_tables,
)


def make_enc(n_levels=4, log2_t=9, max_res=64, f=2):
    return HashGridEncoding(
        n_levels=n_levels,
        min_res=4,
        max_res=max_res,
        features_per_level=f,
        log2_table_size=log2_t,
    )


def rand_inputs(enc, n=300, seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    params = enc.init_params(k1)
    # strictly inside the bbox (clip boundary gradients are convention-
    # dependent; interior points are the defined regime)
    x = jax.random.uniform(k2, (n, 3), minval=enc.bbox_min * 0.9, maxval=enc.bbox_max * 0.9)
    return params, x


def test_forward_matches_xla_path():
    enc = make_enc()
    params, x = rand_inputs(enc)
    ref = enc.apply(params, x)
    got = hash_encode_apply(enc, params, x, block=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=0, atol=1e-6)


def test_forward_f1_and_many_levels():
    enc = make_enc(n_levels=6, log2_t=8, max_res=128, f=1)
    params, x = rand_inputs(enc, n=257)  # non-multiple of block: padding path
    ref = enc.apply(params, x)
    got = hash_encode_apply(enc, params, x, block=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_table_grads_match_xla_path():
    enc = make_enc()
    params, x = rand_inputs(enc, n=200)
    co = jax.random.normal(jax.random.PRNGKey(3), (200, enc.out_dim))

    def loss_ref(p):
        return jnp.sum(enc.apply(p, x) * co)

    def loss_kernel(p):
        return jnp.sum(hash_encode_apply(enc, p, x, block=128) * co)

    g_ref = jax.grad(loss_ref)(params)["tables"]
    g_got = jax.grad(loss_kernel)(params)["tables"]
    # scatter-add (XLA) vs GEMM-contraction (kernel) sum in different orders
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), rtol=1e-3, atol=2e-5)


def test_dx_matches_xla_path():
    enc = make_enc()
    params, x = rand_inputs(enc, n=160)
    co = jax.random.normal(jax.random.PRNGKey(5), (160, enc.out_dim))

    def loss_ref(xx):
        return jnp.sum(enc.apply(params, xx) * co)

    def loss_kernel(xx):
        return jnp.sum(
            hash_encode_apply(enc, params, xx, block=128, compute_dx=True) * co
        )

    g_ref = jax.grad(loss_ref)(x)
    g_got = jax.grad(loss_kernel)(x)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), rtol=1e-4, atol=1e-5)


def test_dx_zero_when_disabled():
    """compute_dx=False must return zero dX (not garbage) — the model path
    relies on positions being data/stop-gradient."""
    enc = make_enc()
    params, x = rand_inputs(enc, n=64)

    def loss(xx):
        return jnp.sum(hash_encode_apply(enc, params, xx, block=64))

    assert float(jnp.abs(jax.grad(loss)(x)).max()) == 0.0


def test_grads_under_jit_and_batch_shapes():
    enc = make_enc(n_levels=2, log2_t=8)
    params, x = rand_inputs(enc, n=96)
    x3 = x.reshape(4, 24, 3)  # leading batch dims preserved

    @jax.jit
    def f(p):
        return jnp.sum(hash_encode_apply(enc, p, x3, block=64) ** 2)

    @jax.jit
    def f_ref(p):
        return jnp.sum(enc.apply(p, x3) ** 2)

    np.testing.assert_allclose(float(f(params)), float(f_ref(params)), rtol=1e-6)
    g = jax.grad(f)(params)["tables"]
    g_ref = jax.grad(f_ref)(params)["tables"]
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-5, atol=1e-7)


def test_vmem_gate():
    small = HashEncodeSpec.from_encoding(make_enc(log2_t=15, n_levels=8))
    paper = HashEncodeSpec.from_encoding(make_enc(log2_t=19, n_levels=16))
    assert small.vmem_ok
    assert not paper.vmem_ok  # 64 MB tables: stays on the XLA fallback


def test_pack_tables_roundtrip_values():
    enc = make_enc(n_levels=2, log2_t=8, f=2)
    spec = HashEncodeSpec.from_encoding(enc)
    params, _ = rand_inputs(enc, n=1)
    t = params["tables"]
    g = pack_tables(spec, t)
    # row h of level l lives at g[l, h // 128, f*128 + h % 128]
    for h in (0, 1, 127, 128, 200, 255):
        for f in range(2):
            assert float(g[1, h // 128, f * 128 + h % 128]) == float(t[1, h, f])


def test_bfloat16_compute_dtype_parity():
    """bf16 GEMM operands: feats/grads match the f32 XLA path to bf16
    rounding (one-hot rows are exact in bf16; accumulation stays f32, so
    the only error is rounding of table values and of ds products)."""
    import dataclasses

    enc = dataclasses.replace(make_enc(), compute_dtype="bfloat16")
    params, x = rand_inputs(enc)
    ref = enc.apply(params, x)
    got = hash_encode_apply(enc, params, x, block=128)
    # table values are ~init_scale=1e-4: per-corner bf16 rounding ~0.4%
    # relative, so the 8-corner sum is within ~8*0.004*1e-4 absolute
    # (relative error is unbounded where corners cancel)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=0, atol=5e-6)

    def loss_k(p):
        return jnp.sum(hash_encode_apply(enc, p, x, block=128) ** 2)

    def loss_r(p):
        return jnp.sum(enc.apply(p, x) ** 2)

    gk = jax.grad(loss_k)(params)["tables"]
    gr = jax.grad(loss_r)(params)["tables"]
    scale = float(np.abs(np.asarray(gr)).max())
    np.testing.assert_allclose(
        np.asarray(gk), np.asarray(gr), rtol=0, atol=2e-2 * scale
    )


def test_config_hash_overrides_reach_kernel_spec():
    """Text-overlay hash keys flow config -> encoding -> kernel spec."""
    import dataclasses as dc
    from nerf_meets_mlx_tpu.config import config_from_text, lego_ingp
    from nerf_meets_mlx_tpu.models import create_nerf
    import tempfile, pathlib

    with tempfile.TemporaryDirectory() as d:
        f = pathlib.Path(d) / "o.txt"
        f.write_text(
            "hash_log2_table_size = 14\nhash_compute_dtype = bfloat16\n"
            "occupancy = True\naabb = -1,-1,-1,1,1,1\n"
        )
        cfg = config_from_text(f, base=lego_ingp())
    assert cfg.pos_encoding.hash_log2_table_size == 14
    assert cfg.pos_encoding.hash_compute_dtype == "bfloat16"
    assert cfg.render.occupancy and cfg.render.aabb == (-1, -1, -1, 1, 1, 1)
    model = create_nerf(cfg)
    spec = HashEncodeSpec.from_encoding(model.pos_enc)
    assert spec.log2_table_size == 14 and spec.compute_dtype == "bfloat16"

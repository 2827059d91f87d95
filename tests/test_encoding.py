"""Encodings: sinusoidal (both band modes), identity, SH, hash grid."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_meets_mlx_tpu.config import EncodingConfig
from nerf_meets_mlx_tpu.encoding import (
    make_encoding,
    frequency_bands,
    sinusoidal_encode,
    sh_encode,
)
from nerf_meets_mlx_tpu.encoding.sinusoidal import embedder_reference_order
from nerf_meets_mlx_tpu.encoding.hash_grid import HashGridEncoding, _level_resolutions


# -- sinusoidal -------------------------------------------------------------


def test_frequency_bands_canonical():
    b = np.asarray(frequency_bands(4, 0.0, 3.0, "canonical"))
    np.testing.assert_allclose(b, [1.0, 2.0, 4.0, 8.0], rtol=1e-6)


def test_frequency_bands_reference_squared():
    # embedding.py:46-49 — linspace(0, max, N)**2 -> [0, 1, 4, 9] for N=4
    b = np.asarray(frequency_bands(4, 0.0, 3.0, "reference_squared"))
    np.testing.assert_allclose(b, [0.0, 1.0, 4.0, 9.0], rtol=1e-6)


def test_sinusoidal_layout_and_values():
    x = jnp.asarray([[0.5, -0.25]])
    bands = frequency_bands(3, 0.0, 2.0)  # [1, 2, 4]
    out = np.asarray(sinusoidal_encode(x, bands, include_input=True))
    assert out.shape == (1, 2 * 2 * 3 + 2)
    # first block: sin(x_i * f_j), i-major
    expect_sin = np.sin(np.asarray([0.5 * 1, 0.5 * 2, 0.5 * 4, -0.25, -0.5, -1.0]))
    np.testing.assert_allclose(out[0, :6], expect_sin, rtol=1e-5, atol=1e-6)
    # second block: cos via sin(x + pi/2)
    expect_cos = np.cos(np.asarray([0.5, 1.0, 2.0, -0.25, -0.5, -1.0]))
    np.testing.assert_allclose(out[0, 6:12], expect_cos, rtol=1e-5, atol=1e-6)
    # raw input appended last
    np.testing.assert_allclose(out[0, 12:], [0.5, -0.25], rtol=1e-6)


def test_embedder_reference_order_layout():
    # legacy Embedder layout: input first, then [sin, cos] per freq
    x = jnp.asarray([[1.0, 2.0, 3.0]])
    bands = jnp.asarray([0.0, 1.0])
    out = np.asarray(embedder_reference_order(x, bands, include_input=True))
    assert out.shape == (1, 3 + 2 * 2 * 3)
    np.testing.assert_allclose(out[0, :3], [1.0, 2.0, 3.0])
    np.testing.assert_allclose(out[0, 3:6], np.sin([0.0, 0.0, 0.0]), atol=1e-7)
    np.testing.assert_allclose(out[0, 6:9], np.cos([0.0, 0.0, 0.0]), atol=1e-7)
    np.testing.assert_allclose(out[0, 9:12], np.sin([1.0, 2.0, 3.0]), rtol=1e-6)


def test_encoding_config_out_dims():
    # volume path: 3-D, 10 freqs, include_input -> 63 (reference 63-D pos)
    assert EncodingConfig(kind="sinusoidal", in_dim=3, n_freqs=10).out_dim == 63
    # dirs: 4 freqs -> 27
    assert EncodingConfig(kind="sinusoidal", in_dim=3, n_freqs=4).out_dim == 27
    # image path: 2-D, 10 freqs, no input -> 40 (__viser_image_learning.py:197-199)
    assert (
        EncodingConfig(kind="sinusoidal", in_dim=2, n_freqs=10, include_input=False).out_dim
        == 40
    )
    assert EncodingConfig(kind="spherical_harmonics", sh_degree=4).out_dim == 25
    assert EncodingConfig(kind="hash_grid").out_dim == 32


def test_make_encoding_apply_shapes():
    for cfg in [
        EncodingConfig(kind="identity", in_dim=3),
        EncodingConfig(kind="sinusoidal", in_dim=3, n_freqs=6),
        EncodingConfig(kind="spherical_harmonics", in_dim=3, sh_degree=3),
        EncodingConfig(kind="hash_grid", in_dim=3, hash_log2_table_size=8),
    ]:
        enc = make_encoding(cfg)
        params = enc.init_params(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 5, 3))
        if cfg.kind == "spherical_harmonics":
            x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        out = enc.apply(params, x)
        assert out.shape == (4, 5, enc.out_dim), cfg.kind


# -- spherical harmonics ----------------------------------------------------


def test_sh_degree0_constant():
    d = jnp.asarray([[0.0, 0.0, 1.0]])
    out = np.asarray(sh_encode(d, 0))
    np.testing.assert_allclose(out, [[0.28209479177387814]], rtol=1e-6)


def test_sh_orthonormality():
    # integral over sphere of Y_i * Y_j ~ delta_ij (Monte-Carlo)
    key = jax.random.PRNGKey(0)
    v = jax.random.normal(key, (200_000, 3))
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    Y = sh_encode(v, 2)  # 9 components
    gram = np.asarray((Y.T @ Y) / v.shape[0] * (4 * np.pi))
    np.testing.assert_allclose(gram, np.eye(9), atol=0.05)


def test_sh_matches_reference_coeffs_degree1():
    d = jnp.asarray([[0.3, -0.5, 0.8124]])
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    out = np.asarray(sh_encode(d, 1))[0]
    x, y, z = np.asarray(d)[0]
    np.testing.assert_allclose(
        out[1:], [0.4886025119029199 * y, 0.4886025119029199 * z, 0.4886025119029199 * x],
        rtol=1e-5,
    )


# -- hash grid --------------------------------------------------------------


def test_level_resolutions_geometric():
    res = _level_resolutions(4, 16, 128)
    np.testing.assert_array_equal(res, [16, 32, 64, 128])


def test_hash_grid_interpolation_is_continuous():
    enc = HashGridEncoding(n_levels=2, min_res=4, max_res=8, log2_table_size=10)
    params = enc.init_params(jax.random.PRNGKey(0))
    x0 = jnp.asarray([[0.1, 0.2, 0.3]])
    eps = 1e-4
    f0 = enc.apply(params, x0)
    f1 = enc.apply(params, x0 + eps)
    assert np.abs(np.asarray(f1 - f0)).max() < 1e-2  # small input step -> small output step


def test_hash_grid_exact_at_vertices():
    """At a grid vertex the trilinear weights collapse to one corner."""
    enc = HashGridEncoding(
        n_levels=1, min_res=4, max_res=4, log2_table_size=12, bbox_min=0.0, bbox_max=1.0
    )
    params = enc.init_params(jax.random.PRNGKey(1))
    # vertex (1, 2, 3) at res 4 -> u = (0.25, 0.5, 0.75)
    x = jnp.asarray([[0.25, 0.5, 0.75]])
    out = np.asarray(enc.apply(params, x))[0]
    h = (1 * 1 ^ 2 * 2654435761 ^ 3 * 805459861) & (enc.table_size - 1)
    expected = np.asarray(params["tables"])[0, h]
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-7)


def test_hash_grid_gradients_flow_to_tables():
    enc = HashGridEncoding(n_levels=2, min_res=4, max_res=8, log2_table_size=8)
    params = enc.init_params(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(2), (32, 3), minval=-1.0, maxval=1.0)

    def loss(p):
        return jnp.sum(enc.apply(p, x) ** 2)

    g = jax.grad(loss)(params)["tables"]
    assert np.abs(np.asarray(g)).sum() > 0.0


def test_hash_grid_init_scale():
    enc = HashGridEncoding(log2_table_size=10, init_scale=1e-4)
    t = np.asarray(enc.init_params(jax.random.PRNGKey(0))["tables"])
    assert np.abs(t).max() <= 1e-4 and np.abs(t).max() > 1e-5

"""Compositor (raw2outputs) — golden math in both modes
(vs /root/reference/mlx_nerf/rendering/render.py:20-96)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_meets_mlx_tpu.rendering.volume import raw2outputs, _exclusive_cumsum


def _ref_raw2outputs(raw, z_vals, rays_d, white_bkgd=False):
    """Straight numpy transcription of the reference math (render.py:20-96):
    no rgb sigmoid, relu only in the alpha term, raw densities in the cumsum."""
    raw_rgb = raw[..., :3]
    sigma = raw[..., 3]
    deltas = np.diff(z_vals, axis=-1)
    deltas = np.concatenate([deltas, np.full_like(deltas[..., :1], 1e10)], -1)
    deltas = deltas * np.linalg.norm(rays_d[..., None, :], axis=-1)
    dd = deltas * sigma
    alphas = 1.0 - np.exp(-np.maximum(dd, 0.0))
    excl = np.concatenate(
        [np.zeros_like(dd[..., :1]), np.cumsum(dd[..., :-1], -1)], -1
    )
    T = np.exp(-excl)
    w = alphas * T
    rgb = (w[..., None] * raw_rgb).sum(-2)
    depth = (w * z_vals).sum(-1)
    acc = w.sum(-1)
    if white_bkgd:
        rgb = rgb + (1 - acc[..., None])
    return rgb, depth, acc, w


def test_reference_mode_matches_transcription():
    rng = np.random.default_rng(0)
    B, S = 8, 16
    raw = rng.normal(size=(B, S, 4)).astype(np.float32)
    z = np.sort(rng.uniform(2, 6, size=(B, S)).astype(np.float32), axis=-1)
    rays_d = rng.normal(size=(B, 3)).astype(np.float32)

    out = raw2outputs(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(rays_d), mode="reference")
    rgb, depth, acc, w = _ref_raw2outputs(raw, z, rays_d)
    np.testing.assert_allclose(np.asarray(out["rgb_map"]), rgb, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["depth_map"]), depth, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["acc_map"]), acc, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["weights"]), w, rtol=2e-4, atol=1e-5)


def test_reference_mode_negative_density_amplifies_transmittance():
    """The documented reference quirk: negative raw density INCREASES
    downstream transmittance because the cumsum has no relu (render.py:71-79)."""
    z = jnp.asarray([[1.0, 2.0, 3.0]])
    rays_d = jnp.asarray([[0.0, 0.0, 1.0]])
    raw_neg = jnp.asarray([[[0, 0, 0, -5.0], [0, 0, 0, 1.0], [0, 0, 0, 1.0]]], jnp.float32)
    raw_zero = jnp.asarray([[[0, 0, 0, 0.0], [0, 0, 0, 1.0], [0, 0, 0, 1.0]]], jnp.float32)
    w_neg = np.asarray(raw2outputs(raw_neg, z, rays_d, mode="reference")["weights"])
    w_zero = np.asarray(raw2outputs(raw_zero, z, rays_d, mode="reference")["weights"])
    assert w_neg[0, 1] > w_zero[0, 1]


def test_canonical_mode_opaque_wall():
    """A single very dense sample absorbs everything behind it."""
    B, S = 1, 8
    z = jnp.broadcast_to(jnp.linspace(2.0, 6.0, S), (B, S))
    raw = np.full((B, S, 4), 0.0, np.float32)
    raw[:, :, 3] = -100.0  # empty space (softplus(-100) ~ 0)
    raw[:, 2, 3] = 1e4  # huge density at sample 2
    raw[:, 2, :3] = 5.0  # sigmoid(5) ~ 0.993 red/green/blue
    rays_d = jnp.asarray([[0.0, 0.0, 1.0]])
    out = raw2outputs(jnp.asarray(raw), z, rays_d, mode="canonical")
    w = np.asarray(out["weights"])[0]
    assert w[2] > 0.99
    assert w[3:].max() < 1e-3
    np.testing.assert_allclose(np.asarray(out["depth_map"])[0], np.asarray(z)[0, 2], rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out["rgb_map"])[0], [0.9933, 0.9933, 0.9933], atol=1e-3
    )


def test_canonical_mode_empty_space_white_bkgd():
    B, S = 2, 8
    z = jnp.broadcast_to(jnp.linspace(2.0, 6.0, S), (B, S))
    raw = jnp.full((B, S, 4), -100.0)  # relu(sigma)=0, sigmoid(rgb)~0
    rays_d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    out = raw2outputs(raw, z, rays_d, mode="canonical", white_bkgd=True)
    np.testing.assert_allclose(np.asarray(out["rgb_map"]), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["acc_map"]), 0.0, atol=1e-6)


def test_weights_sum_bounded_canonical():
    rng = np.random.default_rng(1)
    raw = jnp.asarray(rng.normal(size=(32, 16, 4)).astype(np.float32))
    z = jnp.broadcast_to(jnp.linspace(2.0, 6.0, 16), (32, 16))
    rays_d = jnp.asarray(rng.normal(size=(32, 3)).astype(np.float32))
    out = raw2outputs(raw, z, rays_d, mode="canonical")
    acc = np.asarray(out["acc_map"])
    assert (acc <= 1.0 + 1e-5).all() and (acc >= 0.0).all()


def test_density_noise_changes_output_and_is_reproducible():
    # moderate negative raw density: softplus(sigma) small enough that the
    # Gaussian noise visibly shifts the composite
    raw = jnp.zeros((4, 8, 4))
    z = jnp.broadcast_to(jnp.linspace(2.0, 6.0, 8), (4, 8))
    rays_d = jnp.asarray([[0.0, 0.0, 1.0]] * 4)
    k = jax.random.PRNGKey(7)
    a = raw2outputs(raw, z, rays_d, mode="canonical", raw_noise_std=2.0, noise_key=k)
    b = raw2outputs(raw, z, rays_d, mode="canonical", raw_noise_std=2.0, noise_key=k)
    c = raw2outputs(raw, z, rays_d, mode="canonical")
    np.testing.assert_array_equal(np.asarray(a["weights"]), np.asarray(b["weights"]))
    assert not np.allclose(np.asarray(a["weights"]), np.asarray(c["weights"]))


def test_exclusive_cumsum():
    x = jnp.asarray([[1.0, 2.0, 3.0]])
    np.testing.assert_allclose(np.asarray(_exclusive_cumsum(x)), [[0.0, 1.0, 3.0]])


def test_ray_direction_norm_scales_deltas():
    """delta_dists scale with ||rays_d|| (render.py:59) — doubling the ray
    direction length doubles optical depth."""
    z = jnp.asarray([[1.0, 2.0, 3.0]])
    raw = jnp.asarray([[[0, 0, 0, 0.5], [0, 0, 0, 0.5], [0, 0, 0, 0.5]]], jnp.float32)
    d1 = jnp.asarray([[0.0, 0.0, 1.0]])
    d2 = jnp.asarray([[0.0, 0.0, 2.0]])
    w1 = np.asarray(raw2outputs(raw, z, d1, mode="canonical")["weights"])
    w2 = np.asarray(raw2outputs(raw, z, d2, mode="canonical")["weights"])
    assert w2[0, 0] > w1[0, 0]  # more absorption per bin with longer dir

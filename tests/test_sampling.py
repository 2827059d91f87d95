"""Depth samplers + inverse-CDF importance sampling
(vs /root/reference/mlx_nerf/sampling semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_meets_mlx_tpu.sampling import (
    sample_z_uniform,
    sample_z_lindisp,
    stratified_jitter,
    sample_pdf,
)
from nerf_meets_mlx_tpu.sampling.importance import merge_z


def test_uniform_scalar_and_batched():
    z = sample_z_uniform(2.0, 6.0, 5)
    np.testing.assert_allclose(np.asarray(z), [2.0, 3.0, 4.0, 5.0, 6.0], rtol=1e-6)
    near = jnp.full((3, 1), 2.0)
    far = jnp.full((3, 1), 6.0)
    zb = sample_z_uniform(near, far, 5)
    assert zb.shape == (3, 5)
    np.testing.assert_allclose(np.asarray(zb)[1], [2.0, 3.0, 4.0, 5.0, 6.0], rtol=1e-6)


def test_lindisp_reciprocal_spacing():
    z = np.asarray(sample_z_lindisp(2.0, 6.0, 3))
    # disparity midpoint: 1/z = (1/2 + 1/6)/2 = 1/3 -> z = 3
    np.testing.assert_allclose(z, [2.0, 3.0, 6.0], rtol=1e-6)


def test_jitter_within_bins_and_strength_zero():
    key = jax.random.PRNGKey(0)
    z = jnp.broadcast_to(jnp.linspace(2.0, 6.0, 9), (16, 9))
    zj = stratified_jitter(key, z, 1.0)
    mids = 0.5 * (np.asarray(z)[:, 1:] + np.asarray(z)[:, :-1])
    lower = np.concatenate([np.asarray(z)[:, :1], mids], axis=1)
    upper = np.concatenate([mids, np.asarray(z)[:, -1:]], axis=1)
    assert (np.asarray(zj) >= lower - 1e-6).all()
    assert (np.asarray(zj) <= upper + 1e-6).all()
    assert not np.allclose(np.asarray(zj), np.asarray(z))
    # static zero strength -> identity
    assert stratified_jitter(key, z, 0.0) is z


def test_sample_pdf_concentrates_on_heavy_bins():
    key = jax.random.PRNGKey(1)
    B, n = 64, 32
    z = jnp.broadcast_to(jnp.linspace(2.0, 6.0, n), (B, n))
    # all weight in bins near z=5
    w = np.zeros((B, n), np.float32)
    w[:, 22:26] = 10.0
    zs = np.asarray(sample_pdf(key, z, jnp.asarray(w), 128))
    frac_near = np.mean((zs > 4.3) & (zs < 5.4))
    assert frac_near > 0.8, f"importance samples not concentrated: {frac_near}"
    assert zs.min() >= 2.0 - 1e-5 and zs.max() <= 6.0 + 1e-5


def test_sample_pdf_uniform_weights_cover_range():
    key = jax.random.PRNGKey(2)
    B, n = 8, 16
    z = jnp.broadcast_to(jnp.linspace(2.0, 6.0, n), (B, n))
    w = jnp.ones((B, n))
    zs = np.asarray(sample_pdf(key, z, w, 256))
    assert zs.mean() > 3.5 and zs.mean() < 4.5
    assert zs.std() > 0.7


def test_sample_pdf_deterministic_stratified():
    z = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 8), (2, 8))
    w = jnp.ones((2, 8))
    a = sample_pdf(None, z, w, 16, deterministic=True)
    b = sample_pdf(None, z, w, 16, deterministic=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # monotone queries -> monotone samples
    assert (np.diff(np.asarray(a)[0]) >= -1e-6).all()


def test_sample_pdf_zero_weights_no_nan():
    # eps-renormalization path (torch variant's relu(eps - sum) padding)
    key = jax.random.PRNGKey(3)
    z = jnp.broadcast_to(jnp.linspace(2.0, 6.0, 8), (4, 8))
    w = jnp.full((4, 8), -0.01)  # cancels the +0.01 histogram padding
    zs = np.asarray(sample_pdf(key, z, w, 32))
    assert np.isfinite(zs).all()


def test_sample_pdf_stops_gradient():
    z = jnp.broadcast_to(jnp.linspace(2.0, 6.0, 8), (2, 8))

    def f(w):
        return jnp.sum(sample_pdf(jax.random.PRNGKey(0), z, w, 4))

    g = jax.grad(f)(jnp.ones((2, 8)))
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_merge_z_sorted_superset():
    z = jnp.asarray([[1.0, 3.0, 5.0]])
    zi = jnp.asarray([[4.0, 2.0]])
    out = np.asarray(merge_z(z, zi))
    np.testing.assert_allclose(out, [[1.0, 2.0, 3.0, 4.0, 5.0]])


def test_sample_pdf_matches_reference_formula_single_ray():
    """Golden check of the interpolation math against a hand-computed case
    (torch variant semantics, sampling/__init__.py:101-178)."""
    z = jnp.asarray([[0.0, 1.0, 2.0, 3.0]])  # mids: 0.5, 1.5, 2.5
    w = jnp.asarray([[0.0, 1.0, 0.0, 0.0]])  # all mass in bin 1 (+0.01 pad)
    # deterministic u = linspace(0,1,5) = [0, .25, .5, .75, 1]
    zs = np.asarray(sample_pdf(None, z, w, 5, deterministic=True))[0]
    # padded weights: [.01, 1.01, .01, .01]; sum=1.04
    pdf = np.array([0.01, 1.01, 0.01, 0.01]) / 1.04
    cdf = np.concatenate([[0.0], np.minimum(1.0, np.cumsum(pdf))])
    mids_padded = np.array([0.5, 0.5, 1.5, 2.5, 2.5])
    u = np.linspace(0, 1, 5)
    inds = np.searchsorted(cdf, u, side="right")
    below = np.clip(inds - 1, 0, 4)
    above = np.clip(inds, 0, 4)
    denom = cdf[above] - cdf[below]
    denom = np.where(denom < 1e-5, 1.0, denom)
    t = np.clip(np.nan_to_num((u - cdf[below]) / denom), 0, 1)
    expected = mids_padded[below] + t * (mids_padded[above] - mids_padded[below])
    np.testing.assert_allclose(zs, expected, rtol=1e-5, atol=1e-6)

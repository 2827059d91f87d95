"""Inverse-CDF (hierarchical importance) sampling — fully on-device.

The reference routes this through a torch-CPU round-trip every iteration
(device→numpy→torch.searchsorted→numpy→device; sampling/__init__.py:101-178,
render.py:214-223, __test_nerf.py:274-285) because mlx lacked searchsorted.
On TPU this is a pure jnp stage under stop_gradient: the coarse weights feed
a per-ray CDF, and a batched sort-based searchsorted runs on-chip — no host
boundary, and it fuses into the same jit train step as the coarse forward.

Semantics reproduce the torch variant exactly (the one the reference actually
uses): histogram padding +0.01, eps-renormalization, cdf = min(1, cumsum) with
a prepended 0, right-searchsorted, endpoint-padded z midpoints, guarded
interpolation with nan_to_num + clip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_pdf(
    key: jax.Array | None,
    z_vals,          # [B, n]
    weights,         # [B, n]
    n_importance: int,
    eps: float = 1e-5,
    deterministic: bool = False,
):
    """Draw `n_importance` z values per ray from the weights' inverse CDF.

    Matches sample_from_inverse_cdf_torch (sampling/__init__.py:101-178):
    deterministic=True uses stratified linspace(0,1) queries; otherwise
    uniform draws from `key`. The entire computation is wrapped in
    stop_gradient — the fine pass must not backprop into the coarse weights
    (the reference detaches via @torch.no_grad()).

    Returns [B, n_importance] (unsorted, like the reference).
    """
    z_vals = jax.lax.stop_gradient(jnp.asarray(z_vals))
    weights = jax.lax.stop_gradient(jnp.asarray(weights))
    B, n = weights.shape

    w = weights + 0.01  # histogram padding
    w_sum = jnp.sum(w, axis=-1, keepdims=True)
    padding = jax.nn.relu(eps - w_sum)
    w = w + padding / n
    w_sum = w_sum + padding

    pdf = w / w_sum
    cdf = jnp.minimum(1.0, jnp.cumsum(pdf, axis=-1))
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [B, n+1]

    if deterministic:
        u = jnp.linspace(0.0, 1.0, n_importance, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, (B, n_importance))
    else:
        u = jax.random.uniform(key, (B, n_importance), dtype=cdf.dtype)

    # batched right-bisection; sort-based formulation maps well onto TPU
    inds = jax.vmap(
        lambda c, q: jnp.searchsorted(c, q, side="right", method="sort")
    )(cdf, u)
    below = jnp.clip(inds - 1, 0, n)
    above = jnp.clip(inds, 0, n)

    cdf_from = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_to = jnp.take_along_axis(cdf, above, axis=-1)

    # endpoint-padded bin midpoints: [m0, m0..m_{n-2}, m_{n-2}] -> [B, n+1]
    z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])  # [B, n-1]
    z_mid = jnp.concatenate([z_mid[..., :1], z_mid, z_mid[..., -1:]], axis=-1)
    z_from = jnp.take_along_axis(z_mid, below, axis=-1)
    z_to = jnp.take_along_axis(z_mid, above, axis=-1)

    denom = cdf_to - cdf_from
    denom = jnp.where(denom < eps, jnp.ones_like(denom), denom)
    t = jnp.nan_to_num((u - cdf_from) / denom, nan=0.0)
    t = jnp.clip(t, 0.0, 1.0)
    return z_from + t * (z_to - z_from)


def merge_z(z_vals, z_importance):
    """Sort-merge coarse and importance z values along the sample axis
    (render.py:225, __test_nerf.py:288)."""
    return jnp.sort(jnp.concatenate([z_vals, z_importance], axis=-1), axis=-1)

"""Depth (z) samplers along rays.

jnp equivalents of the reference's samplers:
  * uniform:    /root/reference/mlx_nerf/sampling/uniform.py:7-18
  * lindisp:    /root/reference/mlx_nerf/sampling/linear_disparity.py:8-19
  * stratified jitter: /root/reference/mlx_nerf/sampling/__init__.py:10-31
    (implemented with the *intended* mids/upper/lower semantics — the
    reference's concat is rank-mismatched, SURVEY.md §2.9 — and an explicit
    PRNG key instead of global RNG state).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_z_uniform(near, far, n_samples: int):
    """Linearly spaced z in [near, far].

    near/far may be scalars or [B, 1] arrays; result broadcasts to
    [..., n_samples] (uniform.py:7-18).
    """
    t = jnp.linspace(0.0, 1.0, n_samples, dtype=jnp.float32)
    return jnp.asarray(near) * (1.0 - t) + jnp.asarray(far) * t


def sample_z_lindisp(near, far, n_samples: int):
    """Linear-in-disparity spacing: 1/z interpolates linearly
    (linear_disparity.py:8-19)."""
    t = jnp.linspace(0.0, 1.0, n_samples, dtype=jnp.float32)
    return 1.0 / (1.0 / jnp.asarray(near) * (1.0 - t) + 1.0 / jnp.asarray(far) * t)


def stratified_jitter(key: jax.Array, z_vals, strength: float = 1.0, t=None):
    """Jitter each z within its stratified bin.

    Bins are [lower, upper] where lower/upper come from bin midpoints with
    the endpoints kept (NeRF's standard stratified perturbation; the intended
    behavior of sampling/__init__.py:10-31). ``strength`` scales the jitter
    exactly as the reference multiplies its uniform draw by ``strength``.

    Static strength == 0 returns z_vals unchanged. ``t`` overrides the
    uniform draw (shape z_vals.shape) — used by the sharded train step to
    keep per-device draws identical to the single-device program.
    """
    if strength <= 0.0:
        return z_vals
    mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
    lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
    if t is None:
        t = jax.random.uniform(key, z_vals.shape, dtype=z_vals.dtype)
    return lower + (upper - lower) * (t * strength)

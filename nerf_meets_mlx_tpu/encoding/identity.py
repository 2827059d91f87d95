"""Pass-through encoding (/root/reference/mlx_nerf/encoding/identity.py:13-32)."""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class IdentityEncoding:
    in_dim: int

    @property
    def out_dim(self) -> int:
        return self.in_dim

    def init_params(self, key: jax.Array):
        del key
        return {}

    def apply(self, params, x: jnp.ndarray) -> jnp.ndarray:
        del params
        return x

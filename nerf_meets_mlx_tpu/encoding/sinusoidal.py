"""Sinusoidal (NeRF positional) encoding.

Covers BOTH of the reference's positional-encoding flavors behind one
``band_mode`` switch:

  * ``"canonical"``:        bands = 2**linspace(min_exp, max_exp, n) — the
    SinusoidalEncoding used by the image path
    (/root/reference/mlx_nerf/encoding/sinusoidal.py:49-51).
  * ``"reference_squared"``: bands = linspace(0, max_exp, n)**2 — the legacy
    Embedder quirk the volume path actually trained with
    (/root/reference/mlx_nerf/models/embedding.py:46-49), giving frequencies
    [0, 1, 4, 9, ...] including a constant sin(0) band.

Feature ordering is the reference SinusoidalEncoding layout
(sinusoidal.py:54-62): all sin(x_i * f_j) (i-major, j-minor) followed by all
cos(...), computed as one fused sin over a concatenated phase-shifted block;
optional raw input appended LAST.  NOTE: the legacy Embedder interleaves
sin/cos per-frequency and puts the input FIRST — a pure permutation of the
same features, which an MLP's first dense layer absorbs; fidelity tests that
need exact feature order use `embedder_reference_order`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


def frequency_bands(
    n_freqs: int,
    min_freq_exp: float = 0.0,
    max_freq_exp: Optional[float] = None,
    band_mode: str = "canonical",
) -> jnp.ndarray:
    if max_freq_exp is None:
        max_freq_exp = float(n_freqs - 1)
    lin = jnp.linspace(min_freq_exp, max_freq_exp, n_freqs, dtype=jnp.float32)
    if band_mode == "canonical":
        return 2.0**lin
    if band_mode == "reference_squared":
        # embedding.py:46-49 — linspace(0, max)**2, NOT 2**linspace
        return lin**2.0
    raise ValueError(f"unknown band_mode: {band_mode}")


def sinusoidal_encode(
    x: jnp.ndarray,
    bands: jnp.ndarray,
    include_input: bool = False,
) -> jnp.ndarray:
    """Encode [..., D] -> [..., D*2*n_freqs (+D)].

    Layout: sin(x⊗bands) then cos(x⊗bands) (cos as sin(x+pi/2), the
    reference's single-concat trick at sinusoidal.py:57-62), raw input last.
    """
    scaled = x[..., None] * bands  # [..., D, F]
    scaled = scaled.reshape(*x.shape[:-1], -1)  # [..., D*F]
    phases = jnp.concatenate([scaled, scaled + jnp.pi / 2.0], axis=-1)
    out = jnp.sin(phases)
    if include_input:
        out = jnp.concatenate([out, x], axis=-1)
    return out


def embedder_reference_order(
    x: jnp.ndarray,
    bands: jnp.ndarray,
    include_input: bool = True,
) -> jnp.ndarray:
    """Legacy Embedder feature layout (embedding.py:23-71): raw input first,
    then per-frequency [sin(x*f), cos(x*f)] blocks. Used by fidelity tests
    that compare feature-for-feature against the reference volume path."""
    feats = []
    if include_input:
        feats.append(x)
    for f in bands:
        feats.append(jnp.sin(x * f))
        feats.append(jnp.cos(x * f))
    return jnp.concatenate(feats, axis=-1)


@dataclasses.dataclass(frozen=True)
class SinusoidalEncoding:
    in_dim: int
    n_freqs: int
    min_freq_exp: float = 0.0
    max_freq_exp: Optional[float] = None
    include_input: bool = False
    band_mode: str = "canonical"

    @property
    def out_dim(self) -> int:
        d = self.in_dim * self.n_freqs * 2
        if self.include_input:
            d += self.in_dim
        return d

    def init_params(self, key: jax.Array):
        del key
        return {}

    def apply(self, params, x: jnp.ndarray) -> jnp.ndarray:
        del params
        bands = frequency_bands(
            self.n_freqs, self.min_freq_exp, self.max_freq_exp, self.band_mode
        )
        return sinusoidal_encode(x, bands, self.include_input)

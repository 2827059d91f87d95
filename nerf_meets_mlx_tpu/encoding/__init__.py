from nerf_meets_mlx_tpu.encoding.base import Encoding, make_encoding
from nerf_meets_mlx_tpu.encoding.sinusoidal import (
    SinusoidalEncoding,
    frequency_bands,
    sinusoidal_encode,
)
from nerf_meets_mlx_tpu.encoding.identity import IdentityEncoding
from nerf_meets_mlx_tpu.encoding.spherical_harmonics import (
    SphericalHarmonicsEncoding,
    sh_encode,
)
from nerf_meets_mlx_tpu.encoding.hash_grid import HashGridEncoding

__all__ = [
    "Encoding",
    "make_encoding",
    "SinusoidalEncoding",
    "frequency_bands",
    "sinusoidal_encode",
    "IdentityEncoding",
    "SphericalHarmonicsEncoding",
    "sh_encode",
    "HashGridEncoding",
]

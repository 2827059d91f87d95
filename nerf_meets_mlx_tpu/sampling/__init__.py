from nerf_meets_mlx_tpu.sampling.stratified import (
    sample_z_uniform,
    sample_z_lindisp,
    stratified_jitter,
)
from nerf_meets_mlx_tpu.sampling.importance import sample_pdf

__all__ = [
    "sample_z_uniform",
    "sample_z_lindisp",
    "stratified_jitter",
    "sample_pdf",
]

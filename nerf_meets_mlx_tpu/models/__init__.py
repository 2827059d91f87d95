from nerf_meets_mlx_tpu.models.nerf_mlp import (
    init_nerf_mlp,
    nerf_mlp_apply,
)
from nerf_meets_mlx_tpu.models.factory import NeRFModel, create_nerf

__all__ = ["init_nerf_mlp", "nerf_mlp_apply", "NeRFModel", "create_nerf"]

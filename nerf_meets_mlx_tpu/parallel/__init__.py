from nerf_meets_mlx_tpu.parallel.mesh import make_mesh, replicated, data_sharding
from nerf_meets_mlx_tpu.parallel.sharded_train import (
    make_sharded_nerf_train_step,
    replicate_state,
)
from nerf_meets_mlx_tpu.parallel.sharded_render import make_sharded_render_image

__all__ = [
    "make_mesh",
    "replicated",
    "data_sharding",
    "make_sharded_nerf_train_step",
    "make_sharded_render_image",
    "replicate_state",
]

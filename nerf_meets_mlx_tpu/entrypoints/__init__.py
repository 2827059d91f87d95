from nerf_meets_mlx_tpu.entrypoints.train_nerf import train_nerf
from nerf_meets_mlx_tpu.entrypoints.image_learning import image_learning

__all__ = ["train_nerf", "image_learning"]

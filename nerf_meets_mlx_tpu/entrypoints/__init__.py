from nerf_meets_mlx_tpu.entrypoints.train_nerf import train_nerf
from nerf_meets_mlx_tpu.entrypoints.image_learning import image_learning
from nerf_meets_mlx_tpu.entrypoints.render_only import render_only

__all__ = ["train_nerf", "image_learning", "render_only"]

from nerf_meets_mlx_tpu.datasets.blender import load_blender_data, BlenderDataset
from nerf_meets_mlx_tpu.datasets.llff import load_llff_data, LLFFDataset
from nerf_meets_mlx_tpu.datasets.synthetic import make_synthetic_scene, write_blender_dataset
from nerf_meets_mlx_tpu.datasets.image import load_image_2d, make_test_image

__all__ = [
    "load_blender_data",
    "BlenderDataset",
    "load_llff_data",
    "LLFFDataset",
    "make_synthetic_scene",
    "write_blender_dataset",
    "load_image_2d",
    "make_test_image",
]

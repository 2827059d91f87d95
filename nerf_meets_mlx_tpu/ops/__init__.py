from nerf_meets_mlx_tpu.ops.metrics import mse, psnr, ssim

__all__ = ["mse", "psnr", "ssim"]

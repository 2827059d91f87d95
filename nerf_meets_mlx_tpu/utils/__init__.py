from nerf_meets_mlx_tpu.utils.logging import MetricsLogger
from nerf_meets_mlx_tpu.utils.video import write_video, to8b

__all__ = ["MetricsLogger", "write_video", "to8b"]

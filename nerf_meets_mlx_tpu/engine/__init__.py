from nerf_meets_mlx_tpu.engine.train_state import TrainState, make_optimizer, lr_schedule
from nerf_meets_mlx_tpu.engine.trainer import (
    make_nerf_train_step,
    make_image_train_step,
    Trainer,
)
from nerf_meets_mlx_tpu.engine.checkpoint import save_checkpoint, restore_checkpoint, latest_step

__all__ = [
    "TrainState",
    "make_optimizer",
    "lr_schedule",
    "make_nerf_train_step",
    "make_image_train_step",
    "Trainer",
    "save_checkpoint",
    "restore_checkpoint",
    "latest_step",
]

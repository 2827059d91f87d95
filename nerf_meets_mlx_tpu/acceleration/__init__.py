from nerf_meets_mlx_tpu.acceleration.occupancy import (
    init_occupancy_grid,
    update_occupancy_grid,
    occupancy_binary,
    tighten_near_far,
)

__all__ = [
    "init_occupancy_grid",
    "update_occupancy_grid",
    "occupancy_binary",
    "tighten_near_far",
]

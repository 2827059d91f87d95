from nerf_meets_mlx_tpu.cameras.rays import get_rays, ndc_rays
from nerf_meets_mlx_tpu.cameras.pose import pose_spherical, orbit_poses

__all__ = ["get_rays", "ndc_rays", "pose_spherical", "orbit_poses"]

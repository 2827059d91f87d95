"""Ray generation and pose math vs hand-derived values and reference
semantics (/root/reference/mlx_nerf/rendering/ray.py, ops/pose.py)."""

import numpy as np
import jax.numpy as jnp

from nerf_meets_mlx_tpu.cameras import get_rays, ndc_rays, pose_spherical, orbit_poses
from nerf_meets_mlx_tpu.cameras.rays import get_rays_for_pixels


def _identity_cam(H=4, W=6, focal=2.0):
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]], np.float32)
    c2w = np.eye(4, dtype=np.float32)[:3]
    return K, c2w


def test_get_rays_center_pixel_points_forward():
    H, W, focal = 4, 6, 2.0
    K, c2w = _identity_cam(H, W, focal)
    rays_o, rays_d = get_rays(H, W, K, c2w)
    assert rays_o.shape == (H, W, 3) and rays_d.shape == (H, W, 3)
    # all origins at camera center
    np.testing.assert_allclose(np.asarray(rays_o), 0.0)
    # pixel (i=cx, j=cy) looks straight down -z
    d = np.asarray(rays_d)[H // 2, W // 2]
    np.testing.assert_allclose(d, [0.0, 0.0, -1.0], atol=1e-6)


def test_get_rays_nerf_convention_signs():
    # i > cx -> +x; j > cy -> -y (NeRF convention, ray.py:21-27)
    H, W = 4, 6
    K, c2w = _identity_cam(H, W)
    _, rays_d = get_rays(H, W, K, c2w)
    d = np.asarray(rays_d)
    assert d[0, W - 1, 0] > 0 and d[0, W - 1, 1] > 0  # top-right: +x, +y
    assert d[H - 1, 0, 0] < 0 and d[H - 1, 0, 1] < 0  # bottom-left


def test_get_rays_rotated_camera():
    # camera translated and rotated: origin follows c2w translation
    H, W = 3, 3
    K, _ = _identity_cam(H, W)
    c2w = pose_spherical(30.0, -30.0, 4.0)[:3]
    rays_o, rays_d = get_rays(H, W, K, c2w)
    np.testing.assert_allclose(
        np.asarray(rays_o)[0, 0], np.asarray(c2w)[:3, 3], rtol=1e-6
    )
    # direction = R @ cam_dir
    cam_dir = np.array([(0 - K[0, 2]) / K[0, 0], -(0 - K[1, 2]) / K[1, 1], -1.0])
    np.testing.assert_allclose(
        np.asarray(rays_d)[0, 0], np.asarray(c2w)[:3, :3] @ cam_dir, rtol=1e-5, atol=1e-6
    )


def test_get_rays_for_pixels_matches_grid():
    H, W = 5, 7
    K, _ = _identity_cam(H, W)
    c2w = pose_spherical(45.0, -10.0, 3.0)[:3]
    rays_o, rays_d = get_rays(H, W, K, c2w)
    py, px = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    ro, rd = get_rays_for_pixels(K, c2w, px.ravel(), py.ravel())
    np.testing.assert_allclose(
        np.asarray(ro), np.asarray(rays_o).reshape(-1, 3), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(rd), np.asarray(rays_d).reshape(-1, 3), rtol=1e-5, atol=1e-6
    )


def test_pose_spherical_radius_and_orthonormal():
    for theta, phi, r in [(0.0, 0.0, 4.0), (30.0, -30.0, 4.0), (120.0, -45.0, 2.0)]:
        p = pose_spherical(theta, phi, r)
        assert p.shape == (4, 4)
        # camera center at distance r from origin
        np.testing.assert_allclose(np.linalg.norm(p[:3, 3]), r, rtol=1e-6)
        # rotation block orthonormal
        R = p[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_pose_spherical_theta0():
    # theta=0, phi=0: after fixup, camera sits at (0, r, 0) looking at origin
    p = pose_spherical(0.0, 0.0, 4.0)
    np.testing.assert_allclose(p[:3, 3], [0.0, 4.0, 0.0], atol=1e-6)
    # camera -z axis (view direction) points toward origin
    view = -p[:3, 2]
    np.testing.assert_allclose(view, [0.0, -1.0, 0.0], atol=1e-6)


def test_orbit_poses_shape_and_spread():
    poses = orbit_poses(8)
    assert poses.shape == (8, 4, 4)
    # all centers at radius 4, distinct azimuths
    centers = poses[:, :3, 3]
    np.testing.assert_allclose(np.linalg.norm(centers, axis=1), 4.0, rtol=1e-5)
    assert len(np.unique(np.round(centers[:, 0], 4))) > 4


def test_ndc_rays_bounds():
    # forward-facing camera: NDC z in [-1, 1] range start at o2<=1
    H = W = 8
    K, c2w = _identity_cam(H, W, focal=4.0)
    rays_o, rays_d = get_rays(H, W, K, c2w)
    rays_o = jnp.asarray(rays_o).reshape(-1, 3) + jnp.array([0.0, 0.0, 1.0])
    rays_d = jnp.asarray(rays_d).reshape(-1, 3)
    o_ndc, d_ndc = ndc_rays(H, W, 4.0, 1.0, rays_o, rays_d)
    o_ndc, d_ndc = np.asarray(o_ndc), np.asarray(d_ndc)
    assert np.isfinite(o_ndc).all() and np.isfinite(d_ndc).all()
    # endpoint o+d has z == 1 (NDC far plane property)
    np.testing.assert_allclose(o_ndc[:, 2] + d_ndc[:, 2], 1.0, atol=1e-5)


def test_intersect_aabb_basic():
    """Slab test: hits tighten [near, far]; misses keep the originals."""
    from nerf_meets_mlx_tpu.cameras.rays import intersect_aabb
    import jax.numpy as jnp

    rays_o = jnp.array(
        [
            [0.0, 0.0, 4.0],   # straight through the box
            [3.0, 0.0, 4.0],   # offset: misses a unit box
            [0.0, 0.0, 4.0],   # axis-parallel in x/y (zero components)
        ]
    )
    rays_d = jnp.array(
        [
            [0.0, 0.0, -1.0],
            [0.0, 0.0, -1.0],
            [0.0, 0.0, -2.0],  # unnormalized
        ]
    )
    near, far = intersect_aabb(rays_o, rays_d, [-1.0] * 3, [1.0] * 3, 2.0, 6.0)
    near, far = np.asarray(near)[:, 0], np.asarray(far)[:, 0]
    # ray 0: box z-slab [-1, 1] -> t in [3, 5]
    np.testing.assert_allclose(near[0], 3.0, atol=1e-5)
    np.testing.assert_allclose(far[0], 5.0, atol=1e-5)
    # ray 1: miss -> untightened
    np.testing.assert_allclose([near[1], far[1]], [2.0, 6.0], atol=1e-6)
    # ray 2: unnormalized d scales t by 1/2
    np.testing.assert_allclose(near[2], 1.5 + 0.5, atol=1e-5)  # clipped to near=2
    np.testing.assert_allclose(far[2], 2.5, atol=1e-5)
    assert (far >= near).all()


def test_intersect_aabb_inside_box():
    """Origin inside the box: near stays at the configured near (>=0 clip)."""
    from nerf_meets_mlx_tpu.cameras.rays import intersect_aabb
    import jax.numpy as jnp

    rays_o = jnp.zeros((1, 3))
    rays_d = jnp.array([[0.0, 0.0, -1.0]])
    near, far = intersect_aabb(rays_o, rays_d, [-1.0] * 3, [1.0] * 3, 0.1, 6.0)
    np.testing.assert_allclose(np.asarray(near)[0, 0], 0.1, atol=1e-6)
    np.testing.assert_allclose(np.asarray(far)[0, 0], 1.0, atol=1e-5)

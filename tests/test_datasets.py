"""Dataset layer: procedural synthetic scene, Blender file loader round-trip,
2-D image dataset."""

import numpy as np
import pytest

from nerf_meets_mlx_tpu.datasets import (
    make_synthetic_scene,
    write_blender_dataset,
    load_blender_data,
    make_test_image,
)
from nerf_meets_mlx_tpu.datasets.image import pixel_dataset
from nerf_meets_mlx_tpu.datasets.synthetic import render_gt_image, CAMERA_ANGLE_X
from nerf_meets_mlx_tpu.cameras.pose import pose_spherical


def test_synthetic_scene_shapes_and_splits():
    ds = make_synthetic_scene(n_train=6, n_val=2, n_test=2, resolution=32)
    assert ds.images.shape == (10, 32, 32, 3)
    assert ds.poses.shape == (10, 4, 4)
    assert ds.render_poses.shape == (160, 4, 4)
    np.testing.assert_array_equal(ds.i_train, np.arange(6))
    np.testing.assert_array_equal(ds.i_test, np.arange(8, 10))
    assert ds.near == 2.0 and ds.far == 6.0
    assert 0.0 <= ds.images.min() and ds.images.max() <= 1.0
    # white background: corners of the image should be near-white
    assert ds.images[0, 0, 0].min() > 0.95


def test_synthetic_scene_view_consistency():
    """Two renders of the same pose are identical; different poses differ."""
    H = W = 24
    focal = 0.5 * W / np.tan(0.5 * CAMERA_ANGLE_X)
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]], np.float32)
    p1 = pose_spherical(30.0, -30.0, 4.0)[:3, :4]
    p2 = pose_spherical(120.0, -30.0, 4.0)[:3, :4]
    a = render_gt_image(H, W, K, p1)
    b = render_gt_image(H, W, K, p1)
    c = render_gt_image(H, W, K, p2)
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 0.1


def test_synthetic_scene_object_in_view():
    ds = make_synthetic_scene(n_train=2, n_val=1, n_test=1, resolution=32)
    # scene content: central region darker than white background somewhere
    center = ds.images[:, 8:24, 8:24, :]
    assert center.min() < 0.8, "blob scene not visible in renders"


def test_blender_loader_roundtrip(tmp_path):
    write_blender_dataset(tmp_path / "scene", n_train=3, n_val=2, n_test=2, resolution=16)
    ds = load_blender_data(tmp_path / "scene", half_res=False, testskip=1)
    assert ds.images.shape == (7, 16, 16, 3)
    assert ds.H == ds.W == 16
    expected_focal = 0.5 * 16 / np.tan(0.5 * CAMERA_ANGLE_X)
    np.testing.assert_allclose(ds.focal, expected_focal, rtol=1e-5)
    assert ds.K.shape == (3, 3)
    np.testing.assert_array_equal(ds.i_train, [0, 1, 2])
    np.testing.assert_array_equal(ds.i_test, [5, 6])


def test_blender_loader_testskip_and_half_res(tmp_path):
    write_blender_dataset(tmp_path / "scene", n_train=2, n_val=4, n_test=4, resolution=16)
    ds = load_blender_data(tmp_path / "scene", half_res=True, testskip=2)
    # testskip=2 halves val/test counts
    assert len(ds.i_val) == 2 and len(ds.i_test) == 2
    assert ds.H == ds.W == 8
    # focal halves with resolution (dataloader.py:76-90)
    full = load_blender_data(tmp_path / "scene", half_res=False, testskip=2)
    np.testing.assert_allclose(ds.focal, full.focal / 2, rtol=1e-6)


def test_blender_loader_white_bkgd_compositing(tmp_path):
    write_blender_dataset(tmp_path / "scene", n_train=2, n_val=1, n_test=1, resolution=16)
    white = load_blender_data(tmp_path / "scene", white_bkgd=True)
    black = load_blender_data(tmp_path / "scene", white_bkgd=False)
    # empty-space pixels: white vs dark
    assert white.images[0, 0, 0].mean() > 0.9
    assert black.images[0, 0, 0].mean() < 0.1


def test_make_test_image_and_pixel_dataset():
    img = make_test_image(64)
    assert img.shape == (64, 64, 3)
    assert img.min() >= 0.0 and img.max() <= 1.0
    coords, colors = pixel_dataset(img)
    assert coords.shape == (64 * 64, 2) and colors.shape == (64 * 64, 3)
    assert coords.min() >= 0.0 and coords.max() <= 1.0
    # coords order matches image raster order
    np.testing.assert_allclose(colors[65], img[1, 1], rtol=1e-6)
    np.testing.assert_allclose(coords[65], [1 / 64, 1 / 64], rtol=1e-6)


def test_validate_dataset_contact_sheet(tmp_path):
    from nerf_meets_mlx_tpu.datasets.blender import validate_dataset
    import imageio.v2 as imageio

    ds = make_synthetic_scene(n_train=2, n_val=1, n_test=3, resolution=16)
    out = validate_dataset(ds, tmp_path / "sheet.png")
    img = imageio.imread(out)
    assert img.shape == (16, 3 * 16, 3)


def test_hard_scene_properties():
    """The quality-benchmark scene must be meaningfully harder than the
    blobs: sharp edges (gradient energy), real occlusion, view-consistent."""
    import numpy as np
    from nerf_meets_mlx_tpu.cameras.pose import pose_spherical
    from nerf_meets_mlx_tpu.datasets.synthetic import (
        CAMERA_ANGLE_X,
        render_gt_image,
    )

    H = W = 64
    f = 0.5 * W / np.tan(0.5 * CAMERA_ANGLE_X)
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    p = pose_spherical(30.0, -30.0, 4.0)[:3, :4]

    hard = render_gt_image(H, W, K, p, scene="hard")
    blobs = render_gt_image(H, W, K, p, scene="blobs")

    def edge_energy(img):
        rgb = img[..., :3]
        return float(
            np.abs(np.diff(rgb, axis=0)).mean() + np.abs(np.diff(rgb, axis=1)).mean()
        )

    assert edge_energy(hard) > 3.0 * edge_energy(blobs)
    assert 0.2 < float(hard[..., 3].mean()) < 0.8  # covers part of the frame
    # deterministic / view-consistent: same pose renders identically
    again = render_gt_image(H, W, K, p, scene="hard")
    np.testing.assert_array_equal(hard, again)


def test_hard_scene_via_config():
    from nerf_meets_mlx_tpu.config import lego_fast
    import dataclasses
    from nerf_meets_mlx_tpu.entrypoints.train_nerf import _load_dataset

    cfg = lego_fast()
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data, dataset_type="synthetic", synth_scene="hard",
            synth_resolution=32, synth_n_train=2, synth_n_val=1, synth_n_test=1,
        )
    )
    ds = _load_dataset(cfg)
    assert ds.images.shape == (4, 32, 32, 3)


def test_half_res_lanczos_filter(tmp_path):
    """half_res_filter="lanczos" reproduces PIL's Lanczos-3 on float data
    (the reference's exact filter, dataloader.py:76-90) and differs from
    the area filter on non-smooth content."""
    import numpy as np
    from PIL import Image

    from nerf_meets_mlx_tpu.datasets.blender import _half_res_area, _half_res_lanczos

    rng = np.random.default_rng(0)
    img = rng.uniform(size=(16, 16, 4)).astype(np.float32)
    lz = _half_res_lanczos(img)
    assert lz.shape == (8, 8, 4)
    for c in range(4):
        ref = np.asarray(
            Image.fromarray(img[..., c], "F").resize((8, 8), Image.Resampling.LANCZOS)
        )
        np.testing.assert_array_equal(lz[..., c], ref)
    area = _half_res_area(img)
    assert not np.allclose(lz, area)


def test_load_blender_half_res_filter_option(tmp_path):
    import numpy as np

    from nerf_meets_mlx_tpu.datasets.blender import load_blender_data
    from nerf_meets_mlx_tpu.datasets.synthetic import write_blender_dataset

    d = write_blender_dataset(tmp_path / "scene", resolution=16)
    ds_area = load_blender_data(d, half_res=True)
    ds_lz = load_blender_data(d, half_res=True, half_res_filter="lanczos")
    assert ds_area.images.shape == ds_lz.images.shape
    assert not np.allclose(ds_area.images, ds_lz.images)


def test_real_lego_smoke_pipeline(tmp_path):
    """tools_dev/real_lego_smoke.py: the full --data-dir pipeline (on-disk
    Blender tree -> production loader -> lego_full preset train -> eval ->
    checkpoint) works end-to-end, so a real nerf_synthetic/lego drop is a
    one-command config-4 launch (VERDICT r4 #8)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools_dev"))
    from real_lego_smoke import run_smoke

    row = run_smoke(res=24, iters=4, work_dir=str(tmp_path))
    assert row["ok"]
    assert row["ckpt_steps"] >= 1
    assert np.isfinite(row["test_psnr_mean"])

"""Native (C++) PNG batch decoder: parity vs imageio + loader integration."""

import numpy as np
import pytest

from nerf_meets_mlx_tpu.datasets.native_io import (
    load_png_batch,
    native_available,
    _load_lib,
)


def _write_pngs(tmp_path, n=4, size=16, rgba=True, seed=0):
    import imageio.v2 as imageio

    rng = np.random.default_rng(seed)
    paths = []
    for i in range(n):
        c = 4 if rgba else 3
        img = rng.integers(0, 256, (size, size, c), dtype=np.uint8)
        p = tmp_path / f"img_{i}.png"
        imageio.imwrite(p, img)
        paths.append((p, img))
    return paths


def test_native_lib_builds():
    assert native_available(), "native png loader should build in this env (g++ + zlib)"


def test_native_matches_imageio_rgba(tmp_path):
    paths = _write_pngs(tmp_path, n=6, size=20, rgba=True)
    out = load_png_batch([p for p, _ in paths])
    assert out.shape == (6, 20, 20, 4)
    for i, (_, img) in enumerate(paths):
        np.testing.assert_allclose(out[i], img.astype(np.float32) / 255.0, atol=1e-6)


def test_native_matches_imageio_rgb(tmp_path):
    paths = _write_pngs(tmp_path, n=3, size=12, rgba=False)
    out = load_png_batch([p for p, _ in paths])
    assert out.shape == (3, 12, 12, 4)
    for i, (_, img) in enumerate(paths):
        np.testing.assert_allclose(out[i, :, :, :3], img.astype(np.float32) / 255.0, atol=1e-6)
        np.testing.assert_allclose(out[i, :, :, 3], 1.0)


def test_fallback_on_corrupt_file(tmp_path):
    import imageio.v2 as imageio

    good = tmp_path / "good.png"
    imageio.imwrite(good, np.zeros((8, 8, 4), np.uint8))
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"not a png at all")
    with pytest.raises(Exception):
        load_png_batch([good, bad])  # imageio fallback also fails -> raises


def test_blender_loader_uses_native(tmp_path):
    """Loader round-trip through the native decoder still matches."""
    from nerf_meets_mlx_tpu.datasets import write_blender_dataset, load_blender_data

    write_blender_dataset(tmp_path / "scene", n_train=2, n_val=1, n_test=1, resolution=16)
    ds = load_blender_data(tmp_path / "scene")
    assert ds.images.shape == (4, 16, 16, 3)
    assert np.isfinite(ds.images).all()
    assert 0.0 <= ds.images.min() and ds.images.max() <= 1.0

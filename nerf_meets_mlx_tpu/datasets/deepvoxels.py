"""DeepVoxels dataset loader (armchair / cube / greek / vase captures).

The reference carries only the flags — ``--dataset_type deepvoxels``,
``--shape``, and a testskip note (/root/reference/mlx_nerf/config_parser.py:
53-57) — with no loader behind them (its only loader is the Blender one).
This module supplies the capability for the published DeepVoxels layout:

    basedir/
      train/<shape>/       intrinsics.txt  pose/*.txt  rgb/*.png
      validation/<shape>/  ...
      test/<shape>/        ...

* ``intrinsics.txt``: first line ``f cx cy 0.`` (pixels, at the stored
  resolution); later lines (barycenter, near plane, scale, H W) are allowed
  and ignored.
* ``pose/*.txt``: 16 whitespace-separated floats, a row-major 4x4
  camera-to-world matrix in the OpenCV convention (x right, y down,
  z forward). NeRF wants [right, up, back], so columns 1 and 2 negate.
* Cameras sit on an upper hemisphere around the object; sampling bounds
  follow from the mean camera distance R: near = R - 1, far = R + 1
  (the DeepVoxels scenes are normalized to fit a unit-scale volume).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np

from nerf_meets_mlx_tpu.cameras.pose import orbit_poses


@dataclasses.dataclass
class DeepVoxelsDataset:
    images: np.ndarray        # [N, H, W, 3] float32 in [0, 1]
    poses: np.ndarray         # [N, 4, 4] float32, NeRF convention
    render_poses: np.ndarray  # [n_render, 4, 4] hemisphere orbit
    H: int
    W: int
    focal: float
    i_train: np.ndarray
    i_val: np.ndarray
    i_test: np.ndarray
    near: float
    far: float

    @property
    def K(self) -> np.ndarray:
        return np.array(
            [
                [self.focal, 0, 0.5 * self.W],
                [0, self.focal, 0.5 * self.H],
                [0, 0, 1],
            ],
            dtype=np.float32,
        )


def _cv_to_nerf(c2w: np.ndarray) -> np.ndarray:
    """OpenCV [right, down, forward] -> NeRF [right, up, back]: negate the
    y and z basis columns (a pure rotation-frame relabel, positions keep)."""
    out = c2w.copy()
    out[:3, 1] *= -1.0
    out[:3, 2] *= -1.0
    return out


def _load_split(split_dir: Path, skip: int = 1):
    pose_files = sorted((split_dir / "pose").glob("*.txt"))[::skip]
    img_files = sorted(
        p for p in (split_dir / "rgb").iterdir()
        if p.suffix.lower() in (".png", ".jpg", ".jpeg")
    )[::skip]
    if len(pose_files) != len(img_files):
        raise ValueError(
            f"{split_dir}: {len(pose_files)} poses vs {len(img_files)} images"
        )
    poses = np.stack(
        [np.loadtxt(p, dtype=np.float64).reshape(4, 4) for p in pose_files]
    )

    from nerf_meets_mlx_tpu.datasets.native_io import load_png_batch

    if all(p.suffix.lower() == ".png" for p in img_files):
        images = load_png_batch(img_files)
    else:
        import imageio.v2 as imageio

        images = np.stack(
            [np.asarray(imageio.imread(p), np.float32) / 255.0 for p in img_files]
        )
    if images.shape[-1] == 4:
        images = images[..., :3]
    return images.astype(np.float32), poses


def load_deepvoxels_data(
    basedir: str | Path,
    shape: str = "greek",
    testskip: int = 8,
    n_render_poses: int = 120,
) -> DeepVoxelsDataset:
    """Load a DeepVoxels object (reference flag --shape,
    config_parser.py:57) from the published train/validation/test layout."""
    basedir = Path(basedir)
    splits = {}
    for mode, skip in (("train", 1), ("validation", testskip), ("test", testskip)):
        splits[mode] = _load_split(basedir / mode / shape, max(1, skip))

    # intrinsics are shared across splits; stored at the training resolution
    line = (basedir / "train" / shape / "intrinsics.txt").read_text().split("\n")[0]
    focal, cx, cy = [float(v) for v in line.split()[:3]]

    images = np.concatenate([splits[m][0] for m in ("train", "validation", "test")])
    poses_cv = np.concatenate([splits[m][1] for m in ("train", "validation", "test")])
    poses = np.stack([_cv_to_nerf(p) for p in poses_cv]).astype(np.float32)

    counts = np.cumsum(
        [0] + [len(splits[m][0]) for m in ("train", "validation", "test")]
    )
    i_train = np.arange(counts[0], counts[1])
    i_val = np.arange(counts[1], counts[2])
    i_test = np.arange(counts[2], counts[3])

    H, W = images.shape[1:3]
    # stored intrinsics may describe a different resolution than the PNGs
    # (the published set stores 512x512 intrinsics with same-size images;
    # scale defensively in case of pre-downsampled copies)
    stored = 2.0 * cy if cy > 0 else H
    focal = focal * (H / stored)

    radius = float(np.linalg.norm(poses[i_train, :3, 3], axis=-1).mean())
    near, far = radius - 1.0, radius + 1.0

    render_poses = np.asarray(
        orbit_poses(n_render_poses, phi=-30.0, radius=radius)
    ).astype(np.float32)

    return DeepVoxelsDataset(
        images=np.ascontiguousarray(images),
        poses=poses,
        render_poses=render_poses,
        H=int(H),
        W=int(W),
        focal=float(focal),
        i_train=i_train,
        i_val=i_val,
        i_test=i_test,
        near=near,
        far=far,
    )

"""Sweep fused_train rays_block at the flagship's level shapes (S=64
coarse / S=192 fine, B=4096) on the real TPU — larger blocks amortize
per-grid-step overhead now that the scoped-VMEM cap can be raised.

Usage: python tools_dev/rays_block_sweep.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    return (time.perf_counter() - t0) / n * 1000


def main():
    from nerf_meets_mlx_tpu.config import lego_hierarchical
    from nerf_meets_mlx_tpu.kernels.fused_mlp import FusedMLPSpec, pack_params
    from nerf_meets_mlx_tpu.kernels.fused_train import (
        TrainSpec, fused_train_apply, pack_inputs_train,
    )
    from nerf_meets_mlx_tpu.models import create_nerf

    cfg = lego_hierarchical().replace(use_fused_kernel=True)
    model = create_nerf(cfg)
    params = model.init(jax.random.PRNGKey(0))
    spec = FusedMLPSpec.from_configs(
        cfg.mlp, cfg.pos_encoding, cfg.dir_encoding, compute_dx=False
    )
    packed = pack_params(spec, params["coarse"])
    B = 4096
    rng = np.random.default_rng(0)

    for S, blocks in ((64, (8, 16, 32)), (192, (2, 5, 10))):
        pts = jnp.asarray(rng.normal(size=(B, S, 3)), jnp.float32)
        dirs = jnp.asarray(rng.normal(size=(B, 3)), jnp.float32)
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        deltas = jnp.asarray(rng.uniform(0.01, 0.1, size=(B, S)), jnp.float32)
        nz = jnp.zeros((B, S), jnp.float32)
        target = jnp.asarray(rng.uniform(size=(B, 3)), jnp.float32)
        x = pack_inputs_train(pts, dirs, deltas, nz)
        for rb in blocks:
            tspec = TrainSpec(
                n_samples=S, rays_block=rb, n_rays=B, mode="reference",
                density_activation="softplus", white_bkgd=True,
            )

            def f(packed, x):
                sse, rgb, wts = fused_train_apply(spec, tspec, packed, x, target)
                return sse

            try:
                t = timeit(jax.jit(f), packed, x)
                print(f"[rbsweep] S={S} rays_block={rb} (RBS={rb*S}): {t:.2f}ms",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"[rbsweep] S={S} rays_block={rb}: FAILED "
                      f"{str(e).splitlines()[0][:120]}", flush=True)


if __name__ == "__main__":
    main()

"""Measure per-Pallas-launch fixed overhead inside one jit on this
platform, and the XLA glue cost of the ingp step's non-kernel ops.

Usage: python tools_dev/launch_overhead_probe.py
"""

from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, n=30, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    return (time.perf_counter() - t0) / n * 1000


def tiny_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] + 1.0


def chain(k, x):
    for _ in range(k):
        x = pl.pallas_call(
            tiny_kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
    return x


def main():
    x = jnp.ones((256, 256), jnp.float32)
    for k in (1, 2, 4, 8, 16):
        t = timeit(jax.jit(partial(chain, k)), x)
        print(f"[probe] {k} tiny pallas launches in one jit: {t:.2f}ms "
              f"({t / k:.2f} ms/launch)", flush=True)

    # XLA glue of the ingp step front (no networks): ray sampling, z
    # sampling, importance resample, input packing for both levels
    from nerf_meets_mlx_tpu.config import lego_ingp
    from nerf_meets_mlx_tpu.engine.trainer import sample_train_rays
    from nerf_meets_mlx_tpu.models import create_nerf
    from nerf_meets_mlx_tpu.sampling.importance import merge_z, sample_pdf
    from nerf_meets_mlx_tpu.kernels.fused_feat_train import pack_feat_inputs
    from nerf_meets_mlx_tpu.encoding.spherical_harmonics import sh_encode
    import dataclasses as dc

    cfg = lego_ingp()
    cfg = cfg.replace(train=dc.replace(cfg.train, precrop_iters=0))
    model = create_nerf(cfg)
    H = W = 400
    focal = 0.5 * W / np.tan(0.5 * 0.6911112070083618)
    K = np.array([[focal, 0, 0.5 * W], [0, focal, 0.5 * H], [0, 0, 1]], np.float32)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(4, H, W, 3)), jnp.float32)
    poses = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None, :3, :4], (4, 1, 1))
    poses = poses.at[:, 2, 3].set(4.0)
    rcfg = cfg.render

    def front(key):
        rays_o, rays_d, target, k_render = sample_train_rays(
            cfg, 0, images, poses, K, H, W, cfg.train.n_rand, key
        )
        viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        z = model._coarse_z(rays_o, rays_d, k_render, True, None, True)
        dnorm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        sh = sh_encode(viewdirs, 4)
        w = jax.random.uniform(k_render, z.shape)
        z_imp = sample_pdf(k_render, z, w, rcfg.n_importance, deterministic=False)
        z_all = merge_z(z, z_imp)

        outs = []
        for zz in (z, z_all):
            pts = rays_o[..., None, :] + zz[..., :, None] * rays_d[..., None, :]
            deltas = jnp.concatenate(
                [zz[:, 1:] - zz[:, :-1], jnp.full_like(zz[:, :1], 1e10)], -1
            ) * dnorm
            feats = jnp.zeros(pts.shape[:-1] + (16,), jnp.float32)
            outs.append(pack_feat_inputs(feats, sh, deltas, jnp.zeros_like(zz)))
        return outs

    t = timeit(jax.jit(front), jax.random.PRNGKey(0))
    print(f"[probe] ingp step front (sampling+packing, no nets): {t:.2f}ms",
          flush=True)


if __name__ == "__main__":
    main()

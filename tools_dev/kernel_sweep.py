"""Sweep fused-kernel block sizes / dtype on the fine-batch workload."""
from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from nerf_meets_mlx_tpu.config import EncodingConfig, MLPConfig
from nerf_meets_mlx_tpu.kernels.fused_mlp import (
    FusedMLPSpec, fused_apply, pack_inputs, pack_params,
)
from nerf_meets_mlx_tpu.models import init_nerf_mlp


def measure(block, bwd_block, dtype="float32", n=4096 * 192):
    mlp = MLPConfig(net_depth=8, net_width=256, skips=(4,), compute_dtype=dtype)
    pos = EncodingConfig(kind="sinusoidal", in_dim=3, n_freqs=10, include_input=True)
    dir_ = EncodingConfig(kind="sinusoidal", in_dim=3, n_freqs=4, include_input=True)
    spec = FusedMLPSpec.from_configs(mlp, pos, dir_, block=block, compute_dx=False)
    spec = dataclasses.replace(spec, bwd_block=bwd_block)
    params = init_nerf_mlp(jax.random.PRNGKey(0), mlp, pos.out_dim, dir_.out_dim)

    kp, kd = jax.random.split(jax.random.PRNGKey(1))
    pts = jax.random.normal(kp, (n, 1, 3))
    dirs = jax.random.normal(kd, (n, 3))
    x = pack_inputs(pts, dirs)

    fwd = jax.jit(lambda p, x: fused_apply(spec, pack_params(spec, p), x))
    grad = jax.jit(jax.grad(lambda p, x: jnp.sum(fused_apply(spec, pack_params(spec, p), x)[:, :4] ** 2)))

    def time_it(f, *a):
        o = f(*a)
        float(jax.tree_util.tree_leaves(o)[0].ravel()[0])
        t0 = time.perf_counter()
        for _ in range(10):
            o = f(*a)
        float(jax.tree_util.tree_leaves(o)[0].ravel()[0])
        return (time.perf_counter() - t0) / 10

    tf = time_it(fwd, params, x)
    tg = time_it(grad, params, x)
    print(f"block={block:5d}/{bwd_block:4d} {dtype:8s}: fwd {tf*1e3:6.2f} ms   grad {tg*1e3:6.2f} ms")


if __name__ == "__main__":
    import sys
    args = sys.argv[1:]
    if args:
        measure(int(args[0]), int(args[1]), args[2] if len(args) > 2 else "float32")
    else:
        for b, bb in [(1024, 512), (2048, 512), (1024, 1024), (2048, 1024), (4096, 2048), (512, 256)]:
            try:
                measure(b, bb)
            except Exception as e:  # noqa
                print(f"block={b}/{bb}: FAILED {type(e).__name__}: {str(e)[:100]}")

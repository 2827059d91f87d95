"""Bisect the lego_ingp fused train step: loss fwd only, value_and_grad,
+optimizer — to find where the step's unaccounted ~50 ms lives.

Usage: python tools_dev/step_bisect_probe.py
"""

from __future__ import annotations

import dataclasses as dc
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax


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
    from nerf_meets_mlx_tpu.config import lego_ingp
    from nerf_meets_mlx_tpu.engine.train_state import make_optimizer
    from nerf_meets_mlx_tpu.engine.trainer import nerf_loss_fn
    from nerf_meets_mlx_tpu.models import create_nerf

    cfg = lego_ingp().replace(
        use_fused_kernel=True,
        train=dc.replace(lego_ingp().train, precrop_iters=0),
    )
    model = create_nerf(cfg)
    params = model.init(jax.random.PRNGKey(0))
    B = 4096
    rng = np.random.default_rng(0)
    rays_o = jnp.asarray(rng.normal(size=(B, 3)), jnp.float32)
    rays_o = rays_o.at[:, 2].add(4.0)
    rays_d = jnp.asarray(rng.normal(size=(B, 3)), jnp.float32)
    target = jnp.asarray(rng.uniform(size=(B, 3)), jnp.float32)
    key = jax.random.PRNGKey(1)

    for fused in (True, False):
        def loss(p):
            l, aux = nerf_loss_fn(
                model, p, rays_o, rays_d, target, key, fused_train=fused
            )
            return l

        t_f = timeit(jax.jit(loss), params)
        t_g = timeit(jax.jit(jax.value_and_grad(loss)), params)
        print(f"[probe] fused={fused}: loss_fwd={t_f:.1f}ms "
              f"value_and_grad={t_g:.1f}ms", flush=True)

    # optimizer alone
    tx = make_optimizer(cfg.train)
    opt_state = tx.init(params)
    g = jax.tree_util.tree_map(jnp.ones_like, params)

    def opt(os, g, p):
        u, os2 = tx.update(g, os, p)
        return optax.apply_updates(p, u), os2

    t_o = timeit(jax.jit(opt), opt_state, g, params)
    print(f"[probe] optimizer update alone: {t_o:.1f}ms", flush=True)


if __name__ == "__main__":
    main()

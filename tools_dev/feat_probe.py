"""Per-component timing of the lego_ingp train step on the real TPU:
hash encode fwd / fwd+bwd, the fused feat-train kernel, and the full step
through both paths. Informs the round-4 INGP fusion work (VERDICT #1).

Usage: python tools_dev/feat_probe.py
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
    return (time.perf_counter() - t0) / n * 1000  # ms


def main():
    from nerf_meets_mlx_tpu.config import lego_ingp
    from nerf_meets_mlx_tpu.encoding.hash_grid import HashGridEncoding
    from nerf_meets_mlx_tpu.kernels.hash_encode import (
        HashEncodeSpec, hash_encode, pack_tables,
    )
    from nerf_meets_mlx_tpu.kernels.fused_feat_train import (
        FeatMLPSpec, TrainSpec, feat_rays_block, fused_feat_train_apply,
        pack_feat_inputs, pack_feat_params,
    )
    from nerf_meets_mlx_tpu.models import create_nerf
    from nerf_meets_mlx_tpu.models.nerf_mlp import init_nerf_mlp

    cfg = lego_ingp().replace(use_fused_kernel=True)
    model = create_nerf(cfg)
    enc = model.pos_enc
    params = model.init(jax.random.PRNGKey(0))

    B = 4096
    rng = np.random.default_rng(0)

    for S, lvl in ((48, "coarse"), (96, "fine")):
        N = B * S
        pts = jnp.asarray(rng.uniform(-1.2, 1.2, size=(N, 8)), jnp.float32)
        spec = HashEncodeSpec.from_encoding(enc)
        g = pack_tables(spec, params["pos_enc"]["tables"])

        f_fwd = jax.jit(lambda g, x: hash_encode(spec, g, x))
        t_fwd = timeit(f_fwd, g, pts)

        def fwd_bwd(g, x):
            out, vjp = jax.vjp(lambda gg: hash_encode(spec, gg, x), g)
            (dg,) = vjp(jnp.ones_like(out))
            return dg

        t_fb = timeit(jax.jit(fwd_bwd), g, pts)

        # fused feat kernel at the level's shapes
        P, D = enc.out_dim, model.dir_enc.out_dim
        fspec = FeatMLPSpec.from_configs(cfg.mlp, P, D)
        tspec = TrainSpec(
            n_samples=S, rays_block=feat_rays_block(S), n_rays=B,
            mode=cfg.render.compositing,
            density_activation=cfg.render.density_activation,
            white_bkgd=cfg.render.white_bkgd,
        )
        feats = jnp.asarray(rng.normal(size=(B, S, P)), jnp.float32)
        sh = jnp.asarray(rng.normal(size=(B, D)), jnp.float32)
        deltas = jnp.asarray(rng.uniform(0.01, 0.1, size=(B, S)), jnp.float32)
        nz = jnp.zeros((B, S), jnp.float32)
        target = jnp.asarray(rng.uniform(size=(B, 3)), jnp.float32)
        packed = pack_feat_params(fspec, params[lvl])
        x = pack_feat_inputs(feats, sh, deltas, nz)

        def feat_apply(packed, x):
            sse, rgb, wts = fused_feat_train_apply(fspec, tspec, packed, x, target)
            return sse

        t_feat = timeit(jax.jit(feat_apply), packed, x)

        # feat kernel under grad (same launch count — custom VJP reuses)
        def feat_grad(p, feats):
            xx = pack_feat_inputs(feats, sh, deltas, nz)
            sse, _, _ = fused_feat_train_apply(
                fspec, tspec, pack_feat_params(fspec, p), xx, target
            )
            return sse

        t_featg = timeit(jax.jit(jax.grad(feat_grad, argnums=(0, 1))), params[lvl], feats)

        print(
            f"[probe] S={S}: encode_fwd={t_fwd:.1f}ms encode_fwd+bwd={t_fb:.1f}ms "
            f"feat_kernel={t_feat:.1f}ms feat_kernel_grad={t_featg:.1f}ms",
            flush=True,
        )

    # full step, both paths
    from nerf_meets_mlx_tpu.engine.train_state import create_train_state
    from nerf_meets_mlx_tpu.engine.trainer import make_nerf_train_step
    import dataclasses as dc

    H = W = 400
    focal = 0.5 * W / np.tan(0.5 * 0.6911112070083618)
    images = jnp.asarray(rng.uniform(size=(4, H, W, 3)), jnp.float32)
    poses = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None, :3, :4], (4, 1, 1))
    poses = poses.at[:, 2, 3].set(4.0)

    for ft in (True, False):
        c = cfg.replace(
            use_fused_train=ft,
            train=dc.replace(cfg.train, precrop_iters=0),
        )
        m = create_nerf(c)
        state = create_train_state(m.init(jax.random.PRNGKey(0)), c.train)
        step = make_nerf_train_step(m, H, W, focal)
        key = jax.random.PRNGKey(0)

        def run(state):
            s, aux = step(state, images, poses, key)
            return s, aux

        for _ in range(3):
            state, aux = run(state)
        float(aux["loss"])
        t0 = time.perf_counter()
        for _ in range(20):
            state, aux = run(state)
        float(aux["loss"])
        dt = (time.perf_counter() - t0) / 20 * 1000
        print(f"[probe] full step fused_train={ft}: {dt:.1f}ms "
              f"({4096 / dt * 1000:.0f} rays/s)", flush=True)


if __name__ == "__main__":
    main()

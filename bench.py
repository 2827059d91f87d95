"""Benchmark harness: train-step throughput (rays/sec/chip, fwd+bwd).

Measures the fused hierarchical train step (coarse 64 + fine 192-sample
passes, importance resampling, grads, Adam) at the reference's run-defining
batch of N_rand=4096 rays — the workload BASELINE.md targets.

Prints ONE JSON line:
  {"metric": "train_rays_per_sec", "value": N, "unit": "rays/s", "vs_baseline": R}

The reference publishes no throughput numbers (BASELINE.md: "none
published"), so ``vs_baseline`` reports speedup vs this framework's own
unfused-XLA fp32 baseline recorded in bench_baseline.json (33,892 rays/s,
TPU v5e-1, 2026-08-17 — measured from this same harness with
fused=False before the Pallas kernel and the gather-free sampler landed).
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def make_bench_setup(n_rand: int = 4096, fused: bool = True):
    from nerf_meets_mlx_tpu.config import lego_hierarchical
    from nerf_meets_mlx_tpu.engine.train_state import create_train_state
    from nerf_meets_mlx_tpu.engine.trainer import make_nerf_train_step
    from nerf_meets_mlx_tpu.models import create_nerf

    cfg = lego_hierarchical()
    cfg = cfg.replace(
        train=dataclasses.replace(cfg.train, n_rand=n_rand),
        use_fused_kernel=fused and jax.default_backend() == "tpu",
    )
    model = create_nerf(cfg)
    H = W = 400
    focal = 0.5 * W / np.tan(0.5 * 0.6911112070083618)
    step = make_nerf_train_step(model, H, W, focal)
    state = create_train_state(model.init(jax.random.PRNGKey(0)), cfg.train)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(8, H, W, 3)), jnp.float32)
    poses = jnp.asarray(
        np.stack(
            [np.eye(4, dtype=np.float32)[:3] for _ in range(8)]
        )
    )
    # look-from-distance poses so rays traverse the scene volume
    poses = poses.at[:, 2, 3].set(4.0)
    return step, state, images, poses, n_rand


def bench_train_step(n_warmup: int = 5, n_iters: int = 50, n_rand: int = 4096) -> float:
    step, state, images, poses, n_rand = make_bench_setup(n_rand)
    key = jax.random.PRNGKey(0)
    for _ in range(n_warmup):
        state, aux = step(state, images, poses, key)
    # force a device->host transfer as the barrier: on the tunneled
    # experimental platform block_until_ready alone is not a reliable fence
    float(aux["loss"])
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, aux = step(state, images, poses, key)
    float(aux["loss"])
    dt = time.perf_counter() - t0
    return n_rand * n_iters / dt


def main():
    rays_per_sec = bench_train_step()

    baseline_path = Path(__file__).parent / "bench_baseline.json"
    if baseline_path.exists():
        baseline = json.loads(baseline_path.read_text())["train_rays_per_sec"]
    else:
        baseline = rays_per_sec
        baseline_path.write_text(json.dumps({"train_rays_per_sec": rays_per_sec}))

    print(
        json.dumps(
            {
                "metric": "train_rays_per_sec",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

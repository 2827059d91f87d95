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


def make_bench_setup(
    n_rand: int = 4096,
    fused: bool = True,
    preset: str = "lego_hierarchical",
    n_inner: int = 1,
):
    from nerf_meets_mlx_tpu.config import PRESETS
    from nerf_meets_mlx_tpu.engine.train_state import create_train_state
    from nerf_meets_mlx_tpu.engine.trainer import make_nerf_train_step
    from nerf_meets_mlx_tpu.models import create_nerf

    cfg = PRESETS[preset]()
    cfg = cfg.replace(
        train=dataclasses.replace(cfg.train, n_rand=n_rand, precrop_iters=0),
        use_fused_kernel=(
            fused and jax.default_backend() == "tpu"
            and cfg.pos_encoding.kind in ("sinusoidal", "hash_grid", "cp_grid")
        ),
    )
    model = create_nerf(cfg)
    H = W = 400
    focal = 0.5 * W / np.tan(0.5 * 0.6911112070083618)
    step = make_nerf_train_step(model, H, W, focal, n_inner=n_inner)
    occ = None
    if cfg.render.occupancy:
        from nerf_meets_mlx_tpu.acceleration.occupancy import init_occupancy_grid

        occ = init_occupancy_grid(cfg.render.occ_resolution)
    state = create_train_state(model.init(jax.random.PRNGKey(0)), cfg.train, occ)
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


def bench_train_step(
    n_warmup: int = 5, n_iters: int = 50, n_rand: int = 4096,
    preset: str = "lego_hierarchical", n_inner: int = 1,
) -> float:
    """Returns train rays/sec. With n_inner > 1 each dispatch advances
    n_inner optimizer steps via the trainer's lax.scan step batching
    (same training semantics; amortizes the tunnel's per-execution gap)."""
    n_inner = max(1, n_inner)  # --inner 0/negative would break the ceil-divs
    step, state, images, poses, n_rand = make_bench_setup(
        n_rand, preset=preset, n_inner=n_inner
    )
    key = jax.random.PRNGKey(0)
    n_warmup = -(-n_warmup // n_inner)
    n_calls = -(-n_iters // n_inner)
    for _ in range(n_warmup):
        state, aux = step(state, images, poses, key)
    # force a device->host transfer as the barrier: on the tunneled
    # experimental platform block_until_ready alone is not a reliable fence
    float(aux["loss"])
    t0 = time.perf_counter()
    for _ in range(n_calls):
        state, aux = step(state, images, poses, key)
    float(aux["loss"])
    dt = time.perf_counter() - t0
    return n_rand * n_calls * n_inner / dt


def bench_scaling(n_devices: int = 0, rays_per_device: int = 4096, n_iters: int = 30):
    """Weak-scaling efficiency: sharded step at 1 device vs N devices with
    rays_per_device held constant (BASELINE.md scaling metric). Intended for
    real TPU meshes; off-TPU it automatically shrinks the workload so the
    virtual CPU mesh finishes in seconds (mechanical validation only — the
    correctness of the sharded program is covered by tests/test_parallel.py).
    Prints one JSON line with efficiency = T1 / TN."""
    import jax

    if jax.default_backend() != "tpu":
        rays_per_device = min(rays_per_device, 64)
        n_iters = min(n_iters, 3)

    from nerf_meets_mlx_tpu.config import lego_hierarchical
    from nerf_meets_mlx_tpu.engine.train_state import create_train_state
    from nerf_meets_mlx_tpu.models import create_nerf
    from nerf_meets_mlx_tpu.parallel import (
        make_mesh,
        make_sharded_nerf_train_step,
        replicate_state,
    )
    import jax.numpy as jnp

    n_devices = n_devices or len(jax.devices())
    cfg = lego_hierarchical().replace(
        use_fused_kernel=jax.default_backend() == "tpu"
    )
    model = create_nerf(cfg)
    H = W = 400
    focal = 0.5 * W / np.tan(0.5 * 0.6911112070083618)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(4, H, W, 3)), jnp.float32)
    poses = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None, :3, :4], (4, 1, 1))
    poses = poses.at[:, 2, 3].set(4.0)

    def measure(nd):
        mesh = make_mesh(nd)
        step = make_sharded_nerf_train_step(
            model, H, W, focal, mesh, n_rand_per_device=rays_per_device
        )
        state = replicate_state(
            create_train_state(model.init(jax.random.PRNGKey(0)), cfg.train), mesh
        )
        key = jax.random.PRNGKey(0)
        for _ in range(3):
            state, aux = step(state, images, poses, key)
        float(aux["loss"])
        t0 = time.perf_counter()
        for _ in range(n_iters):
            state, aux = step(state, images, poses, key)
        float(aux["loss"])
        dt = (time.perf_counter() - t0) / n_iters
        return rays_per_device * nd / dt, dt

    rps1, t1 = measure(1)
    rpsN, tN = measure(n_devices)
    efficiency = t1 / tN  # weak scaling: perfect => same step time
    line = {
        "metric": "weak_scaling_efficiency",
        "value": round(efficiency, 4),
        "unit": f"T1/T{n_devices} (rays/device={rays_per_device})",
        "vs_baseline": round(rpsN / max(rps1, 1e-9) / n_devices, 4),
    }
    # durable artifact for the scaling row (BASELINE.md: >=90% 1 host -> N)
    artifact = {
        **line,
        "backend": jax.default_backend(),
        # off-TPU the N "devices" are one host's cores time-sliced, so the
        # measured efficiency is structurally << 1; the artifact then only
        # records that the sharded program compiles and runs end-to-end
        # (BASELINE.md's >=90% target needs a real multi-chip mesh)
        "note": (
            "real-mesh weak scaling"
            if jax.default_backend() == "tpu"
            else "virtual mesh (host cores time-sliced): mechanical "
            "validation only, efficiency not meaningful off-TPU"
        ),
        "n_devices": n_devices,
        "rays_per_device": rays_per_device,
        "step_ms_1dev": round(t1 * 1000, 3),
        "step_ms_ndev": round(tN * 1000, 3),
        "rays_per_sec_1dev": round(rps1, 1),
        "rays_per_sec_ndev": round(rpsN, 1),
    }
    (Path(__file__).parent / "SCALING.json").write_text(json.dumps(artifact, indent=1))
    print(json.dumps(line))


def main():
    import sys

    if "--scaling" in sys.argv:
        bench_scaling()
        return
    preset = "lego_hierarchical"
    if "--preset" in sys.argv:  # e.g. --preset lego_occ: accelerated configs
        preset = sys.argv[sys.argv.index("--preset") + 1]
    n_inner = 1
    if "--inner" in sys.argv:  # lax.scan step batching (trainer n_inner)
        n_inner = int(sys.argv[sys.argv.index("--inner") + 1])
    rays_per_sec = bench_train_step(preset=preset, n_inner=n_inner)

    baseline_path = Path(__file__).parent / "bench_baseline.json"
    if baseline_path.exists():
        baseline = json.loads(baseline_path.read_text())["train_rays_per_sec"]
    else:
        baseline = rays_per_sec
        baseline_path.write_text(json.dumps({"train_rays_per_sec": rays_per_sec}))

    metric = (
        "train_rays_per_sec"
        if preset == "lego_hierarchical"
        else f"train_rays_per_sec[{preset}]"
    )
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(rays_per_sec, 1),
                # vs_baseline is always against the same unfused-XLA
                # reference-workload baseline (bench_baseline.json)
                "vs_baseline": round(rays_per_sec / baseline, 3),
                "unit": "rays/s",
            }
        )
    )


if __name__ == "__main__":
    main()

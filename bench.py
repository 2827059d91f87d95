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
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def make_bench_setup(
    n_rand: int = 4096,
    fused: bool = True,
    preset: str = "lego_hierarchical",
    n_inner: int = 1,
    config_txt: Optional[str] = None,
):
    from nerf_meets_mlx_tpu.config import PRESETS, config_from_text
    from nerf_meets_mlx_tpu.engine.train_state import create_train_state
    from nerf_meets_mlx_tpu.engine.trainer import make_nerf_train_step
    from nerf_meets_mlx_tpu.models import create_nerf

    cfg = PRESETS[preset]()
    if config_txt:
        cfg = config_from_text(config_txt, base=cfg)
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
    config_txt: Optional[str] = None,
) -> float:
    """Returns train rays/sec. With n_inner > 1 each dispatch advances
    n_inner optimizer steps via the trainer's lax.scan step batching
    (same training semantics; amortizes the tunnel's per-execution gap)."""
    n_inner = max(1, n_inner)  # --inner 0/negative would break the ceil-divs
    step, state, images, poses, n_rand = make_bench_setup(
        n_rand, preset=preset, n_inner=n_inner, config_txt=config_txt
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


def model_flops_per_step(cfg) -> Optional[float]:
    """Analytic MODEL FLOPs of one train step (fwd + backward ~= 3x fwd),
    counting the MLP GEMM math at logical dims for both levels over the
    n_rand ray batch. Returns None for learned-table encodings (hash/CP):
    their lookups are memory ops, not model FLOPs — an "MFU" there would
    be structurally near-zero and misleading."""
    from nerf_meets_mlx_tpu.models import create_nerf

    if cfg.pos_encoding.kind != "sinusoidal":
        return None
    model = create_nerf(cfg)
    in_dim = model.pos_enc.out_dim
    dir_dim = model.dir_enc.out_dim if model.dir_enc is not None else 0

    def point_macs(mlp):
        W, D = mlp.net_width, mlp.net_depth
        macs = in_dim * W
        for j in range(1, D):
            macs += W * W + (in_dim * W if (j - 1) in mlp.skips else 0)
        if mlp.use_viewdirs:
            macs += W * 1 + W * W + (W + dir_dim) * (W // 2) + (W // 2) * 3
        else:
            macs += W * mlp.out_channels
        return macs

    rcfg = cfg.render
    B = cfg.train.n_rand
    pts_c = B * rcfg.n_samples
    pts_f = B * (rcfg.n_samples + rcfg.n_importance) if rcfg.n_importance else 0
    fine_mlp = cfg.mlp_fine or cfg.mlp
    fwd = pts_c * point_macs(cfg.mlp) + pts_f * point_macs(fine_mlp)
    return 3.0 * 2.0 * fwd  # fwd + bwd(2x), MACs -> FLOPs


# measured GEMM rate of this chip (f32 == bf16, tools_dev/mxu_probe.py;
# docs/DESIGN.md "Round 2") — the denominator for MFU
MEASURED_PEAK_FLOPS = 147e12


def bench_phases(cfg, n_rand: int = 4096) -> Optional[dict]:
    """Per-level kernel times at the bench shapes: one fused-train launch
    for the coarse and fine levels with synthetic inputs. Only for the
    sinusoidal fused path (the flagship workload). ``cfg`` is the SAME
    (overlay-applied) config the throughput run used, so a --config-txt
    variant can't pair its rays/s with the unmodified preset's phases."""
    from nerf_meets_mlx_tpu.kernels.fused_mlp import FusedMLPSpec, pack_params
    from nerf_meets_mlx_tpu.kernels.fused_train import (
        TrainSpec, default_group, default_rays_block, fused_train_apply,
    )
    from nerf_meets_mlx_tpu.models import create_nerf

    if cfg.pos_encoding.kind != "sinusoidal" or jax.default_backend() != "tpu":
        return None
    model = create_nerf(cfg.replace(use_fused_kernel=True))
    params = model.init(jax.random.PRNGKey(0))
    spec = FusedMLPSpec.from_configs(
        cfg.mlp, cfg.pos_encoding, cfg.dir_encoding, compute_dx=False
    )
    rng = np.random.default_rng(0)
    out = {}
    levels = [("coarse_ms", cfg.render.n_samples, "coarse")]
    if cfg.render.n_importance:
        levels.append(
            ("fine_ms", cfg.render.n_samples + cfg.render.n_importance,
             "fine" if cfg.mlp_fine is not None else "coarse")
        )
    for name, S, level in levels:
        rays_o = jnp.asarray(rng.normal(size=(n_rand, 3)), jnp.float32)
        dirs = jnp.asarray(rng.normal(size=(n_rand, 3)), jnp.float32)
        viewdirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        z = jnp.sort(
            jnp.asarray(rng.uniform(0.5, 4.0, size=(n_rand, S)), jnp.float32),
            axis=-1,
        )
        deltas = jnp.asarray(rng.uniform(0.01, 0.1, size=(n_rand, S)), jnp.float32)
        nz = jnp.zeros((n_rand, S), jnp.float32)
        target = jnp.asarray(rng.uniform(size=(n_rand, 3)), jnp.float32)
        rb = default_rays_block(S)
        tspec = TrainSpec(
            n_samples=S, rays_block=rb, n_rays=n_rand,
            mode=cfg.render.compositing,
            density_activation=cfg.render.density_activation,
            white_bkgd=cfg.render.white_bkgd,
            group=default_group(S, rb),
        )
        packed = pack_params(spec, params[level])

        # device-true time: chain the calls through a lax.scan inside one
        # jit (per-dispatch overhead on the tunneled platform is 0.3-1.9 ms
        # per call — r5; a 20-dispatch loop overstates kernel time by it)
        def one(carry, _):
            p0 = [packed[0] + carry * 0.0] + list(packed[1:])
            sse, _, _ = fused_train_apply(
                spec, tspec, p0, rays_o, dirs, viewdirs, z, deltas, nz, target
            )
            return sse * 1e-30, ()

        n_chain = 20

        def chain():
            s, _ = jax.lax.scan(one, jnp.float32(0.0), None, length=n_chain)
            return s

        jf = jax.jit(chain)
        for _ in range(2):
            r = jf()
        float(r)
        t0 = time.perf_counter()
        r = jf()
        float(r)
        out[name] = round((time.perf_counter() - t0) / n_chain * 1000, 2)
    return out


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
    on_tpu = jax.default_backend() == "tpu"
    line = {
        "metric": "weak_scaling_efficiency",
        # off-TPU the N "devices" are one host's cores time-sliced: the
        # ratio is noise, and publishing it as `value` invites a consumer
        # to read it as a measurement — null means "ran, not meaningful"
        "value": round(efficiency, 4) if on_tpu else None,
        "unit": f"T1/T{n_devices} (rays/device={rays_per_device})",
        "vs_baseline": round(rpsN / max(rps1, 1e-9) / n_devices, 4) if on_tpu else None,
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


def bench_sweep(preset: str = "lego_hierarchical"):
    """Single-chip weak-scaling sweep: rays/s vs per-device batch size —
    the curve that determines where per-chip batch sizes land on a pod
    (BASELINE.md's >=90% target needs the knee to sit left of the chosen
    n_rand/device). Writes SWEEP.json and prints one JSON line."""
    points = []
    for n_rand in (1024, 2048, 4096, 8192, 16384, 32768):
        rps = bench_train_step(n_warmup=3, n_iters=20, n_rand=n_rand, preset=preset)
        points.append({"n_rand": n_rand, "rays_per_sec": round(rps, 1)})
        print(f"# n_rand={n_rand}: {rps:,.0f} rays/s", flush=True)
    artifact = {
        "metric": "weak_scaling_sweep",
        "preset": preset,
        "backend": jax.default_backend(),
        "points": points,
    }
    (Path(__file__).parent / "SWEEP.json").write_text(json.dumps(artifact, indent=1))
    best = max(points, key=lambda p: p["rays_per_sec"])
    print(json.dumps({
        "metric": "sweep_best_rays_per_sec",
        "value": best["rays_per_sec"],
        "unit": f"rays/s @ n_rand={best['n_rand']}",
        "vs_baseline": None,
    }))


def main():
    import sys

    preset = "lego_hierarchical"
    if "--preset" in sys.argv:  # e.g. --preset lego_occ: accelerated configs
        preset = sys.argv[sys.argv.index("--preset") + 1]
    if "--scaling" in sys.argv:
        bench_scaling()
        return
    if "--sweep" in sys.argv:
        bench_sweep(preset)
        return
    n_inner = 1
    if "--inner" in sys.argv:  # lax.scan step batching (trainer n_inner)
        n_inner = int(sys.argv[sys.argv.index("--inner") + 1])
    config_txt = None
    if "--config-txt" in sys.argv:  # key=value overlay (variant benching)
        config_txt = sys.argv[sys.argv.index("--config-txt") + 1]
    rays_per_sec = bench_train_step(
        preset=preset, n_inner=n_inner, config_txt=config_txt
    )

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
    line = {
        "metric": metric,
        "value": round(rays_per_sec, 1),
        # vs_baseline is always against the same unfused-XLA
        # reference-workload baseline (bench_baseline.json)
        "vs_baseline": round(rays_per_sec / baseline, 3),
        "unit": "rays/s",
    }
    # speed-of-light accounting (BASELINE.md): model FLOPs / measured
    # chip GEMM rate, plus the per-level kernel-time breakdown. Use the
    # SAME overlay-applied config + n_rand the throughput run used.
    from nerf_meets_mlx_tpu.config import PRESETS, config_from_text

    bench_n_rand = 4096
    cfg_used = PRESETS[preset]()
    if config_txt:
        cfg_used = config_from_text(config_txt, base=cfg_used)
    cfg_used = cfg_used.replace(
        train=dataclasses.replace(cfg_used.train, n_rand=bench_n_rand)
    )
    step_ms = bench_n_rand / rays_per_sec * 1000
    line["step_ms"] = round(step_ms, 2)
    flops = model_flops_per_step(cfg_used)
    if flops is not None:
        # NOT a datasheet-peak MFU: denominator is this chip's MEASURED
        # Pallas GEMM-chain ceiling (147 TF/s, tools_dev/mxu_probe.py) —
        # the key name says so to keep it comparable only to itself
        line["util_vs_measured_gemm_ceiling_147tf"] = round(
            flops / (step_ms / 1000) / MEASURED_PEAK_FLOPS, 4
        )
    phases = bench_phases(cfg_used, n_rand=bench_n_rand)
    if phases is not None:
        # kernel times are measured in separate dispatch loops; measurement
        # noise can push their sum past step_ms — clamp the remainder
        other = max(0.0, step_ms - sum(phases.values()))
        line["phases"] = {**phases, "other_ms": round(other, 2)}
    print(json.dumps(line))


if __name__ == "__main__":
    main()

"""Round-3 sequential TPU measurement queue (run after hard_scene_battery).

Writes one JSON line per measurement to /tmp/r3queue/results.jsonl:
  1. bench presets (hierarchical / ingp / cp / occ / fast) with the round's
     kernels active,
  2. CP-kernel on-TPU parity + fused-vs-unfused step time,
  3. hash-encode kernel block sweep,
  4. fused image-learning step rate (fused vs XLA),
  5. lego_occ sample-budget probe on the hard scene (re-tune check).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OUT = Path("/tmp/r3queue")
OUT.mkdir(parents=True, exist_ok=True)
RESULTS = OUT / "results.jsonl"


def emit(**row):
    with RESULTS.open("a") as f:
        f.write(json.dumps(row) + "\n")
    print("[r3queue]", json.dumps(row), flush=True)


def bench_presets():
    import bench

    for preset in ("lego_hierarchical", "lego_ingp", "lego_cp", "lego_occ", "lego_fast"):
        t0 = time.time()
        rps = bench.bench_train_step(n_warmup=3, n_iters=15, preset=preset)
        emit(kind="bench", preset=preset, rays_per_sec=round(rps, 1),
             wall_s=round(time.time() - t0, 1))


def cp_parity_and_timing():
    import jax
    import jax.numpy as jnp

    from nerf_meets_mlx_tpu.encoding.cp_grid import CPGridEncoding
    from nerf_meets_mlx_tpu.kernels.cp_encode import cp_encode_apply

    enc = CPGridEncoding()  # preset defaults: L=4, 64..512, C=16, bf16
    params = enc.init_params(jax.random.PRNGKey(0))
    N = 4096 * 96
    x = jax.random.uniform(jax.random.PRNGKey(1), (N, 3), minval=-1.4, maxval=1.4)

    f_k = jax.jit(lambda p, x: cp_encode_apply(enc, p, x))
    f_x = jax.jit(lambda p, x: enc.apply(p, x))
    a, b = f_k(params, x), f_x(params, x)
    diff = float(jnp.abs(a - b).max())

    def timeit(f, *args, n=10):
        r = f(*args); float(r.sum())
        t0 = time.perf_counter()
        for _ in range(n):
            r = f(*args)
        float(r.sum())
        return (time.perf_counter() - t0) / n * 1000

    g_k = jax.jit(jax.grad(lambda p, x: jnp.sum(cp_encode_apply(enc, p, x) ** 2)))
    g_x = jax.jit(jax.grad(lambda p, x: jnp.sum(enc.apply(p, x) ** 2)))
    emit(kind="cp_kernel", max_abs_diff=diff,
         fwd_ms_kernel=round(timeit(f_k, params, x), 2),
         fwd_ms_xla=round(timeit(f_x, params, x), 2),
         grad_ms_kernel=round(timeit(lambda p, x: g_k(p, x)["lines"][0], params, x), 2),
         grad_ms_xla=round(timeit(lambda p, x: g_x(p, x)["lines"][0], params, x), 2))


def hash_block_sweep():
    import jax
    import jax.numpy as jnp

    from nerf_meets_mlx_tpu.encoding.hash_grid import HashGridEncoding
    from nerf_meets_mlx_tpu.kernels.hash_encode import hash_encode_apply

    enc = HashGridEncoding(
        n_levels=8, min_res=16, max_res=256, features_per_level=2, log2_table_size=15
    )
    params = enc.init_params(jax.random.PRNGKey(0))
    N = 4096 * 96
    x = jax.random.uniform(jax.random.PRNGKey(1), (N, 3), minval=-1.3, maxval=1.3)
    for block in (384, 512, 768, 1024):
        try:
            g = jax.jit(
                jax.grad(
                    lambda p, x: jnp.sum(hash_encode_apply(enc, p, x, block=block) ** 2)
                )
            )
            r = g(params, x); float(r["tables"].sum())
            t0 = time.perf_counter()
            for _ in range(8):
                r = g(params, x)
            float(r["tables"].sum())
            ms = (time.perf_counter() - t0) / 8 * 1000
            emit(kind="hash_sweep", block=block, fwd_bwd_ms=round(ms, 2))
        except Exception as e:  # noqa: BLE001 — VMEM OOM at big blocks is data
            emit(kind="hash_sweep", block=block, error=str(e)[:160])


def image_fused_rate():
    import dataclasses

    import jax

    from nerf_meets_mlx_tpu.config import image2d
    from nerf_meets_mlx_tpu.datasets import load_image_2d
    from nerf_meets_mlx_tpu.datasets.image import pixel_dataset
    from nerf_meets_mlx_tpu.engine import make_image_train_step
    from nerf_meets_mlx_tpu.engine.train_state import create_train_state
    from nerf_meets_mlx_tpu.models import create_nerf
    import jax.numpy as jnp

    img = load_image_2d(None, 400)
    coords, colors = pixel_dataset(img)
    coords = jnp.asarray(coords)
    colors = jnp.asarray(colors)
    for fused in (False, True):
        cfg = image2d().replace(use_fused_kernel=fused)
        model = create_nerf(cfg)
        step = make_image_train_step(model)
        state = create_train_state(model.init(jax.random.PRNGKey(0)), cfg.train)
        key = jax.random.PRNGKey(1)
        for _ in range(5):
            state, aux = step(state, coords, colors, key)
        float(aux["loss"])
        t0 = time.perf_counter()
        for _ in range(60):
            state, aux = step(state, coords, colors, key)
        float(aux["loss"])
        sps = 60 / (time.perf_counter() - t0)
        emit(kind="image2d", fused=fused, steps_per_sec=round(sps, 2),
             pixels_per_sec=round(sps * cfg.train.n_rand, 1))


def occ_budget_probe():
    from nerf_meets_mlx_tpu.entrypoints.train_nerf import train_nerf

    for n_s, n_i in ((24, 48), (32, 64)):
        t0 = time.time()
        # sample-budget override via the reference-format text overlay
        cfgf = OUT / f"occ_{n_s}_{n_i}.txt"
        cfgf.write_text(f"N_samples = {n_s}\nN_importance = {n_i}\n")
        m = train_nerf(
            preset="lego_occ",
            max_iters=2000,
            log_dir=OUT / f"occ_{n_s}_{n_i}",
            render_video=False,
            synth_resolution=128,
            synth_scene="hard",
            config_txt=str(cfgf),
        )
        emit(kind="occ_probe", n_samples=n_s, n_importance=n_i,
             test_psnr_mean=round(float(m.get("test_psnr_mean", -1)), 2),
             wall_s=round(time.time() - t0, 1))


def ingp_wd_probe():
    """Hash tables memorized the 20-view hard scene (train 28.7 / test 15.3
    dB): probe encoding_weight_decay levels at 2k iters."""
    from nerf_meets_mlx_tpu.entrypoints.train_nerf import train_nerf

    for wd in (1e-4, 1e-3):
        t0 = time.time()
        cfgf = OUT / f"ingp_wd_{wd}.txt"
        cfgf.write_text(f"encoding_weight_decay = {wd}\n")
        m = train_nerf(
            preset="lego_ingp",
            max_iters=2000,
            log_dir=OUT / f"ingp_wd_{wd}",
            render_video=False,
            synth_resolution=128,
            synth_scene="hard",
            config_txt=str(cfgf),
        )
        emit(kind="ingp_wd", wd=wd,
             test_psnr_mean=round(float(m.get("test_psnr_mean", -1)), 2),
             train_psnr=round(float(m.get("psnr", -1)), 2),
             wall_s=round(time.time() - t0, 1))


def main():
    steps = {
        "bench": bench_presets,
        "cp": cp_parity_and_timing,
        "hash": hash_block_sweep,
        "image": image_fused_rate,
        "occ": occ_budget_probe,
        "ingp_wd": ingp_wd_probe,
    }
    names = sys.argv[1:] or list(steps)
    for name in names:
        try:
            steps[name]()
        except Exception as e:  # noqa: BLE001 — keep the queue moving
            emit(kind="error", step=name, error=str(e)[:300])
    print("[r3queue] done", flush=True)


if __name__ == "__main__":
    main()

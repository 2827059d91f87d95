"""Eval render-path probe: padded point-major pipeline vs the dense fused
eval kernel (kernels/fused_train._eval_kernel) at full-frame scale.

Times `render_image` (the orbit/battery/serving path) on the flagship
preset at 800x800 on the real TPU. Path selection rides the factory gate:
use_fused_train=True routes render_rays(train=False) through the dense
eval kernel; =False keeps the old pack_inputs -> fused_apply -> XLA
raw2outputs pipeline (use_fused_kernel stays True in both).

Timing per .claude/skills/verify: only a float(...) host transfer is a
reliable fence on the tunneled platform; frames are timed back-to-back
after one warmup (compile) frame.

Usage: python tools_dev/eval_render_probe.py [--size 800] [--frames 3]
Mirrors JSON to docs/results/eval_render_probe.json.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from nerf_meets_mlx_tpu.config import PRESETS
from nerf_meets_mlx_tpu.models.factory import create_nerf
from nerf_meets_mlx_tpu.rendering.renderer import render_image
from nerf_meets_mlx_tpu.cameras.pose import pose_spherical


def time_path(cfg, H, W, frames):
    model = create_nerf(cfg)
    params = model.init(jax.random.PRNGKey(0))
    focal = 0.5 * W / np.tan(0.25)
    K = jnp.asarray(
        [[focal, 0, 0.5 * W], [0, focal, 0.5 * H], [0, 0, 1]], jnp.float32
    )
    c2w = jnp.asarray(pose_spherical(30.0, -30.0, 4.0))
    out = render_image(model, params, H, W, K, c2w)
    float(jnp.sum(out["rgb_map"]))  # warmup + compile fence
    t0 = time.perf_counter()
    for i in range(frames):
        out = render_image(
            model, params, H, W, K,
            jnp.asarray(pose_spherical(30.0 + i, -30.0, 4.0)),
        )
        float(jnp.sum(out["rgb_map"]))
    dt = (time.perf_counter() - t0) / frames
    return dt, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=800)
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--preset", default="lego_hierarchical")
    ap.add_argument(
        "--sweep", action="store_true",
        help="sweep eval sub-block / group / chunk sizes (fused path only)",
    )
    args = ap.parse_args()
    H = W = args.size
    base = PRESETS[args.preset]().replace(use_fused_kernel=True)

    if args.sweep:
        from nerf_meets_mlx_tpu.kernels import fused_train as ft

        rows = []
        for tp, gp, chunk in [
            (2048, 16384, 32768),
            (4096, 16384, 32768),
            (4096, 32768, 32768),
            (8192, 32768, 32768),
            (4096, 32768, 65536),
            (4096, 32768, 131072),
            (8192, 65536, 131072),
        ]:
            ft.EVAL_TARGET_POINTS = tp
            ft.EVAL_GROUP_POINTS = gp
            import dataclasses as _dc

            cfg = base.replace(
                use_fused_train=True,
                render=_dc.replace(base.render, ray_chunk=chunk),
            )
            try:
                dt, _ = time_path(cfg, H, W, args.frames)
                row = {
                    "target_points": tp, "group_points": gp, "chunk": chunk,
                    "ms_per_frame": round(dt * 1e3, 1),
                    "rays_per_s": round(H * W / dt),
                }
            except Exception as e:  # VMEM OOM etc. — record, keep sweeping
                row = {
                    "target_points": tp, "group_points": gp, "chunk": chunk,
                    "error": str(e)[:200],
                }
            rows.append(row)
            print(json.dumps(row), flush=True)
        out_path = pathlib.Path(__file__).resolve().parent.parent / (
            "docs/results/eval_render_sweep.json"
        )
        out_path.write_text(json.dumps(rows, indent=1) + "\n")
        return

    dt_old, out_old = time_path(
        base.replace(use_fused_train=False), H, W, args.frames
    )
    dt_new, out_new = time_path(
        base.replace(use_fused_train=True), H, W, args.frames
    )
    diff = float(
        jnp.max(jnp.abs(out_old["rgb_map"] - out_new["rgb_map"]))
    )
    rays = H * W
    res = {
        "size": args.size,
        "frames": args.frames,
        "preset": args.preset,
        "old_ms_per_frame": round(dt_old * 1e3, 1),
        "new_ms_per_frame": round(dt_new * 1e3, 1),
        "old_rays_per_s": round(rays / dt_old),
        "new_rays_per_s": round(rays / dt_new),
        "speedup": round(dt_old / dt_new, 3),
        "rgb_maxdiff": diff,
        "backend": jax.default_backend(),
    }
    print(json.dumps(res))
    suffix = "" if args.preset == "lego_hierarchical" else f"_{args.preset}"
    out_path = pathlib.Path(__file__).resolve().parent.parent / (
        f"docs/results/eval_render_probe{suffix}.json"
    )
    out_path.write_text(json.dumps(res, indent=1) + "\n")


if __name__ == "__main__":
    main()

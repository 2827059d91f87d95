"""INGP preset re-spec matrix (round 4): quality x speed for hash-table /
sample-budget / dtype variants of lego_ingp on the hard scene, matching the
recorded battery row's conditions (5k iters, 128^2, 50 views; baseline
T=2^15 f32 48+48 = 26.6 dB, docs/results/hard_battery.jsonl).

Rows append to docs/results/ingp_respec.jsonl. steps_per_sec comes from the
train metrics (approximate under tunnel multiplexing; the adopted variant
gets a clean idle-tunnel bench before the round ends).

Usage: python tools_dev/ingp_respec_matrix.py [--only tagA,tagB]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OUT = Path(__file__).resolve().parent.parent / ".runs" / "ingp_respec"
OUT.mkdir(parents=True, exist_ok=True)

VARIANTS = {
    # tag -> extra `key = value` overlay lines
    # control: preset defaults on the CURRENT (feat-fused) path — isolates
    # bf16's quality effect from the r3 battery row's path-change noise
    "t15_f32": [],
    "t15_bf16": ["hash_compute_dtype = bfloat16"],
    "t14_bf16": ["hash_compute_dtype = bfloat16", "hash_log2_table_size = 14"],
    "t13_bf16": ["hash_compute_dtype = bfloat16", "hash_log2_table_size = 13"],
    "t14_bf16_occ32": [
        "hash_compute_dtype = bfloat16",
        "hash_log2_table_size = 14",
        "occupancy = True",
        "aabb = -1.5,-1.5,-1.5,1.5,1.5,1.5",
        "N_samples = 32",
        "N_importance = 32",
    ],
}


def main():
    from nerf_meets_mlx_tpu.entrypoints.train_nerf import train_nerf

    only = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1].split(",")

    results = Path(__file__).resolve().parent.parent / "docs" / "results"
    results.mkdir(parents=True, exist_ok=True)
    dest = results / "ingp_respec.jsonl"
    done = set()
    if dest.exists():
        for line in dest.read_text().splitlines():
            if line.strip():
                done.add(json.loads(line)["tag"])

    for tag, lines in VARIANTS.items():
        if only and tag not in only:
            continue
        if tag in done:
            print(f"[respec] {tag} already recorded, skipping", flush=True)
            continue
        cfgf = OUT / f"{tag}.txt"
        cfgf.write_text("synth_n_train = 50\n" + "\n".join(lines) + "\n")
        t0 = time.time()
        m = train_nerf(
            preset="lego_ingp",
            max_iters=5000,
            log_dir=str(OUT / tag),
            render_video=False,
            synth_resolution=128,
            synth_scene="hard",
            config_txt=str(cfgf),
        )
        # last logged steps/s from the run's metrics
        sps = -1.0
        mfile = OUT / tag / "metrics.jsonl"
        if mfile.exists():
            for line in mfile.read_text().splitlines():
                try:
                    row = json.loads(line)
                    sps = row.get("steps_per_sec", sps)
                except json.JSONDecodeError:
                    pass
        row = {
            "tag": tag,
            "iters": 5000,
            "resolution": 128,
            "views": 50,
            "test_psnr_mean": round(float(m.get("test_psnr_mean", -1)), 2),
            "test_ssim_mean": round(float(m.get("test_ssim_mean", -1)), 4),
            "train_psnr": round(float(m.get("psnr", -1)), 2),
            "steps_per_sec_contended": round(sps, 2),
            "wall_s": round(time.time() - t0, 1),
        }
        with dest.open("a") as f:
            f.write(json.dumps(row) + "\n")
        print("[respec]", json.dumps(row), flush=True)
    print("[respec] done", flush=True)


if __name__ == "__main__":
    main()

"""BASELINE config-4 analog: lego_full recipe (800^2, 64+128 samples,
200k iters, lr decay) on the hard procedural scene — the closest runnable
stand-in for the reference's 200k-iter lego milestone
(/root/reference/README.md:43-46) in a dataset-less environment.

Chained-resume loop: train in slices so a killed tunnel/job only loses one
slice (the trainer checkpoints on wall-clock + step cadence; train_nerf
resumes from the latest checkpoint automatically).

Usage: python tools_dev/config4_long_run.py [--iters 200000] [--res 800]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Durable (gitignored) home for the checkpoint chain: /tmp is wiped between
# sessions and twice reset this run's 200k trajectory (round-3/4 lesson).
OUT = Path(__file__).resolve().parent.parent / ".runs" / "config4_long"
OUT.mkdir(parents=True, exist_ok=True)


def arg(name, default):
    if name in sys.argv:
        return int(sys.argv[sys.argv.index(name) + 1])
    return default


def main():
    total = arg("--iters", 200_000)
    res = arg("--res", 800)
    slice_iters = arg("--slice", 25_000)
    views = arg("--views", 50)
    # real dataset passthrough: the day nerf_synthetic/lego exists on disk,
    #   python tools_dev/config4_long_run.py --data-dir .../lego
    # runs the same chained 200k recipe on it (smoke-tested end-to-end by
    # tools_dev/real_lego_smoke.py on an on-disk Blender tree)
    data_dir = None
    if "--data-dir" in sys.argv:
        data_dir = sys.argv[sys.argv.index("--data-dir") + 1]

    from nerf_meets_mlx_tpu.entrypoints.train_nerf import train_nerf

    cfgf = OUT / "views.txt"
    cfgf.write_text(f"synth_n_train = {views}\n")

    # Resume from the latest checkpoint step so no-op slices are never run.
    done = 0
    ckpt_dir = OUT / "run" / "ckpt"
    if ckpt_dir.exists():
        steps = [int(p.name.split("_")[-1]) for p in ckpt_dir.glob("step_*")]
        if steps:
            done = (max(steps) // slice_iters) * slice_iters
            print(f"[config4] resuming past {done} iters", flush=True)
    while done < total:
        done = min(done + slice_iters, total)
        t0 = time.time()
        kw = (
            dict(data_dir=data_dir)
            if data_dir
            else dict(
                synth_resolution=res, synth_scene="hard",
                config_txt=str(cfgf),
            )
        )
        m = train_nerf(
            preset="lego_full",
            max_iters=done,
            log_dir=str(OUT / "run"),
            render_video=(done >= total),  # orbit video only at the end
            **kw,
        )
        row = {
            "through_iters": done,
            "test_psnr_mean": round(float(m.get("test_psnr_mean", -1)), 2),
            "wall_s": round(time.time() - t0, 1),
        }
        # mirror into the repo, skipping no-op resume slices (a resume that
        # did not advance through_iters would otherwise append duplicate rows)
        repo_results = Path(__file__).resolve().parent.parent / "docs" / "results"
        repo_results.mkdir(parents=True, exist_ok=True)
        for dest in (OUT / "progress.jsonl", repo_results / "config4_hard_800.jsonl"):
            last = None
            if dest.exists():
                lines = [l for l in dest.read_text().splitlines() if l.strip()]
                if lines:
                    last = json.loads(lines[-1])
            if last is not None and last.get("through_iters", -1) >= row["through_iters"]:
                continue
            with dest.open("a") as f:
                f.write(json.dumps(row) + "\n")
        print("[config4]", json.dumps(row), flush=True)
    print("[config4] done", flush=True)


if __name__ == "__main__":
    main()

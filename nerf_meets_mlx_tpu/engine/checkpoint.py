"""Checkpoint save/restore (orbax).

The reference flags checkpointing but never implements it — `--no_reload`,
`--ft_path`, `--i_weights` exist (config_parser.py:25-26,75) while
create_NeRF holds only `# TODO: load state here` (models/NeRF.py:122-125)
and update_NeRF_args even forces no_reload=True (config_parser.py:120).
Real checkpoint/resume is the preemption story for multi-host TPU training:
the full TrainState (params, Adam moments, step) round-trips losslessly.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax
import orbax.checkpoint as ocp

from nerf_meets_mlx_tpu.engine.train_state import TrainState


def _ckpt_path(ckpt_dir: str | Path, step: int) -> Path:
    return Path(ckpt_dir).absolute() / f"step_{step:08d}"


def save_checkpoint(ckpt_dir: str | Path, state: TrainState, step: int) -> Path:
    """Multi-process contract: called by EVERY process (orbax's save is a
    collective with internal barriers); only the primary host creates the
    directory and writes data."""
    path = _ckpt_path(ckpt_dir, step)
    if jax.process_index() == 0:
        path.parent.mkdir(parents=True, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(
    ckpt_dir: str | Path, template: TrainState, step: int
) -> TrainState:
    """Restore into the structure of `template` (shapes/dtypes must match)."""
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(_ckpt_path(ckpt_dir, step), template)


def latest_step(ckpt_dir: str | Path) -> Optional[int]:
    d = Path(ckpt_dir)
    if not d.is_dir():
        return None
    steps = [
        int(p.name.split("_")[1])
        for p in d.iterdir()
        if p.name.startswith("step_") and p.is_dir()
    ]
    return max(steps) if steps else None

"""Multi-host (pod) initialization.

The reference has no distributed layer (SURVEY.md §2 checklist). Here the
multi-host story is deliberately thin because the single-controller JAX
model does the heavy lifting:

1. every host calls ``init_distributed()`` (jax.distributed.initialize —
   coordinator discovery via env or explicit args),
2. ``make_mesh()`` then spans ALL processes' devices; the same
   ``make_sharded_nerf_train_step`` runs unchanged — rays shard globally,
   gradient all-reduce rides ICI within hosts and DCN across,
3. host-local input loading: each process feeds only its addressable shard
   of the ray batch (``host_local_batch``),
4. ``is_main_process()`` gates logging/checkpoint writes.
"""

from __future__ import annotations

from typing import Optional

import jax


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX. No-op when running single-process or when
    already initialized. On TPU pods with standard env (GCE metadata /
    megascale env vars) all args auto-discover."""
    if jax.process_count() > 1:
        return  # already initialized
    try:
        if coordinator_address is None and num_processes is None:
            jax.distributed.initialize()
        else:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
    except (ValueError, RuntimeError):
        # single-process run (no coordinator configured) — fine
        pass


def is_main_process() -> bool:
    return jax.process_index() == 0


def host_local_batch(global_batch: int) -> int:
    """Per-host slice of a global ray batch (host-sharded data loading)."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by {n} hosts")
    return global_batch // n

"""Worker process for tests/test_distributed.py::test_two_process_real_init.

Runs REAL jax.distributed.initialize (CPU backend, gloo collectives, 4
virtual devices per process -> 8 global), trains a few sharded steps of the
tiny hierarchical NeRF over the global mesh, then dumps its local view of
the (replicated) params and emulates the Trainer's main-process-gated
checkpoint write.

argv: <coordinator_port> <process_id> <out_dir>
"""

import os
import sys
from pathlib import Path

port, idx, out_dir = sys.argv[1], int(sys.argv[2]), Path(sys.argv[3])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from nerf_meets_mlx_tpu.parallel.distributed import (  # noqa: E402
    init_distributed,
    is_main_process,
    host_local_batch,
)

init_distributed(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=idx
)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

import dataclasses  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from nerf_meets_mlx_tpu.config import lego_hierarchical  # noqa: E402
from nerf_meets_mlx_tpu.engine.train_state import create_train_state  # noqa: E402
from nerf_meets_mlx_tpu.models import create_nerf  # noqa: E402
from nerf_meets_mlx_tpu.parallel import (  # noqa: E402
    make_mesh,
    make_sharded_nerf_train_step,
    replicate_state,
)

cfg = lego_hierarchical()
cfg = cfg.replace(
    train=dataclasses.replace(cfg.train, n_rand=16, precrop_iters=0),
    render=dataclasses.replace(cfg.render, n_samples=4, n_importance=4),
    mlp=dataclasses.replace(cfg.mlp, net_depth=2, net_width=16),
    mlp_fine=dataclasses.replace(cfg.mlp_fine, net_depth=2, net_width=16),
)
model = create_nerf(cfg)
H = W = 16
focal = 15.0
rng = np.random.default_rng(0)  # same data on every host (replicated inputs)
images = jnp.asarray(rng.uniform(size=(2, H, W, 3)), jnp.float32)
poses = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None, :3, :4], (2, 1, 1))
poses = poses.at[:, 2, 3].set(4.0)

mesh = make_mesh()  # spans all 8 global devices across both processes
assert mesh.devices.size == 8
assert host_local_batch(cfg.train.n_rand) == 8  # 2 hosts

step = make_sharded_nerf_train_step(model, H, W, focal, mesh)
state = replicate_state(
    create_train_state(model.init(jax.random.PRNGKey(0)), cfg.train), mesh
)
key = jax.random.PRNGKey(7)
for _ in range(3):
    state, aux = step(state, images, poses, key)

# local view of the replicated params
flat = {}
leaves, _ = jax.tree_util.tree_flatten_with_path(state.params)
for path, leaf in leaves:
    flat[jax.tree_util.keystr(path)] = np.asarray(leaf.addressable_data(0))
out_dir.mkdir(parents=True, exist_ok=True)
np.savez(out_dir / f"params_{idx}.npz", **flat)

# Trainer.save()'s gating: only the main process writes checkpoints
if is_main_process():
    (out_dir / f"ckpt_written_by_{idx}").write_text("ok")

print(f"[worker {idx}] done loss={float(aux['loss']):.6f}", flush=True)

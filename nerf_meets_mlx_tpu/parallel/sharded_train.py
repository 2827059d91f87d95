"""Multi-chip data-parallel training step.

Rays shard over the mesh's ``data`` axis; params/optimizer state replicate.
The step body is the SAME fused computation as the single-chip path
(engine/trainer.py) — sharding is expressed with `with_sharding_constraint`
on the ray batch and replicated in/out shardings on the state, and XLA GSPMD
partitions the program and inserts the gradient all-reduce (psum over ICI)
automatically, overlapping it with the backward pass.

This replaces nothing in the reference (it has no distributed layer at all);
it is the framework's scaling path per BASELINE.md (≥90% rays/s efficiency
1 host -> N hosts, weak scaling by growing n_rand with chip count).
"""

from __future__ import annotations

from typing import Callable

import jax
import numpy as np
import optax
from jax.sharding import Mesh

from nerf_meets_mlx_tpu.engine.train_state import TrainState, make_optimizer
from nerf_meets_mlx_tpu.engine.trainer import (
    maybe_update_occupancy,
    nerf_loss_fn,
    sample_train_rays,
)
from nerf_meets_mlx_tpu.models.factory import NeRFModel
from nerf_meets_mlx_tpu.parallel.mesh import data_sharding, replicated


def replicate_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place every leaf of the train state replicated on the mesh."""
    return jax.device_put(state, replicated(mesh))


def make_sharded_nerf_train_step(
    model: NeRFModel,
    H: int,
    W: int,
    focal: float,
    mesh: Mesh,
    n_rand_per_device: int = 0,
) -> Callable:
    """Build step(state, images, poses, key) -> (state, metrics) sharded over
    `mesh`. Global ray batch = n_rand_per_device * n_devices (weak scaling)
    or cfg.train.n_rand if n_rand_per_device == 0."""
    cfg = model.cfg
    tx = make_optimizer(cfg.train)
    n_dev = mesh.devices.size
    n_rand = (n_rand_per_device * n_dev) if n_rand_per_device else cfg.train.n_rand
    if n_rand % n_dev:
        raise ValueError(f"global ray batch {n_rand} not divisible by {n_dev} devices")
    K = np.array([[focal, 0, 0.5 * W], [0, focal, 0.5 * H], [0, 0, 1]], np.float32)
    ray_shard = data_sharding(mesh)
    repl = replicated(mesh)

    def step(state: TrainState, images, poses, key):
        rays_o, rays_d, target, k_render = sample_train_rays(
            cfg, state.step, images, poses, K, H, W, n_rand, key
        )
        viewdirs = None
        if cfg.render.ndc:
            import jax.numpy as jnp
            from nerf_meets_mlx_tpu.cameras.rays import ndc_rays

            viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
            rays_o, rays_d = ndc_rays(H, W, float(K[0, 0]), 1.0, rays_o, rays_d)

        # shard the ray batch across chips; everything downstream
        # (encode/MLP/composite/loss) partitions along rays
        rays_o = jax.lax.with_sharding_constraint(rays_o, ray_shard)
        rays_d = jax.lax.with_sharding_constraint(rays_d, ray_shard)
        target = jax.lax.with_sharding_constraint(target, ray_shard)
        if viewdirs is not None:
            viewdirs = jax.lax.with_sharding_constraint(viewdirs, ray_shard)

        # occupancy grid: replicated state; the update's per-cell density
        # forward partitions trivially (XLA may shard the cell batch too)
        occ, occ_active = maybe_update_occupancy(model, state, key)

        def loss_fn(p):
            return nerf_loss_fn(
                model, p, rays_o, rays_d, target, k_render, viewdirs,
                occ_grid=occ, occ_active=occ_active,
            )

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        # grads of replicated params over sharded rays -> GSPMD all-reduce
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state, occ_grid=occ
        )
        return new_state, aux

    del repl  # state placement comes from replicate_state(); GSPMD keeps it
    return jax.jit(step, donate_argnums=(0,))

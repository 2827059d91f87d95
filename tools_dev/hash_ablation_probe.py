"""Stage ablation of the hash-encode forward kernel: which stage owns the
invariant ~40 ms? Local kernel variants, fine batch, block=2048, T=2^15.

Usage: python tools_dev/hash_ablation_probe.py
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_meets_mlx_tpu.encoding.hash_grid import HashGridEncoding
from nerf_meets_mlx_tpu.kernels.hash_encode import (
    LANE,
    HashEncodeSpec,
    _axes,
    _res_array,
    _stacked_corners,
    _traced_level_coords,
    _hot_compiler_params,
    pack_tables,
)


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _ = float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = float(jnp.sum(out))
    return (time.perf_counter() - t0) / n * 1000


def make_kernel(spec, stage):
    F = spec.features_per_level

    def kernel(res_ref, x_ref, g_ref, out_ref):
        n = x_ref.shape[0]
        n8 = 8 * n
        l = pl.program_id(0)

        if stage == "io_only":
            out_ref[0] = x_ref[:, :F] * (res_ref[0, l] * 0.0 + 1.0)
            return

        ux, uy, uz = _axes(spec, x_ref[:])
        ix, iy, iz, fx, fy, fz = _traced_level_coords(res_ref[0, l], ux, uy, uz)
        hi_all, lo_all, w_all = _stacked_corners(spec, ix, iy, iz, fx, fy, fz)

        if stage == "corners_only":
            # hash/corner arithmetic + narrow-shape concats, no masks/GEMM
            s = (hi_all.astype(jnp.float32) + lo_all.astype(jnp.float32)
                 + w_all).reshape(8, n, 1)
            out_ref[0] = jnp.sum(s, axis=0) * jnp.ones((1, F), jnp.float32)
            return

        hi_iota = jax.lax.broadcasted_iota(jnp.int32, (n8, spec.hi), 1)
        lo_iota = jax.lax.broadcasted_iota(jnp.int32, (n8, LANE), 1)
        aw = (hi_iota == hi_all).astype(jnp.float32) * w_all

        if stage == "no_gemm":
            # masks built, GEMM and lane select skipped
            v = jnp.sum(aw[:, :F], axis=1, keepdims=True) * jnp.ones((1, F))
            out_ref[0] = jnp.sum(v.reshape(8, n, F), axis=0)
            return

        r = jnp.dot(aw, g_ref[0], preferred_element_type=jnp.float32)

        if stage == "no_sel":
            out_ref[0] = jnp.sum(r[:, :F].reshape(8, n, F), axis=0)
            return

        sel = (lo_iota == lo_all).astype(jnp.float32)
        selF = jnp.concatenate([sel] * F, axis=1)
        plane_of = jax.lax.broadcasted_iota(jnp.int32, (F * LANE, F), 0) // LANE
        f_col = jax.lax.broadcasted_iota(jnp.int32, (F * LANE, F), 1)
        P = (plane_of == f_col).astype(jnp.float32)
        v = jnp.dot(r * selF, P, preferred_element_type=jnp.float32)
        out_ref[0] = jnp.sum(v.reshape(8, n, F), axis=0)

    return kernel


def run(spec, g, xp, stage):
    F = spec.features_per_level
    L = spec.n_levels
    nblocks = xp.shape[0] // spec.block
    out = pl.pallas_call(
        make_kernel(spec, stage),
        grid=(L, nblocks),
        in_specs=[
            pl.BlockSpec((1, L), lambda l, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((spec.block, 8), lambda l, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, spec.hi, F * LANE), lambda l, i: (l, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, spec.block, F), lambda l, i: (l, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, xp.shape[0], F), jnp.float32),
        compiler_params=_hot_compiler_params(spec),
    )(_res_array(spec), xp, g)
    return out


def main():
    enc = HashGridEncoding(n_levels=8, min_res=16, max_res=256,
                           features_per_level=2, log2_table_size=15)
    spec = HashEncodeSpec.from_encoding(enc, block=2048)
    params = enc.init_params(jax.random.PRNGKey(0))
    g = pack_tables(spec, params["tables"])
    rng = np.random.default_rng(0)
    N = 4096 * 96
    xp = jnp.asarray(rng.uniform(-1.2, 1.2, size=(N, 8)), jnp.float32)

    for stage in ("io_only", "corners_only", "no_gemm", "no_sel", "full"):
        f = jax.jit(lambda g, x, s=stage: run(spec, g, x, s))
        t = timeit(f, g, xp)
        print(f"[ablate] {stage}: {t:.1f}ms", flush=True)


if __name__ == "__main__":
    main()

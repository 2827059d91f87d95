"""Sweep hash-encode kernel variants on the real TPU: block size and GEMM
dtype, fwd and bwd separately (bwd timed as grad-only: XLA DCEs the forward
GEMM when only dG is live, so vjp-with-unused-output measures bwd alone).

Usage: python tools_dev/hash_kernel_sweep.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    return (time.perf_counter() - t0) / n * 1000


def main():
    from nerf_meets_mlx_tpu.config import lego_ingp
    from nerf_meets_mlx_tpu.kernels.hash_encode import (
        HashEncodeSpec, hash_encode, pack_tables,
    )
    from nerf_meets_mlx_tpu.models import create_nerf

    cfg = lego_ingp().replace(use_fused_kernel=True)
    model = create_nerf(cfg)
    enc = model.pos_enc
    params = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    N = 4096 * 96  # fine batch
    pts = jnp.asarray(rng.uniform(-1.2, 1.2, size=(N, 8)), jnp.float32)

    import dataclasses
    for block in (512, 1024, 2048):
      for cdt in ("float32", "bfloat16"):
       for body in (True, False):
        spec = dataclasses.replace(
            HashEncodeSpec.from_encoding(enc, block=block), compute_dtype=cdt,
            levels_in_body=body)
        g = pack_tables(spec, params["pos_enc"]["tables"])

        f_fwd = jax.jit(lambda g, x, s=spec: hash_encode(s, g, x))
        t_fwd = timeit(f_fwd, g, pts)

        def bwd_only(g, x, s=spec):
            out, vjp = jax.vjp(lambda gg: hash_encode(s, gg, x), g)
            (dg,) = vjp(jnp.ones_like(out))
            return dg  # forward GEMM is dead code -> measures bwd alone

        t_bwd = timeit(jax.jit(bwd_only), g, pts)
        print(f"[sweep] block={block} dtype={cdt} body={body}: fwd={t_fwd:.1f}ms bwd={t_bwd:.1f}ms",
              flush=True)


if __name__ == "__main__":
    main()

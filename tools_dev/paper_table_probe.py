"""Paper-size hash tables (T=2^19, VERDICT r3 item 5): measured attempts.

Three measurements at the INGP-paper config (L=16, T=2^19, F=2), fine
batch (4096 rays x 96 samples):

1. the XLA-gather fallback (the current lego_ingp_paper-scale path),
2. the one-hot GEMM kernel with a level-resident [4096, 256] table slice
   and a small point block (the [8n, 4096] one-hot bounds the block) —
   per-lookup cost is 2*T*F FLOPs by construction, so this is expected to
   LOSE; the number makes the loss a recorded fact instead of a guess,
3. an int8 x int8 MXU rate probe — if s8 GEMMs ran faster than f32/bf16
   (as on untunneled v5e), a quantized-table one-hot would cut the
   per-lookup cost; on this chip f32 == bf16 == ~147 TFLOP/s, so this
   decides whether the quantization route is worth building.

Usage: python tools_dev/paper_table_probe.py
"""

from __future__ import annotations

import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / n * 1000


def main():
    from nerf_meets_mlx_tpu.encoding.hash_grid import HashGridEncoding
    from nerf_meets_mlx_tpu.kernels.hash_encode import (
        HashEncodeSpec, hash_encode, pack_tables,
    )

    N = 4096 * 96
    rng = np.random.default_rng(0)
    pts3 = jnp.asarray(rng.uniform(-1.2, 1.2, size=(N, 3)), jnp.float32)
    pts8 = jnp.pad(pts3, ((0, 0), (0, 5)))

    # --- 3. int8 MXU rate first (decides the quantization route) ---
    M = K = Nn = 4096
    a8 = jnp.asarray(rng.integers(-127, 127, size=(M, K)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 127, size=(K, Nn)), jnp.int8)
    af = a8.astype(jnp.float32)
    bf = b8.astype(jnp.float32)

    def mm_s8(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )

    def mm_f32(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    for name, f, x, y in (("s8xs8", mm_s8, a8, b8), ("f32", mm_f32, af, bf)):
        try:
            t = timeit(jax.jit(f), x, y)
            tf = 2 * M * K * Nn / (t / 1000) / 1e12
            print(f"[paper] GEMM {name} 4096^3: {t:.2f}ms = {tf:.0f} TFLOP/s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"[paper] GEMM {name}: FAILED {str(e).splitlines()[0][:100]}",
                  flush=True)

    # --- paper-size encoding, L=16 T=2^19 ---
    enc = HashGridEncoding(
        n_levels=16, min_res=16, max_res=512, features_per_level=2,
        log2_table_size=19,
    )
    params = enc.init_params(jax.random.PRNGKey(0))

    # 1. XLA gather fallback
    t_gather = timeit(jax.jit(lambda p, x: enc.apply(p, x)), params, pts3, n=3)
    print(f"[paper] XLA gather fwd (L=16, T=2^19): {t_gather:.0f}ms", flush=True)

    # 2. one-hot GEMM, small block (one-hot [8*64, 4096] bounds VMEM)
    # levels_in_body=False: at T=2^19 only the per-level 4 MB table
    # slice fits VMEM (all-resident would need 64 MB of tables)
    spec = dataclasses.replace(
        HashEncodeSpec.from_encoding(enc, block=64), compute_dtype="bfloat16",
        levels_in_body=False,
    )
    g = pack_tables(spec, params["tables"])
    try:
        t_k = timeit(jax.jit(lambda g, x: hash_encode(spec, g, x)), g, pts8, n=3)
        print(f"[paper] one-hot GEMM fwd (block=64, bf16): {t_k:.0f}ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"[paper] one-hot GEMM: FAILED {str(e).splitlines()[0][:140]}",
              flush=True)


if __name__ == "__main__":
    main()

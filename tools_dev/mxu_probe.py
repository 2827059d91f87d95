"""Probe: what matmul rate does the v5e MXU deliver from a Pallas kernel
for (a) f32 x f32, (b) bf16-cast-in-kernel, (c) bf16-stored operands?

Isolates the fused-MLP kernel's inner pattern: a chain of [N,256]@[256,256]
GEMMs with relu between, weights grid-invariant in VMEM. Explains the
round-1 anomaly where compute_dtype=bfloat16 bought only ~3%.
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEPTH = 8
W = 256


def make_kernel(mode: str, block: int):
    def kernel(x_ref, *refs):
        out_ref = refs[-1]
        ws = [r[:] for r in refs[:-1]]
        h = x_ref[:]
        if mode == "cast":
            for w in ws:
                h = jax.nn.relu(
                    jnp.dot(h.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32))
        elif mode == "stored_bf16":
            # weights arrive already bf16; activations kept bf16 between layers
            h = h.astype(jnp.bfloat16)
            for w in ws:
                h = jax.nn.relu(
                    jnp.dot(h, w, preferred_element_type=jnp.float32)
                ).astype(jnp.bfloat16)
            h = h.astype(jnp.float32)
        else:  # f32
            for w in ws:
                h = jax.nn.relu(jnp.dot(h, w, preferred_element_type=jnp.float32))
        out_ref[:] = h.astype(jnp.float32)

    return kernel


def run(mode: str, n: int = 4096 * 192, block: int = 1024):
    wdt = jnp.bfloat16 if mode == "stored_bf16" else jnp.float32
    ws = [jnp.asarray(np.random.randn(W, W) * 0.05, wdt) for _ in range(DEPTH)]
    x = jnp.asarray(np.random.randn(n, W), jnp.float32)
    grid = (n // block,)
    w_specs = [pl.BlockSpec((W, W), lambda i: (0, 0), memory_space=pltpu.VMEM) for _ in ws]
    f = jax.jit(functools.partial(
        pl.pallas_call,
        make_kernel(mode, block),
        grid=grid,
        in_specs=[pl.BlockSpec((block, W), lambda i: (i, 0), memory_space=pltpu.VMEM), *w_specs],
        out_specs=pl.BlockSpec((block, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, W), jnp.float32),
    )())
    out = f(x, *ws)
    float(out[0, 0])
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(x, *ws)
    float(out[0, 0])
    dt = (time.perf_counter() - t0) / iters
    flops = 2 * n * W * W * DEPTH
    print(f"{mode:12s} block={block:5d} n={n}: {dt*1e3:7.2f} ms  {flops/dt/1e12:6.1f} TFLOP/s")
    return dt


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    for block in (512, 1024, 2048):
        for mode in ("f32", "cast", "stored_bf16"):
            try:
                run(mode, block=block)
            except Exception as e:  # noqa
                print(f"{mode:12s} block={block:5d}: FAILED {type(e).__name__}: {str(e)[:120]}")

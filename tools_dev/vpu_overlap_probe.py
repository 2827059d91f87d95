"""Probe: is the fused kernel VPU-bound (sin/relu serialized with MXU), and
does manually splitting a block into two independent half-chains let Mosaic
overlap VPU work of one half with MXU work of the other?

Variants (all 8 x [.,256]@[256,256] useful GEMMs per point):
  chain        — relu between layers (baseline, ~147 TFLOP/s measured)
  norelu       — no activation at all (pure MXU)
  chain_sin    — plus sin on [., 256] once per layer (stand-in for encode sin)
  2way         — two independent half-block chains, ops interleaved
  2way_sin     — both
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


def make_kernel(mode: str):
    def body(h, ws, use_sin):
        for w in ws:
            h = jnp.dot(h, w, preferred_element_type=jnp.float32)
            h = jnp.sin(h) if use_sin else jax.nn.relu(h)
        return h

    def kernel(x_ref, *refs):
        out_ref = refs[-1]
        ws = [r[:] for r in refs[:-1]]
        X = x_ref[:]
        if mode == "chain":
            out_ref[:] = body(X, ws, False)
        elif mode == "norelu":
            h = X
            for w in ws:
                h = jnp.dot(h, w, preferred_element_type=jnp.float32)
            out_ref[:] = h
        elif mode == "chain_sin":
            out_ref[:] = body(X, ws, True)
        elif mode in ("2way", "2way_sin"):
            n = X.shape[0] // 2
            sin = mode.endswith("sin")
            h1, h2 = X[:n], X[n:]
            for w in ws:
                p1 = jnp.dot(h1, w, preferred_element_type=jnp.float32)
                p2 = jnp.dot(h2, w, preferred_element_type=jnp.float32)
                h1 = jnp.sin(p1) if sin else jax.nn.relu(p1)
                h2 = jnp.sin(p2) if sin else jax.nn.relu(p2)
            out_ref[:] = jnp.concatenate([h1, h2], axis=0)
        else:
            raise ValueError(mode)

    return kernel


def run(mode: str, n: int = 4096 * 192, block: int = 1024):
    ws = [jnp.asarray(np.random.randn(W, W) * 0.05, jnp.float32) for _ in range(DEPTH)]
    x = jnp.asarray(np.random.randn(n, W), jnp.float32)
    w_specs = [pl.BlockSpec((W, W), lambda i: (0, 0), memory_space=pltpu.VMEM) for _ in ws]
    f = jax.jit(functools.partial(
        pl.pallas_call, make_kernel(mode), grid=(n // block,),
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
    print(f"{mode:10s} block={block:5d}: {dt*1e3:7.2f} ms  {flops/dt/1e12:6.1f} TFLOP/s")


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    for block in (1024,):
        for mode in ("norelu", "chain", "chain_sin", "2way", "2way_sin"):
            try:
                run(mode, block=block)
            except Exception as e:  # noqa
                print(f"{mode:10s} block={block:5d}: FAILED {type(e).__name__}: {str(e)[:150]}")

"""Probe: current fused-MLP structure (tiny-K side matmuls for input taps /
skip / encode) vs a concat-packed structure (merge tiny-K operands into the
main GEMM via VMEM concatenation). Realistic NeRF shapes.

Hypothesis: the ~6 K=8 matmuls per block each cost a full MXU pipeline pass,
halving the kernel's effective rate (pure chain: 147 TFLOP/s; fused kernel:
~75).
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W = 256
PSC = 384   # padded sin+cos pos features
DSC = 256   # padded dir features
DEPTH = 8
SKIP = 4    # skip-concat after layer idx 4 (input to layer 5)


def rnd(*s, dtype=jnp.float32):
    return jnp.asarray(np.random.randn(*s).astype(np.float32) * 0.05, dtype)


def split_kernel(x_ref, *refs):
    """Mirror of the current _forward_core: separate tiny-K matmuls."""
    out_ref = refs[-1]
    (Mp, phip, Md, phid, A0, B0, b0, *rest) = [r[:] for r in refs[:-1]]
    it = iter(rest)
    X = x_ref[:]
    mm = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
    Sp = jnp.sin(mm(X, Mp) + phip)
    Sd = jnp.sin(mm(X, Md) + phid)
    h = jax.nn.relu(mm(Sp, A0) + mm(X, B0) + b0)
    for j in range(1, DEPTH):
        if (j - 1) == SKIP:
            Ah, Aenc, Benc, bj = next(it), next(it), next(it), next(it)
            pre = mm(h, Ah) + mm(Sp, Aenc) + mm(X, Benc) + bj
        else:
            Aj, bj = next(it), next(it)
            pre = mm(h, Aj) + bj
        h = jax.nn.relu(pre)
    Whf, bhf = next(it), next(it)
    hf = mm(h, Whf) + bhf
    feat = hf[:, :W]
    alpha = hf[:, W : W + 1]
    Wdf, Wds, Bd, bd = next(it), next(it), next(it), next(it)
    hd = jax.nn.relu(mm(feat, Wdf) + mm(Sd, Wds) + mm(X, Bd) + bd)
    Wr, br = next(it), next(it)
    out = mm(hd, Wr) + br + alpha * 0.0
    out_ref[:] = out


def packed_kernel(x_ref, *refs):
    """Concat-packed: one encode GEMM, [Sp|X] and [h|Sp|X] fused operands."""
    out_ref = refs[-1]
    (Mpd, phipd, A0c, b0, *rest) = [r[:] for r in refs[:-1]]
    it = iter(rest)
    X = x_ref[:]
    mm = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)
    S = jnp.sin(mm(X, Mpd) + phipd)          # [N, PSC+DSC] one pass
    Sp = S[:, :PSC]
    Sd = S[:, PSC:]
    SpX = jnp.concatenate([Sp, X], axis=1)   # [N, PSC+8]
    h = jax.nn.relu(mm(SpX, A0c) + b0)
    for j in range(1, DEPTH):
        if (j - 1) == SKIP:
            Ac, bj = next(it), next(it)
            pre = mm(jnp.concatenate([h, SpX], axis=1), Ac)  # [N, W+PSC+8]
            pre = pre + bj
        else:
            Aj, bj = next(it), next(it)
            pre = mm(h, Aj) + bj
        h = jax.nn.relu(pre)
    Whf, bhf = next(it), next(it)
    hf = mm(h, Whf) + bhf
    feat = hf[:, :W]
    alpha = hf[:, W : W + 1]
    Wdc, bd = next(it), next(it)
    hd = jax.nn.relu(mm(jnp.concatenate([feat, Sd, X], axis=1), Wdc) + bd)
    Wr, br = next(it), next(it)
    out = mm(hd, Wr) + br + alpha * 0.0
    out_ref[:] = out


def build(mode: str, n: int, block: int):
    if mode == "split":
        ws = [rnd(8, PSC), rnd(1, PSC), rnd(8, DSC), rnd(1, DSC),
              rnd(PSC, W), rnd(8, W), rnd(1, W)]
        for j in range(1, DEPTH):
            if (j - 1) == SKIP:
                ws += [rnd(W, W), rnd(PSC, W), rnd(8, W), rnd(1, W)]
            else:
                ws += [rnd(W, W), rnd(1, W)]
        ws += [rnd(W, W + 128), rnd(1, W + 128)]
        ws += [rnd(W, 128), rnd(DSC, 128), rnd(8, 128), rnd(1, 128)]
        ws += [rnd(128, 8), rnd(1, 8)]
        kern = split_kernel
    else:
        ws = [rnd(8, PSC + DSC), rnd(1, PSC + DSC), rnd(PSC + 8, W), rnd(1, W)]
        for j in range(1, DEPTH):
            if (j - 1) == SKIP:
                ws += [rnd(W + PSC + 8, W), rnd(1, W)]
            else:
                ws += [rnd(W, W), rnd(1, W)]
        ws += [rnd(W, W + 128), rnd(1, W + 128)]
        ws += [rnd(W + DSC + 8, 128), rnd(1, 128)]
        ws += [rnd(128, 8), rnd(1, 8)]
        kern = packed_kernel

    x = rnd(n, 8)
    w_specs = [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for w in ws]
    f = jax.jit(functools.partial(
        pl.pallas_call, kern, grid=(n // block,),
        in_specs=[pl.BlockSpec((block, 8), lambda i: (i, 0), memory_space=pltpu.VMEM), *w_specs],
        out_specs=pl.BlockSpec((block, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 8), jnp.float32),
    )())
    return f, x, ws


def run(mode: str, n: int = 4096 * 192, block: int = 1024):
    f, x, ws = build(mode, n, block)
    out = f(x, *ws)
    float(out[0, 0])
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(x, *ws)
    float(out[0, 0])
    dt = (time.perf_counter() - t0) / iters
    # useful-FLOP accounting (same for both: the real network's math)
    fl = 2 * n * (8 * (PSC + DSC) + (PSC + 8) * W + (DEPTH - 2) * W * W
                  + (W + PSC + 8) * W + W * (W + 128) + (W + DSC + 8) * 128 + 128 * 8)
    print(f"{mode:7s} block={block:5d}: {dt*1e3:7.2f} ms  {fl/dt/1e12:6.1f} TFLOP/s")


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    for block in (512, 1024, 2048):
        for mode in ("split", "packed"):
            try:
                run(mode, block=block)
            except Exception as e:  # noqa
                print(f"{mode:7s} block={block:5d}: FAILED {type(e).__name__}: {str(e)[:150]}")

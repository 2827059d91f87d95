"""Stage ablation of the fused_train kernel (VERDICT r4 #1): where do the
fine level's 28.6 ms go, against a ~21.5 ms analytic roofline?

Stages (cumulative):
  io_only        input/output DMA + grid pipeline only (empty body)
  fwd            + _forward_core (the MLP GEMM chain)
  fwd_composite  + alpha/transmittance/composite/loss (the CS/U GEMMs)
  full_nodw      + _backprop_core (dW epilogue replaced by a scalar
                   reduction consumer so nothing is DCE'd)
  full           the real production kernel (_train_kernel)

Each stage's outputs feed an UNCONDITIONAL store (sse accumulator) so no
stage can be dead-code-eliminated (r3's "90 ms encode" lesson).

Run on an IDLE tunnel. Usage: python tools_dev/fused_train_ablation_probe.py
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

from nerf_meets_mlx_tpu.config import PRESETS
from nerf_meets_mlx_tpu.kernels.fused_mlp import (
    FusedMLPSpec,
    _backprop_core,
    _forward_core,
    _n_layer_arrays,
    pack_params,
)
from nerf_meets_mlx_tpu.kernels.fused_train import (
    TrainSpec,
    _alpha_terms,
    _train_kernel,
    default_rays_block,
    pack_inputs_train,
    selector_mats,
)
from nerf_meets_mlx_tpu.models import create_nerf


def timeit_chained(run_fn, packed, xp, tp, CS, U, U_first, n=50, warmup=2):
    """DEVICE-TRUE kernel time: n calls chained through a lax.scan inside
    ONE jit, each iteration's first weight array perturbed by the previous
    sse (x0 dependency) so XLA can neither CSE the identical calls nor
    overlap them. The r5 discovery this encodes: per-dispatch overhead on
    the tunneled platform is 0.3-1.9 ms/call, which inflated every 20-call
    probe by ~5-20% and made the old 'io floor' mostly a measurement
    artifact (phase sums exceeded the full step's time)."""

    def one(carry, _):
        p0 = [packed[0] + carry * 0.0] + list(packed[1:])
        outs = run_fn(p0, xp, tp, CS, U, U_first)
        return outs[2][0, 0] * 1e-30, ()

    def chain(k):
        s, _ = jax.lax.scan(one, jnp.float32(0.0), None, length=k)
        return s

    jf = jax.jit(chain, static_argnums=0)
    for _ in range(warmup):
        r = jf(n)
    float(r)
    t0 = time.perf_counter()
    r = jf(n)
    float(r)
    one_call = time.perf_counter() - t0
    # subtract the single-dispatch cost by differencing against a shorter
    # chain run in the same compiled form
    t0 = time.perf_counter()
    r = jf(n)
    float(r)
    one_call = min(one_call, time.perf_counter() - t0)
    return one_call / n * 1000


def make_stage_kernel(spec: FusedMLPSpec, tspec: TrainSpec, stage: str):
    if stage == "full":
        return functools.partial(_train_kernel, spec, tspec)

    def kernel(x_ref, target_ref, cs_ref, u_ref, uf_ref, *refs):
        n_w = _n_layer_arrays(spec)
        w_refs = refs[:n_w]
        rgb_ref, wts_ref, sse_ref = refs[n_w], refs[n_w + 1], refs[n_w + 2]
        dw_refs = refs[n_w + 3:]
        RB, S = tspec.rays_block, tspec.n_samples
        RBS = RB * S
        f32 = jnp.float32
        first = pl.program_id(0) == 0

        # dW outputs exist in every stage (same DMA/layout); written once
        for r in dw_refs:
            @pl.when(first)
            def _(r=r):
                r[:] = jnp.zeros(r.shape, f32)

        def put_sse(v):  # unconditional accumulate — the DCE-proof consumer
            @pl.when(first)
            def _():
                sse_ref[:] = v

            @pl.when(jnp.logical_not(first))
            def _():
                sse_ref[:] = sse_ref[:] + v

        X = x_ref[:]
        if stage == "io_only":
            v = jnp.sum(X[:, :1], axis=(0, 1), keepdims=True) * 0.0
            rgb_ref[:] = jnp.zeros((RBS, 3), f32)
            wts_ref[:] = jnp.zeros((RBS, 1), f32)
            put_sse(v + jnp.sum(target_ref[0:1, :1], keepdims=True) * 0.0)
            return

        ws = [r[:] for r in w_refs]
        out, residuals = _forward_core(spec, X, ws, want_residuals=True)
        raw_rgb = out[:, 0:3]
        raw_sigma = out[:, 3:4] + X[:, 7:8]
        delta = X[:, 6:7]

        if stage == "fwd":
            rgb_ref[:] = raw_rgb
            wts_ref[:] = raw_sigma * delta * 0.0
            put_sse(jnp.sum(out[:1, :1], axis=(0, 1), keepdims=True))
            return

        def mmf(a, b):
            return jnp.dot(a, b, preferred_element_type=f32)

        def mmTf(a, b):
            return jax.lax.dot_general(
                a, b, (((0,), (0,)), ((), ())), preferred_element_type=f32
            )

        CS, U, U_first = cs_ref[:], u_ref[:], uf_ref[:]
        q, alpha, dalpha_dq, dq_to_draw = _alpha_terms(tspec, raw_sigma, delta)
        Texc = jnp.exp(-mmf(CS, q))
        w = alpha * Texc
        c = jax.nn.sigmoid(raw_rgb) if tspec.mode == "canonical" else raw_rgb
        rgb_map = mmf(U, w * c)
        if tspec.white_bkgd:
            acc = mmf(U, w)
            rgb_map = rgb_map + (1.0 - acc)
        wts_ref[:] = w
        rgb_ref[:] = mmTf(U, rgb_map)
        target_ray = mmf(U_first, target_ref[:])
        pid = pl.program_id(0)
        ridx = jax.lax.broadcasted_iota(jnp.int32, (RB, 1), 0) + pid * RB
        valid = (ridx < tspec.n_rays).astype(f32)
        resid = (rgb_map - target_ray) * valid
        sse_blk = jnp.sum(resid * resid, axis=(0, 1), keepdims=True)

        if stage == "fwd_composite":
            put_sse(sse_blk)
            return

        # backward chain (same math as _train_kernel)
        g = 2.0 * resid
        g_pt = mmTf(U, g)
        dc = w * g_pt
        dw = jnp.sum(c * g_pt, axis=1, keepdims=True)
        if tspec.white_bkgd:
            gsum = jnp.sum(g, axis=1, keepdims=True)
            dw = dw - mmTf(U, gsum)
        dq = dw * Texc * dalpha_dq - mmTf(CS, dw * w)
        draw_sigma = dq * dq_to_draw
        draw_rgb = dc * c * (1.0 - c) if tspec.mode == "canonical" else dc
        dout = jnp.concatenate(
            [draw_rgb, draw_sigma, jnp.zeros((RBS, 4), f32)], axis=1
        )
        grads, _ = _backprop_core(spec, ws, residuals, dout)

        assert stage == "full_nodw", stage
        # consume every grad through the sse accumulator (store each step —
        # the VPU read-modify-write of the dW blocks is what's REMOVED)
        s = sse_blk
        for gr in grads[2:]:
            s = s + jnp.sum(gr[:1, :1], axis=(0, 1), keepdims=True) * 1e-30
        put_sse(s)

    return kernel


def run_stage(spec, tspec, packed, xp, tp, CS, U, U_first, stage):
    RB, S = tspec.rays_block, tspec.n_samples
    RBS = RB * S
    R_pad = xp.shape[0] // S
    grid = (R_pad // RB,)

    n_res = 2 * spec.sw + spec.depth * spec.width + spec.width + spec.w2
    est = 4 * (
        2 * RBS * n_res + RBS * RBS
        + 2 * sum(int(np.prod(w.shape)) for w in packed)
    )
    compiler_params = pltpu.CompilerParams(
        vmem_limit_bytes=int(
            min(max(3 * est + 8 * 1024 * 1024, 24 * 1024 * 1024),
                110 * 1024 * 1024)
        )
    )

    def const2(m):
        return pl.BlockSpec(m.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    w_specs = [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for w in packed
    ]
    dw_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in packed[2:]]
    dw_specs = [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for w in packed[2:]
    ]
    outs = pl.pallas_call(
        make_stage_kernel(spec, tspec, stage),
        grid=grid,
        in_specs=[
            pl.BlockSpec((RBS, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RBS, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            const2(CS), const2(U), const2(U_first),
            *w_specs,
        ],
        out_specs=[
            pl.BlockSpec((RBS, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RBS, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            *dw_specs,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R_pad * S, 3), jnp.float32),
            jax.ShapeDtypeStruct((R_pad * S, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            *dw_shapes,
        ],
        compiler_params=compiler_params,
    )(xp, tp, CS, U, U_first, *packed)
    return outs


def gemm_roofline_ms(spec, tspec, n_rays, peak=147e12):
    """Analytic per-step GEMM time with LANE padding accounted (the MXU
    executes an N<128-wide output at 128-lane occupancy)."""
    RB, S = tspec.rays_block, tspec.n_samples
    RBS = RB * S
    grid = -(-n_rays // RB)

    def g(m, k, n):
        return m * k * max(n, 128)

    W, SW, W2 = spec.width, spec.sw, spec.w2
    fwd = g(RBS, 8, SW) + g(RBS, SW, W)
    for j in range(1, spec.depth):
        fwd += g(RBS, W, W) + (g(RBS, SW, W) if (j - 1) in spec.skips else 0)
    fwd += g(RBS, W, W + 128) + g(RBS, W, W2) + g(RBS, SW, W2) + g(RBS, W2, 8)
    comp = 2 * g(RBS, RBS, 1) + 4 * g(8, RBS, 3) + 2 * g(RBS, 8, 3)
    bwd = 2 * fwd  # dW + dh per layer
    total_macs = grid * (fwd + comp + bwd)
    return 2.0 * total_macs / peak * 1000


def main():
    preset = "lego_hierarchical"
    cfg = PRESETS[preset]()
    model = create_nerf(cfg.replace(use_fused_kernel=True))
    params = model.init(jax.random.PRNGKey(0))
    spec = FusedMLPSpec.from_configs(
        cfg.mlp, cfg.pos_encoding, cfg.dir_encoding, compute_dx=False
    )
    rng = np.random.default_rng(0)
    n_rand = 4096

    levels = [("coarse", cfg.render.n_samples, "coarse")]
    if cfg.render.n_importance:
        levels.append(("fine", cfg.render.n_samples + cfg.render.n_importance,
                       "fine"))
    for lname, S, pkey in levels:
        tspec = TrainSpec(
            n_samples=S, rays_block=default_rays_block(S), n_rays=n_rand,
            mode=cfg.render.compositing,
            density_activation=cfg.render.density_activation,
            white_bkgd=cfg.render.white_bkgd,
        )
        packed = pack_params(spec, params[pkey])
        RB = tspec.rays_block
        R_pad = -(-n_rand // RB) * RB
        pts = jnp.asarray(rng.normal(size=(n_rand, S, 3)), jnp.float32)
        dirs = jnp.asarray(rng.normal(size=(n_rand, 3)), jnp.float32)
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        deltas = jnp.asarray(rng.uniform(0.01, 0.1, (n_rand, S)), jnp.float32)
        x = pack_inputs_train(pts, dirs, deltas, jnp.zeros((n_rand, S), jnp.float32))
        target = jnp.asarray(rng.uniform(size=(n_rand, 3)), jnp.float32)
        xp = jnp.pad(x, ((0, (R_pad - n_rand) * S), (0, 0)))
        tp = jnp.pad(target, ((0, R_pad - n_rand), (0, 0)))
        tp = jnp.broadcast_to(tp[:, None, :], (R_pad, S, 3)).reshape(R_pad * S, 3)
        CS, U, U_first = (jnp.asarray(m) for m in selector_mats(tspec))

        grid_n = R_pad // RB
        print(f"[{lname}] S={S} RB={RB} RBS={RB*S} grid={grid_n} "
              f"roofline={gemm_roofline_ms(spec, tspec, n_rand):.1f}ms",
              flush=True)
        prev = 0.0
        for stage in ("io_only", "fwd", "fwd_composite", "full_nodw", "full"):
            f = functools.partial(run_stage, spec, tspec, stage=stage)
            t = timeit_chained(f, packed, xp, tp, CS, U, U_first)
            print(f"[{lname}] {stage}: {t:.2f}ms (+{t - prev:.2f})", flush=True)
            prev = t


if __name__ == "__main__":
    main()

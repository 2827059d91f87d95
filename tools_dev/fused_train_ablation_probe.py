"""Stage ablation of the fused_train kernel (v3, ray-major dense IO).

History: the v2 ablation this probe started as discovered BOTH r5 findings
— that the tunneled platform adds 0.3-1.9 ms per dispatch (so kernels must
be timed lax.scan-chained, see timeit_chained), and that the v2 kernel's
remaining gap was lane-padded DMA, which v3 removed. This version ablates
the v3 kernel.

Stages (cumulative):
  io_only        dense block DMA + grid pipeline (empty body)
  fwd            + point construction + _forward_core (the MLP GEMM chain)
  fwd_composite  + ray-major alpha/transmittance/composite/loss
  full_nodw      + _backprop_core (dW epilogue replaced by a scalar
                   consumer so nothing is DCE'd)
  full           the real production kernel (_train_kernel)

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
    default_group,
    default_rays_block,
    pack_ray_inputs,
    selector_mats,
)
from nerf_meets_mlx_tpu.models import create_nerf


def timeit_chained(run_fn, packed, inputs, n=50, warmup=2):
    """DEVICE-TRUE kernel time: n calls chained through a lax.scan inside
    ONE jit, each iteration's first weight array perturbed by the previous
    sse so XLA can neither CSE the identical calls nor overlap them
    (per-dispatch overhead on the tunneled platform is 0.3-1.9 ms/call)."""

    def one(carry, _):
        p0 = [packed[0] + carry * 0.0] + list(packed[1:])
        outs = run_fn(p0, *inputs)
        return outs[2][0, 0] * 1e-30, ()

    def chain():
        s, _ = jax.lax.scan(one, jnp.float32(0.0), None, length=n)
        return s

    jf = jax.jit(chain)
    for _ in range(warmup):
        r = jf()
    float(r)
    t0 = time.perf_counter()
    r = jf()
    float(r)
    return (time.perf_counter() - t0) / n * 1000


def make_stage_kernel(spec: FusedMLPSpec, tspec: TrainSpec, stage: str):
    if stage == "full":
        return functools.partial(_train_kernel, spec, tspec)

    def kernel(rw_ref, z_ref, delta_ref, noise_ref, target_ref,
               u_ref, e_ref, a_ref, *refs):
        n_w = _n_layer_arrays(spec)
        w_refs = refs[:n_w]
        rgb_ref, wts_ref, sse_ref = refs[n_w], refs[n_w + 1], refs[n_w + 2]
        dw_refs = refs[n_w + 3:]
        ws = [r[:] for r in w_refs]
        RB, S, G = tspec.rays_block, tspec.n_samples, tspec.group
        RBS = RB * S
        f32 = jnp.float32
        U, E, A = u_ref[:], e_ref[:], a_ref[:]
        pid = pl.program_id(0)

        def mmf(a, b):
            return jnp.dot(a, b, preferred_element_type=f32)

        def mmTf(a, b):
            return jax.lax.dot_general(
                a, b, (((0,), (0,)), ((), ())), preferred_element_type=f32
            )

        def mmbTf(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (1,)), ((), ())), preferred_element_type=f32
            )

        def to_pm(v_rm):
            return jnp.sum(mmTf(U, v_rm) * E, axis=1, keepdims=True)

        def to_rm(v_pm):
            return mmf(U, v_pm * E)

        def put_sse(v, first):
            @pl.when(first)
            def _():
                sse_ref[:] = v

            @pl.when(jnp.logical_not(first))
            def _():
                sse_ref[:] = sse_ref[:] + v

        def sub_block(j, carry):
            first = jnp.logical_and(pid == 0, j == 0)
            for r in dw_refs:
                @pl.when(first)
                def _(r=r):
                    r[:] = jnp.zeros(r.shape, f32)

            rw = rw_ref[pl.ds(j * RB, RB), :]
            zb = z_ref[pl.ds(j * RB, RB), :]
            db = delta_ref[pl.ds(j * RB, RB), :]
            nb = noise_ref[pl.ds(j * RB, RB), :]
            tb = target_ref[pl.ds(j * RB, RB), :]

            if stage == "io_only":
                v = jnp.sum(rw[:1, :1], keepdims=True) * 0.0
                v = v + jnp.sum(zb[:1, :1] + db[:1, :1] + nb[:1, :1],
                                keepdims=True) * 0.0
                wts_ref[pl.ds(j * RB, RB), :] = jnp.zeros((RB, S), f32)
                rgb_ref[pl.ds(j * RB, RB), :] = jnp.zeros((RB, 3), f32)
                put_sse(v + jnp.sum(tb[:1, :1], keepdims=True) * 0.0, first)
                return carry

            pm16 = mmTf(U, rw)
            z_pm = to_pm(zb)
            pts = pm16[:, 0:3] + z_pm * pm16[:, 3:6]
            vd_pm = pm16[:, 6:9]
            cdt = jnp.bfloat16 if spec.compute_dtype == "bfloat16" else f32
            M, phi = ws[0], ws[1]
            T = (
                jnp.dot(pts.astype(cdt), M[0:3].astype(cdt),
                        preferred_element_type=f32)
                + jnp.dot(vd_pm.astype(cdt), M[3:6].astype(cdt),
                          preferred_element_type=f32)
                + phi
            )
            out, residuals = _forward_core(
                spec, None, ws, want_residuals=True, T=T
            )
            raw_rgb = out[:, 0:3]

            if stage == "fwd":
                wts_ref[pl.ds(j * RB, RB), :] = jnp.zeros((RB, S), f32)
                rgb_ref[pl.ds(j * RB, RB), :] = jnp.zeros((RB, 3), f32)
                put_sse(jnp.sum(out[:1, :1], keepdims=True) * 1e-30, first)
                return carry

            sig_rm = to_rm(out[:, 3:4]) + nb
            q, alpha, dalpha_dq, dq_to_draw = _alpha_terms(tspec, sig_rm, db)
            Texc = jnp.exp(-mmf(q, A))
            w_rm = alpha * Texc
            c = (
                jax.nn.sigmoid(raw_rgb)
                if tspec.mode == "canonical" else raw_rgb
            )
            w_pm = to_pm(w_rm)
            rgb_map = mmf(U, w_pm * c)
            if tspec.white_bkgd:
                acc = jnp.sum(w_rm, axis=1, keepdims=True)
                rgb_map = rgb_map + (1.0 - acc)
            wts_ref[pl.ds(j * RB, RB), :] = w_rm
            rgb_ref[pl.ds(j * RB, RB), :] = rgb_map
            ridx = (
                jax.lax.broadcasted_iota(jnp.int32, (RB, 1), 0)
                + (pid * G + j) * RB
            )
            valid = (ridx < tspec.n_rays).astype(f32)
            resid = (rgb_map - tb) * valid
            sse_blk = jnp.sum(resid * resid, axis=(0, 1), keepdims=True)

            if stage == "fwd_composite":
                put_sse(sse_blk, first)
                return carry

            g2 = 2.0 * resid
            g_pt = mmTf(U, g2)
            dc = w_pm * g_pt
            dwght_pm = jnp.sum(c * g_pt, axis=1, keepdims=True)
            if tspec.white_bkgd:
                gsum = jnp.sum(g2, axis=1, keepdims=True)
                dwght_pm = dwght_pm - mmTf(U, gsum)
            dw_rm = to_rm(dwght_pm)
            dq_rm = dw_rm * Texc * dalpha_dq - mmbTf(dw_rm * w_rm, A)
            draw_sigma = to_pm(dq_rm * dq_to_draw)
            draw_rgb = dc * c * (1.0 - c) if tspec.mode == "canonical" else dc
            dout = jnp.concatenate(
                [draw_rgb, draw_sigma, jnp.zeros((RBS, 4), f32)], axis=1
            )
            grads, _ = _backprop_core(spec, ws, residuals, dout)

            assert stage == "full_nodw", stage
            s = sse_blk
            for gr in grads[2:]:
                s = s + jnp.sum(gr[:1, :1], keepdims=True) * 1e-30
            put_sse(s, first)
            return carry

        jax.lax.fori_loop(0, G, sub_block, 0, unroll=False)

    return kernel


def run_stage(spec, tspec, packed, rw, zp, dp, np_, tp, U, E, A, stage):
    RB, S, G = tspec.rays_block, tspec.n_samples, tspec.group
    RBS = RB * S
    R_pad = rw.shape[0]
    grid = (R_pad // (RB * G),)

    n_res = 2 * spec.sw + spec.depth * spec.width + spec.width + spec.w2
    est = 4 * (
        2 * RBS * n_res + RBS * S + S * S + RB * RBS
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

    def blk(cols):
        return pl.BlockSpec(
            (G * RB, cols), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

    w_specs = [const2(w) for w in packed]
    dw_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in packed[2:]]
    dw_specs = [const2(w) for w in packed[2:]]
    outs = pl.pallas_call(
        make_stage_kernel(spec, tspec, stage),
        grid=grid,
        in_specs=[
            blk(16), blk(S), blk(S), blk(S), blk(3),
            const2(U), const2(E), const2(A),
            *w_specs,
        ],
        out_specs=[
            blk(3), blk(S),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            *dw_specs,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R_pad, 3), jnp.float32),
            jax.ShapeDtypeStruct((R_pad, S), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            *dw_shapes,
        ],
        compiler_params=compiler_params,
    )(rw, zp, dp, np_, tp, U, E, A, *packed)
    return outs


def gemm_roofline_ms(spec, tspec, n_rays, peak=147e12):
    """Analytic per-step GEMM time with LANE padding accounted."""
    RB, S = tspec.rays_block, tspec.n_samples
    RBS = RB * S
    grid = -(-n_rays // RB)

    def g(m, k, n):
        return m * k * max(n, 128)

    W, SW, W2 = spec.width, spec.sw, spec.w2
    fwd = g(RBS, 3, SW) * 2 + g(RBS, SW, W)
    for j in range(1, spec.depth):
        fwd += g(RBS, W, W) + (g(RBS, SW, W) if (j - 1) in spec.skips else 0)
    fwd += g(RBS, W, W + 128) + g(RBS, W, W2) + g(RBS, SW, W2) + g(RBS, W2, 8)
    comp = 2 * g(RB, S, S) + 6 * g(RBS, RB, S) + 4 * g(8, RBS, 3)
    bwd = 2 * fwd
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
        rb = default_rays_block(S)
        tspec = TrainSpec(
            n_samples=S, rays_block=rb, n_rays=n_rand,
            mode=cfg.render.compositing,
            density_activation=cfg.render.density_activation,
            white_bkgd=cfg.render.white_bkgd,
            group=default_group(S, rb),
        )
        packed = pack_params(spec, params[pkey])
        RB, G = tspec.rays_block, tspec.group
        R_pad = -(-n_rand // (RB * G)) * (RB * G)
        pad = ((0, R_pad - n_rand), (0, 0))
        rays_o = jnp.asarray(rng.normal(size=(n_rand, 3)), jnp.float32)
        d = jnp.asarray(rng.normal(size=(n_rand, 3)), jnp.float32)
        vd = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        z = jnp.sort(
            jnp.asarray(rng.uniform(0.5, 4.0, (n_rand, S)), jnp.float32),
            axis=-1,
        )
        deltas = jnp.asarray(rng.uniform(0.01, 0.1, (n_rand, S)), jnp.float32)
        target = jnp.asarray(rng.uniform(size=(n_rand, 3)), jnp.float32)
        rw = jnp.pad(pack_ray_inputs(rays_o, d, vd), pad)
        zp = jnp.pad(z, pad)
        dp = jnp.pad(deltas, pad)
        np_ = jnp.pad(jnp.zeros((n_rand, S), jnp.float32), pad)
        tp = jnp.pad(target, pad)
        U, E, A = (jnp.asarray(m) for m in selector_mats(tspec))

        grid_n = R_pad // (RB * G)
        print(f"[{lname}] S={S} RB={RB} G={G} RBS={RB*S} grid={grid_n} "
              f"roofline={gemm_roofline_ms(spec, tspec, n_rand):.1f}ms",
              flush=True)
        prev = 0.0
        for stage in ("io_only", "fwd", "fwd_composite", "full_nodw", "full"):
            f = functools.partial(run_stage, spec, tspec, stage=stage)
            t = timeit_chained(f, packed, (rw, zp, dp, np_, tp, U, E, A))
            print(f"[{lname}] {stage}: {t:.2f}ms (+{t - prev:.2f})", flush=True)
            prev = t


if __name__ == "__main__":
    main()

"""Stage ablation of the fully-fused INGP train kernel: where do the
90.7 ms of the lego_ingp step go, against the ~63-70 ms analytic
(one-hot GEMMs + VPU masks)?

Stages (cumulative), per level at the bench shapes:
  io_only      block reads + zero writes (+ dg/dw zero-on-first)
  encode       + in-kernel points + hash encode forward (all levels)
  encode_mlp   + feat-MLP forward + ray-major composite + sse
  full_nodg    + MLP backward + dW accumulation (hash bwd skipped)
  full         the real production kernel

Device-true timing (lax.scan-chained, r5 dispatch-overhead lesson).
Run on an IDLE tunnel: python tools_dev/ingp_ablation_probe.py
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
from nerf_meets_mlx_tpu.kernels.fused_feat_train import (
    FeatMLPSpec,
    _feat_backprop,
    _feat_forward,
    _n_feat_arrays,
    pack_feat_params,
)
from nerf_meets_mlx_tpu.kernels.fused_ingp_train import _ingp_train_kernel
from nerf_meets_mlx_tpu.kernels.fused_train import (
    TrainSpec,
    _alpha_terms,
    default_group,
    default_rays_block,
    pack_ray_inputs,
    selector_mats,
)
from nerf_meets_mlx_tpu.kernels.hash_encode import (
    LANE,
    HashEncodeSpec,
    _level_coords,
    _plane_indicator,
    _stacked_corners,
    pack_tables,
)
from nerf_meets_mlx_tpu.models import create_nerf


def make_stage_kernel(fspec, hspec, tspec, stage):
    if stage == "full":
        return functools.partial(_ingp_train_kernel, fspec, hspec, tspec)

    def kernel(rw_ref, sh_ref, z_ref, delta_ref, noise_ref, target_ref,
               u_ref, e_ref, a_ref, g_ref, *refs):
        n_w = _n_feat_arrays(fspec)
        w_refs = refs[:n_w]
        rgb_ref, wts_ref, sse_ref, dg_ref = (
            refs[n_w], refs[n_w + 1], refs[n_w + 2], refs[n_w + 3]
        )
        dw_refs = refs[n_w + 4:]
        ws = [r[:] for r in w_refs]
        RB, S, G = tspec.rays_block, tspec.n_samples, tspec.group
        RBS = RB * S
        n8 = 8 * RBS
        F = hspec.features_per_level
        L = hspec.n_levels
        f32 = jnp.float32
        cdt = jnp.bfloat16 if hspec.compute_dtype == "bfloat16" else f32
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

        def body(a_ref_s, r_ref_s, ds_ref_s):
            hi_iota = jax.lax.broadcasted_iota(jnp.int32, (n8, hspec.hi), 1)
            lo_iota = jax.lax.broadcasted_iota(jnp.int32, (n8, LANE), 1)
            P_ind = _plane_indicator(F, cdt)

            def put_sse(v, first):
                @pl.when(first)
                def _():
                    sse_ref[:] = v

                @pl.when(jnp.logical_not(first))
                def _():
                    sse_ref[:] = sse_ref[:] + v

            def zero_first(first):
                @pl.when(first)
                def _():
                    dg_ref[...] = jnp.zeros(dg_ref.shape, f32)
                    for r in dw_refs:
                        r[:] = jnp.zeros(r.shape, f32)

            def sub_block(j, carry):
                first = jnp.logical_and(pid == 0, j == 0)
                zero_first(first)
                rw = rw_ref[pl.ds(j * RB, RB), :]
                shb = sh_ref[pl.ds(j * RB, RB), :]
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
                Dn = mmTf(U, shb)
                inv = 1.0 / (hspec.bbox_max - hspec.bbox_min)
                ux = jnp.clip((pts[:, 0:1] - hspec.bbox_min) * inv, 0.0, 1.0)
                uy = jnp.clip((pts[:, 1:2] - hspec.bbox_min) * inv, 0.0, 1.0)
                uz = jnp.clip((pts[:, 2:3] - hspec.bbox_min) * inv, 0.0, 1.0)

                if stage in ("coords", "masks", "gemm1"):
                    # in-encode sub-stages (r5 late): localize the
                    # analytic-vs-measured residual inside the per-level
                    # block. All consumed values go through full jnp.sum
                    # reductions (the r4 DCE'd-probe lesson).
                    acc = jnp.zeros((1, 1), f32)
                    for l in range(L):
                        ix, iy, iz, fx, fy, fz = _level_coords(
                            hspec, ux, uy, uz, l
                        )
                        hi_all, lo_all, w_all = _stacked_corners(
                            hspec, ix, iy, iz, fx, fy, fz
                        )
                        acc = acc + (
                            jnp.sum(lo_all.astype(f32))
                        ).reshape(1, 1) * 1e-30
                        if stage == "coords":
                            acc = acc + (
                                jnp.sum(hi_all.astype(f32)) + jnp.sum(w_all)
                            ).reshape(1, 1) * 1e-30
                            continue
                        a_ref_s[:] = (
                            (hi_iota == hi_all).astype(cdt)
                            * w_all.astype(cdt)
                        )
                        if stage == "masks":
                            acc = acc + a_ref_s[0:1, 0:1].astype(f32) * 1e-30
                            continue
                        r_ref_s[:] = jnp.dot(
                            a_ref_s[:], g_ref[l].astype(cdt),
                            preferred_element_type=f32,
                        ).astype(cdt)
                        acc = acc + r_ref_s[0:1, 0:1].astype(f32) * 1e-30
                    wts_ref[pl.ds(j * RB, RB), :] = jnp.zeros((RB, S), f32)
                    rgb_ref[pl.ds(j * RB, RB), :] = jnp.zeros((RB, 3), f32)
                    put_sse(acc, first)
                    return carry

                feat_cols = []
                for l in range(L):
                    ix, iy, iz, fx, fy, fz = _level_coords(hspec, ux, uy, uz, l)
                    hi_all, lo_all, w_all = _stacked_corners(
                        hspec, ix, iy, iz, fx, fy, fz
                    )
                    a_ref_s[:] = (hi_iota == hi_all).astype(cdt) * w_all.astype(cdt)
                    r_ref_s[:] = jnp.dot(
                        a_ref_s[:], g_ref[l].astype(cdt),
                        preferred_element_type=f32,
                    ).astype(cdt)
                    sel = (lo_iota == lo_all).astype(cdt)
                    selF = jnp.concatenate([sel] * F, axis=1)
                    v = jnp.dot(
                        r_ref_s[:] * selF, P_ind, preferred_element_type=f32
                    )
                    feat_cols.append(jnp.sum(v.reshape(8, RBS, F), axis=0))
                P_feat = jnp.concatenate(feat_cols, axis=1)

                if stage == "encode":
                    wts_ref[pl.ds(j * RB, RB), :] = jnp.zeros((RB, S), f32)
                    rgb_ref[pl.ds(j * RB, RB), :] = jnp.zeros((RB, 3), f32)
                    put_sse(
                        jnp.sum(P_feat[:1, :1], keepdims=True) * 1e-30, first
                    )
                    return carry

                out8, alpha8, residuals = _feat_forward(
                    fspec, P_feat, Dn, ws, want_residuals=True
                )
                raw_rgb = out8[:, 0:3]
                sig_rm = to_rm(alpha8[:, 0:1]) + nb
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

                if stage == "encode_mlp":
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
                draw_rgb = (
                    dc * c * (1.0 - c) if tspec.mode == "canonical" else dc
                )
                grads, dP = _feat_backprop(
                    fspec, ws, P_feat, Dn, residuals, draw_rgb, draw_sigma
                )
                for k, r in enumerate(dw_refs):
                    gk = grads[k]

                    @pl.when(jnp.logical_not(first))
                    def _(r=r, gk=gk):
                        r[:] = r[:] + gk

                assert stage == "full_nodg", stage
                # consume dP without the hash backward loop
                put_sse(
                    sse_blk + jnp.sum(dP[:1, :1], keepdims=True) * 1e-30, first
                )
                return carry

            jax.lax.fori_loop(0, G, sub_block, 0, unroll=False)

        pl.run_scoped(
            body,
            pltpu.VMEM((n8, hspec.hi), cdt),
            pltpu.VMEM((n8, F * LANE), cdt),
            pltpu.VMEM((n8, F * LANE), cdt),
        )

    return kernel


def run_stage(fspec, hspec, tspec, packed, g, args, stage):
    rays_o, rays_d, sh, z_vals, deltas, noise, target = args
    RB, S, G = tspec.rays_block, tspec.n_samples, tspec.group
    R = target.shape[0]
    D = sh.shape[1]
    R_pad = -(-R // (RB * G)) * (RB * G)
    pad = ((0, R_pad - R), (0, 0))
    rw = jnp.pad(pack_ray_inputs(rays_o, rays_d, jnp.zeros_like(rays_d)), pad)
    shp = jnp.pad(sh, pad)
    zp = jnp.pad(z_vals, pad)
    dp = jnp.pad(deltas, pad)
    np_ = jnp.pad(noise, pad)
    tp = jnp.pad(target, pad)
    grid = (R_pad // (RB * G),)
    U, E, A = (jnp.asarray(m) for m in selector_mats(tspec))
    compiler_params = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)

    def const(m):
        nd = len(m.shape)
        return pl.BlockSpec(m.shape, (lambda i: (0,) * nd),
                            memory_space=pltpu.VMEM)

    def blk(cols):
        return pl.BlockSpec((G * RB, cols), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    w_specs = [const(w) for w in packed]
    dw_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in packed]
    dw_specs = [const(w) for w in packed]
    outs = pl.pallas_call(
        make_stage_kernel(fspec, hspec, tspec, stage),
        grid=grid,
        in_specs=[
            blk(16), blk(D), blk(tspec.n_samples), blk(tspec.n_samples),
            blk(tspec.n_samples), blk(3),
            const(U), const(E), const(A), const(g),
            *w_specs,
        ],
        out_specs=[
            blk(3), blk(tspec.n_samples),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            const(g),
            *dw_specs,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R_pad, 3), jnp.float32),
            jax.ShapeDtypeStruct((R_pad, tspec.n_samples), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct(g.shape, jnp.float32),
            *dw_shapes,
        ],
        compiler_params=compiler_params,
    )(rw, shp, zp, dp, np_, tp, U, E, A, g, *packed)
    return outs


def timeit_chained(f, packed, args, n=15, warmup=2):
    def one(carry, _):
        p0 = [packed[0] + carry * 0.0] + list(packed[1:])
        outs = f(p0)
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


def main():
    cfg = PRESETS["lego_ingp"]().replace(use_fused_kernel=True)
    model = create_nerf(cfg)
    params = model.init(jax.random.PRNGKey(0))
    hspec = HashEncodeSpec.from_encoding(model.pos_enc)
    g = pack_tables(hspec, params["pos_enc"]["tables"])
    fspec = FeatMLPSpec.from_configs(
        cfg.mlp, model.pos_enc.out_dim, model.dir_enc.out_dim
    )
    rng = np.random.default_rng(0)
    n_rand = 4096
    levels = [
        ("coarse", cfg.render.n_samples),
        ("fine", cfg.render.n_samples + cfg.render.n_importance),
    ]
    for lname, S in levels:
        rays_o = jnp.asarray(rng.uniform(-0.3, 0.3, (n_rand, 3)), jnp.float32)
        d = jnp.asarray(rng.normal(size=(n_rand, 3)), jnp.float32)
        vd = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        sh = model.dir_enc.apply({}, vd)
        z = jnp.sort(
            jnp.asarray(rng.uniform(0.5, 4.0, (n_rand, S)), jnp.float32),
            axis=-1,
        )
        deltas = jnp.asarray(rng.uniform(0.01, 0.1, (n_rand, S)), jnp.float32)
        nz = jnp.zeros((n_rand, S), jnp.float32)
        tgt = jnp.asarray(rng.uniform(size=(n_rand, 3)), jnp.float32)
        args = (rays_o, d, sh, z, deltas, nz, tgt)
        rb = default_rays_block(S, target_points=512)
        tspec = TrainSpec(
            n_samples=S, rays_block=rb, n_rays=n_rand,
            mode=cfg.render.compositing,
            density_activation=cfg.render.density_activation,
            white_bkgd=cfg.render.white_bkgd,
            group=default_group(S, rb, target_points=8192),
        )
        packed = pack_feat_params(fspec, params["coarse"])
        print(f"[{lname}] S={S} RB={rb} G={tspec.group} "
              f"RBS={rb*S}", flush=True)
        prev = 0.0
        for stage in ("io_only", "coords", "masks", "gemm1", "encode",
                      "encode_mlp", "full_nodg", "full"):
            f = functools.partial(
                run_stage, fspec, hspec, tspec, g=g, args=args, stage=stage
            )
            fn = lambda p, f=f: f(p)
            t = timeit_chained(fn, packed, args)
            print(f"[{lname}] {stage}: {t:.2f}ms (+{t - prev:.2f})",
                  flush=True)
            prev = t


if __name__ == "__main__":
    main()

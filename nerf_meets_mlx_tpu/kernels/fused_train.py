"""Fused train kernel: encode+MLP forward → volume compositing → MSE
cotangent → full backward → dW, in ONE Pallas launch per level.

Why: with the plain fused MLP op (kernels/fused_mlp.py), one value_and_grad
per level costs a forward launch (for the loss value) PLUS a backward launch
that re-runs the forward per block (flash-style recompute) — the forward
work is paid twice. But the training loss is plain MSE against a known
target, so its cotangent dL/drgb_map = 2·(rgb_map − target)/n is closed
form: a single kernel can run the forward, composite the ray colors, form
the loss gradient, and backprop — with every activation still resident in
VMEM. This removes the entire duplicated forward and also absorbs the XLA
compositing/loss ops.

This is SURVEY.md §7's "one fused ray-march kernel": stratified z-sampling
and importance resampling stay outside (they are parameter-free data
movement), everything parameterized — encode, MLP, transmittance scan,
composite, loss grad, backprop — is one launch.

v3 (r5): RAY-MAJOR dense IO. The r5 device-true ablation
(tools_dev/fused_train_ablation_probe.py, measured with lax.scan-chained
kernels after discovering 0.3–1.9 ms per-dispatch overhead on the tunneled
platform) showed the v2 kernel's GEMMs already ran at the analytic roofline;
the remaining ~3 ms/level was DMA of LANE-PADDED narrow arrays: the
point-major [N, 8] input and [N, 3]/[N, 1] outputs are physically stored as
(8, 128) tiles, a 16–43× byte inflation (~1.6 GB of HBM traffic per fine
call). v3 eliminates the padded streams entirely:

* Inputs are per-RAY and dense: rw [R, 16] (origin, direction, viewdir),
  z/deltas/noise [R, S] (lane-dense for S ≥ 128), target [R, 3]. Points are
  reconstructed IN-KERNEL (pts = o + z·d) via skinny selector GEMMs — the
  [N, 8] point stream (405 MB physical at the fine batch) never exists.
* Compositing runs RAY-MAJOR on [RB, S] tiles: the within-ray prefix/suffix
  sums are GEMMs with one [S, S] strictly-upper matrix A (prefix = q @ A,
  suffix = x @ Aᵀ). This replaces v2's [RBS, RBS] block-diagonal CS matrix —
  which was both the 2.2 ms narrow-GEMM tax and the quadratic VMEM term that
  capped the block size.
* Point-major ↔ ray-major conversions use two constant selectors:
  U [RB, RBS] (ray-of-point) and E [RBS, S] (sample-slot-of-point):
  to ray-major: U @ (v ⊙ E); to point-major: rowsum((Uᵀ @ V) ⊙ E).
  Each conversion is a ~2 M-MAC skinny GEMM — noise against the MLP chain.
* Outputs are dense: rgb_map [R, 3] and weights [R, S] (exactly what the
  importance sampler consumes) — v2 wrote both point-major-replicated
  (810 MB of padded writes per fine call).
* rays_block is a multiple of 8 (sublane-aligned sub-block stores); `group`
  sub-blocks share one grid step via an in-body fori_loop.

Both compositing modes of rendering/volume.py are supported: "canonical"
(sigmoid rgb, softplus/relu density, optical-depth transmittance) and
"reference" (raw rgb, relu only in alpha, RAW densities in the cumsum —
render.py:67-79 semantics).

Gradient contract: `fused_train_apply` returns (sse, rgb_map, weights) and
is differentiable ONLY through `sse` (w.r.t. the packed params): the kernel
already produced d(sse)/d(packed), and the custom VJP just scales it by the
incoming sse cotangent. rgb_map/weights carry structurally-zero cotangents —
callers must stop_gradient them (models/factory.py does; weights feed the
importance sampler which is stop-gradient anyway, matching the reference's
@torch.no_grad detachment).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_meets_mlx_tpu.kernels.fused_mlp import (
    FusedMLPSpec,
    _accumulate_dw,
    _backprop_core,
    _forward_core,
    _interpret,
    _n_layer_arrays,
)


@dataclasses.dataclass(frozen=True)
class TrainSpec:
    """Static description of the compositing + loss stage."""

    n_samples: int            # S: depth samples per ray
    rays_block: int           # rays per SUB-block (multiple of 8)
    n_rays: int               # valid (unpadded) ray count, for masking
    mode: str                 # "canonical" | "reference" (rendering/volume.py)
    density_activation: str   # "softplus" | "relu" (canonical mode only)
    white_bkgd: bool
    # sub-blocks per grid step (in-body fori_loop): amortizes per-step
    # costs; the VMEM-limiting live set stays sized by the sub-block
    group: int = 1


def max_fused_samples() -> int:
    """Largest per-ray sample count the kernel accepts. v3 requires
    rays_block to be a multiple of 8 (sublane-aligned ray-major stores), so
    past S=256 the minimum block is 8·S points and the stashed activations
    (~22 KB/point) blow the scoped-VMEM budget — callers
    (factory.supports_fused_train) fall back to the unfused path rather
    than VMEM-OOM at compile time."""
    return 256


def default_rays_block(n_samples: int, target_points: int = 2048) -> int:
    """Rays per sub-block: multiple of 8 (sublane alignment for the
    ray-major IO), sized so rays_block * n_samples ≈ target_points.

    The sub-block must keep all `depth` layer activations plus the dW
    accumulators in VMEM (the wrapper raises the compiler's scoped-VMEM cap
    when the estimate needs it). Swept on v5e (r5): 2048-point sub-blocks
    beat 1024 at the coarse level (9.1 -> 8.5 ms; halves the dW-epilogue
    count); the fine level floors at RB=8 (1536 points) — RB=16 measured
    slower (24.9 vs 24.0 ms, VMEM pressure)."""
    if n_samples > max_fused_samples():
        raise ValueError(
            f"n_samples={n_samples} exceeds the fused-train kernel's VMEM "
            f"bound ({max_fused_samples()}); use the unfused "
            "path (factory.supports_fused_train gates this automatically)"
        )
    rb = max(1, target_points // n_samples) // 8 * 8
    return max(8, rb)


def default_group(
    n_samples: int, rays_block: int, target_points: int = 16384
) -> int:
    """Sub-blocks per grid step: ~16384 points each (swept r5: coarse G=8
    at RB=32 and fine G=10 at RB=8 measured best; the curve is flat past
    G=4 so the exact target is uncritical)."""
    return max(1, target_points // (rays_block * n_samples))


# ---------------------------------------------------------------------------
# Shared compositing math (kernel + jnp twin)
# ---------------------------------------------------------------------------


def _alpha_terms(tspec: TrainSpec, raw_sigma, delta):
    """Returns (q, alpha, dalpha_dq, dq_to_draw) where q is the quantity the
    transmittance prefix-sums, alpha the per-sample opacity, dalpha_dq the
    local alpha derivative, and dq_to_draw the factor turning a q cotangent
    into a raw-density cotangent. Shapes all broadcast like raw_sigma."""
    f32 = jnp.float32
    if tspec.mode == "canonical":
        if tspec.density_activation == "softplus":
            sigma = jax.nn.softplus(raw_sigma)
            dsig = jax.nn.sigmoid(raw_sigma)
        elif tspec.density_activation == "relu":
            sigma = jax.nn.relu(raw_sigma)
            dsig = (raw_sigma > 0).astype(f32)
        else:
            raise ValueError(tspec.density_activation)
        q = sigma * delta
        # NB 1-exp, not -expm1: Mosaic has no expm1 lowering; the absolute
        # error vs expm1 is < 1e-7 for f32 optical depths
        e = jnp.exp(-q)
        alpha = 1.0 - e
        dalpha_dq = e
        dq_to_draw = delta * dsig
    elif tspec.mode == "reference":
        # render.py:67-79: alpha gets the relu, the cumsum does NOT
        q = delta * raw_sigma
        rq = jax.nn.relu(q)
        e = jnp.exp(-rq)
        alpha = 1.0 - e
        dalpha_dq = e * (q > 0).astype(f32)
        dq_to_draw = delta
    else:
        raise ValueError(tspec.mode)
    return q, alpha, dalpha_dq, dq_to_draw


# ---------------------------------------------------------------------------
# Selector matrices (host-side constants per (rays_block, n_samples))
# ---------------------------------------------------------------------------


def selector_mats(tspec: TrainSpec):
    """(U [RB, RBS], E [RBS, S], A [S, S]) as numpy f32, grid-invariant
    kernel inputs (constant index maps keep them VMEM-resident):

      U[r, k] = 1 iff point k belongs to ray r        (ray-of-point)
      E[k, s] = 1 iff point k is sample slot s        (slot-of-point)
      A[t, s] = 1 iff t < s (strictly upper): ray-major exclusive prefix
                sums are `x @ A`, exclusive suffix sums are `x @ Aᵀ`.
    """
    RB, S = tspec.rays_block, tspec.n_samples
    RBS = RB * S
    k = np.arange(RBS)
    r = np.arange(RB)
    U = (r[:, None] == (k[None, :] // S)).astype(np.float32)
    E = ((k[:, None] % S) == np.arange(S)[None, :]).astype(np.float32)
    t = np.arange(S)
    A = (t[:, None] < t[None, :]).astype(np.float32)
    return U, E, A


def pack_ray_inputs(
    rays_o: jnp.ndarray,    # [R, 3]
    rays_d: jnp.ndarray,    # [R, 3] (raw — pts = o + z·d)
    viewdirs: jnp.ndarray,  # [R, 3] normalized (dir-head input)
) -> jnp.ndarray:
    """[R, 16] per-ray row: cols 0-2 origin, 3-5 direction, 6-8 viewdir."""
    return jnp.pad(
        jnp.concatenate([rays_o, rays_d, viewdirs], axis=-1),
        ((0, 0), (0, 7)),
    )


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _train_kernel(
    spec: FusedMLPSpec, tspec: TrainSpec, rw_ref, z_ref, delta_ref,
    noise_ref, target_ref, u_ref, e_ref, a_ref, *refs,
):
    n_w = _n_layer_arrays(spec)
    w_refs = refs[:n_w]
    rgb_ref, wts_ref, sse_ref = refs[n_w], refs[n_w + 1], refs[n_w + 2]
    dw_refs = refs[n_w + 3 :]
    ws = [r[:] for r in w_refs]
    RB, S, G = tspec.rays_block, tspec.n_samples, tspec.group
    RBS = RB * S
    f32 = jnp.float32
    U, E, A = u_ref[:], e_ref[:], a_ref[:]
    pid = pl.program_id(0)

    def mmf(a, b):  # f32 matmul (compositing precision)
        return jnp.dot(a, b, preferred_element_type=f32)

    def mmTf(a, b):  # a.T @ b (contract dim 0), f32
        return jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())), preferred_element_type=f32
        )

    def mmbTf(a, b):  # a @ b.T (contract dim 1), f32
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())), preferred_element_type=f32
        )

    def to_pm(v_rm):  # [RB, S] ray-major -> [RBS, 1] point-major
        return jnp.sum(mmTf(U, v_rm) * E, axis=1, keepdims=True)

    def to_rm(v_pm):  # [RBS, 1] point-major -> [RB, S] ray-major
        return mmf(U, v_pm * E)

    def sub_block(j, carry):
        rw = rw_ref[pl.ds(j * RB, RB), :]        # [RB, 16]
        zb = z_ref[pl.ds(j * RB, RB), :]         # [RB, S]
        db = delta_ref[pl.ds(j * RB, RB), :]     # [RB, S]
        nb = noise_ref[pl.ds(j * RB, RB), :]     # [RB, S]
        tb = target_ref[pl.ds(j * RB, RB), :]    # [RB, 3]

        # in-kernel point construction: pts = o + z·d (the [N, 8] padded
        # point stream of v2 never exists)
        pm16 = mmTf(U, rw)                       # [RBS, 16]
        z_pm = to_pm(zb)                         # [RBS, 1]
        pts = pm16[:, 0:3] + z_pm * pm16[:, 3:6]
        vd_pm = pm16[:, 6:9]

        # packed encode directly from parts: M rows 0-2 are position bands,
        # 3-5 direction bands (rows 6-7 structurally zero in v2's layout)
        cdt = jnp.bfloat16 if spec.compute_dtype == "bfloat16" else f32
        M, phi = ws[0], ws[1]
        T = (
            jnp.dot(pts.astype(cdt), M[0:3].astype(cdt),
                    preferred_element_type=f32)
            + jnp.dot(vd_pm.astype(cdt), M[3:6].astype(cdt),
                      preferred_element_type=f32)
            + phi
        )
        out, residuals = _forward_core(spec, None, ws, want_residuals=True, T=T)
        raw_rgb = out[:, 0:3]                    # [RBS, 3] point-major

        # ---- ray-major compositing ----
        sig_rm = to_rm(out[:, 3:4]) + nb         # [RB, S] + pre-scaled noise
        q, alpha, dalpha_dq, dq_to_draw = _alpha_terms(tspec, sig_rm, db)
        Texc = jnp.exp(-mmf(q, A))               # exclusive within-ray prefix
        w_rm = alpha * Texc                      # [RB, S] sample weights
        c = jax.nn.sigmoid(raw_rgb) if tspec.mode == "canonical" else raw_rgb

        w_pm = to_pm(w_rm)                       # [RBS, 1]
        rgb_map = mmf(U, w_pm * c)               # [RB, 3]
        if tspec.white_bkgd:
            acc = jnp.sum(w_rm, axis=1, keepdims=True)   # [RB, 1]
            rgb_map = rgb_map + (1.0 - acc)

        wts_ref[pl.ds(j * RB, RB), :] = w_rm
        rgb_ref[pl.ds(j * RB, RB), :] = rgb_map

        # ---- loss (masked: padded rays contribute nothing) ----
        ridx = (
            jax.lax.broadcasted_iota(jnp.int32, (RB, 1), 0)
            + (pid * G + j) * RB
        )
        valid = (ridx < tspec.n_rays).astype(f32)        # [RB, 1]
        resid = (rgb_map - tb) * valid
        sse_blk = jnp.sum(resid * resid, axis=(0, 1), keepdims=True)  # [1, 1]

        first = jnp.logical_and(pid == 0, j == 0)

        @pl.when(first)
        def _():
            sse_ref[:] = sse_blk

        @pl.when(jnp.logical_not(first))
        def _():
            sse_ref[:] = sse_ref[:] + sse_blk

        # ---- backward: d(sse)/drgb_map = 2·resid ----
        g = 2.0 * resid                          # [RB, 3]
        g_pt = mmTf(U, g)                        # [RBS, 3] per-ray broadcast
        dc = w_pm * g_pt                         # [RBS, 3]
        dwght_pm = jnp.sum(c * g_pt, axis=1, keepdims=True)  # [RBS, 1]
        if tspec.white_bkgd:
            gsum = jnp.sum(g, axis=1, keepdims=True)   # [RB, 1]
            dwght_pm = dwght_pm - mmTf(U, gsum)

        # w_s = alpha_s·T_s with T_s = exp(-Σ_{t<s} q_t):
        #   dq_t = dw_t·T_t·(dalpha/dq)_t − Σ_{s>t} dw_s·w_s
        # (exclusive suffix = @ Aᵀ)
        dw_rm = to_rm(dwght_pm)                  # [RB, S]
        dq_rm = dw_rm * Texc * dalpha_dq - mmbTf(dw_rm * w_rm, A)
        draw_sigma = to_pm(dq_rm * dq_to_draw)   # [RBS, 1]
        draw_rgb = dc * c * (1.0 - c) if tspec.mode == "canonical" else dc

        dout = jnp.concatenate(
            [draw_rgb, draw_sigma, jnp.zeros((RBS, 4), f32)], axis=1
        )
        grads, _ = _backprop_core(spec, ws, residuals, dout)
        _accumulate_dw(grads, dw_refs, first=first)
        return carry

    jax.lax.fori_loop(0, G, sub_block, 0, unroll=False)


# ---------------------------------------------------------------------------
# Host-side wrapper + custom VJP
# ---------------------------------------------------------------------------


def _train_pallas(
    spec: FusedMLPSpec,
    tspec: TrainSpec,
    packed: List[jnp.ndarray],
    rays_o: jnp.ndarray,    # [R, 3]
    rays_d: jnp.ndarray,    # [R, 3]
    viewdirs: jnp.ndarray,  # [R, 3] normalized
    z_vals: jnp.ndarray,    # [R, S]
    deltas: jnp.ndarray,    # [R, S] — pre-scaled by ||rays_d||, 1e10 terminal
    noise: jnp.ndarray,     # [R, S] — pre-scaled density noise (zeros if off)
    target: jnp.ndarray,    # [R, 3]
):
    RB, S, G = tspec.rays_block, tspec.n_samples, tspec.group
    RBS = RB * S
    R = target.shape[0]
    assert z_vals.shape == (R, S), (z_vals.shape, R, S)
    R_pad = -(-R // (RB * G)) * (RB * G)
    pad = ((0, R_pad - R), (0, 0))
    rw = jnp.pad(pack_ray_inputs(rays_o, rays_d, viewdirs), pad)
    zp = jnp.pad(z_vals, pad)
    dp = jnp.pad(deltas, pad)
    np_ = jnp.pad(noise, pad)
    tp = jnp.pad(target, pad)
    grid = (R_pad // (RB * G),)
    U, E, A = (jnp.asarray(m) for m in selector_mats(tspec))

    # scoped-VMEM estimate: residual activations dominate (T, S, hs[depth],
    # feat, hd), plus the selectors, the packed weights and dW accumulators;
    # raise the compiler's ~16 MB default when a large sub-block needs it
    # (physical VMEM is far larger). Mosaic stack-allocates up to ~3x a
    # naive live-set estimate (measured in fused_feat_train).
    n_res = 2 * spec.sw + spec.depth * spec.width + spec.width + spec.w2
    est = 4 * (
        2 * RBS * n_res
        + RBS * S + S * S + RB * RBS
        + G * RB * (16 + 3 * S + 3 + S + 3)
        + 2 * sum(int(np.prod(w.shape)) for w in packed)
    )
    compiler_params = None
    if est > 12 * 1024 * 1024:
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
        functools.partial(_train_kernel, spec, tspec),
        grid=grid,
        in_specs=[
            blk(16), blk(S), blk(S), blk(S), blk(3),
            const2(U), const2(E), const2(A),
            *w_specs,
        ],
        out_specs=[
            blk(3),
            blk(S),
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
        interpret=_interpret(),
    )(rw, zp, dp, np_, tp, U, E, A, *packed)
    return outs[0][:R], outs[1][:R], outs[2][0, 0], list(outs[3:])


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fused_train_core(
    spec: FusedMLPSpec,
    tspec: TrainSpec,
    packed: List[jnp.ndarray],
    rays_o, rays_d, viewdirs, z_vals, deltas, noise, target,
):
    rgb, wts, sse, _ = _train_pallas(
        spec, tspec, packed, rays_o, rays_d, viewdirs, z_vals, deltas,
        noise, target,
    )
    return sse, rgb, wts


def _vjp_fwd(spec, tspec, packed, rays_o, rays_d, viewdirs, z_vals, deltas,
             noise, target):
    rgb, wts, sse, dws = _train_pallas(
        spec, tspec, packed, rays_o, rays_d, viewdirs, z_vals, deltas,
        noise, target,
    )
    shapes = tuple(
        a.shape for a in
        (rays_o, rays_d, viewdirs, z_vals, deltas, noise, target)
    )
    return (sse, rgb, wts), (dws, shapes)


def _vjp_bwd(spec, tspec, res, cots):
    dws, shapes = res
    dsse, _drgb, _dwts = cots  # rgb/weights cotangents are structurally zero
    dpacked = [
        jnp.zeros((8, spec.sw), jnp.float32),   # band matrix (constant)
        jnp.zeros((1, spec.sw), jnp.float32),   # phases (constant)
    ] + [dsse * g for g in dws]
    return (dpacked,) + tuple(jnp.zeros(s, jnp.float32) for s in shapes)


_fused_train_core.defvjp(_vjp_fwd, _vjp_bwd)


def fused_train_apply(
    spec: FusedMLPSpec,
    tspec: TrainSpec,
    packed: List[jnp.ndarray],
    rays_o, rays_d, viewdirs, z_vals, deltas, noise, target,
):
    """One-launch train op: (sse, rgb_map [R,3], weights [R,S]).

    sse = Σ_valid rays ‖rgb_map − target‖² — the ONLY differentiable output
    (w.r.t. `packed`; the ray/depth/target inputs are data). rgb_map/weights
    come back already stop-gradient'd: their cotangents are discarded by the
    custom VJP (the kernel computes only the sse pullback), so a caller
    differentiating through them must get zero BY CONSTRUCTION rather than
    silently-wrong gradients."""
    sse, rgb, wts = _fused_train_core(
        spec, tspec, packed, rays_o, rays_d, viewdirs, z_vals, deltas,
        noise, target,
    )
    return sse, jax.lax.stop_gradient(rgb), jax.lax.stop_gradient(wts)


# ---------------------------------------------------------------------------
# Forward-only eval kernel (dense ray-major IO — the serving/render path)
# ---------------------------------------------------------------------------
#
# Why: render_image/render_orbit (the eval path the battery, periodic
# renders, and any serving deployment sit on) still ran the v2-style
# point-major pipeline — pack_inputs builds a [B*S, 8] point stream
# (8→128 lane padding, 16× physical inflation), fused_apply writes a
# [B*S, 8] padded output, and XLA recomposites from HBM. The v3 train
# ablation showed exactly that padded DMA is the dominant non-GEMM cost.
# Eval needs no noise, no loss, and no backward, so the forward half of the
# v3 train kernel IS the eval kernel: dense per-ray inputs, points rebuilt
# in-kernel, ray-major compositing, dense rgb [R, 3] + weights [R, S] out.
# depth/disp/acc maps are cheap XLA reductions over the dense weights
# (rendering/volume.py formulas — see factory._maps_from_weights).


# eval sub-block sizing: no residual stash or dW accumulators in the live
# set, so the sweet spot can sit above the train kernel's 2048/16384
# (swept on the real chip by tools_dev/eval_render_probe.py --sweep)
EVAL_TARGET_POINTS = 2048
EVAL_GROUP_POINTS = 16384


def eval_block(n_samples: int):
    """(rays_block, group) for the forward-only eval kernel."""
    rb = default_rays_block(n_samples, target_points=EVAL_TARGET_POINTS)
    return rb, default_group(n_samples, rb, target_points=EVAL_GROUP_POINTS)


def _eval_kernel(
    spec: FusedMLPSpec, tspec: TrainSpec, rw_ref, z_ref, delta_ref,
    u_ref, e_ref, a_ref, *refs,
):
    n_w = _n_layer_arrays(spec)
    w_refs = refs[:n_w]
    rgb_ref, wts_ref = refs[n_w], refs[n_w + 1]
    ws = [r[:] for r in w_refs]
    RB, S, G = tspec.rays_block, tspec.n_samples, tspec.group
    f32 = jnp.float32
    U, E, A = u_ref[:], e_ref[:], a_ref[:]

    def mmf(a, b):
        return jnp.dot(a, b, preferred_element_type=f32)

    def mmTf(a, b):
        return jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())), preferred_element_type=f32
        )

    def to_pm(v_rm):
        return jnp.sum(mmTf(U, v_rm) * E, axis=1, keepdims=True)

    def to_rm(v_pm):
        return mmf(U, v_pm * E)

    def sub_block(j, carry):
        rw = rw_ref[pl.ds(j * RB, RB), :]        # [RB, 16]
        zb = z_ref[pl.ds(j * RB, RB), :]         # [RB, S]
        db = delta_ref[pl.ds(j * RB, RB), :]     # [RB, S]

        pm16 = mmTf(U, rw)                       # [RBS, 16]
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
        out = _forward_core(spec, None, ws, want_residuals=False, T=T)
        raw_rgb = out[:, 0:3]

        sig_rm = to_rm(out[:, 3:4])              # eval: raw_noise_std = 0
        q, alpha, _, _ = _alpha_terms(tspec, sig_rm, db)
        Texc = jnp.exp(-mmf(q, A))
        w_rm = alpha * Texc
        c = jax.nn.sigmoid(raw_rgb) if tspec.mode == "canonical" else raw_rgb

        w_pm = to_pm(w_rm)
        rgb_map = mmf(U, w_pm * c)
        if tspec.white_bkgd:
            acc = jnp.sum(w_rm, axis=1, keepdims=True)
            rgb_map = rgb_map + (1.0 - acc)

        wts_ref[pl.ds(j * RB, RB), :] = w_rm
        rgb_ref[pl.ds(j * RB, RB), :] = rgb_map
        return carry

    jax.lax.fori_loop(0, G, sub_block, 0, unroll=False)


def _eval_pallas(
    spec: FusedMLPSpec,
    tspec: TrainSpec,
    packed: List[jnp.ndarray],
    rays_o: jnp.ndarray,    # [R, 3]
    rays_d: jnp.ndarray,    # [R, 3]
    viewdirs: jnp.ndarray,  # [R, 3] normalized
    z_vals: jnp.ndarray,    # [R, S]
    deltas: jnp.ndarray,    # [R, S] — pre-scaled by ||rays_d||, 1e10 terminal
):
    RB, S, G = tspec.rays_block, tspec.n_samples, tspec.group
    RBS = RB * S
    R = rays_o.shape[0]
    assert z_vals.shape == (R, S), (z_vals.shape, R, S)
    R_pad = -(-R // (RB * G)) * (RB * G)
    pad = ((0, R_pad - R), (0, 0))
    rw = jnp.pad(pack_ray_inputs(rays_o, rays_d, viewdirs), pad)
    zp = jnp.pad(z_vals, pad)
    dp = jnp.pad(deltas, pad)
    grid = (R_pad // (RB * G),)
    U, E, A = (jnp.asarray(m) for m in selector_mats(tspec))

    # live set: forward activations only (no residual stash, no dW
    # accumulators) — roughly half the train kernel's estimate
    n_res = 2 * spec.sw + spec.depth * spec.width + spec.width + spec.w2
    est = 4 * (
        RBS * n_res
        + RBS * S + S * S + RB * RBS
        + G * RB * (16 + 2 * S + S + 3)
        + sum(int(np.prod(w.shape)) for w in packed)
    )
    compiler_params = None
    if est > 12 * 1024 * 1024:
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
    outs = pl.pallas_call(
        functools.partial(_eval_kernel, spec, tspec),
        grid=grid,
        in_specs=[
            blk(16), blk(S), blk(S),
            const2(U), const2(E), const2(A),
            *w_specs,
        ],
        out_specs=[blk(3), blk(S)],
        out_shape=[
            jax.ShapeDtypeStruct((R_pad, 3), jnp.float32),
            jax.ShapeDtypeStruct((R_pad, S), jnp.float32),
        ],
        compiler_params=compiler_params,
        interpret=_interpret(),
    )(rw, zp, dp, U, E, A, *packed)
    return outs[0][:R], outs[1][:R]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fused_eval_core(
    spec: FusedMLPSpec, tspec: TrainSpec, packed, rays_o, rays_d, viewdirs,
    z_vals, deltas,
):
    return _eval_pallas(
        spec, tspec, packed, rays_o, rays_d, viewdirs, z_vals, deltas
    )


def _eval_vjp_fwd(spec, tspec, packed, rays_o, rays_d, viewdirs, z_vals,
                  deltas):
    out = _eval_pallas(
        spec, tspec, packed, rays_o, rays_d, viewdirs, z_vals, deltas
    )
    shapes = (
        tuple(w.shape for w in packed),
        tuple(a.shape for a in (rays_o, rays_d, viewdirs, z_vals, deltas)),
    )
    return out, shapes


def _eval_vjp_bwd(spec, tspec, res, cots):
    w_shapes, in_shapes = res
    return ([jnp.zeros(s, jnp.float32) for s in w_shapes],) + tuple(
        jnp.zeros(s, jnp.float32) for s in in_shapes
    )


_fused_eval_core.defvjp(_eval_vjp_fwd, _eval_vjp_bwd)


def fused_eval_apply(
    spec: FusedMLPSpec,
    tspec: TrainSpec,
    packed: List[jnp.ndarray],
    rays_o, rays_d, viewdirs, z_vals, deltas,
):
    """Forward-only render op: (rgb_map [R, 3], weights [R, S]).

    Not differentiable (the eval/serving path never is). A zero-cotangent
    custom VJP makes an accidental grad trace produce structural zeros
    rather than a missing-JVP error from inside the pallas_call — plain
    stop_gradient on the outputs would not stop linearization of the
    kernel itself."""
    rgb, wts = _fused_eval_core(
        spec, tspec, packed, rays_o, rays_d, viewdirs, z_vals, deltas
    )
    return jax.lax.stop_gradient(rgb), jax.lax.stop_gradient(wts)


# ---------------------------------------------------------------------------
# Pure-jnp twin (differentiable; parity tests + CPU fallback semantics)
# ---------------------------------------------------------------------------


def pack_inputs_train(
    pts: jnp.ndarray,       # [B, S, 3]
    viewdirs: jnp.ndarray,  # [B, 3] normalized
    deltas: jnp.ndarray,    # [B, S] — pre-scaled by ||rays_d||, 1e10 terminal
    noise: jnp.ndarray,     # [B, S] — pre-scaled density noise (zeros if off)
) -> jnp.ndarray:
    """[B*S, 8] point-major packing: cols 0-2 pts, 3-5 dirs, 6 delta,
    7 noise. The twin's internal layout (v2's kernel input; the v3 kernel
    reconstructs points in-kernel instead)."""
    B, S = pts.shape[:2]
    dirs = jnp.broadcast_to(viewdirs[:, None, :], (B, S, 3))
    x = jnp.concatenate(
        [pts, dirs, deltas[..., None], noise[..., None]], axis=-1
    )
    return x.reshape(B * S, 8)


def fused_train_reference(
    spec: FusedMLPSpec,
    tspec: TrainSpec,
    packed: List[jnp.ndarray],
    rays_o, rays_d, viewdirs, z_vals, deltas, noise, target,
):
    """Same math as the kernel in plain jnp (jax-differentiable)."""
    pts = rays_o[:, None, :] + z_vals[..., None] * rays_d[:, None, :]
    x = pack_inputs_train(pts, viewdirs, deltas, noise)
    return _reference_from_x(spec, tspec, packed, x, target)


def _reference_from_x(
    spec: FusedMLPSpec,
    tspec: TrainSpec,
    packed: List[jnp.ndarray],
    x: jnp.ndarray,        # [R*S, 8]
    target: jnp.ndarray,   # [R, 3]
):
    """Twin body on the point-major packed layout (also used by tests that
    construct points directly)."""
    S = tspec.n_samples
    R = target.shape[0]
    out = _forward_core(spec, x, packed)
    raw_rgb = out[:, 0:3].reshape(R, S, 3)
    raw_sigma = (out[:, 3] + x[:, 7]).reshape(R, S)
    delta = x[:, 6].reshape(R, S)

    q, alpha, _, _ = _alpha_terms(tspec, raw_sigma, delta)
    q_excl = jnp.concatenate(
        [jnp.zeros_like(q[:, :1]), jnp.cumsum(q[:, :-1], axis=-1)], axis=-1
    )
    Texc = jnp.exp(-q_excl)
    w = alpha * Texc                                           # [R, S]
    c = jax.nn.sigmoid(raw_rgb) if tspec.mode == "canonical" else raw_rgb
    rgb_map = jnp.sum(w[..., None] * c, axis=1)                # [R, 3]
    if tspec.white_bkgd:
        rgb_map = rgb_map + (1.0 - jnp.sum(w, axis=1, keepdims=True))
    sse = jnp.sum((rgb_map - target) ** 2)
    return sse, rgb_map, w

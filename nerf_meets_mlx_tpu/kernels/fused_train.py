"""Fused train kernel: encode+MLP forward → volume compositing → MSE
cotangent → full backward → dW, in ONE Pallas launch per level.

Why: with the plain fused MLP op (kernels/fused_mlp.py), one value_and_grad
per level costs a forward launch (for the loss value) PLUS a backward launch
that re-runs the forward per block (flash-style recompute) — the forward
work is paid twice. But the training loss is plain MSE against a known
target, so its cotangent dL/drgb_map = 2·(rgb_map − target)/n is closed
form: a single kernel can run the forward, composite the ray colors, form
the loss gradient, and backprop — with every activation still resident in
VMEM. This removes the entire duplicated forward (≈ fwd-launch time per
level per step) and also absorbs the XLA compositing/loss ops.

This is SURVEY.md §7's "one fused ray-march kernel": stratified z-sampling
and importance resampling stay outside (they are parameter-free data
movement), everything parameterized — encode, MLP, transmittance scan,
composite, loss grad, backprop — is one launch.

Compositing inside the kernel, TPU-shaped:

* The kernel blocks over RAYS (rays_block rays × n_samples points per grid
  step) so the per-ray transmittance scan never crosses a block boundary.
* No reshapes/gathers: the within-ray exclusive prefix sum is a GEMM with a
  block-diagonal strictly-lower 0/1 matrix CS built from iota comparisons
  (CS[k, j] = 1 iff points k, j share a ray and j < k); the backward's
  within-ray suffix sums reuse CS through a transposed contraction. Ray
  reductions (color composite, per-point broadcast of per-ray cotangents)
  use the ray-selector matrix U[r, k] = 1 iff point k ∈ ray r. These
  matrices cost ≲1 MACs-million per block — noise against the MLP GEMMs.
* Per-point delta (pre-scaled by ‖rays_d‖, with the reference's 1e10
  terminal bin — render.py:46-59) and pre-scaled density noise ride in the
  two spare input columns (6, 7) of the [N, 8] input tile: rows 6/7 of the
  packed band matrix are structurally zero, so they never leak into the
  network.
* Both compositing modes of rendering/volume.py are supported: "canonical"
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
    rays_block: int           # rays per grid step
    n_rays: int               # valid (unpadded) ray count, for masking
    mode: str                 # "canonical" | "reference" (rendering/volume.py)
    density_activation: str   # "softplus" | "relu" (canonical mode only)
    white_bkgd: bool


def max_fused_samples(target_points: int = 1024) -> int:
    """Largest per-ray sample count the kernel accepts. Past ~2x the block
    target, rays_block clamps to 1 and the [RBS, RBS] scan matrix + live
    activations grow as n_samples^2 with no way to shrink the block —
    callers (factory.supports_fused_train) fall back to the unfused path
    rather than VMEM-OOM at compile time."""
    return 2 * target_points


def default_rays_block(n_samples: int, target_points: int = 1024) -> int:
    """Rays per block such that rays_block * n_samples ≈ target_points.

    The block must keep all `depth` layer activations plus the dW
    accumulators and the [RBS, RBS] scan matrix in VMEM (the wrapper
    raises the compiler's scoped-VMEM cap when the estimate needs it).
    Swept on v5e (tools_dev/rays_block_sweep.py, r4): 1024-point blocks
    beat 512 at both flagship levels (coarse 10.5 -> 9.9 ms, fine
    30.1 -> 28.6 ms); 2048 regresses both."""
    if n_samples > max_fused_samples(target_points):
        raise ValueError(
            f"n_samples={n_samples} exceeds the fused-train kernel's VMEM "
            f"bound ({max_fused_samples(target_points)}); use the unfused "
            "path (factory.supports_fused_train gates this automatically)"
        )
    return max(1, target_points // n_samples)


def pack_inputs_train(
    pts: jnp.ndarray,       # [B, S, 3]
    viewdirs: jnp.ndarray,  # [B, 3] normalized
    deltas: jnp.ndarray,    # [B, S] — pre-scaled by ||rays_d||, 1e10 terminal
    noise: jnp.ndarray,     # [B, S] — pre-scaled density noise (zeros if off)
) -> jnp.ndarray:
    """[B*S, 8] kernel input: cols 0-2 pts, 3-5 dirs, 6 delta, 7 noise."""
    B, S = pts.shape[:2]
    dirs = jnp.broadcast_to(viewdirs[:, None, :], (B, S, 3))
    x = jnp.concatenate(
        [pts, dirs, deltas[..., None], noise[..., None]], axis=-1
    )
    return x.reshape(B * S, 8)


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
    """(CS [RBS, RBS], U [RB, RBS], U_first [RB, RBS]) as numpy f32.

    Grid-invariant kernel INPUTS (constant index maps keep them VMEM-
    resident across the whole grid). v1 rebuilt them from iota compares on
    every grid step; at the fine level (rays_block=2 -> 2048 grid steps per
    4096-ray batch) those VPU compares rivalled the compositing GEMMs."""
    RB, S = tspec.rays_block, tspec.n_samples
    RBS = RB * S
    k = np.arange(RBS)
    ray = k // S
    CS = ((ray[:, None] == ray[None, :]) & (k[None, :] < k[:, None])).astype(np.float32)
    r = np.arange(RB)
    U = (r[:, None] == ray[None, :]).astype(np.float32)
    U_first = ((r[:, None] * S) == k[None, :]).astype(np.float32)
    return CS, U, U_first


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _train_kernel(
    spec: FusedMLPSpec, tspec: TrainSpec, x_ref, target_ref, cs_ref, u_ref,
    uf_ref, *refs,
):
    n_w = _n_layer_arrays(spec)
    w_refs = refs[:n_w]
    rgb_ref, wts_ref, sse_ref = refs[n_w], refs[n_w + 1], refs[n_w + 2]
    dw_refs = refs[n_w + 3 :]
    ws = [r[:] for r in w_refs]
    X = x_ref[:]  # [RBS, 8]
    RB, S = tspec.rays_block, tspec.n_samples
    RBS = RB * S
    f32 = jnp.float32

    out, residuals = _forward_core(spec, X, ws, want_residuals=True)
    raw_rgb = out[:, 0:3]                    # [RBS, 3]
    raw_sigma = out[:, 3:4] + X[:, 7:8]      # + pre-scaled noise (col 7)
    delta = X[:, 6:7]                        # [RBS, 1]

    def mmf(a, b):  # f32 matmul (compositing precision)
        return jnp.dot(a, b, preferred_element_type=f32)

    def mmTf(a, b):  # a.T @ b (contract dim 0), f32
        return jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())), preferred_element_type=f32
        )

    CS, U, U_first = cs_ref[:], u_ref[:], uf_ref[:]

    q, alpha, dalpha_dq, dq_to_draw = _alpha_terms(tspec, raw_sigma, delta)
    Texc = jnp.exp(-mmf(CS, q))              # exclusive within-ray prefix
    w = alpha * Texc                         # [RBS, 1] sample weights
    c = jax.nn.sigmoid(raw_rgb) if tspec.mode == "canonical" else raw_rgb

    rgb_map = mmf(U, w * c)                  # [RB, 3]
    if tspec.white_bkgd:
        acc = mmf(U, w)                      # [RB, 1]
        rgb_map = rgb_map + (1.0 - acc)

    # per-point outputs (per-RAY blocks of 2-8 sublanes violate the TPU
    # (8, 128) tiling rule, so weights/rgb leave the kernel point-major and
    # the wrapper reshapes/slices them outside)
    wts_ref[:] = w
    rgb_ref[:] = mmTf(U, rgb_map)            # ray rgb replicated per point

    # ---- loss (masked: padded rays contribute nothing) ----
    # per-ray target = the first sample's row of the point-major target
    # (exact — no division)
    target_ray = mmf(U_first, target_ref[:])  # [RB, 3]
    pid = pl.program_id(0)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (RB, 1), 0) + pid * RB
    valid = (ridx < tspec.n_rays).astype(f32)        # [RB, 1]
    resid = (rgb_map - target_ray) * valid
    sse_blk = jnp.sum(resid * resid, axis=(0, 1), keepdims=True)  # [1, 1]

    first = pid == 0

    @pl.when(first)
    def _():
        sse_ref[:] = sse_blk

    @pl.when(jnp.logical_not(first))
    def _():
        sse_ref[:] = sse_ref[:] + sse_blk

    # ---- backward: d(sse)/drgb_map = 2·resid ----
    g = 2.0 * resid                          # [RB, 3]
    g_pt = mmTf(U, g)                        # [RBS, 3] per-ray broadcast
    dc = w * g_pt                            # [RBS, 3]
    dw = jnp.sum(c * g_pt, axis=1, keepdims=True)  # [RBS, 1]
    if tspec.white_bkgd:
        gsum = jnp.sum(g, axis=1, keepdims=True)   # [RB, 1]
        dw = dw - mmTf(U, gsum)

    # w_s = alpha_s·T_s with T_s = exp(-Σ_{t<s} q_t):
    #   dq_t = dw_t·T_t·(dalpha/dq)_t − Σ_{s>t} dw_s·w_s
    # (the suffix sum is CS through the transposed contraction)
    dq = dw * Texc * dalpha_dq - mmTf(CS, dw * w)
    draw_sigma = dq * dq_to_draw
    draw_rgb = dc * c * (1.0 - c) if tspec.mode == "canonical" else dc

    dout = jnp.concatenate(
        [draw_rgb, draw_sigma, jnp.zeros((RBS, 4), f32)], axis=1
    )
    grads, _ = _backprop_core(spec, ws, residuals, dout)
    _accumulate_dw(grads, dw_refs)


# ---------------------------------------------------------------------------
# Host-side wrapper + custom VJP
# ---------------------------------------------------------------------------


def _train_pallas(
    spec: FusedMLPSpec,
    tspec: TrainSpec,
    packed: List[jnp.ndarray],
    x: jnp.ndarray,        # [R*S, 8]
    target: jnp.ndarray,   # [R, 3]
):
    RB, S = tspec.rays_block, tspec.n_samples
    RBS = RB * S
    R = target.shape[0]
    assert x.shape[0] == R * S, (x.shape, R, S)
    R_pad = -(-R // RB) * RB
    xp = jnp.pad(x, ((0, (R_pad - R) * S), (0, 0)))
    tp = jnp.pad(target, ((0, R_pad - R), (0, 0)))
    # point-major target (per-ray blocks would violate the (8, 128) tiling
    # minimum; the replication costs ~10 MB of HBM reads per call)
    tp = jnp.broadcast_to(tp[:, None, :], (R_pad, S, 3)).reshape(R_pad * S, 3)
    grid = (R_pad // RB,)
    CS, U, U_first = (jnp.asarray(m) for m in selector_mats(tspec))

    # scoped-VMEM estimate: residual activations dominate (T, S, hs[depth],
    # feat, hd), plus the CS matrix, the packed weights and dW accumulators;
    # raise the compiler's ~16 MB default when a large rays_block needs it
    # (physical VMEM is far larger)
    n_res = 2 * spec.sw + spec.depth * spec.width + spec.width + spec.w2
    est = 4 * (
        2 * RBS * n_res
        + RBS * RBS
        + 2 * sum(int(np.prod(w.shape)) for w in packed)
    )
    compiler_params = None
    if est > 12 * 1024 * 1024:
        # Mosaic stack-allocates ~3x a naive live-set estimate (measured in
        # fused_feat_train, same pattern) — without the 3x headroom the
        # upper half of the max_fused_samples range (1024 < S <= 2048,
        # rays_block=1) can fail scoped-VMEM allocation at compile time
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
        functools.partial(_train_kernel, spec, tspec),
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
        interpret=_interpret(),
    )(xp, tp, CS, U, U_first, *packed)
    # back to per-ray layout: rgb is replicated across a ray's points (take
    # the first); weights are point-major
    rgb = outs[0].reshape(R_pad, S, 3)[:R, 0]
    wts = outs[1].reshape(R_pad, S)[:R]
    return rgb, wts, outs[2][0, 0], list(outs[3:])


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fused_train_core(
    spec: FusedMLPSpec,
    tspec: TrainSpec,
    packed: List[jnp.ndarray],
    x: jnp.ndarray,
    target: jnp.ndarray,
):
    rgb, wts, sse, _ = _train_pallas(spec, tspec, packed, x, target)
    return sse, rgb, wts


def _vjp_fwd(spec, tspec, packed, x, target):
    rgb, wts, sse, dws = _train_pallas(spec, tspec, packed, x, target)
    return (sse, rgb, wts), (dws, x.shape, target.shape)


def _vjp_bwd(spec, tspec, res, cots):
    dws, x_shape, t_shape = res
    dsse, _drgb, _dwts = cots  # rgb/weights cotangents are structurally zero
    dpacked = [
        jnp.zeros((8, spec.sw), jnp.float32),   # band matrix (constant)
        jnp.zeros((1, spec.sw), jnp.float32),   # phases (constant)
    ] + [dsse * g for g in dws]
    return dpacked, jnp.zeros(x_shape, jnp.float32), jnp.zeros(t_shape, jnp.float32)


_fused_train_core.defvjp(_vjp_fwd, _vjp_bwd)


def fused_train_apply(
    spec: FusedMLPSpec,
    tspec: TrainSpec,
    packed: List[jnp.ndarray],
    x: jnp.ndarray,
    target: jnp.ndarray,
):
    """One-launch train op: (sse, rgb_map [R,3], weights [R,S]).

    sse = Σ_valid rays ‖rgb_map − target‖² — the ONLY differentiable output
    (w.r.t. `packed`; x and target are data). rgb_map/weights come back
    already stop-gradient'd: their cotangents are discarded by the custom
    VJP (the kernel computes only the sse pullback), so a caller
    differentiating through them must get zero BY CONSTRUCTION rather than
    silently-wrong gradients."""
    sse, rgb, wts = _fused_train_core(spec, tspec, packed, x, target)
    return sse, jax.lax.stop_gradient(rgb), jax.lax.stop_gradient(wts)


# ---------------------------------------------------------------------------
# Pure-jnp twin (differentiable; parity tests + CPU fallback semantics)
# ---------------------------------------------------------------------------


def fused_train_reference(
    spec: FusedMLPSpec,
    tspec: TrainSpec,
    packed: List[jnp.ndarray],
    x: jnp.ndarray,        # [R*S, 8]
    target: jnp.ndarray,   # [R, 3]
):
    """Same math as the kernel in plain jnp (jax-differentiable)."""
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

"""Fused train kernel for the 2-D image-learning path (BASELINE config 1).

The image task (reference: __viser_image_learning.py:231-279) regresses
pixel rgb directly through sinusoidal-encode + the non-viewdir NeRF MLP —
a strict subset of the GEMM chain in kernels/fused_mlp.py (no dir head, no
compositing scan). Unfused, every [N, 256] activation round-trips HBM per
layer; this kernel runs encode -> D-layer MLP -> output head -> MSE loss
cotangent -> full backward in ONE launch with activations resident in VMEM
(the fused_train.py strategy: the loss grad is closed-form, so the backward
needs no second dispatch).

Gradient contract mirrors fused_train_apply: `fused_image_train` returns
(sse, dWs-internally) through a custom_vjp whose backward scales the stored
dW by the incoming sse cotangent — `jax.value_and_grad` at the call site
works unchanged. Cotangents for X/target are structurally zero (pixel
coords and colors are data).

Packed layout (pack_image_params): the encoding is one tiny-K GEMM against
a band matrix M [8, SW] with phases phi (cos as sin(x+pi/2), fused_mlp.py
v2 layout restricted to the position block), the `include_input`
passthrough rides identity rows, and skip-concats become a second GEMM
against zero-extended S rows.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_meets_mlx_tpu.config import EncodingConfig, MLPConfig
from nerf_meets_mlx_tpu.kernels.fused_mlp import _bands

LANE = 128


def _ru(x: int, m: int = LANE) -> int:
    return -(-x // m) * m


@dataclasses.dataclass(frozen=True)
class FusedImageSpec:
    depth: int
    width: int
    skips: Tuple[int, ...]
    in_dim: int
    n_freqs: int
    min_exp: float
    max_exp: float
    include_input: bool
    band_mode: str
    out_channels: int
    block: int = 512

    @staticmethod
    def from_configs(
        mlp: MLPConfig, pos: EncodingConfig, block: int = 512
    ) -> "FusedImageSpec":
        assert not mlp.use_viewdirs and pos.kind == "sinusoidal"
        return FusedImageSpec(
            depth=mlp.net_depth,
            width=mlp.net_width,
            skips=tuple(mlp.skips),
            in_dim=pos.in_dim,
            n_freqs=pos.n_freqs,
            min_exp=pos.min_freq_exp,
            max_exp=(
                pos.max_freq_exp if pos.max_freq_exp is not None else float(pos.n_freqs - 1)
            ),
            include_input=pos.include_input,
            band_mode=pos.frequency_bands,
            out_channels=mlp.out_channels,
            block=block,
        )

    @property
    def n_sin(self) -> int:
        return 2 * self.in_dim * self.n_freqs

    @property
    def o_x(self) -> int:
        return self.n_sin

    @property
    def sw(self) -> int:
        return _ru(self.n_sin + self.in_dim)

    @property
    def enc_dim(self) -> int:
        """Logical encoding width the standard MLP sees."""
        return self.n_sin + (self.in_dim if self.include_input else 0)


def _band_matrix(spec: FusedImageSpec) -> Tuple[np.ndarray, np.ndarray]:
    """M [8, SW], phi [1, SW]: sin cols [axis*F + j], cos cols
    [dF + axis*F + j] (sinusoidal_encode layout), raw-input passthrough at
    [o_x, o_x + in_dim)."""
    SW, d, F = spec.sw, spec.in_dim, spec.n_freqs
    M = np.zeros((8, SW), np.float32)
    phi = np.zeros((1, SW), np.float32)
    b = _bands(F, spec.min_exp, spec.max_exp, spec.band_mode)
    for axis in range(d):
        for j in range(F):
            M[axis, axis * F + j] = b[j]
            M[axis, d * F + axis * F + j] = b[j]
    phi[0, d * F : 2 * d * F] = np.pi / 2
    for i in range(d):
        M[i, spec.o_x + i] = 1.0
    return M, phi


def pack_image_inputs(coords: jnp.ndarray) -> jnp.ndarray:
    """[N, in_dim] pixel coords -> [N, 8] kernel input tile."""
    return jnp.pad(coords, ((0, 0), (0, 8 - coords.shape[-1])))


def pack_image_params(spec: FusedImageSpec, params) -> List[jnp.ndarray]:
    """Standard non-viewdir MLP pytree (models/nerf_mlp.py) -> GEMM layout.
    Pure jax ops — autodiff routes cotangents back to the pytree."""
    SW = spec.sw
    n_sin = spec.n_sin
    M, phi = _band_matrix(spec)
    out: List[jnp.ndarray] = [jnp.asarray(M), jnp.asarray(phi)]

    def pack_enc_rows(w_enc):
        O = w_enc.shape[1]
        A = jnp.zeros((SW, O), w_enc.dtype).at[:n_sin].set(w_enc[:n_sin])
        if spec.include_input:
            A = A.at[spec.o_x : spec.o_x + spec.in_dim].set(
                w_enc[n_sin : n_sin + spec.in_dim]
            )
        return A

    p0 = params["pos_linears"][0]
    out += [pack_enc_rows(p0["w"]), p0["b"][None, :]]
    for j in range(1, spec.depth):
        pj = params["pos_linears"][j]
        if (j - 1) in spec.skips:
            w = pj["w"]
            Aenc = pack_enc_rows(w[: spec.enc_dim])
            out += [w[spec.enc_dim :], Aenc, pj["b"][None, :]]
        else:
            out += [pj["w"], pj["b"][None, :]]

    wo, bo = params["output_linear"]["w"], params["output_linear"]["b"]
    out += [
        jnp.pad(wo, ((0, 0), (0, 8 - spec.out_channels))),
        jnp.pad(bo, (0, 8 - spec.out_channels))[None, :],
    ]
    return out


def _n_arrays(spec: FusedImageSpec) -> int:
    n = 4  # M, phi, A0, b0
    for j in range(1, spec.depth):
        n += 3 if (j - 1) in spec.skips else 2
    return n + 2  # Wout, bout


# ---------------------------------------------------------------------------
# Shared math
# ---------------------------------------------------------------------------


def _sin_mask(spec: FusedImageSpec, shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 1) < spec.n_sin


def _forward(spec: FusedImageSpec, X, ws, want_residuals=False):
    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    it = iter(ws)
    M, phi = next(it), next(it)
    T = mm(X, M) + phi
    S = jnp.where(_sin_mask(spec, (1, spec.sw)), jnp.sin(T), T)
    A0, b0 = next(it), next(it)
    h = jax.nn.relu(mm(S, A0) + b0)
    hs = [h]
    for j in range(1, spec.depth):
        if (j - 1) in spec.skips:
            Ah, Aenc, bj = next(it), next(it), next(it)
            pre = mm(h, Ah) + mm(S, Aenc) + bj
        else:
            Aj, bj = next(it), next(it)
            pre = mm(h, Aj) + bj
        h = jax.nn.relu(pre)
        hs.append(h)
    Wout, bout = next(it), next(it)
    out = mm(h, Wout) + bout  # [N, 8], cols [0, out_channels) valid
    if want_residuals:
        return out, (S, hs)
    return out


def _backprop(spec: FusedImageSpec, ws, residuals, dout):
    """dout [N, 8] -> grads aligned with the packed list (M/phi stay None)."""
    S, hs = residuals

    def mmTa(a, b):
        return jax.lax.dot_general(
            a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    def mmbT(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    grads: List[Optional[jnp.ndarray]] = [None] * _n_arrays(spec)
    idx = {"i": 2}

    def take():
        i = idx["i"]
        idx["i"] += 1
        return i

    i_A0, i_b0 = take(), take()
    layer_idx = []
    for j in range(1, spec.depth):
        layer_idx.append(
            (take(), take(), take()) if (j - 1) in spec.skips else (take(), take())
        )
    i_Wout, i_bout = take(), take()

    h_last = hs[-1]
    grads[i_Wout] = mmTa(h_last, dout)
    grads[i_bout] = jnp.sum(dout, axis=0, keepdims=True)
    dh = mmbT(dout, ws[i_Wout]) * (h_last > 0)

    for j in range(spec.depth - 1, 0, -1):
        ids = layer_idx[j - 1]
        h_prev = hs[j - 1]
        if len(ids) == 3:
            i_Ah, i_Aenc, i_bj = ids
            grads[i_Ah] = mmTa(h_prev, dh)
            grads[i_Aenc] = mmTa(S, dh)
            grads[i_bj] = jnp.sum(dh, axis=0, keepdims=True)
            dh = mmbT(dh, ws[i_Ah]) * (h_prev > 0)
        else:
            i_Aj, i_bj = ids
            grads[i_Aj] = mmTa(h_prev, dh)
            grads[i_bj] = jnp.sum(dh, axis=0, keepdims=True)
            dh = mmbT(dh, ws[i_Aj]) * (h_prev > 0)

    grads[i_A0] = mmTa(S, dh)
    grads[i_b0] = jnp.sum(dh, axis=0, keepdims=True)
    return grads


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _train_kernel(spec: FusedImageSpec, n_valid: int, x_ref, t_ref, *refs):
    """One launch: forward + sse + loss cotangent + backward; dW/db into
    grid-invariant accumulators; sse into a [1, 1] accumulator."""
    n_w = _n_arrays(spec)
    w_refs = refs[:n_w]
    sse_ref = refs[n_w]
    dw_refs = refs[n_w + 1 :]
    ws = [r[:] for r in w_refs]
    n = x_ref.shape[0]
    first = pl.program_id(0) == 0

    out, residuals = _forward(spec, x_ref[:], ws, want_residuals=True)
    # valid = real (unpadded) rows of real output channels
    row = pl.program_id(0) * n + jax.lax.broadcasted_iota(jnp.int32, (n, 8), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, 8), 1)
    valid = ((row < n_valid) & (col < spec.out_channels)).astype(jnp.float32)
    err = (out - t_ref[:]) * valid
    sse = jnp.sum(err * err)
    dout = 2.0 * err  # d sse / d out

    grads = _backprop(spec, ws, residuals, dout)

    @pl.when(first)
    def _():
        sse_ref[0, 0] = sse

    @pl.when(jnp.logical_not(first))
    def _():
        sse_ref[0, 0] = sse_ref[0, 0] + sse

    for k, r in enumerate(dw_refs):
        g = grads[2 + k]

        @pl.when(first)
        def _(r=r, g=g):
            r[:] = g

        @pl.when(jnp.logical_not(first))
        def _(r=r, g=g):
            r[:] = r[:] + g


def _fwd_kernel(spec: FusedImageSpec, x_ref, *refs):
    out_ref = refs[-1]
    ws = [r[:] for r in refs[:-1]]
    out_ref[:] = _forward(spec, x_ref[:], ws)


# ---------------------------------------------------------------------------
# Public ops
# ---------------------------------------------------------------------------


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_n(x, block):
    n = x.shape[0]
    return jnp.pad(x, ((0, (-n) % block), (0, 0))), n


def _train_pallas(spec: FusedImageSpec, packed, x, target):
    xp, n = _pad_n(x, spec.block)
    tp = jnp.pad(target, ((0, xp.shape[0] - n), (0, 8 - target.shape[1])))
    grid = (xp.shape[0] // spec.block,)
    w_specs = [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for w in packed
    ]
    dw_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in packed[2:]]
    dw_specs = [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for w in packed[2:]
    ]
    outs = pl.pallas_call(
        functools.partial(_train_kernel, spec, n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((spec.block, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((spec.block, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            *dw_specs,
        ],
        out_shape=[jax.ShapeDtypeStruct((1, 1), jnp.float32), *dw_shapes],
        interpret=_interpret(),
    )(xp, tp, *packed)
    return outs[0][0, 0], list(outs[1:])


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_image_train(spec: FusedImageSpec, packed, x, target):
    """sse = sum over valid pixels/channels of (pred - target)^2; the ONLY
    differentiable output (w.r.t. packed; x/target are data)."""
    sse, _ = _train_pallas(spec, packed, x, target)
    return sse


def _vjp_fwd(spec, packed, x, target):
    sse, dws = _train_pallas(spec, packed, x, target)
    return sse, (dws, x.shape, target.shape)


def _vjp_bwd(spec, res, dsse):
    dws, x_shape, t_shape = res
    dpacked = [
        jnp.zeros((8, spec.sw), jnp.float32),
        jnp.zeros((1, spec.sw), jnp.float32),
    ] + [dsse * g for g in dws]
    return dpacked, jnp.zeros(x_shape, jnp.float32), jnp.zeros(t_shape, jnp.float32)


fused_image_train.defvjp(_vjp_fwd, _vjp_bwd)


def fused_image_apply(spec: FusedImageSpec, packed, x):
    """Forward-only: [N, 8] -> [N, 8] (cols [0, out_channels) valid)."""
    xp, n = _pad_n(x, spec.block)
    grid = (xp.shape[0] // spec.block,)
    w_specs = [
        pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for w in packed
    ]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, spec),
        grid=grid,
        in_specs=[
            pl.BlockSpec((spec.block, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=pl.BlockSpec((spec.block, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], 8), jnp.float32),
        interpret=_interpret(),
    )(xp, *packed)
    return out[:n]


def fused_image_reference(spec: FusedImageSpec, packed, x):
    """Pure-jnp twin (differentiable) for parity tests / CPU fallback."""
    return _forward(spec, x, packed)

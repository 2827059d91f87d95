"""Fused CP-grid (TensoRF-style) encoding as a Pallas TPU kernel.

The XLA path (encoding/cp_grid.py) expresses 1-D line interpolation as
``W @ line`` with a hat matrix ``W[n, i] = relu(1 - |t_n - i|)``. XLA
cannot fuse an elementwise producer into a dot operand, so every [N, R]
hat matrix materializes in HBM — at the fine train batch (~400k points,
R=512, 3 axes, L levels) that is multiple GB of pure-traffic per step,
which is the lego_cp step's actual bound (the GEMM FLOPs are ~1 ms).

This kernel builds each hat block in VMEM from an iota compare, contracts
it against the VMEM-resident factor lines, and multiplies the three axis
interpolations in-register — the [N, R] operand never exists in HBM.
Structure mirrors kernels/hash_encode.py: grid = (L, nblocks) with the
level axis outermost (per-level resolution from SMEM; padded factor rows
beyond R_l receive structurally-zero hat weights, since |t - i| >= 1
there), backward accumulates dLines = W^T @ dF transposed contractions
into grid-invariant outputs across the sequential grid.

Semantics match CPGridEncoding.apply (same bf16 hat GEMM, same axis
product order) to float tolerance (GEMM accumulation-order only);
parity gated in tests/test_cp_encode.py.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_meets_mlx_tpu.encoding.cp_grid import CPGridEncoding

LANE = 128


def _ru(x: int, m: int = LANE) -> int:
    return -(-x // m) * m


@dataclasses.dataclass(frozen=True)
class CPEncodeSpec:
    n_levels: int
    resolutions: Tuple[int, ...]
    n_components: int
    bbox_min: float
    bbox_max: float
    compute_dtype: str
    block: int = 512

    @staticmethod
    def from_encoding(enc: CPGridEncoding, block: int = 512) -> "CPEncodeSpec":
        assert enc.in_dim == 3
        return CPEncodeSpec(
            n_levels=enc.n_levels,
            resolutions=tuple(int(r) for r in enc.resolutions),
            n_components=enc.n_components,
            bbox_min=enc.bbox_min,
            bbox_max=enc.bbox_max,
            compute_dtype=enc.compute_dtype,
            block=block,
        )

    @property
    def r_max(self) -> int:
        """Lane-aligned common factor-line length (levels padded up)."""
        return _ru(max(self.resolutions))

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.n_components


def pack_lines(spec: CPEncodeSpec, lines) -> jnp.ndarray:
    """Per-level [3, R_l, C] leaves -> one [L, 3, R_max, C] array (rows past
    R_l zero — they get zero hat weight anyway). Pure jnp: the custom VJP's
    dG unpads back through autodiff."""
    padded = [
        jnp.pad(l, ((0, 0), (0, spec.r_max - l.shape[1]), (0, 0))) for l in lines
    ]
    return jnp.stack(padded)


# ---------------------------------------------------------------------------
# Kernels: grid = (L, nblocks), level outermost
# ---------------------------------------------------------------------------


def _axes_t(spec: CPEncodeSpec, x, res):
    """Per-axis align-corners grid coordinate t = u * (res - 1), [N, 1]."""
    inv = 1.0 / (spec.bbox_max - spec.bbox_min)
    ts = []
    for d in range(3):
        u = jnp.clip((x[:, d : d + 1] - spec.bbox_min) * inv, 0.0, 1.0)
        ts.append(u * (res - 1.0))
    return ts


def _hat(t, iota_f):
    """W[n, i] = relu(1 - |t_n - i|) — two nonzeros per row."""
    return jax.nn.relu(1.0 - jnp.abs(t - iota_f))


def _fwd_grid_kernel(spec: CPEncodeSpec, res_ref, x_ref, g_ref, out_ref):
    n = x_ref.shape[0]
    l = pl.program_id(0)
    cdt = jnp.bfloat16 if spec.compute_dtype == "bfloat16" else jnp.float32
    res = res_ref[0, l]
    iota_f = jax.lax.broadcasted_iota(jnp.int32, (n, spec.r_max), 1).astype(
        jnp.float32
    )
    ts = _axes_t(spec, x_ref[:], res)
    level = None
    for axis in range(3):
        w = _hat(ts[axis], iota_f)
        f = jnp.dot(
            w.astype(cdt), g_ref[0, axis].astype(cdt),
            preferred_element_type=jnp.float32,
        )  # [N, C]
        level = f if level is None else level * f
    out_ref[0] = level


def _bwd_grid_kernel(spec: CPEncodeSpec, res_ref, x_ref, g_ref, d_ref, dg_ref):
    """Flash-style: recompute the three hat/interp pairs for this block,
    then product-rule the level cotangent into per-axis dLines."""
    n = x_ref.shape[0]
    l = pl.program_id(0)
    first = pl.program_id(1) == 0
    cdt = jnp.bfloat16 if spec.compute_dtype == "bfloat16" else jnp.float32
    res = res_ref[0, l]
    iota_f = jax.lax.broadcasted_iota(jnp.int32, (n, spec.r_max), 1).astype(
        jnp.float32
    )
    ts = _axes_t(spec, x_ref[:], res)
    d = d_ref[0]  # [N, C]

    ws = [_hat(ts[a], iota_f) for a in range(3)]
    fs = [
        jnp.dot(
            ws[a].astype(cdt), g_ref[0, a].astype(cdt),
            preferred_element_type=jnp.float32,
        )
        for a in range(3)
    ]
    others = [fs[1] * fs[2], fs[0] * fs[2], fs[0] * fs[1]]
    for a in range(3):
        df = d * others[a]  # [N, C] — product rule
        # dLines[l, a] += W^T @ (df) : transposed contraction, matching the
        # XLA backward's bf16 operand dtypes
        dg_a = jax.lax.dot_general(
            ws[a].astype(cdt), df.astype(cdt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [R_max, C]

        @pl.when(first)
        def _(dg_a=dg_a, a=a):
            dg_ref[0, a] = dg_a

        @pl.when(jnp.logical_not(first))
        def _(dg_a=dg_a, a=a):
            dg_ref[0, a] = dg_ref[0, a] + dg_a


# ---------------------------------------------------------------------------
# Public op with custom VJP
# ---------------------------------------------------------------------------


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_n(x, block):
    n = x.shape[0]
    return jnp.pad(x, ((0, (-n) % block), (0, 0))), n


def _res_array(spec: CPEncodeSpec) -> jnp.ndarray:
    return jnp.asarray([spec.resolutions], dtype=jnp.float32)


def _fwd_pallas(spec: CPEncodeSpec, g: jnp.ndarray, x: jnp.ndarray):
    xp, n = _pad_n(x, spec.block)
    L, C = spec.n_levels, spec.n_components
    nblocks = xp.shape[0] // spec.block
    out = pl.pallas_call(
        functools.partial(_fwd_grid_kernel, spec),
        grid=(L, nblocks),
        in_specs=[
            pl.BlockSpec((1, L), lambda l, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (spec.block, x.shape[1]), lambda l, i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 3, spec.r_max, C), lambda l, i: (l, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, spec.block, C), lambda l, i: (l, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((L, xp.shape[0], C), jnp.float32),
        interpret=_interpret(),
    )(_res_array(spec), xp, g)
    return jnp.transpose(out[:, :n], (1, 0, 2)).reshape(n, L * C)


def _bwd_pallas(spec: CPEncodeSpec, g: jnp.ndarray, x: jnp.ndarray, dout: jnp.ndarray):
    xp, n = _pad_n(x, spec.block)
    L, C = spec.n_levels, spec.n_components
    nblocks = xp.shape[0] // spec.block
    d3 = jnp.transpose(dout.reshape(n, L, C), (1, 0, 2))
    d3 = jnp.pad(d3, ((0, 0), (0, xp.shape[0] - n), (0, 0)))
    dg = pl.pallas_call(
        functools.partial(_bwd_grid_kernel, spec),
        grid=(L, nblocks),
        in_specs=[
            pl.BlockSpec((1, L), lambda l, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (spec.block, x.shape[1]), lambda l, i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 3, spec.r_max, C), lambda l, i: (l, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, spec.block, C), lambda l, i: (l, i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 3, spec.r_max, C), lambda l, i: (l, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((L, 3, spec.r_max, C), jnp.float32),
        interpret=_interpret(),
    )(_res_array(spec), xp, g, d3)
    return dg


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def cp_encode(spec: CPEncodeSpec, g: jnp.ndarray, x: jnp.ndarray):
    """g [L, 3, R_max, C] (pack_lines), x [N, >=3] raw coords -> [N, L*C]."""
    return _fwd_pallas(spec, g, x)


def _vjp_fwd(spec, g, x):
    return _fwd_pallas(spec, g, x), (g, x)


def _vjp_bwd(spec, res, dout):
    g, x = res
    dg = _bwd_pallas(spec, g, x, dout)
    # positions are data / stop-gradient z-samples in the model path
    return dg, jnp.zeros_like(x)


cp_encode.defvjp(_vjp_fwd, _vjp_bwd)


def cp_encode_apply(
    enc: CPGridEncoding, params, x: jnp.ndarray, *, block: int = 512
) -> jnp.ndarray:
    """Drop-in fast path for ``CPGridEncoding.apply`` (same semantics)."""
    spec = CPEncodeSpec.from_encoding(enc, block=block)
    g = pack_lines(spec, params["lines"])
    lead = x.shape[:-1]
    flat = x.reshape(-1, x.shape[-1])
    if flat.shape[-1] < 8:
        flat = jnp.pad(flat, ((0, 0), (0, 8 - flat.shape[-1])))
    feats = cp_encode(spec, g, flat)
    return feats.reshape(*lead, spec.out_dim)

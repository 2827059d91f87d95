"""Fused Instant-NGP hash-grid encoding as a Pallas TPU kernel.

The hash grid's fundamental op — N random row lookups into L hash tables —
is the one primitive TPUs lack: XLA lowers every gather flavor to ~9-11 ns
serial HBM random access per row (measured, docs/DESIGN.md "Hash-grid on
TPU"), and the INGP train step needs tens of millions of them (measured
1.05 s/step for the lego_ingp preset). This kernel replaces the gather with
MXU work:

* **Gather = one-hot matmul, two-stage radix.** Split the hash
  ``h = hi * 128 + lo`` (hi = h >> 7, lo = h & 127) and keep each level's
  table VMEM-resident as ``G[l] : [T/128, F*128]`` with feature planes side
  by side (column f*128 + lo). A table-row lookup becomes
  ``R = onehot(hi) @ G[l]`` — a GEMM whose products are exact (one-hot rows
  select a single table row) — followed by a lane-select on lo
  (iota-compare + masked row-reduce, pure VPU). Cost is 2*T*F FLOPs per
  lookup: ~0.9 ns on this chip's measured 147 TFLOP/s MXU vs ~10 ns for the
  XLA gather, and the one-hot construction is O(T/128 + 128) VPU compares
  per lookup instead of O(T).
* **All 8 cell corners ride ONE GEMM per level**, stacked along the sublane
  axis: [8*N, T/128] @ [T/128, F*128]. The level axis is a GRID dimension
  (grid = (L, nblocks), level outermost): each grid step touches one
  level's working set, and that level's table slice stays VMEM-resident
  across its whole point pass (index map constant in the block index).
  Rejected alternatives, measured: a fori_loop over corners took Mosaic
  443 s to compile even at L=2; unrolling levels x corners in one kernel
  body stack-allocates every temporary (no cross-iteration reuse) and
  OOMs scoped VMEM at 42-68 MB. Per-level resolutions ride in SMEM.
* **Backward = transposed GEMMs, no atomics.** The scatter-add of
  cotangents into the tables is ``dG[l] += onehot(hi)^T @ Dsel`` where
  ``Dsel[8n, f*128+lo] = w_c(n) * dfeats[n, l*F+f]`` — the segment-sum
  formulation (SURVEY.md §7 "Hash-grid gradients") as one dot_general
  contraction over the stacked point axis per level, accumulated into
  grid-invariant output blocks (TPU grids are sequential).
* **dX is optional** (``compute_dx``): positions fed to the encoding are
  data or stop-gradient z-samples in this framework (models/factory.py), so
  the model path skips it; when enabled (tests, future composition) the
  forward additionally stashes the 8 raw corner values per level/feature
  ([N, L*8*F] — one extra tile) so the backward needs no GEMM recompute.

Semantics are bit-matched to encoding/hash_grid.py `HashGridEncoding.apply`
(the fixed transcription of the reference's broken WIP MultiHashEncoding,
/root/reference/mlx_nerf/encoding/multi_hash.py:61-131): same Lehmer-prime
XOR hash, same floor/floor+1 corners; the one-hot GEMM and masked reduce
introduce no rounding (single nonzero per row), only the corner-sum order
differs (tree reduce vs sequential — float-level tolerance). Parity is
gated in tests/test_hash_encode.py.

The approach needs the packed tables to fit VMEM (``spec.vmem_ok``): true
for the lego_ingp preset (L=8, T=2^15, F=2 -> 2 MB). Paper-size tables
(T=2^19) stay on the XLA-gather fallback — the one-hot GEMM's O(T*F) per
lookup erases its advantage there (7 ns/lookup at peak ~= the gather).
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

from nerf_meets_mlx_tpu.encoding.hash_grid import (
    HashGridEncoding,
    _PRIMES,
    _level_resolutions,
)

LANE = 128

# the Lehmer primes reinterpreted as int32: Mosaic has no f32->uint32 cast,
# and int32 multiply wraps mod 2^32 exactly like uint32, so the masked hash
# is bit-identical (the mask < 2^31 keeps the result non-negative)
_IPRIMES = tuple(int(np.uint32(p).astype(np.int32)) for p in _PRIMES)


@dataclasses.dataclass(frozen=True)
class HashEncodeSpec:
    """Static description of the fused hash-encode op (hashable)."""

    n_levels: int
    log2_table_size: int
    features_per_level: int
    resolutions: Tuple[int, ...]
    bbox_min: float
    bbox_max: float
    block: int = 512
    compute_dx: bool = False
    # "bfloat16" casts the one-hot and packed-table GEMM operands (one-hot
    # rows are exact in bf16; accumulation stays f32 via
    # preferred_element_type, so the only error is bf16 rounding of the
    # table values themselves — the precision regime INGP/tcnn train in)
    compute_dtype: str = "float32"
    # levels unrolled INSIDE the kernel body (grid over point blocks only):
    # streams x once instead of L times, writes one [block, L*F] output
    # tile instead of L narrow [block, F] tiles, and drops L-1 of the
    # per-grid-step pipeline fixed costs — the r4 ablation measured ~17 ms
    # of the 42 ms forward as pure per-step IO/pipeline overhead
    levels_in_body: bool = True

    @staticmethod
    def from_encoding(
        enc: HashGridEncoding, block: int = 512, compute_dx: bool = False
    ) -> "HashEncodeSpec":
        assert enc.in_dim == 3, "hash-encode kernel supports 3-D inputs"
        res = _level_resolutions(enc.n_levels, enc.min_res, enc.max_res)
        return HashEncodeSpec(
            n_levels=enc.n_levels,
            log2_table_size=enc.log2_table_size,
            features_per_level=enc.features_per_level,
            resolutions=tuple(int(r) for r in res),
            bbox_min=enc.bbox_min,
            bbox_max=enc.bbox_max,
            block=block,
            compute_dx=compute_dx,
            compute_dtype=enc.compute_dtype,
        )

    @property
    def table_size(self) -> int:
        return 1 << self.log2_table_size

    @property
    def hi(self) -> int:
        """Rows of the packed per-level table (T / 128)."""
        return self.table_size // LANE

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.features_per_level

    @property
    def packed_bytes(self) -> int:
        return self.n_levels * self.table_size * self.features_per_level * 4

    @property
    def vmem_ok(self) -> bool:
        """Whether the packed tables + working set fit the VMEM budget.

        Tables stay resident across the whole grid; the per-block stacked
        one-hot is [8*block, T/128] f32. 6 MB of tables + HI <= 1024 leaves
        headroom inside the ~16 MB/core budget.
        """
        return (
            self.log2_table_size >= 7
            and self.packed_bytes <= 6 * 1024 * 1024
            and self.hi <= 1024
        )


def pack_tables(spec: HashEncodeSpec, tables: jnp.ndarray) -> jnp.ndarray:
    """[L, T, F] -> [L, T/128, F*128] with feature planes side by side.

    Pure jnp (differentiable): the custom VJP's dG flows back through this
    packing to the canonical [L, T, F] parameter leaf automatically.
    """
    L, T, F = tables.shape
    g = tables.reshape(L, spec.hi, LANE, F)
    g = jnp.transpose(g, (0, 1, 3, 2))  # [L, HI, F, 128]
    return g.reshape(L, spec.hi, F * LANE)


# ---------------------------------------------------------------------------
# Kernel-side shared math
# ---------------------------------------------------------------------------


def _axes(spec: HashEncodeSpec, x):
    """Normalize raw coords [N, >=3] to the unit cube; per-axis [N, 1] cols."""
    inv = 1.0 / (spec.bbox_max - spec.bbox_min)
    cols = []
    for d in range(3):
        t = (x[:, d : d + 1] - spec.bbox_min) * inv
        cols.append(jnp.clip(t, 0.0, 1.0))
    return cols


def _level_coords(spec: HashEncodeSpec, ux, uy, uz, level: int):
    res = float(spec.resolutions[level])
    out = []
    for u in (ux, uy, uz):
        s = u * res
        b = jnp.floor(s)
        out.append((b.astype(jnp.int32), s - b))
    (ix, fx), (iy, fy), (iz, fz) = out
    return ix, iy, iz, fx, fy, fz


def _corner_hash(spec: HashEncodeSpec, ix, iy, iz, cx: int, cy: int, cz: int):
    """XOR-product Lehmer hash of a corner, masked to the table size.

    Wrap-around (mod 2^32) is the intended modular arithmetic
    (multi_hash.py:66-70; PRIME1 = 1)."""
    mask = jnp.int32(spec.table_size - 1)
    h = (
        (ix + jnp.int32(cx)) * jnp.int32(_IPRIMES[0])
        ^ (iy + jnp.int32(cy)) * jnp.int32(_IPRIMES[1])
        ^ (iz + jnp.int32(cz)) * jnp.int32(_IPRIMES[2])
    ) & mask
    hi = jax.lax.shift_right_logical(h, jnp.int32(7))
    lo = h & jnp.int32(LANE - 1)
    return hi, lo


def _corner_weight(fx, fy, fz, cx: int, cy: int, cz: int):
    wx = fx if cx else 1.0 - fx
    wy = fy if cy else 1.0 - fy
    wz = fz if cz else 1.0 - fz
    return (wx * wy) * wz


def _stacked_corners(spec: HashEncodeSpec, ix, iy, iz, fx, fy, fz):
    """hi/lo/weight for all 8 corners, stacked along sublanes -> [8n, 1]
    each (corner-major: rows [c*n, (c+1)*n) belong to corner c)."""
    his, los, ws = [], [], []
    for c in range(8):
        cx, cy, cz = c & 1, (c >> 1) & 1, (c >> 2) & 1
        hi, lo = _corner_hash(spec, ix, iy, iz, cx, cy, cz)
        his.append(hi)
        los.append(lo)
        ws.append(_corner_weight(fx, fy, fz, cx, cy, cz))
    return (
        jnp.concatenate(his, axis=0),
        jnp.concatenate(los, axis=0),
        jnp.concatenate(ws, axis=0),
    )


# ---------------------------------------------------------------------------
# Hot-path kernels: grid = (L, nblocks), one level per grid step
# ---------------------------------------------------------------------------


def _traced_level_coords(res, ux, uy, uz):
    """_level_coords with a traced (SMEM-read) resolution scalar."""
    out = []
    for u in (ux, uy, uz):
        s = u * res
        b = jnp.floor(s)
        out.append((b.astype(jnp.int32), s - b))
    (ix, fx), (iy, fy), (iz, fz) = out
    return ix, iy, iz, fx, fy, fz


def _fwd_grid_kernel(spec: HashEncodeSpec, res_ref, x_ref, g_ref, out_ref):
    n = x_ref.shape[0]
    F = spec.features_per_level
    n8 = 8 * n
    l = pl.program_id(0)
    cdt = jnp.bfloat16 if spec.compute_dtype == "bfloat16" else jnp.float32

    ux, uy, uz = _axes(spec, x_ref[:])
    ix, iy, iz, fx, fy, fz = _traced_level_coords(res_ref[0, l], ux, uy, uz)
    hi_all, lo_all, w_all = _stacked_corners(spec, ix, iy, iz, fx, fy, fz)

    hi_iota = jax.lax.broadcasted_iota(jnp.int32, (n8, spec.hi), 1)
    lo_iota = jax.lax.broadcasted_iota(jnp.int32, (n8, LANE), 1)
    # The kernel is VPU-throughput-bound on these mask builds/mults (time
    # is invariant to T, block size and dtype — DESIGN.md round 4), so the
    # formulation minimizes elementwise ops per corner row:
    # * the trilinear weight folds INTO the one-hot (one [8n, HI] mult)
    #   so the GEMM emits pre-weighted rows,
    # * the lane mask is built once per 128 lanes and tiled across the F
    #   feature planes (copy, not compare),
    # * the plane reduction is an MXU contraction against the constant
    #   plane indicator P (cross-lane jnp.sum is log-step VPU shuffles).
    # In bf16 mode EVERY [8n, *] intermediate stays bf16 — the kernel is
    # VMEM-traffic-bound on these materialized intermediates (time is
    # invariant to T/block/op-count, DESIGN.md round 4), and the one-hot
    # GEMM is a row SELECTION (single nonzero per row): r is exact at the
    # bf16-rounded table's own precision, so only the final P contraction
    # accumulates (in f32 via preferred_element_type).
    aw = (hi_iota == hi_all).astype(cdt) * w_all.astype(cdt)  # [8n, HI]
    r = jnp.dot(
        aw, g_ref[0].astype(cdt), preferred_element_type=jnp.float32
    ).astype(cdt)  # Mosaic requires 32-bit matmul acc; bf16 materialization
    sel = (lo_iota == lo_all).astype(cdt)                  # [8n, 128]
    selF = jnp.concatenate([sel] * F, axis=1)              # [8n, F*128]
    plane_of = jax.lax.broadcasted_iota(jnp.int32, (F * LANE, F), 0) // LANE
    f_col = jax.lax.broadcasted_iota(jnp.int32, (F * LANE, F), 1)
    P = (plane_of == f_col).astype(cdt)                    # [F*128, F]
    v = jnp.dot(r * selF, P, preferred_element_type=jnp.float32)  # [8n, F]
    out_ref[0] = jnp.sum(v.reshape(8, n, F), axis=0)


def _bwd_grid_kernel(spec: HashEncodeSpec, res_ref, x_ref, d_ref, dg_ref):
    n = x_ref.shape[0]
    F = spec.features_per_level
    n8 = 8 * n
    l = pl.program_id(0)
    first = pl.program_id(1) == 0
    cdt = jnp.bfloat16 if spec.compute_dtype == "bfloat16" else jnp.float32

    ux, uy, uz = _axes(spec, x_ref[:])
    ix, iy, iz, fx, fy, fz = _traced_level_coords(res_ref[0, l], ux, uy, uz)
    hi_all, lo_all, w_all = _stacked_corners(spec, ix, iy, iz, fx, fy, fz)

    hi_iota = jax.lax.broadcasted_iota(jnp.int32, (n8, spec.hi), 1)
    lo_iota = jax.lax.broadcasted_iota(jnp.int32, (n8, LANE), 1)
    # mirrors the fwd's op-minimized formulation: the trilinear weight
    # folds into the one-hot; the lane mask is built once and tiled; the
    # per-plane cotangent replicates across lanes via a tiny constant GEMM
    aw = (hi_iota == hi_all).astype(cdt) * w_all.astype(cdt)  # [8n, HI]
    sel = (lo_iota == lo_all).astype(cdt)                  # [8n, 128]
    selF = jnp.concatenate([sel] * F, axis=1)              # [8n, F*128]
    plane_of = jax.lax.broadcasted_iota(jnp.int32, (F, F * LANE), 1) // LANE
    f_row = jax.lax.broadcasted_iota(jnp.int32, (F, F * LANE), 0)
    PT = (plane_of == f_row).astype(cdt)                   # [F, F*128]
    d8 = jnp.concatenate([d_ref[0]] * 8, axis=0)           # [8n, F]
    d8F = jnp.dot(
        d8.astype(cdt), PT, preferred_element_type=jnp.float32
    ).astype(cdt)
    ds = selF * d8F  # [8n, F*128] (bf16 in bf16 mode — VMEM traffic)
    # scatter-add into the tables = transposed contraction ((w·a)^T @ ds)
    dg_l = jax.lax.dot_general(
        aw, ds.astype(cdt), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [HI, F*128]

    @pl.when(first)
    def _():
        dg_ref[0] = dg_l

    @pl.when(jnp.logical_not(first))
    def _():
        dg_ref[0] = dg_ref[0] + dg_l


def _plane_indicator(F: int, cdt):
    """Constant [F*128, F] plane indicator for the select-reduce GEMM."""
    plane_of = jax.lax.broadcasted_iota(jnp.int32, (F * LANE, F), 0) // LANE
    f_col = jax.lax.broadcasted_iota(jnp.int32, (F * LANE, F), 1)
    return (plane_of == f_col).astype(cdt)


def _fwd_body_kernel(spec: HashEncodeSpec, x_ref, g_ref, out_ref):
    """Levels-in-body forward: grid = (nblocks,), all tables resident,
    out [block, L*F] written once per block."""
    n = x_ref.shape[0]
    F = spec.features_per_level
    n8 = 8 * n
    cdt = jnp.bfloat16 if spec.compute_dtype == "bfloat16" else jnp.float32

    def body(a_ref, r_ref):
        ux, uy, uz = _axes(spec, x_ref[:])
        hi_iota = jax.lax.broadcasted_iota(jnp.int32, (n8, spec.hi), 1)
        lo_iota = jax.lax.broadcasted_iota(jnp.int32, (n8, LANE), 1)
        P = _plane_indicator(F, cdt)
        feat_cols = []
        for l in range(spec.n_levels):
            ix, iy, iz, fx, fy, fz = _level_coords(spec, ux, uy, uz, l)
            hi_all, lo_all, w_all = _stacked_corners(spec, ix, iy, iz, fx, fy, fz)
            # trilinear weight folded into the one-hot: the GEMM emits
            # pre-weighted rows (products exact — single nonzero per row)
            a_ref[:] = (hi_iota == hi_all).astype(cdt) * w_all.astype(cdt)
            r_ref[:] = jnp.dot(
                a_ref[:], g_ref[l].astype(cdt), preferred_element_type=jnp.float32
            ).astype(cdt)
            sel = (lo_iota == lo_all).astype(cdt)
            selF = jnp.concatenate([sel] * F, axis=1)
            v = jnp.dot(r_ref[:] * selF, P, preferred_element_type=jnp.float32)
            feat_cols.append(jnp.sum(v.reshape(8, n, F), axis=0))  # [n, F]
        out_ref[:] = jnp.concatenate(feat_cols, axis=1)  # [n, L*F]

    pl.run_scoped(
        body,
        pltpu.VMEM((n8, spec.hi), cdt),
        pltpu.VMEM((n8, F * LANE), cdt),
    )


def _bwd_body_kernel(spec: HashEncodeSpec, x_ref, d_ref, dg_ref):
    """Levels-in-body backward: grid = (nblocks,), dout [block, L*F] read
    once, dG accumulated per level across the sequential grid."""
    n = x_ref.shape[0]
    F = spec.features_per_level
    n8 = 8 * n
    cdt = jnp.bfloat16 if spec.compute_dtype == "bfloat16" else jnp.float32
    first = pl.program_id(0) == 0

    def body(a_ref, ds_ref):
        ux, uy, uz = _axes(spec, x_ref[:])
        hi_iota = jax.lax.broadcasted_iota(jnp.int32, (n8, spec.hi), 1)
        lo_iota = jax.lax.broadcasted_iota(jnp.int32, (n8, LANE), 1)
        plane_of = jax.lax.broadcasted_iota(jnp.int32, (F, F * LANE), 1) // LANE
        f_row = jax.lax.broadcasted_iota(jnp.int32, (F, F * LANE), 0)
        PT = (plane_of == f_row).astype(cdt)
        for l in range(spec.n_levels):
            ix, iy, iz, fx, fy, fz = _level_coords(spec, ux, uy, uz, l)
            hi_all, lo_all, w_all = _stacked_corners(spec, ix, iy, iz, fx, fy, fz)
            a_ref[:] = (hi_iota == hi_all).astype(cdt) * w_all.astype(cdt)
            sel = (lo_iota == lo_all).astype(cdt)
            selF = jnp.concatenate([sel] * F, axis=1)
            d8 = jnp.concatenate([d_ref[:, l * F : (l + 1) * F]] * 8, axis=0)
            d8F = jnp.dot(
                d8.astype(cdt), PT, preferred_element_type=jnp.float32
            ).astype(cdt)
            ds_ref[:] = selF * d8F
            dg_l = jax.lax.dot_general(
                a_ref[:], ds_ref[:], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [HI, F*128]

            @pl.when(first)
            def _(l=l, dg_l=dg_l):
                dg_ref[l] = dg_l

            @pl.when(jnp.logical_not(first))
            def _(l=l, dg_l=dg_l):
                dg_ref[l] = dg_ref[l] + dg_l

    pl.run_scoped(
        body,
        pltpu.VMEM((n8, spec.hi), cdt),
        pltpu.VMEM((n8, F * LANE), cdt),
    )


# ---------------------------------------------------------------------------
# compute_dx kernels (tests / encoding composition; interpret off-TPU)
# ---------------------------------------------------------------------------


def _fwd_kernel(spec: HashEncodeSpec, x_ref, g_ref, *out_refs):
    out_ref = out_refs[0]
    vals_ref = out_refs[1] if spec.compute_dx else None
    n = x_ref.shape[0]
    F = spec.features_per_level
    n8 = 8 * n

    def body(a_ref, r_ref):
        ux, uy, uz = _axes(spec, x_ref[:])
        hi_iota = jax.lax.broadcasted_iota(jnp.int32, (n8, spec.hi), 1)
        lo_iota = jax.lax.broadcasted_iota(jnp.int32, (n8, LANE), 1)

        feat_cols = []
        val_cols = [None] * (spec.n_levels * 8 * F) if spec.compute_dx else None
        for l in range(spec.n_levels):
            ix, iy, iz, fx, fy, fz = _level_coords(spec, ux, uy, uz, l)
            hi_all, lo_all, w_all = _stacked_corners(spec, ix, iy, iz, fx, fy, fz)
            a_ref[:] = (hi_iota == hi_all).astype(jnp.float32)  # [8n, HI]
            r_ref[:] = jnp.dot(
                a_ref[:], g_ref[l], preferred_element_type=jnp.float32
            )  # [8n, F*128]
            sel = (lo_iota == lo_all).astype(jnp.float32)  # [8n, 128]
            for f in range(F):
                plane = r_ref[:, f * LANE : (f + 1) * LANE]
                v_raw = jnp.sum(plane * sel, axis=1, keepdims=True)  # [8n, 1]
                vw = (v_raw * w_all).reshape(8, n, 1)
                feat_cols.append(jnp.sum(vw, axis=0))  # [n, 1]
                if spec.compute_dx:
                    for c in range(8):
                        val_cols[(l * 8 + c) * F + f] = v_raw[c * n : (c + 1) * n]
        out_ref[:] = jnp.concatenate(feat_cols, axis=1)
        if spec.compute_dx:
            vals_ref[:] = jnp.concatenate(val_cols, axis=1)

    pl.run_scoped(
        body,
        pltpu.VMEM((n8, spec.hi), jnp.float32),
        pltpu.VMEM((n8, F * LANE), jnp.float32),
    )


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(spec: HashEncodeSpec, x_ref, d_ref, *refs):
    """Accumulate dG (grid-invariant, sequential-grid accumulation) and,
    when compute_dx, write per-block dX from the stashed corner values."""
    if spec.compute_dx:
        vals_ref, dg_ref, dx_ref = refs
    else:
        (dg_ref,) = refs
        vals_ref = dx_ref = None
    n = x_ref.shape[0]
    F = spec.features_per_level
    n8 = 8 * n
    first = pl.program_id(0) == 0

    def body(a_ref, ds_ref):
        ux, uy, uz = _axes(spec, x_ref[:])
        hi_iota = jax.lax.broadcasted_iota(jnp.int32, (n8, spec.hi), 1)
        lo_iota = jax.lax.broadcasted_iota(jnp.int32, (n8, LANE), 1)
        d = d_ref[:]  # [n, L*F]

        if spec.compute_dx:
            vals = vals_ref[:]
            gx = jnp.zeros((n, 1), jnp.float32)
            gy = jnp.zeros((n, 1), jnp.float32)
            gz = jnp.zeros((n, 1), jnp.float32)

        for l in range(spec.n_levels):
            ix, iy, iz, fx, fy, fz = _level_coords(spec, ux, uy, uz, l)
            hi_all, lo_all, w_all = _stacked_corners(spec, ix, iy, iz, fx, fy, fz)
            a_ref[:] = (hi_iota == hi_all).astype(jnp.float32)  # [8n, HI]
            sel = (lo_iota == lo_all).astype(jnp.float32)  # [8n, 128]
            for f in range(F):
                dcol = d[:, l * F + f : l * F + f + 1]  # [n, 1]
                d8 = jnp.concatenate([dcol] * 8, axis=0)  # [8n, 1]
                ds_ref[:, f * LANE : (f + 1) * LANE] = sel * (w_all * d8)
            # scatter-add into the tables = transposed contraction (a^T @ ds)
            dg_l = jax.lax.dot_general(
                a_ref[:], ds_ref[:], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [HI, F*128]

            @pl.when(first)
            def _(dg_l=dg_l, l=l):
                dg_ref[l] = dg_l

            @pl.when(jnp.logical_not(first))
            def _(dg_l=dg_l, l=l):
                dg_ref[l] = dg_ref[l] + dg_l

            if spec.compute_dx:
                res = float(spec.resolutions[l])
                for c in range(8):
                    cx, cy, cz = c & 1, (c >> 1) & 1, (c >> 2) & 1
                    base = (l * 8 + c) * F
                    s = jnp.zeros((n, 1), jnp.float32)
                    for f in range(F):
                        s = s + d[:, l * F + f : l * F + f + 1] * vals[
                            :, base + f : base + f + 1
                        ]
                    wx = fx if cx else 1.0 - fx
                    wy = fy if cy else 1.0 - fy
                    wz = fz if cz else 1.0 - fz
                    sx = 1.0 if cx else -1.0
                    sy = 1.0 if cy else -1.0
                    sz = 1.0 if cz else -1.0
                    gx = gx + s * (sx * res) * (wy * wz)
                    gy = gy + s * (sy * res) * (wx * wz)
                    gz = gz + s * (sz * res) * (wx * wy)

        if spec.compute_dx:
            # chain through u = clip((x - bmin) * inv, 0, 1): zero outside
            inv = 1.0 / (spec.bbox_max - spec.bbox_min)
            x = x_ref[:]
            cols = []
            for dcol, dim in ((gx, 0), (gy, 1), (gz, 2)):
                t = (x[:, dim : dim + 1] - spec.bbox_min) * inv
                live = jnp.logical_and(t >= 0.0, t <= 1.0).astype(jnp.float32)
                cols.append(dcol * inv * live)
            zeros = jnp.zeros((n, x.shape[1] - 3), jnp.float32)
            dx_ref[:] = jnp.concatenate(cols + [zeros], axis=1)

    pl.run_scoped(
        body,
        pltpu.VMEM((n8, spec.hi), jnp.float32),
        pltpu.VMEM((n8, F * LANE), jnp.float32),
    )


# ---------------------------------------------------------------------------
# Public op with custom VJP
# ---------------------------------------------------------------------------


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_n(x, block):
    n = x.shape[0]
    return jnp.pad(x, ((0, (-n) % block), (0, 0))), n


def _res_array(spec: HashEncodeSpec) -> jnp.ndarray:
    """Per-level resolutions for the gridded kernels' SMEM input [1, L]
    (values <= 2^24 are exact in f32)."""
    return jnp.asarray([spec.resolutions], dtype=jnp.float32)


def _hot_compiler_params(spec: HashEncodeSpec):
    """Raise the scoped-VMEM cap for blocks whose [8*block, HI] one-hot +
    [8*block, F*128] GEMM output exceed the default ~16 MB budget (the
    physical VMEM is far larger; the default is a compiler heuristic)."""
    b = 2 if spec.compute_dtype == "bfloat16" else 4
    a_bytes = 8 * spec.block * spec.hi * b
    r_bytes = 8 * spec.block * spec.features_per_level * LANE * b
    table_bytes = spec.hi * spec.features_per_level * LANE * 4
    if spec.levels_in_body:
        # all tables + dg accumulator resident, plus scratch a/r and the
        # per-level stack temporaries (sel/selF/products)
        need = (
            2 * spec.n_levels * table_bytes + 4 * (a_bytes + r_bytes)
        )
    else:
        need = 2 * (a_bytes + r_bytes) + table_bytes
    if need <= 12 * 1024 * 1024:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=min(need + 8 * 1024 * 1024, 110 * 1024 * 1024))


def _fwd_pallas(spec: HashEncodeSpec, g: jnp.ndarray, x: jnp.ndarray):
    xp, n = _pad_n(x, spec.block)
    F = spec.features_per_level
    L = spec.n_levels
    nblocks = xp.shape[0] // spec.block

    if not spec.compute_dx:
        if spec.levels_in_body:
            # hot path v2: grid over point blocks only; all tables
            # resident; one wide [block, L*F] output write per block
            out = pl.pallas_call(
                functools.partial(_fwd_body_kernel, spec),
                grid=(nblocks,),
                in_specs=[
                    pl.BlockSpec(
                        (spec.block, x.shape[1]), lambda i: (i, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (L, spec.hi, F * LANE), lambda i: (0, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (spec.block, L * F), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
                out_shape=jax.ShapeDtypeStruct((xp.shape[0], L * F), jnp.float32),
                compiler_params=_hot_compiler_params(spec),
                interpret=_interpret(),
            )(xp, g)
            return out[:n], None
        # hot path v1: one level per grid step; the level's table slice
        # stays VMEM-resident across its whole point pass
        out = pl.pallas_call(
            functools.partial(_fwd_grid_kernel, spec),
            grid=(L, nblocks),
            in_specs=[
                pl.BlockSpec((1, L), lambda l, i: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (spec.block, x.shape[1]), lambda l, i: (i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (1, spec.hi, F * LANE), lambda l, i: (l, 0, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, spec.block, F), lambda l, i: (l, i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((L, xp.shape[0], F), jnp.float32),
            compiler_params=_hot_compiler_params(spec),
            interpret=_interpret(),
        )(_res_array(spec), xp, g)
        # [L, N, F] -> [N, L*F]
        feats = jnp.transpose(out[:, :n], (1, 0, 2)).reshape(n, L * F)
        return feats, None

    out_shapes = [jax.ShapeDtypeStruct((xp.shape[0], spec.out_dim), jnp.float32)]
    out_specs = [
        pl.BlockSpec((spec.block, spec.out_dim), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ]
    vw = L * 8 * F
    out_shapes.append(jax.ShapeDtypeStruct((xp.shape[0], vw), jnp.float32))
    out_specs.append(
        pl.BlockSpec((spec.block, vw), lambda i: (i, 0), memory_space=pltpu.VMEM)
    )
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, spec),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((spec.block, x.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(g.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=_interpret(),
    )(xp, g)
    return outs[0][:n], outs[1][:n]


def _bwd_pallas(spec: HashEncodeSpec, x: jnp.ndarray, vals, dout: jnp.ndarray):
    xp, n = _pad_n(x, spec.block)
    F = spec.features_per_level
    L = spec.n_levels
    g_shape = (L, spec.hi, F * LANE)
    nblocks = xp.shape[0] // spec.block

    if not spec.compute_dx:
        if spec.levels_in_body:
            dp = jnp.pad(dout, ((0, xp.shape[0] - n), (0, 0)))  # [Npad, L*F]
            dg = pl.pallas_call(
                functools.partial(_bwd_body_kernel, spec),
                grid=(nblocks,),
                in_specs=[
                    pl.BlockSpec(
                        (spec.block, x.shape[1]), lambda i: (i, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (spec.block, L * F), lambda i: (i, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (L, spec.hi, F * LANE), lambda i: (0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                out_shape=jax.ShapeDtypeStruct(g_shape, jnp.float32),
                compiler_params=_hot_compiler_params(spec),
                interpret=_interpret(),
            )(xp, dp)
            return dg, jnp.zeros_like(x)
        # [N, L*F] -> [L, Npad, F]; zero-padded rows contribute nothing
        d3 = jnp.transpose(dout.reshape(n, L, F), (1, 0, 2))
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
                    (1, spec.block, F), lambda l, i: (l, i, 0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, spec.hi, F * LANE), lambda l, i: (l, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct(g_shape, jnp.float32),
            compiler_params=_hot_compiler_params(spec),
            interpret=_interpret(),
        )(_res_array(spec), xp, d3)
        return dg, jnp.zeros_like(x)

    dp, _ = _pad_n(dout, spec.block)
    vp, _ = _pad_n(vals, spec.block)
    vw = L * 8 * F
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, spec),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((spec.block, x.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((spec.block, spec.out_dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((spec.block, vw), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(g_shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((spec.block, x.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(g_shape, jnp.float32),
            jax.ShapeDtypeStruct((xp.shape[0], x.shape[1]), jnp.float32),
        ],
        interpret=_interpret(),
    )(xp, dp, vp)
    return outs[0], outs[1][:n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def hash_encode(spec: HashEncodeSpec, g: jnp.ndarray, x: jnp.ndarray):
    """Fused hash-grid encode: g [L, T/128, F*128] (pack_tables), x [N, >=3]
    raw world coords -> feats [N, L*F]."""
    feats, _ = _fwd_pallas(spec, g, x)
    return feats


def _vjp_fwd(spec, g, x):
    feats, vals = _fwd_pallas(spec, g, x)
    return feats, (x, vals)


def _vjp_bwd(spec, res, dout):
    x, vals = res
    dg, dx = _bwd_pallas(spec, x, vals, dout)
    return dg, dx


hash_encode.defvjp(_vjp_fwd, _vjp_bwd)


def hash_encode_apply(
    enc: HashGridEncoding,
    params,
    x: jnp.ndarray,
    *,
    block: int = 512,
    compute_dx: bool = False,
) -> jnp.ndarray:
    """Drop-in fast path for ``HashGridEncoding.apply`` (same semantics)."""
    spec = HashEncodeSpec.from_encoding(enc, block=block, compute_dx=compute_dx)
    g = pack_tables(spec, params["tables"])
    lead = x.shape[:-1]
    flat = x.reshape(-1, x.shape[-1])
    if flat.shape[-1] < 8:  # lane-pad the input tile
        flat = jnp.pad(flat, ((0, 0), (0, 8 - flat.shape[-1])))
    feats = hash_encode(spec, g, flat)
    return feats.reshape(*lead, spec.out_dim)

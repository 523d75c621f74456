"""Pallas TPU SpMV kernels over packed (two-pass, P=1) plans.

The full-generality execution path — any matrix, any width, no column
locality or skew required (see ``formats/packed.py`` for the layout
rationale and the reference lineage: ``SpMVFrontendBufferNone.scala:
9-175``).

Pass A streams one chunk's slot tiles plus its (chunk_blocks, 128) x
window per grid step (scalar-prefetched chunk id — the sliding residency
set; DMA-engine role of ``SpMVBackendTwoPort.scala:57-136``), gathers x
through a select tree, multiplies, and *segmented*-prefix-scans each
128-lane row (piece-start flags ride bit 14 of the column stream, so a
piece's sum lands at its end slot with no subtraction).  Pass B sweeps y
windows in order: each visit streams one scan block and its extraction
index tile, gathers every row's piece sum from its end slot (one select
tree), and accumulates the (64, 128) y window block — VMEM-resident
across all of the window's visits, written back once.  y is a reshape of
the pass-B output; no host-side gather, scatter, or segment-sum ever
touches an nnz-sized array.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats.packed import PACKED_WINDOW_BLOCKS, PackedPlan
from ..utils import platform
from .spmv_pallas import _compute_dtype, _fence_interpret

Array = Any


def _roll_lanes(S: Array, d: int, interpret: bool) -> Array:
    return (jnp.roll(S, d, axis=1) if interpret
            else pltpu.roll(S, shift=d, axis=1))


def _make_scan_kernel(CB: int, ST: int, interpret: bool, acc_dtype):
    """Pass A: x select-tree gather, multiply, segmented lane scan."""
    N = ST * 8

    def kernel(cs_ref, vals_ref, cols_ref, x_ref, out_ref):
        v = vals_ref[...].reshape(N, 128)
        if v.dtype != acc_dtype:
            v = v.astype(acc_dtype)
        craw = cols_ref[...].reshape(N, 128).astype(jnp.int32)
        c = jnp.bitwise_and(craw, 16383)
        # piece-start flags kept int32 (pltpu.roll of bools is not
        # supported on all Mosaic versions)
        f = jnp.bitwise_and(jax.lax.shift_right_logical(craw, 14), 1)
        blk = jax.lax.shift_right_logical(c, 7)
        lane = jnp.bitwise_and(c, 127)
        depth = max(1, (CB - 1).bit_length())
        bits = [jnp.bitwise_and(jax.lax.shift_right_logical(blk, d), 1)
                == 1 for d in range(depth)]

        def tree(lo: int, size: int):
            if size == 1:
                b = min(lo, CB - 1)
                return jnp.take_along_axis(
                    jnp.broadcast_to(x_ref[b:b + 1, :], (N, 128)), lane,
                    axis=1)
            half = size // 2
            left = tree(lo, half)
            if lo + half >= CB:
                return left
            right = tree(lo + half, half)
            return jnp.where(bits[half.bit_length() - 1], right, left)

        S = v * tree(0, 1 << depth)
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, S.shape, 1)
        zero = jnp.zeros((), S.dtype)
        for d in (1, 2, 4, 8, 16, 32, 64):
            vs = jnp.where(lane_iota >= d,
                           _roll_lanes(S, d, interpret), zero)
            fs = jnp.where(lane_iota >= d,
                           _roll_lanes(f, d, interpret), 0)
            S = S + jnp.where(f == 1, zero, vs)
            f = jnp.bitwise_or(f, fs)
        out_ref[...] = S.reshape(ST, 8, 128)

    return kernel


def _make_extract_kernel(ST: int, acc_dtype):
    """Pass B: gather piece sums from their end slots, accumulate the
    window's resident y block."""
    N = ST * 8
    YB = PACKED_WINDOW_BLOCKS

    def kernel(sb_ref, ws_ref, wf_ref, s_ref, esrc_ref, out_ref):
        i = pl.program_id(0)
        S = s_ref[...].reshape(N, 128)
        e = esrc_ref[0].astype(jnp.int32)                # (64, 128)
        me = e >= 0
        ei = jnp.where(me, e, 0)
        sub = jax.lax.shift_right_logical(ei, 7)
        elan = jnp.bitwise_and(ei, 127)
        depth = max(1, (N - 1).bit_length())
        bits = [jnp.bitwise_and(jax.lax.shift_right_logical(sub, d), 1)
                == 1 for d in range(depth)]

        def tree(lo: int, size: int):
            if size == 1:
                b = min(lo, N - 1)
                row = jnp.broadcast_to(S[b:b + 1, :], (YB, 128))
                return jnp.take_along_axis(row, elan, axis=1)
            half = size // 2
            left = tree(lo, half)
            if lo + half >= N:
                return left
            right = tree(lo + half, half)
            return jnp.where(bits[half.bit_length() - 1], right, left)

        contrib = jnp.where(me, tree(0, 1 << depth),
                            jnp.zeros((), acc_dtype))

        @pl.when(wf_ref[i] == 1)
        def _():
            out_ref[...] = contrib

        @pl.when(wf_ref[i] == 0)
        def _():
            out_ref[...] += contrib

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def _spmv_packed(plan: PackedPlan, x: Array,
                 interpret: bool = False) -> Array:
    T = plan.vals.shape[0]
    st = plan.stats
    CB, ST = st.chunk_blocks, st.step_tiles
    rows, ncols = plan.shape
    nwin = st.num_windows
    YB = PACKED_WINDOW_BLOCKS
    acc_dtype = _compute_dtype(plan.vals.dtype)

    nchunks = -(-ncols // (CB * 128))
    xp = jnp.zeros((nchunks * CB * 128,), acc_dtype)
    xp = xp.at[:ncols].set(jnp.asarray(x, acc_dtype))
    x2d = xp.reshape(nchunks * CB, 128)

    # ---- pass A: segmented scan ----
    scan_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(st.num_steps_a,),
        in_specs=[
            pl.BlockSpec((ST, 8, 128), lambda i, cs: (i, 0, 0)),
            pl.BlockSpec((ST, 8, 128), lambda i, cs: (i, 0, 0)),
            pl.BlockSpec((CB, 128), lambda i, cs: (cs[i], 0)),
        ],
        out_specs=pl.BlockSpec((ST, 8, 128), lambda i, cs: (i, 0, 0)),
    )
    S = pl.pallas_call(
        _make_scan_kernel(CB, ST, interpret, acc_dtype),
        grid_spec=scan_spec,
        out_shape=jax.ShapeDtypeStruct((T, 8, 128), acc_dtype),
        interpret=interpret,
    )(plan.cstep, plan.vals, plan.cols, x2d)
    S = _fence_interpret(S, interpret)

    # ---- pass B: extract + window accumulate ----
    ext_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(st.num_steps_b,),
        in_specs=[
            pl.BlockSpec((ST, 8, 128), lambda i, sb, ws, wf: (sb[i], 0, 0)),
            pl.BlockSpec((1, 64, 128), lambda i, sb, ws, wf: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((YB, 128),
                               lambda i, sb, ws, wf: (ws[i], 0)),
    )
    out = pl.pallas_call(
        _make_extract_kernel(ST, acc_dtype),
        grid_spec=ext_spec,
        out_shape=jax.ShapeDtypeStruct((nwin * YB, 128), acc_dtype),
        interpret=interpret,
    )(plan.sblock, plan.wstep, plan.wfirst, S, plan.esrc)
    out = _fence_interpret(out, interpret)

    # unvisited windows hold uninitialized memory — mask them off
    y = jnp.where(
        jnp.repeat(plan.window_mask, YB * 128).reshape(out.shape) > 0,
        out, jnp.zeros((), acc_dtype)).reshape(-1)[:rows]

    if plan.ov_vals.shape[0]:
        xg = jnp.take(jnp.asarray(x, acc_dtype), plan.ov_cols)
        y = y + jax.ops.segment_sum(plan.ov_vals.astype(acc_dtype) * xg,
                                    plan.ov_rows, num_segments=rows)
    return y


def spmv_packed(plan: PackedPlan, x: Array, *,
                interpret: Optional[bool] = None,
                semiring: str = "plus_times") -> Array:
    """``y = A @ x`` from a packed plan (any structure, any width).

    plus_times only: the segmented-scan extraction assumes the additive
    monoid of a ring (use a SELL plan's strategies for min/max
    semirings)."""
    if semiring != "plus_times":
        raise ValueError(
            f"packed plans run plus_times only (piece extraction rides a "
            f"segmented prefix sum); got {semiring!r}")
    if interpret is None:
        interpret = platform.use_interpret()
    return _spmv_packed(plan, jnp.asarray(x), interpret=interpret)

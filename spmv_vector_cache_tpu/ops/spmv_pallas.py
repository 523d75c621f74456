"""Pallas TPU SpMV kernels over SELL tile plans.

This is the accelerator datapath of the library — the role of the
reference's frontend/backend RTL (``chisel/backend/SpMVBackend.scala``,
``chisel/frontend/SpMVFrontend*.scala``), rebuilt the TPU way:

* the *backend* (4-channel DMA engine with FIFO-feedback throttling,
  ``SpMVBackend.scala:59-135``) becomes the Pallas grid pipeline: BlockSpec
  index maps stream value/column tiles HBM->VMEM double-buffered by the
  Mosaic pipeliner, with scalar-prefetched metadata steering the output
  block (``PrefetchScalarGridSpec``);
* the *frontend* (multiply + hazard-interlocked scattered accumulate)
  becomes a sublane multiply-reduce: the SELL layout binds rows to lanes,
  so ``y[row] +=`` is a vector sum with no hazards to track;
* the *result-vector placement* design space (BufferAll / BufferSel /
  BufferNone / vector cache over y, SURVEY.md §2.1) maps onto placement of
  the irregularly-accessed dense vector, which in the CSR dual is **x**:

  - ``GATHER_STREAM``  (BufferNone analog) — x[cols] pre-gathered by an XLA
    gather, streamed through HBM; every irregular access pays HBM
    bandwidth, like the reference's every-operand-to-DDR variant
    (``SpMVFrontendBufferNone.scala``);
  - ``X_RESIDENT``     (BufferAll analog) — x held entirely in VMEM and
    gathered in-kernel; capacity-capped exactly like ocmDepth caps rows in
    ``SpMVFrontendBufferAll.scala``;
  - ``X_WINDOW``       (BufferSel/cache analog) — a sliding column window
    of x in VMEM, selected per tile by scalar-prefetched window indices;
    feasible when the plan's per-tile column span is bounded (the
    ``maxColSpan`` analysis, ``SparseMatrix.cpp:110-119``, decides).

Accumulation across tiles of one slice uses the revisiting-output pattern:
``tile_slice`` is nondecreasing, so the y slice block stays VMEM-resident
while its tiles stream past, and flushes once per slice — the TPU
equivalent of the reference's write-combining y cache.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats.plan import SellPlan
from ..utils import platform

Array = Any


# ---------------------------------------------------------------------------
# kernel helpers
# ---------------------------------------------------------------------------

def _accumulate(tile_slice_ref, out_ref, partial):
    """Accumulate a (1, R) slice partial into the (8, R) super-slice block.

    The output block groups 8 y-slices (TPU sublane granularity); it is
    zeroed when the grid enters a new super-slice, then every tile adds its
    partial into sublane ``slice % 8``.  ``tile_slice`` is nondecreasing so
    the block stays VMEM-resident until its last tile and flushes once —
    the write-combining behavior the reference builds a vector cache for.
    """
    i = pl.program_id(0)
    s = tile_slice_ref[i]
    prev_super = tile_slice_ref[jnp.maximum(i, 1) - 1] // 8
    first_of_super = jnp.logical_or(i == 0, (s // 8) != prev_super)

    @pl.when(first_of_super)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    r = s % 8
    out_ref[pl.ds(r, 1), :] = out_ref[pl.ds(r, 1), :] + partial


def _gather_lanes(x_row: Array, cols: Array) -> Array:
    """Gather x values for a (P, R) column-index tile from a (1, C) row."""
    P = cols.shape[0]
    return jnp.take_along_axis(
        jnp.broadcast_to(x_row, (P, x_row.shape[1])), cols, axis=1)


# ---------------------------------------------------------------------------
# strategy kernels + dispatchers
# ---------------------------------------------------------------------------

def _kernel_gather_stream(tile_slice_ref, vals_ref, xg_ref, out_ref):
    """GATHER_STREAM: products from pre-gathered x, sublane reduction."""
    partial = jnp.sum(vals_ref[0] * xg_ref[0], axis=0)[None, :]
    _accumulate(tile_slice_ref, out_ref, partial)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _spmv_gather_stream(plan: SellPlan, x: Array,
                        interpret: bool = False) -> Array:
    T, P, R = plan.vals.shape
    xg = jnp.take(x.astype(plan.vals.dtype), plan.cols, axis=0)  # (T, P, R)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, P, R), lambda i, ts: (i, 0, 0)),
            pl.BlockSpec((1, P, R), lambda i, ts: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((8, R), lambda i, ts: (ts[i] // 8, 0)),
    )
    y2d = pl.pallas_call(
        _kernel_gather_stream,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.num_slices, R), plan.vals.dtype),
        interpret=interpret,
    )(plan.tile_slice, plan.vals, xg)
    return _fixup(plan, y2d)


def _kernel_x_resident(tile_slice_ref, vals_ref, cols_ref, x_ref, out_ref):
    """X_RESIDENT: gather from whole-x VMEM block inside the kernel."""
    xg = _gather_lanes(x_ref[...], cols_ref[0])
    partial = jnp.sum(vals_ref[0] * xg, axis=0)[None, :]
    _accumulate(tile_slice_ref, out_ref, partial)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _spmv_x_resident(plan: SellPlan, x: Array,
                     interpret: bool = False) -> Array:
    T, P, R = plan.vals.shape
    C = _pad_to(plan.shape[1], 128)
    xp = jnp.zeros((1, C), plan.vals.dtype).at[0, :plan.shape[1]].set(
        x.astype(plan.vals.dtype))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, P, R), lambda i, ts: (i, 0, 0)),
            pl.BlockSpec((1, P, R), lambda i, ts: (i, 0, 0)),
            pl.BlockSpec((1, C), lambda i, ts: (0, 0)),   # whole x, resident
        ],
        out_specs=pl.BlockSpec((8, R), lambda i, ts: (ts[i] // 8, 0)),
    )
    y2d = pl.pallas_call(
        _kernel_x_resident,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.num_slices, R), plan.vals.dtype),
        interpret=interpret,
    )(plan.tile_slice, plan.vals, plan.cols, xp)
    return _fixup(plan, y2d)


@functools.partial(jax.jit, static_argnames=("interpret", "window"))
def _spmv_x_window(plan: SellPlan, x: Array, window: int,
                   interpret: bool = False) -> Array:
    """X_WINDOW: two adjacent W-wide x blocks form a 2W sliding window.

    The window block index is ``tile_col_min // W``; any tile whose column
    span is <= W is covered by [base*W, base*W + 2W).  Feasibility is the
    planner's job (``stats.max_tile_col_span <= window``).
    """
    T, P, R = plan.vals.shape
    W = window
    if plan.stats.max_tile_col_span > W:
        raise ValueError(
            f"x_window infeasible: tile col span {plan.stats.max_tile_col_span}"
            f" > window {W}")
    # pad x so block indices base and base+1 are always in range
    nblocks = _pad_to(plan.shape[1], W) // W + 1
    xp = jnp.zeros((1, nblocks * W), plan.vals.dtype)
    xp = xp.at[0, :plan.shape[1]].set(x.astype(plan.vals.dtype))
    win_block = jnp.asarray(plan.tile_col_min, jnp.int32) // W    # (T,)

    def kernel(ts_ref, wb_ref, vals_ref, cols_ref, xlo_ref, xhi_ref, out_ref):
        i = pl.program_id(0)
        base = wb_ref[i] * W
        cols = cols_ref[0] - base
        xw = jnp.concatenate([xlo_ref[...], xhi_ref[...]], axis=1)  # (1, 2W)
        xg = _gather_lanes(xw, cols)
        partial = jnp.sum(vals_ref[0] * xg, axis=0)[None, :]
        _accumulate(ts_ref, out_ref, partial)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,   # tile_slice, win_block
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, P, R), lambda i, ts, wb: (i, 0, 0)),
            pl.BlockSpec((1, P, R), lambda i, ts, wb: (i, 0, 0)),
            pl.BlockSpec((1, W), lambda i, ts, wb: (0, wb[i])),
            pl.BlockSpec((1, W), lambda i, ts, wb: (0, wb[i] + 1)),
        ],
        out_specs=pl.BlockSpec((8, R), lambda i, ts, wb: (ts[i] // 8, 0)),
    )
    y2d = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.num_slices, R), plan.vals.dtype),
        interpret=interpret,
    )(plan.tile_slice, win_block, plan.vals, plan.cols, xp, xp)
    return _fixup(plan, y2d)


def _pad_to(n: int, m: int) -> int:
    return -(-n // m) * m


def _fixup(plan: SellPlan, y2d: Array) -> Array:
    """Map flat sub-row results back to y (split/sigma merge)."""
    rows = plan.shape[0]
    flat = y2d.reshape(-1)
    if plan.identity_map:
        return flat[:rows]
    y = jax.ops.segment_sum(flat, plan.row_map, num_segments=rows + 1)
    return y[:rows]


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------

STRATEGIES = ("gather_stream", "x_resident", "x_window")


def spmv_plan(plan: SellPlan, x: Array, *, strategy: str = "auto",
              window: int = 2048, interpret: Optional[bool] = None) -> Array:
    """Run SpMV ``y = A @ x`` from a prebuilt :class:`SellPlan`.

    strategy: 'gather_stream' | 'x_resident' | 'x_window' | 'auto'.
    'auto' defers to :mod:`.strategy`'s selector features.
    """
    if interpret is None:
        interpret = platform.use_interpret()
    if strategy == "auto":
        from .strategy import select_strategy
        strategy = select_strategy(plan)
    x = jnp.asarray(x)
    if strategy == "gather_stream":
        return _spmv_gather_stream(plan, x, interpret=interpret)
    if strategy == "x_resident":
        return _spmv_x_resident(plan, x, interpret=interpret)
    if strategy == "x_window":
        return _spmv_x_window(plan, x, window, interpret=interpret)
    raise ValueError(f"unknown strategy {strategy!r}")

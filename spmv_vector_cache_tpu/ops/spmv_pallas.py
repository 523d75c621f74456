"""Pallas TPU SpMV kernels over SELL tile plans.

This is the accelerator datapath of the library — the role of the
reference's frontend/backend RTL (``chisel/backend/SpMVBackend.scala``,
``chisel/frontend/SpMVFrontend*.scala``), rebuilt the TPU way:

* the *backend* (4-channel DMA engine with FIFO-feedback throttling,
  ``SpMVBackend.scala:59-135``) becomes the Pallas grid pipeline: BlockSpec
  index maps stream value/column tiles HBM->VMEM, double-buffered by the
  Mosaic pipeliner, with a scalar-prefetched window table steering the x
  blocks (``PrefetchScalarGridSpec``);
* the *frontend* (multiply + hazard-interlocked scattered accumulate)
  becomes a sublane multiply-reduce: the SELL layout binds rows to lanes,
  so ``y[row] +=`` is a vector sum with no hazards to track;
* the *result-vector placement* design space (BufferAll / BufferNone /
  BufferSel / vector cache over y, SURVEY.md §2.1) maps onto placement of
  the irregularly-accessed dense vector — in the CSR dual that is **x**:

  - ``window`` strategy (the vector-cache / BufferSel / BufferAll analog):
    a K*128-wide VMEM window of x slides under plan control
    (``window_base``), and the kernel gathers lanes from it with K
    ``take_along_axis`` passes (TPU's gather primitive covers exactly 128
    lanes).  K comes from the plan's column-span analysis — the port of
    ``maxColSpan`` (``SparseMatrix.cpp:110-119``).  A window covering all
    of x *is* BufferAll; a sliding window is the cache; the plan's
    column-striping mode manufactures locality when there is none, the
    role the hybrid BufferSel plays in the reference;
  - ``stream`` strategy (BufferNone analog): x[cols] pre-gathered by an
    XLA gather through HBM — every irregular access pays memory latency,
    like the every-operand-to-DDR variant
    (``SpMVFrontendBufferNone.scala``); the robust fallback for layouts
    where no window is feasible.

The kernel emits per-tile partial sums (no cross-tile accumulation in the
kernel, so the grid pipelines freely); a sorted segment-sum folds tiles
into slices, and the plan's ``row_map`` fixup merges split/sigma/stripe
sub-rows — both cheap XLA passes over data that is ~P*R times smaller than
the nonzero stream.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..formats.plan import TILES_PER_STEP, WINDOW_GROUP_TILES, SellPlan
from ..utils import platform

Array = Any

STRATEGIES = ("window", "stream")


# ---------------------------------------------------------------------------
# reductions shared by both strategies
# ---------------------------------------------------------------------------

def _compute_dtype(vals_dtype):
    """Mixed precision: bf16 value streams gather/accumulate in f32 (the
    value channel halves to 2 B/nnz; with int16 in-window offsets the
    whole nonzero stream is 4 B/nnz — the same discipline as the DIA
    kernel's bf16 path, ``spmv_dia._compute_dtype``)."""
    if jnp.dtype(vals_dtype) == jnp.bfloat16:
        return jnp.float32
    return jnp.dtype(vals_dtype)


def _fence_interpret(partials: Array, interpret: bool) -> Array:
    """Stop XLA from rewriting across the kernel/epilogue boundary in
    interpret mode.

    With ``interpret=True`` the Pallas kernel inlines into the XLA module
    as plain HLO (gather/select/iota chains); feeding that straight into
    the segment-sum epilogue makes the algebraic simplifier oscillate
    ("Algebraic simplifier is likely stuck in a circular simplification
    loop... 50 runs", observed in the 8-device CPU dryrun, VERDICT r2).
    On real TPU the Mosaic kernel is opaque to XLA, so no such rewrite
    exists — the barrier only reproduces that boundary for interpret
    mode and costs nothing."""
    if interpret:
        return jax.lax.optimization_barrier(partials)
    return partials


def _reduce_partials(plan: SellPlan, partials: Array,
                     semiring: str = "plus_times") -> Array:
    """(T, R) per-tile partials -> y: slice fold + sub-row fixup, both
    under the semiring's additive reduction."""
    from . import semiring as sr

    s = sr.get(semiring)
    rows = plan.shape[0]
    y2d = s.segment_reduce(partials, jnp.asarray(plan.tile_slice),
                           num_segments=plan.num_slices,
                           indices_are_sorted=True)
    flat = y2d.reshape(-1)
    if plan.identity_map:
        return flat[:rows]
    y = s.segment_reduce(flat, jnp.asarray(plan.row_map),
                         num_segments=rows + 1)
    return y[:rows]


# ---------------------------------------------------------------------------
# window strategy
# ---------------------------------------------------------------------------

#: x copies up to this size stay fully VMEM-resident in the window kernel
#: (the BufferAll regime); larger x falls back to per-group window streaming
X_RESIDENT_BUDGET_BYTES = 8 << 20


def _group_accumulate(K: int, WG: int, P: int, R: int, vg, cw, get_xb,
                      semiring: str = "plus_times", acc_dtype=None):
    """Multiply-gather one window group: vals (WG,P,R) x in-window offsets
    (WG,P,R) against a K*128-wide x window served block-wise by
    ``get_xb(b)`` ((1, 128) block b of the window).

    ``cw`` offsets are plan-precomputed (``compute_cols_win``) and already
    in [0, K*128), so the per-pass steering is two cheap integer ops —
    ``bucket = off >> 7`` picks the 128-lane block, ``off & 127`` the lane
    — instead of the subtract/compare/clamp chain the global-cols kernel
    needed.  Each block is gathered once and the K gathered candidates are
    merged with K-1 selects before a single multiply (gather passes are
    the kernel's dominant cost; the per-pass multiply/add of the earlier
    scheme measured ~20% slower).  Padding slots carry (val 0, offset 0):
    they gather a real lane but contribute val*x = 0."""
    from . import semiring as sr

    mul, axis_reduce = sr.kernel_ops(semiring)
    if acc_dtype is not None and vg.dtype != acc_dtype:
        vg = vg.astype(acc_dtype)                        # bf16 -> f32
    bucket = jax.lax.shift_right_logical(cw, 7)          # (WG, P, R)
    idx = jnp.bitwise_and(cw, 127).reshape(WG * P, R)
    gat = None
    for b in range(K):
        xb = get_xb(b)                                   # (1, 128)
        gb = jnp.take_along_axis(
            jnp.broadcast_to(xb, (WG * P, 128)), idx,
            axis=1).reshape(WG, P, R)
        gat = gb if gat is None else jnp.where(bucket == b, gb, gat)
    return axis_reduce(mul(vg, gat), 1)                  # (WG, R)


def _make_window_kernel_resident(K: int, NG: int, P: int, R: int, WG: int,
                                 semiring: str = "plus_times",
                                 acc_dtype=None):
    """Window kernel with x fully VMEM-resident: each 4-tile group slices
    its K x 128 window out of the resident copy at a 128-aligned dynamic
    offset — no per-step x DMAs (probe-measured ~35% faster than
    scalar-steered window fetches).  Two groups share one 8-sublane output
    write (stores must stay 8-row aligned)."""
    PAIR = TILES_PER_STEP // WG

    def kernel(wb_ref, vals_ref, cols_ref, x_ref, out_ref):
        i = pl.program_id(0)
        v = vals_ref[...]                                # (NG*WG, P, R)
        cw = cols_ref[...].astype(jnp.int32)             # int16 -> int32

        def group(g):
            base = wb_ref[i * NG + g] * 128

            def get_xb(b, base=base):
                start = pl.multiple_of(base + b * 128, 128)
                return x_ref[0:1, pl.ds(start, 128)]
            return _group_accumulate(
                K, WG, P, R, v[g * WG:(g + 1) * WG],
                cw[g * WG:(g + 1) * WG], get_xb, semiring, acc_dtype)

        for w in range(NG // PAIR):
            parts = [group(w * PAIR + j) for j in range(PAIR)]
            res = parts[0] if PAIR == 1 else jnp.concatenate(parts, axis=0)
            out_ref[w * TILES_PER_STEP:(w + 1) * TILES_PER_STEP, :] = res
    return kernel


def _make_window_kernel(K: int, NG: int, P: int, R: int, WG: int,
                        semiring: str = "plus_times", acc_dtype=None):
    """Kernel over one grid step = NG groups of WG=4 tiles; group g
    gathers from its own K x 128 window (x_refs[g*K + b])."""
    PAIR = TILES_PER_STEP // WG

    def kernel(wb_ref, vals_ref, cols_ref, *rest):
        x_refs, out_ref = rest[:NG * K], rest[NG * K]
        v = vals_ref[...]                                # (NG*WG, P, R)
        cw = cols_ref[...].astype(jnp.int32)             # int16 -> int32

        def group(g):
            return _group_accumulate(
                K, WG, P, R, v[g * WG:(g + 1) * WG],
                cw[g * WG:(g + 1) * WG],
                lambda b, g=g: x_refs[g * K + b][...], semiring, acc_dtype)

        for w in range(NG // PAIR):
            parts = [group(w * PAIR + j) for j in range(PAIR)]
            res = parts[0] if PAIR == 1 else jnp.concatenate(parts, axis=0)
            out_ref[w * TILES_PER_STEP:(w + 1) * TILES_PER_STEP, :] = res
    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "semiring"))
def _spmv_window(plan: SellPlan, x: Array, interpret: bool = False,
                 semiring: str = "plus_times") -> Array:
    T, P, R = plan.vals.shape
    B = TILES_PER_STEP
    K = plan.stats.window_blocks
    G = plan.stats.groups_per_step
    if K <= 0:
        raise ValueError(
            "window strategy infeasible for this plan "
            "(stats.window_blocks == 0); rebuild with stripe_width or use "
            "the 'stream' strategy")
    # pad x so blocks wb .. wb+K-1 always exist
    acc_dtype = _compute_dtype(plan.vals.dtype)
    nblocks = max(-(-plan.shape[1] // 128), plan.stats.max_window_base + K)
    xp = jnp.zeros((1, nblocks * 128), acc_dtype)
    xp = xp.at[0, :plan.shape[1]].set(jnp.asarray(x, acc_dtype))

    WG = WINDOW_GROUP_TILES
    NG = (B * G) // WG                        # 4-tile window groups per step
    import os
    budget = int(os.environ.get("SPMV_TPU_X_RESIDENT_BYTES",
                                X_RESIDENT_BUDGET_BYTES))
    if xp.shape[1] * xp.dtype.itemsize <= budget:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,                # window_base
            grid=(T // (B * G),),
            in_specs=[
                pl.BlockSpec((B * G, P, R), lambda i, wb: (i, 0, 0)),
                pl.BlockSpec((B * G, P, R), lambda i, wb: (i, 0, 0)),
                pl.BlockSpec((1, xp.shape[1]), lambda i, wb: (0, 0)),
            ],
            out_specs=pl.BlockSpec((B * G, R), lambda i, wb: (i, 0)),
        )
        kernel = _make_window_kernel_resident(K, NG, P, R, WG, semiring,
                                              acc_dtype)
        operands = (plan.window_base, plan.vals, plan.cols_win, xp)
    else:
        x_specs = [
            pl.BlockSpec((1, 128),
                         lambda i, wb, g=g, b=b: (0, wb[i * NG + g] + b))
            for g in range(NG) for b in range(K)
        ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,                # window_base
            grid=(T // (B * G),),
            in_specs=[
                pl.BlockSpec((B * G, P, R), lambda i, wb: (i, 0, 0)),
                pl.BlockSpec((B * G, P, R), lambda i, wb: (i, 0, 0)),
                *x_specs,
            ],
            out_specs=pl.BlockSpec((B * G, R), lambda i, wb: (i, 0)),
        )
        kernel = _make_window_kernel(K, NG, P, R, WG, semiring, acc_dtype)
        operands = (plan.window_base, plan.vals, plan.cols_win,
                    *([xp] * (NG * K)))
    partials = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, R), acc_dtype),
        interpret=interpret,
    )(*operands)
    return _reduce_partials(plan, _fence_interpret(partials, interpret),
                            semiring)


# ---------------------------------------------------------------------------
# stream strategy
# ---------------------------------------------------------------------------

def _make_stream_kernel(semiring: str, acc_dtype=None):
    from . import semiring as sr

    mul, axis_reduce = sr.kernel_ops(semiring)

    def kernel(vals_ref, xg_ref, out_ref):
        v = vals_ref[...]
        if acc_dtype is not None and v.dtype != acc_dtype:
            v = v.astype(acc_dtype)
        out_ref[...] = axis_reduce(mul(v, xg_ref[...]), 1)
    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "semiring"))
def _spmv_stream(plan: SellPlan, x: Array, interpret: bool = False,
                 semiring: str = "plus_times") -> Array:
    T, P, R = plan.vals.shape
    B = TILES_PER_STEP * plan.stats.groups_per_step
    acc_dtype = _compute_dtype(plan.vals.dtype)
    xg = jnp.take(jnp.asarray(x, acc_dtype), plan.cols, axis=0)
    partials = pl.pallas_call(
        _make_stream_kernel(semiring, acc_dtype),
        grid=(T // B,),
        in_specs=[
            pl.BlockSpec((B, P, R), lambda i: (i, 0, 0)),
            pl.BlockSpec((B, P, R), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((B, R), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((T, R), acc_dtype),
        interpret=interpret,
    )(plan.vals, xg)
    return _reduce_partials(plan, _fence_interpret(partials, interpret),
                            semiring)


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------

def spmv_plan(plan, x: Array, *, strategy: str = "auto",
              interpret: Optional[bool] = None,
              semiring: str = "plus_times") -> Array:
    """Run SpMV ``y = A (+).(x) x`` from a prebuilt plan over a semiring.

    Dispatches on plan type: :class:`~..formats.dia.DiaPlan` runs the
    gather-free shift kernel, :class:`~..formats.dia.HybridPlan` adds the
    SELL residual pass, :class:`SellPlan` picks among the x-placement
    strategies: 'window' | 'stream' | 'auto' (window when feasible).

    ``semiring``: name or :class:`.semiring.Semiring` — plus_times,
    min_plus, max_plus, max_times, or_and ({0,1}-float encoded).  The plan
    must have been built with ``pad_value`` = the semiring's zero
    (``auto_plan(semiring=...)`` does this); DIA plans support plus_times
    only.
    """
    from ..formats.dia import DiaPlan, HybridPlan
    from . import semiring as sr
    from .spmv_dia import spmv_dia

    semiring = sr.get(semiring).name
    if isinstance(plan, (DiaPlan, HybridPlan)) and semiring != "plus_times":
        raise ValueError("DIA plans encode absence as 0 and support only "
                         "plus_times; build a SELL plan via "
                         "auto_plan(semiring=...)")
    if isinstance(plan, DiaPlan):
        if strategy not in ("auto", "dia"):
            raise ValueError(f"DiaPlan supports only the 'dia' strategy, "
                             f"got {strategy!r}")
        if plan.double:
            from .spmv_dia import spmv_dia_double
            return spmv_dia_double(plan, x, interpret=interpret)
        return spmv_dia(plan, x, interpret=interpret)
    if isinstance(plan, HybridPlan):
        return (spmv_dia(plan.dia, x, interpret=interpret) +
                spmv_plan(plan.rest, x, strategy=strategy,
                          interpret=interpret))
    if interpret is None:
        interpret = platform.use_interpret()
    if strategy == "auto":
        strategy = "window" if plan.stats.window_blocks > 0 else "stream"
    x = jnp.asarray(x)
    if strategy == "window":
        return _spmv_window(plan, x, interpret=interpret, semiring=semiring)
    if strategy == "stream":
        return _spmv_stream(plan, x, interpret=interpret, semiring=semiring)
    raise ValueError(f"unknown strategy {strategy!r}")

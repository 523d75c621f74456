"""Pallas SpMM (sparse x dense, multi-RHS) over SELL tile plans.

BASELINE.json config 3.  Extends the windowed SpMV kernel to k right-hand
sides: the RHS matrix is transposed host-side to (k, cols) so a window
block is a natural (8, 128) tile — 8 RHS columns on sublanes x 128 matrix
columns on lanes — and one ``take_along_axis`` with a broadcast index row
yields the gathered values for 8 RHS at once.  The matrix tiles stream
once per 8-RHS chunk (vs once per RHS when looping SpMV), which is the
point of a fused SpMM: the nonzero stream amortizes over the dense block.

For block-structured matrices prefer the BSR path
(:func:`..ops.reference.spmm`), which rides the MXU directly.
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

RHS_CHUNK = 8   # RHS columns per kernel pass (sublane granularity)


def _make_spmm_kernel(K: int, NG: int, P: int, R: int, WG: int):
    """NG groups of WG=4 tiles per step; group g gathers 8 RHS rows from
    its own K-block window.  The out block's tile axis is not the sublane
    axis (block (1, step, 8, R)), so 4-tile writes need no pairing."""
    def kernel(wb_ref, vals_ref, cols_ref, *rest):
        bt_refs, out_ref = rest[:NG * K], rest[NG * K]
        i = pl.program_id(1)
        v = vals_ref[...]                                 # (NG*WG, P, R)
        cols = cols_ref[...]
        for g in range(NG):
            base = wb_ref[i * NG + g] * 128
            cg = (cols[g * WG:(g + 1) * WG] - base).reshape(WG * P, R)
            vg = v[g * WG:(g + 1) * WG].reshape(WG * P, R)
            accs = [jnp.zeros((WG * P, R), v.dtype)
                    for _ in range(RHS_CHUNK)]
            for b in range(K):
                off = cg - b * 128
                inb = (off >= 0) & (off < 128)
                idx = jnp.where(inb, off, 0)
                bt = bt_refs[g * K + b][0]                # (8, 128)
                for c in range(RHS_CHUNK):
                    src = jnp.broadcast_to(bt[c][None, :], (WG * P, 128))
                    gat = jnp.take_along_axis(src, idx, axis=1)
                    accs[c] = accs[c] + \
                        jnp.where(inb, gat, jnp.zeros((), v.dtype)) * vg
            # (8, WG*P, R) -> (WG, 8, R): per-tile sublane sum + transpose
            acc = jnp.stack(accs)                         # (8, WG*P, R)
            per_tile = jnp.sum(acc.reshape(RHS_CHUNK, WG, P, R), axis=2)
            out_ref[0, g * WG:(g + 1) * WG] = per_tile.transpose(1, 0, 2)
    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def _spmm_window(plan: SellPlan, bt: Array, interpret: bool = False) -> Array:
    """bt: (k, cols) transposed RHS; returns y (rows, k)."""
    T, P, R = plan.vals.shape
    B = TILES_PER_STEP
    K = plan.stats.window_blocks
    G = plan.stats.groups_per_step
    if K <= 0:
        raise ValueError("window SpMM infeasible for this plan; use the "
                         "reference spmm path")
    k = bt.shape[0]
    k8 = -(-k // RHS_CHUNK)
    nblocks = max(-(-plan.shape[1] // 128), plan.stats.max_window_base + K)
    btp = jnp.zeros((k8, RHS_CHUNK, nblocks * 128), plan.vals.dtype)
    btp = btp.at[:, :, :plan.shape[1]].set(
        jnp.asarray(bt, plan.vals.dtype).reshape(k8, RHS_CHUNK, -1)
        if k % RHS_CHUNK == 0 else
        jnp.pad(jnp.asarray(bt, plan.vals.dtype),
                ((0, k8 * RHS_CHUNK - k), (0, 0))).reshape(
                    k8, RHS_CHUNK, -1))

    WG = WINDOW_GROUP_TILES
    NG = (B * G) // WG
    bt_specs = [
        pl.BlockSpec((1, RHS_CHUNK, 128),
                     lambda kc, i, wb, g=g, b=b: (kc, 0, wb[i * NG + g] + b))
        for g in range(NG) for b in range(K)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(k8, T // (B * G)),
        in_specs=[
            pl.BlockSpec((B * G, P, R), lambda kc, i, wb: (i, 0, 0)),
            pl.BlockSpec((B * G, P, R), lambda kc, i, wb: (i, 0, 0)),
            *bt_specs,
        ],
        out_specs=pl.BlockSpec((1, B * G, RHS_CHUNK, R),
                               lambda kc, i, wb: (kc, i, 0, 0)),
    )
    partials = pl.pallas_call(
        _make_spmm_kernel(K, NG, P, R, WG),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k8, T, RHS_CHUNK, R),
                                       plan.vals.dtype),
        interpret=interpret,
    )(plan.window_base, plan.vals, plan.cols, *([btp] * (NG * K)))

    # fold tiles -> slices, then sub-rows -> rows
    y4 = jax.ops.segment_sum(partials.transpose(1, 0, 2, 3),
                             jnp.asarray(plan.tile_slice),
                             num_segments=plan.num_slices,
                             indices_are_sorted=True)   # (S, k8, 8, R)
    # (S, k8, 8, R) -> sub-row-major (S*R, k8*8)
    flat = y4.transpose(0, 3, 1, 2).reshape(plan.num_slices * R,
                                            k8 * RHS_CHUNK)
    rows = plan.shape[0]
    if plan.identity_map:
        y = flat[:rows]
    else:
        y = jax.ops.segment_sum(flat, jnp.asarray(plan.row_map),
                                num_segments=rows + 1)[:rows]
    return y[:, :k]


def spmm_plan(plan, b: Array, *,
              interpret: Optional[bool] = None) -> Array:
    """Fused SpMM ``Y = A @ B`` from a prebuilt plan (B: (cols, k)).

    Dispatches on plan type like :func:`.spmv_pallas.spmv_plan`: DiaPlan
    runs the gather-free diagonal SpMM when its x image fits VMEM,
    HybridPlan adds the SELL residual pass.
    """
    from ..formats.dia import DiaPlan, HybridPlan
    from ..formats.packed import PackedPlan
    from .spmm_dia import spmm_dia, spmm_dia_feasible

    if isinstance(plan, PackedPlan):
        raise ValueError(
            "PackedPlan has no fused SpMM kernel; run one spmv_plan per "
            "RHS column, or build a SELL plan (auto_plan(allow_dia="
            "False)) when the structure permits")
    if isinstance(plan, DiaPlan):
        if not spmm_dia_feasible(plan):
            raise ValueError(
                "DIA SpMM x image exceeds the VMEM budget for this matrix "
                "width; use a SELL plan (auto_plan(allow_dia=False)) or the "
                "reference spmm path")
        return spmm_dia(plan, b, interpret=interpret)
    if isinstance(plan, HybridPlan):
        return (spmm_plan(plan.dia, b, interpret=interpret) +
                spmm_plan(plan.rest, b, interpret=interpret))
    if interpret is None:
        interpret = platform.use_interpret()
    bt = jnp.asarray(b).T
    return _spmm_window(plan, bt, interpret=interpret)

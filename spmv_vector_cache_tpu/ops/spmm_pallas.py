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
from .spmv_pallas import _fence_interpret

Array = Any

RHS_CHUNK = 8   # RHS columns per kernel pass (sublane granularity)


def _make_spmm_kernel(K: int, NG: int, P: int, R: int, WG: int,
                      acc_dtype=None):
    """NG groups of WG tiles per step; group g gathers 8 RHS rows from
    its own K-block window slice of the ONE pre-gathered ``btw`` operand
    (the round-3 SpMV design: windows arrive as a regular operand, never
    as per-group block streams — an operand per (group, block) made the
    pipeline juggle hundreds of 4 KB streams per step, measured ~10x
    slower).  In-window offsets are plan-precomputed int16 in [0, K*128):
    ``off >> 7`` picks the block, ``off & 127`` the lane, the K gathered
    candidates merge with K-1 selects.  The out block's tile axis is not
    the sublane axis (block (1, step, 8, R)), so WG-tile writes need no
    pairing."""
    def kernel(vals_ref, cols_ref, btw_ref, out_ref):
        v = vals_ref[...]                                 # (NG*WG, P, R)
        if acc_dtype is not None and v.dtype != acc_dtype:
            v = v.astype(acc_dtype)
        cw = cols_ref[...].astype(jnp.int32)
        for g in range(NG):
            ix = cw[g * WG:(g + 1) * WG].reshape(WG * P, R)
            vg = v[g * WG:(g + 1) * WG].reshape(WG * P, R)
            bucket = jax.lax.shift_right_logical(ix, 7)
            lane = jnp.bitwise_and(ix, 127)
            accs = []
            for c in range(RHS_CHUNK):
                gat = None
                for b in range(K):
                    row = btw_ref[0, g, c, b * 128:(b + 1) * 128]  # (128,)
                    src = jnp.broadcast_to(row[None, :], (WG * P, 128))
                    gb = jnp.take_along_axis(src, lane, axis=1)
                    gat = gb if gat is None else \
                        jnp.where(bucket == b, gb, gat)
                accs.append(gat * vg)
            # (8, WG*P, R) -> (WG, 8, R): per-tile sublane sum + transpose
            acc = jnp.stack(accs)                         # (8, WG*P, R)
            per_tile = jnp.sum(acc.reshape(RHS_CHUNK, WG, P, R), axis=2)
            out_ref[0, g * WG:(g + 1) * WG] = per_tile.transpose(1, 0, 2)
    return kernel


def _bt_windows(bt: Array, k8: int, cols: int, nb: int, grain: int,
                rowidx: Array, ngroups: int, K: int, dtype) -> Array:
    """(k8, ngroups, RHS_CHUNK, K*128) pre-gathered RHS windows: group
    g's window holds columns [base_g, base_g + K*128) of each RHS in the
    chunk, materialized by ONE row-take from a (128/grain)-way
    overlapped image (mirror of ``spmv_pallas._window_xw``)."""
    f = 128 // grain
    L = nb * 128
    k = bt.shape[0]
    btf = jnp.zeros((k8 * RHS_CHUNK, L + 128), dtype)
    btf = btf.at[:k, :cols].set(jnp.asarray(bt, dtype))
    btf = btf.reshape(k8, RHS_CHUNK, L + 128)
    if f == 1:
        img = btf[:, :, :L].reshape(k8, RHS_CHUNK, nb, 128)
    else:
        img = jnp.stack([btf[:, :, grain * i:grain * i + L]
                         .reshape(k8, RHS_CHUNK, nb, 128)
                         for i in range(f)], axis=3)      # (k8,8,nb,f,128)
        img = img.reshape(k8, RHS_CHUNK, nb * f, 128)
    # (k8, 8, f*nb, 128) -take-> (k8, 8, ngroups*K, 128)
    g = jnp.take(img, rowidx, axis=2)
    g = g.reshape(k8, RHS_CHUNK, ngroups, K, 128)
    return g.transpose(0, 2, 1, 3, 4).reshape(k8, ngroups, RHS_CHUNK,
                                              K * 128)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _spmm_window(plan: SellPlan, bt: Array, interpret: bool = False) -> Array:
    """bt: (k, cols) transposed RHS; returns y (rows, k)."""
    from ..formats.plan import window_image_blocks

    T, P, R = plan.vals.shape
    st = plan.stats
    B = TILES_PER_STEP
    K = st.window_blocks
    G = st.groups_per_step
    if K <= 0:
        raise ValueError("window SpMM infeasible for this plan; use the "
                         "reference spmm path")
    WG = st.group_tiles
    NG = (B * G) // WG
    ngroups = T // WG
    k = bt.shape[0]
    k8 = -(-k // RHS_CHUNK)
    gr = st.window_grain
    f = 128 // gr
    nb = window_image_blocks(plan.shape[1], st.max_window_base, K, gr)
    acc_dtype = plan.vals.dtype
    if jnp.dtype(acc_dtype) == jnp.bfloat16:
        acc_dtype = jnp.dtype(jnp.float32)

    if plan.window_rows.shape[0] == ngroups * K:
        rowidx = plan.window_rows
    else:
        # sharded local plans shift window_base in-graph (grain pinned
        # to 128 there); compute the gather rows here
        wb = jnp.asarray(plan.window_base, jnp.int32)
        rowidx = jnp.clip(
            wb[:, None] + f * jnp.arange(K, dtype=jnp.int32)[None, :],
            0, f * nb - 1).reshape(-1)
    btw = _bt_windows(bt, k8, plan.shape[1], nb, gr, rowidx, ngroups, K,
                      acc_dtype)
    grid_spec = pl.GridSpec(
        grid=(k8, T // (B * G)),
        in_specs=[
            pl.BlockSpec((B * G, P, R), lambda kc, i: (i, 0, 0)),
            pl.BlockSpec((B * G, P, R), lambda kc, i: (i, 0, 0)),
            pl.BlockSpec((1, NG, RHS_CHUNK, K * 128),
                         lambda kc, i: (kc, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, B * G, RHS_CHUNK, R),
                               lambda kc, i: (kc, i, 0, 0)),
    )
    partials = pl.pallas_call(
        _make_spmm_kernel(K, NG, P, R, WG, acc_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k8, T, RHS_CHUNK, R), acc_dtype),
        interpret=interpret,
    )(plan.vals, plan.cols_win, btw)
    partials = _fence_interpret(partials, interpret)

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
    from ..formats.cached import CooTail
    from ..formats.dia import DiaPlan, HybridPlan
    from ..formats.packed import PackedPlan
    from .spmm_dia import spmm_dia, spmm_dia_feasible

    if isinstance(plan, CooTail):
        # tiny residues: XLA row-gather of B + segment scatter, the
        # multi-RHS analog of the spmv CooTail path
        bd = jnp.asarray(b)
        prod = plan.vals[:, None].astype(bd.dtype) * \
            jnp.take(bd, plan.cols, axis=0)
        rows = plan.shape[0]
        y = jax.ops.segment_sum(prod, plan.rows_idx,
                                num_segments=rows + 1)
        return y[:rows]
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

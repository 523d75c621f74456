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
    """NG groups of WG tiles per step.  The 8 RHS of a chunk live on the
    SUBLANE axis of the window operand (``btw`` group row viewed as
    (8, K*128)), so one ``take_along_axis`` with a value row's index
    broadcast across sublanes gathers all 8 RHS at once — per value row
    the kernel pays K gathers + K-1 tree selects + one multiply-add on
    an (8, R) vreg that is ALREADY the output layout (RHS on sublanes,
    matrix rows on lanes).  The round-4 kernel gathered per (RHS, block)
    from scalar rows and transposed (8, WG, R) blocks in-kernel —
    layout churn measured 2-30x SLOWER than looping single-RHS SpMV
    (probes/probe_spmm_vs_loop.py); this shape is what makes the fused
    kernel actually amortize the nonzero stream."""
    def kernel(vals_ref, cols_ref, btw_ref, out_ref):
        # ALL refs 2-D/3-D with a 128-lane minor: Mosaic lowers 4-D
        # blocks whose minor dims are (8, R) with strided element
        # stores, measured ~9x slower on the SAME math
        # (probes/probe_spmm_kernelvar.py v0 vs v4)
        v = vals_ref[...]                                 # (NG*WG, P, R)
        if acc_dtype is not None and v.dtype != acc_dtype:
            v = v.astype(acc_dtype)
        cw = cols_ref[...].astype(jnp.int32)
        C = RHS_CHUNK

        def rep(x):                                       # (P, R)->(P*C, R)
            return jnp.broadcast_to(x[:, None, :],
                                    (P, C, x.shape[1])).reshape(P * C,
                                                                x.shape[1])

        for g in range(NG):
            win = btw_ref[g * C:(g + 1) * C]              # (C, K*128)
            winr = jnp.broadcast_to(win[None], (P, C, K * 128)) \
                .reshape(P * C, K * 128)
            for t in range(WG):
                ix = cw[g * WG + t]                       # (P, R)
                vg = v[g * WG + t]
                lane = rep(jnp.bitwise_and(ix, 127))      # (P*C, R)
                if K == 1:
                    gat = jnp.take_along_axis(winr[:, :128], lane,
                                              axis=1)
                else:
                    bucket = jax.lax.shift_right_logical(ix, 7)
                    bits = [rep((jax.lax.shift_right_logical(bucket, d)
                                 & 1) == 1)
                            for d in range((K - 1).bit_length())]

                    def tree(lo, size):
                        if size == 1:
                            b = min(lo, K - 1)
                            return jnp.take_along_axis(
                                winr[:, b * 128:(b + 1) * 128], lane,
                                axis=1)
                        half = size // 2
                        left = tree(lo, half)
                        if lo + half >= K:
                            return left
                        right = tree(lo + half, half)
                        return jnp.where(bits[half.bit_length() - 1],
                                         right, left)

                    gat = tree(0, 1 << (K - 1).bit_length())
                contrib = gat * rep(vg)                   # (P*C, R)
                acc = contrib[:C]
                for p in range(1, P):
                    acc = acc + contrib[p * C:(p + 1) * C]
                tt = g * WG + t
                out_ref[tt * C:(tt + 1) * C] = acc        # (C, R)
    return kernel


def _bt_windows(bt: Array, k8: int, cols: int, nb: int, grain: int,
                rowidx: Array, ngroups: int, K: int, dtype) -> Array:
    """(k8, ngroups, RHS_CHUNK, K*128) pre-gathered RHS windows: group
    g's window holds columns [base_g, base_g + K*128) of each RHS in the
    chunk, materialized by ONE row-take from a flat (k8*C*f*nb, 128)
    image whose take indices are already emitted in (chunk, group, rhs,
    block) order — reshape-only on both sides.  The round-4 version
    gathered then ran a 5-axis transpose over the whole operand, a full
    XLA relayout of up to k/8 x T/WG x 4 KB that dominated the entire
    SpMM (probes/probe_spmm_vs_loop.py: 2-30x slower than looped SpMV
    regardless of kernel shape)."""
    f = 128 // grain
    L = nb * 128
    k = bt.shape[0]
    C = RHS_CHUNK
    btf = jnp.zeros((k8 * C, L + 128), dtype)
    btf = btf.at[:k, :cols].set(jnp.asarray(bt, dtype))
    if f == 1:
        img = btf[:, :L].reshape(k8 * C * nb, 128)
        stride = nb
    else:
        # overlapped grain image: rows interleave the f shifted copies,
        # still reshape-only (minor-dim slices of the padded buffer)
        img = jnp.stack([btf[:, grain * i:grain * i + L]
                         .reshape(k8 * C, nb, 128)
                         for i in range(f)], axis=2)      # (k8C,nb,f,128)
        img = img.reshape(k8 * C * nb * f, 128)
        stride = nb * f
    # flat row ids in (chunk, group, rhs, block) output order
    ridx = jnp.asarray(rowidx, jnp.int32).reshape(ngroups, K)
    kc = jnp.arange(k8, dtype=jnp.int32)
    c = jnp.arange(C, dtype=jnp.int32)
    rows = ((kc[:, None, None, None] * C + c[None, None, :, None])
            * stride + ridx[None, :, None, :])            # (k8,G,C,K)
    g = jnp.take(img, rows.reshape(-1), axis=0)
    return g.reshape(k8 * ngroups * C, K * 128)


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
    C = RHS_CHUNK
    steps = T // (B * G)
    grid_spec = pl.GridSpec(
        grid=(k8, steps),
        in_specs=[
            pl.BlockSpec((B * G, P, R), lambda kc, i: (i, 0, 0)),
            pl.BlockSpec((B * G, P, R), lambda kc, i: (i, 0, 0)),
            pl.BlockSpec((NG * C, K * 128),
                         lambda kc, i, s=steps: (kc * s + i, 0)),
        ],
        out_specs=pl.BlockSpec((B * G * C, R),
                               lambda kc, i, s=steps: (kc * s + i, 0)),
    )
    partials = pl.pallas_call(
        _make_spmm_kernel(K, NG, P, R, WG, acc_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k8 * T * C, R), acc_dtype),
        interpret=interpret,
    )(plan.vals, plan.cols_win, btw)
    partials = _fence_interpret(partials, interpret)

    # fold tiles -> slices per chunk (reshape-only views, no transpose)
    p4 = partials.reshape(k8, T, C, R)
    y4 = jnp.stack([
        jax.ops.segment_sum(p4[kc], jnp.asarray(plan.tile_slice),
                            num_segments=plan.num_slices,
                            indices_are_sorted=True)
        for kc in range(k8)], axis=1)                   # (S, k8, 8, R)
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

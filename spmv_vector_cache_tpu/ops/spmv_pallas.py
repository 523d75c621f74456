"""Pallas TPU SpMV kernels over SELL tile plans.

This is the accelerator datapath of the library — the role of the
reference's frontend/backend RTL (``chisel/backend/SpMVBackend.scala``,
``chisel/frontend/SpMVFrontend*.scala``), rebuilt the TPU way:

* the *backend* (4-channel DMA engine with FIFO-feedback throttling,
  ``SpMVBackend.scala:59-135``) becomes the Pallas grid pipeline: BlockSpec
  index maps stream value/offset tiles HBM->VMEM, double-buffered by the
  Mosaic pipeliner;
* the *frontend* (multiply + hazard-interlocked scattered accumulate)
  becomes a sublane multiply-reduce: the SELL layout binds rows to lanes,
  so ``y[row] +=`` is a vector sum with no hazards to track;
* the *result-vector placement* design space (BufferAll / BufferNone /
  BufferSel / vector cache over y, SURVEY.md §2.1) maps onto placement of
  the irregularly-accessed dense vector — in the CSR dual that is **x**:

  - ``window`` strategy (the vector-cache / BufferSel / BufferAll analog):
    each K*128-lane x window is materialized by ONE XLA row-gather into a
    regular ``xw`` operand streamed alongside the nonzero tiles, and the
    kernel's x accesses are all *static* slices of its block.  This shape
    is probe-derived (probes/probe_window8/9.py): on a v5e the 128-lane
    gathers cost ~a cycle per vreg, while any per-group *dynamic* VMEM
    slicing costs ~25 scalar cycles of address arithmetic — so the round-2
    kernel (resident x + per-group ``pl.ds`` windows) was address-bound at
    42 Gnnz/s and this one reaches ~74 on the same banded matrix.  K
    (``window_blocks``) comes from the plan's column-span analysis — the
    port of ``maxColSpan`` (``SparseMatrix.cpp:110-119``);
  - ``stream`` strategy (BufferNone analog): x[cols] pre-gathered by an
    XLA gather through HBM — every irregular access pays memory latency,
    like the every-operand-to-DDR variant
    (``SpMVFrontendBufferNone.scala``); the robust fallback for layouts
    where no window is feasible.

The kernel emits per-tile partial sums, or — when the plan guarantees
every window group lives in one slice (``stats.group_fold``) — one row
per *group*; with uniform tiling (``stats.group_slice_identity``) those
rows ARE y2d and the epilogue collapses to a reshape (+ a p-way fold for
``stats.uniform_parts`` split layouts).  Otherwise a sorted segment-sum
folds tiles into slices and the plan's ``row_map`` fixup merges
split/sigma/stripe sub-rows.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..formats.plan import TILES_PER_STEP, SellPlan
from ..utils import platform

Array = Any

STRATEGIES = ("window", "resident", "deep", "stream")

#: the 'resident' strategy keeps all of x in VMEM and pays one
#: gather+compare+select per 128-lane x block per value vreg — linear in
#: the block count, so it is only offered for x up to this many blocks
#: (measured ~15 Gnnz/s at 64 blocks / 8K cols on a v5e; the window
#: strategy is preferred wherever the plan found bounded spans)
RESIDENT_MAX_BLOCKS = 64

#: the 'deep' strategy extends the resident idea past the unrolled-tree
#: cap with a fori_loop block sweep (one dynamic sublane slice of x per
#: block, amortized over the whole step) — still linear in the block
#: count, so rate ~ c/NB (probes/probe_deep.py); beyond this cap it is
#: indistinguishable from the XLA-gather floor and the planner should
#: have chosen a CachedPlan hot/cold split instead
DEEP_MAX_BLOCKS = 2048


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


def _fixup_rows(plan: SellPlan, y2d: Array, semiring: str) -> Array:
    """(num_slices, R) slice sums -> y: identity slice, uniform-parts
    lane fold, or the general row_map segment reduce."""
    from . import semiring as sr

    rows = plan.shape[0]
    if plan.identity_map:
        return y2d.reshape(-1)[:rows]
    p = plan.stats.uniform_parts
    if p:
        # uniform split layouts are part-major within each slice (part j
        # of row r at lane j*rps + r%rps), so the fixup is a fold of
        # contiguous 2D lane slices — cheap on TPU, unlike a (rows, p)
        # reshape+reduce (full relayout) or an unsorted segment_sum
        # (scatter, measured ~19 ms for 2M elements)
        s = sr.get(semiring)
        rps = plan.lane_rows // p
        acc = y2d[:, :rps]
        for j in range(1, p):
            acc = s.add(acc, y2d[:, j * rps:(j + 1) * rps])
        # or_and's logical add yields bool; restore the float encoding
        return acc.astype(y2d.dtype).reshape(-1)[:rows]
    s = sr.get(semiring)
    y = s.segment_reduce(y2d.reshape(-1), jnp.asarray(plan.row_map),
                         num_segments=rows + 1)
    return y[:rows]


def _reduce_partials(plan: SellPlan, partials: Array,
                     semiring: str = "plus_times",
                     per_group: bool = False) -> Array:
    """Kernel output -> y.  ``partials`` holds per-tile rows (T, R), or
    per-group rows (ngroups, R) when the kernel folded slices in-place
    (``per_group``); both reduce to y2d under the semiring's add, then
    the sub-row fixup runs."""
    from . import semiring as sr

    s = sr.get(semiring)
    st = plan.stats
    if per_group and st.group_slice_identity:
        y2d = partials[:plan.num_slices]
    else:
        ids = jnp.asarray(plan.tile_slice)
        if per_group:
            ids = ids[::st.group_tiles]
        y2d = s.segment_reduce(partials, ids,
                               num_segments=plan.num_slices,
                               indices_are_sorted=True)
    return _fixup_rows(plan, y2d, semiring)


# ---------------------------------------------------------------------------
# window strategy
# ---------------------------------------------------------------------------

def _make_window_kernel(K: int, NG: int, P: int, R: int, wg: int,
                        fold: bool, semiring: str = "plus_times",
                        acc_dtype=None):
    """One grid step = NG groups of wg tiles; group g gathers from row g
    of the pre-gathered ``xw`` block — every x access is a static slice
    (no per-group address arithmetic, the round-3 redesign).  In-window
    offsets are plan-precomputed int16 in [0, K*128): ``off >> 7`` picks
    the 128-lane block, ``off & 127`` the lane; the K gathered candidates
    merge with K-1 selects before a single multiply.  Padding slots carry
    (semiring zero, offset 0): they gather a real lane but contribute
    nothing to the reduction.  ``fold=True`` reduces each group (all of
    one slice) to a single output row."""
    from . import semiring as sr

    mul, axis_reduce = sr.kernel_ops(semiring)

    def kernel(vals_ref, cols_ref, xw_ref, out_ref):
        v = vals_ref[...]                                # (NG*wg, P, R)
        if acc_dtype is not None and v.dtype != acc_dtype:
            v = v.astype(acc_dtype)                      # bf16 -> f32
        cw = cols_ref[...].astype(jnp.int32)             # int16 -> int32

        def group(g):
            vg = v[g * wg:(g + 1) * wg].reshape(wg * P, R)
            ix = cw[g * wg:(g + 1) * wg].reshape(wg * P, R)
            gat = _gather_window(xw_ref, g, ix, K, wg * P)
            prod = mul(vg, gat)
            if fold:
                return axis_reduce(prod, 0)[None, :]     # (1, R)
            return axis_reduce(prod.reshape(wg, P, R), 1)  # (wg, R)

        gs = 8 if fold else 8 // wg         # groups per 8-sublane store
        for w in range(NG // gs):
            parts = [group(w * gs + j) for j in range(gs)]
            out_ref[w * 8:(w + 1) * 8, :] = parts[0] if gs == 1 else \
                jnp.concatenate(parts, axis=0)
    return kernel


def _window_xw(plan: SellPlan, x: Array, ngroups: int, acc_dtype):
    """Materialize every group's x window with ONE XLA row-gather from a
    (128/grain)-way overlapped x image — ~556 GB/s for contiguous 512 B
    rows, vs ~25 scalar cycles per *in-kernel* dynamic slice
    (probes/probe_window9.py).  Image row j covers elements
    [grain*j, grain*j + 128), so a window starting at ``wb*grain`` is
    rows ``wb + f*k`` (f = 128/grain) — the sub-block alignment that
    shaves K for spans straddling block boundaries."""
    st = plan.stats
    K = st.window_blocks
    g = st.window_grain
    f = 128 // g
    from ..formats.plan import window_image_blocks

    nb = window_image_blocks(plan.shape[1], st.max_window_base, K, g)
    L = nb * 128
    xflat = jnp.zeros((L + 128,), acc_dtype)
    xflat = xflat.at[:plan.shape[1]].set(jnp.asarray(x, acc_dtype))
    if f == 1:
        x2d = xflat[:L].reshape(nb, 128)
    else:
        # x2d[j] == xflat[g*j : g*j + 128]: interleave f shifted copies
        x2d = jnp.stack([xflat[g * i:g * i + L].reshape(nb, 128)
                         for i in range(f)], axis=1).reshape(f * nb, 128)
    if plan.window_rows.shape[0] == ngroups * K:
        rowidx = plan.window_rows
    else:
        # sharded local plans shift window_base in-graph; fall back to
        # computing the gather rows here
        wb = jnp.asarray(plan.window_base, jnp.int32)
        rowidx = jnp.clip(
            wb[:, None] + f * jnp.arange(K, dtype=jnp.int32)[None, :],
            0, f * nb - 1).reshape(-1)
    return jnp.take(x2d, rowidx, axis=0).reshape(ngroups, K * 128)


def _window_partials(plan: SellPlan, x: Array, interpret: bool,
                     semiring: str):
    """Run the windowed kernel, returning (per-tile or per-group
    partial rows, fold) before any slice/row reduction — shared by
    :func:`_spmv_window` and the ChunkPlan fast path."""
    T, P, R = plan.vals.shape
    st = plan.stats
    wg = st.group_tiles
    K = st.window_blocks
    if K <= 0:
        raise ValueError(
            "window strategy infeasible for this plan "
            "(stats.window_blocks == 0); rebuild with stripe_width or use "
            "the 'stream' strategy")
    step_tiles = TILES_PER_STEP * st.groups_per_step
    ngroups = T // wg
    NG = step_tiles // wg
    fold = st.group_fold and NG % 8 == 0
    acc_dtype = _compute_dtype(plan.vals.dtype)
    xw = _window_xw(plan, x, ngroups, acc_dtype)

    out_rows = ngroups if fold else T
    out = pl.pallas_call(
        _make_window_kernel(K, NG, P, R, wg, fold, semiring, acc_dtype),
        grid=(T // step_tiles,),
        in_specs=[
            pl.BlockSpec((step_tiles, P, R), lambda i: (i, 0, 0)),
            pl.BlockSpec((step_tiles, P, R), lambda i: (i, 0, 0)),
            pl.BlockSpec((NG, K * 128), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((NG if fold else step_tiles, R),
                               lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((out_rows, R), acc_dtype),
        interpret=interpret,
    )(plan.vals, plan.cols_win, xw)
    return _fence_interpret(out, interpret), fold


@functools.partial(jax.jit, static_argnames=("interpret", "semiring"))
def _spmv_window(plan: SellPlan, x: Array, interpret: bool = False,
                 semiring: str = "plus_times") -> Array:
    out, fold = _window_partials(plan, x, interpret, semiring)
    return _reduce_partials(plan, out, semiring, per_group=fold)


def _make_subwin_kernel(W: int, B: int, P: int, R: int, semiring: str,
                        acc_dtype=None):
    """Sorted-subwindow kernel for heavy-row tiles: every sublane row
    gathers from its OWN W-block x window (``formats/chunk.SubwinPlan``)
    — the window rows arrive pre-aligned with the value sublanes, so the
    gather needs no broadcasts and only a W-deep select tree."""
    from . import semiring as sr

    mul, axis_reduce = sr.kernel_ops(semiring)

    def kernel(vals_ref, cols_ref, xw_ref, out_ref):
        v = vals_ref[...].reshape(B * P, R)
        if acc_dtype is not None and v.dtype != acc_dtype:
            v = v.astype(acc_dtype)
        ix = cols_ref[...].reshape(B * P, R).astype(jnp.int32)
        xw = xw_ref[...].reshape(B * P, W * R)
        lane = jnp.bitwise_and(ix, 127)
        if W == 1:
            gat = jnp.take_along_axis(xw, lane, axis=1)
        else:
            bucket = jax.lax.shift_right_logical(ix, 7)
            depth = (W - 1).bit_length()
            bits = [jnp.bitwise_and(
                jax.lax.shift_right_logical(bucket, d), 1) == 1
                for d in range(depth)]

            def tree(lo: int, size: int):
                if size == 1:
                    b = min(lo, W - 1)
                    return jnp.take_along_axis(
                        xw[:, b * R:(b + 1) * R], lane, axis=1)
                half = size // 2
                left = tree(lo, half)
                if lo + half >= W:
                    return left
                right = tree(lo + half, half)
                return jnp.where(bits[half.bit_length() - 1], right, left)

            gat = tree(0, 1 << depth)
        prod = mul(v, gat).reshape(B, P, R)
        out_ref[...] = axis_reduce(prod, 1)
    return kernel


def _subwin_partials(plan, x: Array, interpret: bool, semiring: str):
    """Run one SubwinPlan bucket -> (T, 128) per-tile lane partials."""
    T, P, R = plan.vals.shape
    W = plan.window_blocks
    acc_dtype = _compute_dtype(plan.vals.dtype)
    step = TILES_PER_STEP * plan.groups_per_step
    nb = -(-plan.shape[1] // 128) + W
    xflat = jnp.zeros((nb * 128,), acc_dtype)
    xflat = xflat.at[:plan.shape[1]].set(jnp.asarray(x, acc_dtype))
    x2d = xflat.reshape(nb, 128)
    rowidx = (jnp.asarray(plan.bases, jnp.int32)[:, :, None]
              + jnp.arange(W, dtype=jnp.int32)[None, None, :])
    xw = jnp.take(x2d, jnp.clip(rowidx, 0, nb - 1).reshape(-1),
                  axis=0).reshape(T, P, W * 128)
    out = pl.pallas_call(
        _make_subwin_kernel(W, step, P, R, semiring, acc_dtype),
        grid=(T // step,),
        in_specs=[
            pl.BlockSpec((step, P, R), lambda i: (i, 0, 0)),
            pl.BlockSpec((step, P, R), lambda i: (i, 0, 0)),
            pl.BlockSpec((step, P, W * 128), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((step, R), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((T, R), acc_dtype),
        interpret=interpret,
    )(plan.vals, plan.cols_win, xw)
    return _fence_interpret(out, interpret)


@functools.partial(jax.jit, static_argnames=("interpret", "semiring"))
def _spmv_chunk(plan, x: Array, interpret: bool = False,
                semiring: str = "plus_times") -> Array:
    """ChunkPlan fast path: per-bucket windowed kernels -> ONE sorted
    segment reduction over the unified (light blocks + heavy rows)
    space -> in-block lane un-permutation for the light part, lane fold
    + short sorted merge for the heavy part (``formats/chunk.py`` for
    the layout story).  No scatter anywhere."""
    from . import semiring as sr
    from .lane_perm import lane_unpermute

    s = sr.get(semiring)
    _, axis_reduce = sr.kernel_ops(semiring)
    nblk = plan.num_blocks
    nheavy = plan.num_heavy
    rows = plan.shape[0]
    y2d = None
    parts = []
    for b in plan.buckets:
        part, fold = _window_partials(b, x, interpret, semiring)
        ids = jnp.asarray(b.tile_slice)
        if fold:
            ids = ids[::b.stats.group_tiles]
        parts.append((part, ids))
    for h in plan.hbuckets:
        parts.append((_subwin_partials(h, x, interpret, semiring),
                      jnp.asarray(h.tile_seg)))
    for part, ids in parts:
        y2b = s.segment_reduce(part, ids, num_segments=nblk + nheavy,
                               indices_are_sorted=True)
        y2d = y2b if y2d is None else s.add(y2d, y2b).astype(y2b.dtype)
    y = lane_unpermute(y2d[:nblk], jnp.asarray(plan.perm_idx),
                       interpret=interpret)
    y = y.reshape(-1)[:rows]
    if nheavy:
        yh = axis_reduce(y2d[nblk:], 1)            # (nheavy,)
        yh = s.segment_reduce(yh, jnp.asarray(plan.heavy_rows),
                              num_segments=rows + 1,
                              indices_are_sorted=True)[:rows]
        y = s.add(y, yh).astype(y.dtype)
    if plan.residue is not None:
        yr = spmv_plan(plan.residue, x, interpret=interpret,
                       semiring=semiring)
        y = s.add(y, yr).astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# resident strategy (the randAcc / BufferNone analog, done the TPU way)
# ---------------------------------------------------------------------------

def _make_resident_kernel(NB: int, NBP: int, NG: int, P: int, R: int,
                          wg: int, fold: bool, semiring: str,
                          acc_dtype=None):
    """Global-column gather against a fully VMEM-resident x: the TPU
    port of the reference's random-access port (the frontend issues a
    memory op per operand, ``SpMVFrontendBufferNone.scala:9-175``; here
    every 'miss' costs VPU work instead of DDR latency).  Per value vreg
    it pays NB gathers merged by a NB-1-select binary tree keyed on the
    block-index bits (no per-block compares), gathering from a
    pre-replicated (wg*P, NB*128) x image so no broadcasts are needed
    either.  Linear in NB, so the planner caps it
    (RESIDENT_MAX_BLOCKS); unlike the window kernel it needs NO column
    locality at all."""
    from . import semiring as sr

    mul, axis_reduce = sr.kernel_ops(semiring)

    def kernel(vals_ref, cols_ref, x_ref, out_ref):
        v = vals_ref[...]                                # (NG*wg, P, R)
        if acc_dtype is not None and v.dtype != acc_dtype:
            v = v.astype(acc_dtype)
        c = cols_ref[...].astype(jnp.int32)

        def group(g):
            vg = v[g * wg:(g + 1) * wg].reshape(wg * P, R)
            ix = c[g * wg:(g + 1) * wg].reshape(wg * P, R)
            blk = jax.lax.shift_right_logical(ix, 7)
            lane = jnp.bitwise_and(ix, 127)
            bits = [jnp.bitwise_and(
                jax.lax.shift_right_logical(blk, d), 1) == 1
                for d in range(max(1, NBP))]

            def tree(lo: int, size: int):
                if size == 1:
                    b = min(lo, NB - 1)
                    return jnp.take_along_axis(
                        x_ref[:, b * 128:(b + 1) * 128], lane, axis=1)
                half = size // 2
                left = tree(lo, half)
                if lo + half >= NB:
                    return left
                right = tree(lo + half, half)
                d = half.bit_length() - 1     # deciding bit of blk
                return jnp.where(bits[d], right, left)

            gat = tree(0, 1 << NBP)
            prod = mul(vg, gat)
            if fold:
                return axis_reduce(prod, 0)[None, :]
            return axis_reduce(prod.reshape(wg, P, R), 1)

        gs = 8 if fold else 8 // wg
        for w in range(NG // gs):
            parts = [group(w * gs + j) for j in range(gs)]
            out_ref[w * 8:(w + 1) * 8, :] = parts[0] if gs == 1 else \
                jnp.concatenate(parts, axis=0)
    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "semiring"))
def _spmv_resident(plan: SellPlan, x: Array, interpret: bool = False,
                   semiring: str = "plus_times") -> Array:
    T, P, R = plan.vals.shape
    st = plan.stats
    wg = st.group_tiles
    NB = -(-plan.shape[1] // 128)
    if NB > RESIDENT_MAX_BLOCKS:
        raise ValueError(
            f"x spans {NB} 128-lane blocks > RESIDENT_MAX_BLOCKS "
            f"({RESIDENT_MAX_BLOCKS}); the resident strategy's per-block "
            "select chain would dominate — use 'stream' or restructure")
    step_tiles = TILES_PER_STEP * st.groups_per_step
    NG = step_tiles // wg
    fold = st.group_fold and NG % 8 == 0
    acc_dtype = _compute_dtype(plan.vals.dtype)
    NBP = max(1, (NB - 1).bit_length())      # select-tree depth
    xp = jnp.zeros((1, NB * 128), acc_dtype)
    xp = xp.at[0, :plan.shape[1]].set(jnp.asarray(x, acc_dtype))
    xrep = jnp.broadcast_to(xp, (wg * P, NB * 128))
    out_rows = (T // wg) if fold else T
    out = pl.pallas_call(
        _make_resident_kernel(NB, NBP, NG, P, R, wg, fold, semiring,
                              acc_dtype),
        grid=(T // step_tiles,),
        in_specs=[
            pl.BlockSpec((step_tiles, P, R), lambda i: (i, 0, 0)),
            pl.BlockSpec((step_tiles, P, R), lambda i: (i, 0, 0)),
            pl.BlockSpec((wg * P, NB * 128), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((NG if fold else step_tiles, R),
                               lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((out_rows, R), acc_dtype),
        interpret=interpret,
    )(plan.vals, plan.cols, xrep)
    return _reduce_partials(plan, _fence_interpret(out, interpret),
                            semiring, per_group=fold)


# ---------------------------------------------------------------------------
# deep strategy (the BufferNone analog past the unrolled-tree cap)
# ---------------------------------------------------------------------------

def _make_deep_kernel(NB: int, B: int, P: int, R: int, semiring: str,
                      acc_dtype=None):
    """Block-major masked-accumulate gather against a VMEM-resident
    (NB, 128) x image: one ``fori_loop`` over the NB blocks; each
    iteration pays a single dynamic sublane slice of x (amortized over
    the whole step's B*P*R nonzeros) plus one gather/compare/select per
    value vreg.  Linear in NB like the resident select tree, but
    loop-compiled (no NB-fold code blowup) so it serves x up to
    DEEP_MAX_BLOCKS — the role of the reference's every-operand-to-DDR
    variant (``SpMVFrontendBufferNone.scala:9-175``): usable for ANY
    matrix, never fast, never catastrophic."""
    from . import semiring as sr

    mul, axis_reduce = sr.kernel_ops(semiring)

    def kernel(vals_ref, cols_ref, x_ref, out_ref):
        v = vals_ref[...].reshape(B * P, R)
        if acc_dtype is not None and v.dtype != acc_dtype:
            v = v.astype(acc_dtype)
        c = cols_ref[...].reshape(B * P, R)
        blk = jax.lax.shift_right_logical(c, 7)
        lane = jnp.bitwise_and(c, 127)

        def body(b, xg):
            xb = x_ref[pl.ds(b, 1), :]
            g = jnp.take_along_axis(
                jnp.broadcast_to(xb, (B * P, R)), lane, axis=1)
            return jnp.where(blk == b, g, xg)

        # every slot's blk matches exactly one b, so the init value never
        # survives (padding slots carry col 0 -> block 0's x[0])
        xg = jax.lax.fori_loop(
            0, NB, body, jnp.zeros((B * P, R), v.dtype))
        out_ref[...] = axis_reduce(mul(v, xg).reshape(B, P, R), 1)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "semiring"))
def _spmv_deep(plan: SellPlan, x: Array, interpret: bool = False,
               semiring: str = "plus_times") -> Array:
    T, P, R = plan.vals.shape
    st = plan.stats
    NB = -(-plan.shape[1] // 128)
    if NB > DEEP_MAX_BLOCKS:
        raise ValueError(
            f"x spans {NB} 128-lane blocks > DEEP_MAX_BLOCKS "
            f"({DEEP_MAX_BLOCKS}); build a CachedPlan (hot/cold column "
            "split) for matrices this wide with no locality")
    step_tiles = TILES_PER_STEP * st.groups_per_step
    acc_dtype = _compute_dtype(plan.vals.dtype)
    xp = jnp.zeros((NB * 128,), acc_dtype)
    xp = xp.at[:plan.shape[1]].set(jnp.asarray(x, acc_dtype))
    out = pl.pallas_call(
        _make_deep_kernel(NB, step_tiles, P, R, semiring, acc_dtype),
        grid=(T // step_tiles,),
        in_specs=[
            pl.BlockSpec((step_tiles, P, R), lambda i: (i, 0, 0)),
            pl.BlockSpec((step_tiles, P, R), lambda i: (i, 0, 0)),
            pl.BlockSpec((NB, 128), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((step_tiles, R), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((T, R), acc_dtype),
        interpret=interpret,
    )(plan.vals, plan.cols, xp.reshape(NB, 128))
    return _reduce_partials(plan, _fence_interpret(out, interpret),
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
# double-float (f64-parity) paths
# ---------------------------------------------------------------------------

def _gather_window(xw_ref, g: int, ix, K: int, n: int):
    """K-block select-merge gather from group g's window row (shared by
    the f32 and df64 window kernels); ``ix`` in [0, K*128).

    Candidate blocks merge through a binary tree keyed on the block-index
    bits (the resident kernel's trick, ``_make_resident_kernel``): K
    gathers + K-1 selects on precomputed bit masks, vs the round-4
    linear chain's K gathers + K compares + K selects — ~40% fewer VPU
    ops at K=16, which is where the skewed-row plans live."""
    if K == 1:
        w0 = xw_ref[g:g + 1, 0:128]
        return jnp.take_along_axis(jnp.broadcast_to(w0, (n, 128)), ix,
                                   axis=1)
    bucket = jax.lax.shift_right_logical(ix, 7)
    i0 = jnp.bitwise_and(ix, 127)
    depth = (K - 1).bit_length()
    bits = [jnp.bitwise_and(
        jax.lax.shift_right_logical(bucket, d), 1) == 1
        for d in range(depth)]

    def tree(lo: int, size: int):
        if size == 1:
            b = min(lo, K - 1)
            wb = xw_ref[g:g + 1, b * 128:(b + 1) * 128]
            return jnp.take_along_axis(jnp.broadcast_to(wb, (n, 128)),
                                       i0, axis=1)
        half = size // 2
        left = tree(lo, half)
        if lo + half >= K:
            return left
        right = tree(lo + half, half)
        return jnp.where(bits[half.bit_length() - 1], right, left)

    return tree(0, 1 << depth)


def _df_product_reduce(vh, vl, xh, xl, wg: int, P: int, R: int):
    """df64 product + per-tile compensated pairwise reduction:
    (wg*P, R) hi/lo operands -> (wg, R) hi/lo tile sums with ~2^-48
    relative error (error-free transformations, ``ops/df64.py``)."""
    from . import df64

    ph, pe = df64.two_prod(vh, xh)
    pe = pe + (vh * xl + vl * xh)
    ph, pe = df64.quick_two_sum(ph, pe)
    hh = ph.reshape(wg, P, R)
    ll = pe.reshape(wg, P, R)
    m = P
    while m > 1:
        m //= 2
        hh, ll = df64.add(hh[:, :m], ll[:, :m], hh[:, m:2 * m],
                          ll[:, m:2 * m])
    return hh[:, 0], ll[:, 0]


def _make_window_kernel_df(K: int, NG: int, P: int, R: int, wg: int):
    """df64 window kernel: value hi/lo channel pairs stream as one
    (2P, R) sublane-stacked tile; x windows arrive as separate hi/lo xw
    operands.  Emits per-tile (hi, lo) partial rows — the slice/row
    reductions happen on the host in exact float64 (the pair join makes
    them exact there; doing them on-device in f32 would break the
    compensation)."""

    def kernel(vals_ref, cols_ref, xwh_ref, xwl_ref, oh_ref, ol_ref):
        v = vals_ref[...]                                # (NG*wg, 2P, R)
        cw = cols_ref[...].astype(jnp.int32)

        def group(g):
            vg = v[g * wg:(g + 1) * wg]
            vh = vg[:, :P].reshape(wg * P, R)
            vl = vg[:, P:].reshape(wg * P, R)
            ix = cw[g * wg:(g + 1) * wg].reshape(wg * P, R)
            xh = _gather_window(xwh_ref, g, ix, K, wg * P)
            xl = _gather_window(xwl_ref, g, ix, K, wg * P)
            return _df_product_reduce(vh, vl, xh, xl, wg, P, R)

        gs = 8 // wg
        for w in range(NG // gs):
            parts = [group(w * gs + j) for j in range(gs)]
            hi = parts[0][0] if gs == 1 else \
                jnp.concatenate([p[0] for p in parts], axis=0)
            lo = parts[0][1] if gs == 1 else \
                jnp.concatenate([p[1] for p in parts], axis=0)
            oh_ref[w * 8:(w + 1) * 8, :] = hi
            ol_ref[w * 8:(w + 1) * 8, :] = lo
    return kernel


def _make_stream_kernel_df(P: int):
    def kernel(vals_ref, xgh_ref, xgl_ref, oh_ref, ol_ref):
        v = vals_ref[...]                                # (B, 2P, R)
        B, _, R = v.shape
        vh = v[:, :P].reshape(B * P, R)
        vl = v[:, P:].reshape(B * P, R)
        hi, lo = _df_product_reduce(vh, vl,
                                    xgh_ref[...].reshape(B * P, R),
                                    xgl_ref[...].reshape(B * P, R),
                                    B, P, R)
        oh_ref[...] = hi
        ol_ref[...] = lo
    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def _spmv_window_df(plan: SellPlan, xh: Array, xl: Array,
                    interpret: bool = False):
    T = plan.vals.shape[0]
    P, R = plan.positions, plan.lane_rows
    st = plan.stats
    wg = st.group_tiles
    K = st.window_blocks
    step_tiles = TILES_PER_STEP * st.groups_per_step
    ngroups = T // wg
    NG = step_tiles // wg

    def xw_of(v):
        return _window_xw(plan, v, ngroups, jnp.float32)

    out_sds = jax.ShapeDtypeStruct((T, R), jnp.float32)
    out = pl.pallas_call(
        _make_window_kernel_df(K, NG, P, R, wg),
        grid=(T // step_tiles,),
        in_specs=[
            pl.BlockSpec((step_tiles, 2 * P, R), lambda i: (i, 0, 0)),
            pl.BlockSpec((step_tiles, P, R), lambda i: (i, 0, 0)),
            pl.BlockSpec((NG, K * 128), lambda i: (i, 0)),
            pl.BlockSpec((NG, K * 128), lambda i: (i, 0)),
        ],
        out_specs=[pl.BlockSpec((step_tiles, R), lambda i: (i, 0))] * 2,
        out_shape=[out_sds, out_sds],
        interpret=interpret,
    )(plan.vals, plan.cols_win, xw_of(xh), xw_of(xl))
    return _fence_interpret(tuple(out), interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _spmv_stream_df(plan: SellPlan, xh: Array, xl: Array,
                    interpret: bool = False):
    T = plan.vals.shape[0]
    P, R = plan.positions, plan.lane_rows
    B = TILES_PER_STEP * plan.stats.groups_per_step
    xgh = jnp.take(jnp.asarray(xh, jnp.float32), plan.cols, axis=0)
    xgl = jnp.take(jnp.asarray(xl, jnp.float32), plan.cols, axis=0)
    out_sds = jax.ShapeDtypeStruct((T, R), jnp.float32)
    out = pl.pallas_call(
        _make_stream_kernel_df(P),
        grid=(T // B,),
        in_specs=[
            pl.BlockSpec((B, 2 * P, R), lambda i: (i, 0, 0)),
            pl.BlockSpec((B, P, R), lambda i: (i, 0, 0)),
            pl.BlockSpec((B, P, R), lambda i: (i, 0, 0)),
        ],
        out_specs=[pl.BlockSpec((B, R), lambda i: (i, 0))] * 2,
        out_shape=[out_sds, out_sds],
        interpret=interpret,
    )(plan.vals, xgh, xgl)
    return _fence_interpret(tuple(out), interpret)


def _df_slice_indices(plan: SellPlan):
    """Static (num_slices, max_tiles) tile-id matrix for the compensated
    slice reduction; id == T points at an appended zero tile."""
    import numpy as np

    ts = np.asarray(plan.tile_slice)
    T = ts.shape[0]
    starts = np.searchsorted(ts, np.arange(plan.num_slices + 1))
    counts = np.diff(starts)
    maxt = max(1, int(counts.max()))
    idx = starts[:-1, None] + np.arange(maxt)[None, :]
    idx = np.where(np.arange(maxt)[None, :] < counts[:, None], idx, T)
    return idx.astype(np.int32)


def _df_row_indices(plan: SellPlan):
    """Static (rows, max_parts) slot-id matrix for the compensated row
    fixup; id == num_slots points at an appended zero slot."""
    import numpy as np

    rm = np.asarray(plan.row_map)
    rows = plan.shape[0]
    n = rm.shape[0]
    order = np.argsort(rm, kind="stable")
    rs = rm[order]
    starts = np.searchsorted(rs, np.arange(rows + 1))
    counts = np.diff(starts)
    maxp = max(1, int(counts.max()))
    idx = np.full((rows, maxp), n, dtype=np.int64)
    for j in range(maxp):
        sel = counts > j
        idx[sel, j] = order[starts[:-1][sel] + j]
    return idx.astype(np.int32)


def spmv_sell_double_pair(plan: SellPlan, xh: Array, xl: Array, *,
                          strategy: str = "auto",
                          interpret: bool = False):
    """``y = A @ x`` in f64-equivalent precision, fully on device:
    hi/lo f32 pair in, hi/lo f32 pair out — jit-composable (a df64 CG
    or power-iteration chain never syncs the host; VERDICT r4 weak #7).
    The multiply/within-tile reduction uses error-free transformations
    in the Pallas kernel; the slice and row reductions here run the
    compensated ``df64.add`` over statically planned index matrices, so
    precision stays ~2^-48 end to end — the device counterpart of the
    reference's DP datapath (``SemiringOp.scala:98-154``).

    Close the plan over (don't pass it as a traced jit argument): the
    fold shapes derive from the concrete ``tile_slice``/``row_map``."""
    from . import df64

    if strategy == "auto":
        strategy = "window" if plan.stats.window_blocks > 0 else "stream"
    if strategy == "window":
        th, tl = _spmv_window_df(plan, xh, xl, interpret=interpret)
    elif strategy == "stream":
        th, tl = _spmv_stream_df(plan, xh, xl, interpret=interpret)
    else:
        raise ValueError(f"unknown strategy {strategy!r}")
    R = plan.lane_rows
    rows = plan.shape[0]
    zrow = jnp.zeros((1, R), th.dtype)
    th = jnp.concatenate([th, zrow])
    tl = jnp.concatenate([tl, zrow])
    sidx = jnp.asarray(_df_slice_indices(plan))        # (S, maxT)
    maxt = sidx.shape[1]
    TH = jnp.take(th, sidx, axis=0)                    # (S, maxT, R)
    TL = jnp.take(tl, sidx, axis=0)

    def sbody(j, c):
        return df64.add(c[0], c[1], TH[:, j], TL[:, j])

    yh, yl = jax.lax.fori_loop(1, maxt, sbody, (TH[:, 0], TL[:, 0])) \
        if maxt > 1 else (TH[:, 0], TL[:, 0])
    if plan.identity_map:
        return yh.reshape(-1)[:rows], yl.reshape(-1)[:rows]
    p = plan.stats.uniform_parts
    if p:
        rps = R // p
        ah, al = yh[:, :rps], yl[:, :rps]
        for j in range(1, p):
            ah, al = df64.add(ah, al, yh[:, j * rps:(j + 1) * rps],
                              yl[:, j * rps:(j + 1) * rps])
        return ah.reshape(-1)[:rows], al.reshape(-1)[:rows]
    fh = jnp.concatenate([yh.reshape(-1), jnp.zeros((1,), yh.dtype)])
    fl = jnp.concatenate([yl.reshape(-1), jnp.zeros((1,), yl.dtype)])
    ridx = jnp.asarray(_df_row_indices(plan))          # (rows, maxp)
    FH = jnp.take(fh, ridx)                            # (rows, maxp)
    FL = jnp.take(fl, ridx)

    def rbody(j, c):
        return df64.add(c[0], c[1], FH[:, j], FL[:, j])

    maxp = ridx.shape[1]
    oh, ol = jax.lax.fori_loop(1, maxp, rbody, (FH[:, 0], FL[:, 0])) \
        if maxp > 1 else (FH[:, 0], FL[:, 0])
    return oh, ol


def spmv_sell_double(plan: SellPlan, x, *,
                     strategy: str = "auto",
                     interpret: Optional[bool] = None):
    """``y = A @ x`` in f64-equivalent precision from a double SELL plan:
    float64 x in, float64 y out.  The entire reduction chain runs on
    device (:func:`spmv_sell_double_pair`); the f64 join here is only
    the API boundary for host-precision callers."""
    from . import df64

    if not plan.stats.double:
        raise ValueError("plan was not built with value_dtype=np.float64")
    if interpret is None:
        interpret = platform.use_interpret()
    xh, xl = df64.split_f64(x)
    fn = jax.jit(lambda a, b: spmv_sell_double_pair(
        plan, a, b, strategy=strategy, interpret=interpret))
    yh, yl = fn(jnp.asarray(xh), jnp.asarray(xl))
    import numpy as np

    return df64.join_f64(np.asarray(yh), np.asarray(yl))


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
    from ..formats.cached import CachedPlan, CooTail
    from ..formats.chunk import ChunkPlan
    from ..formats.dia import DiaPlan, HybridPlan
    from ..formats.packed import PackedPlan
    from . import semiring as sr
    from .spmv_dia import spmv_dia

    semiring = sr.get(semiring).name
    if isinstance(plan, ChunkPlan):
        if strategy not in ("auto", "window", "chunk"):
            raise ValueError(f"ChunkPlan supports only the 'chunk' "
                             f"strategy, got {strategy!r}")
        if interpret is None:
            interpret = platform.use_interpret()
        return _spmv_chunk(plan, jnp.asarray(x), interpret=interpret,
                           semiring=semiring)
    if isinstance(plan, CooTail):
        # tiny residues: XLA element gather + segment scatter beats any
        # tiled kernel's fixed machinery below ~64K nonzeros
        s = sr.get(semiring)
        mul, _ = sr.kernel_ops(semiring)
        xd = jnp.asarray(x)
        prod = mul(plan.vals.astype(xd.dtype),
                   jnp.take(xd, plan.cols))
        rows = plan.shape[0]
        y = s.segment_reduce(prod, plan.rows_idx, num_segments=rows + 1)
        return y[:rows]
    if isinstance(plan, PackedPlan):
        from .spmv_packed import spmv_packed

        if strategy not in ("auto", "packed"):
            raise ValueError(f"PackedPlan supports only the 'packed' "
                             f"strategy, got {strategy!r}")
        return spmv_packed(plan, x, interpret=interpret,
                           semiring=semiring)
    if isinstance(plan, CachedPlan):
        # hot part on the compact remapped domain (fast kernels apply by
        # construction), cold tail on the original domain; each nonzero
        # lives in exactly one part, so the merge is one semiring add —
        # the two-pipe join of SpMVFrontendBufferSel.scala:125-145
        s = sr.get(semiring)
        xd = jnp.asarray(x)
        y = spmv_plan(plan.hot, jnp.take(xd, jnp.asarray(plan.hot_cols)),
                      strategy="auto", interpret=interpret,
                      semiring=semiring)
        if plan.cold is not None:
            yc = spmv_plan(plan.cold, xd, strategy="auto",
                           interpret=interpret, semiring=semiring)
            # or_and's logical add yields bool; restore the float encoding
            y = s.add(y, yc).astype(yc.dtype)
        return y
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
        if plan.dia.double:
            from .spmv_dia import spmv_dia_double
            return (spmv_dia_double(plan.dia, x, interpret=interpret) +
                    spmv_plan(plan.rest, x, strategy=strategy,
                              interpret=interpret))
        return (spmv_dia(plan.dia, x, interpret=interpret) +
                spmv_plan(plan.rest, x, strategy=strategy,
                          interpret=interpret))
    if plan.stats.double:
        if semiring != "plus_times":
            raise ValueError(
                f"double-float plans run plus_times only (error-free "
                f"transformations are +/* identities); got {semiring!r}")
        return spmv_sell_double(plan, x, strategy=strategy,
                                interpret=interpret)
    if interpret is None:
        interpret = platform.use_interpret()
    if strategy == "auto":
        nb = -(-plan.shape[1] // 128)
        if plan.stats.window_blocks > 0:
            strategy = "window"
        elif nb <= RESIDENT_MAX_BLOCKS:
            strategy = "resident"
        elif nb <= DEEP_MAX_BLOCKS:
            strategy = "deep"
        else:
            _warn_stream_cliff(plan)
            strategy = "stream"
    x = jnp.asarray(x)
    if strategy == "window":
        return _spmv_window(plan, x, interpret=interpret, semiring=semiring)
    if strategy == "resident":
        return _spmv_resident(plan, x, interpret=interpret,
                              semiring=semiring)
    if strategy == "deep":
        return _spmv_deep(plan, x, interpret=interpret, semiring=semiring)
    if strategy == "stream":
        return _spmv_stream(plan, x, interpret=interpret, semiring=semiring)
    raise ValueError(f"unknown strategy {strategy!r}")


def _warn_stream_cliff(plan) -> None:
    """The XLA element-gather stream path is ~1000x off roofline
    (docs/TPU_NOTES.md:44) — never let it be chosen silently (the
    reference ships no variant remotely that slow under any config)."""
    import warnings

    warnings.warn(
        f"SpMV falling back to the 'stream' strategy for a "
        f"{plan.shape[0]}x{plan.shape[1]} matrix: XLA element gather is "
        f"~1000x off roofline.  Build the plan with auto_plan (CachedPlan "
        f"hot/cold split) or restructure; 'stream' is correctness-only.",
        RuntimeWarning, stacklevel=3)

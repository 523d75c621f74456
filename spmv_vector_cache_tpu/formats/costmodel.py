"""Plan cost model: predicted seconds-per-apply for each plan family.

The reference chooses its accelerator variant per matrix by flashing the
bitfile the ``HWSpMVFactory`` maps to the driver's signature probe
(``software/HWSpMVFactory.cpp:20-38``); the analyses that *inform* the
choice (maxAlive / maxColSpan, ``SparseMatrix.cpp:92-119``) predict which
buffer strategy wins.  This module is the TPU port of that prediction: a
closed-form per-apply time estimate for every plan family, built from
constants measured on this project's v5e (docs/TPU_NOTES.md and the
round-5 probes ``probes/probe_fixup.py`` / ``probes/probe_tiny.py``).

The model is deliberately coarse (±2x): its job is to veto 10-100x
mis-selections (a HybridPlan whose residual SELL plan collapsed to 1%
fill, a striped plan whose epilogue scatter dwarfs its kernel), not to
replace measurement — ``ops.tune.autotune_plan`` refines empirically.
"""

from __future__ import annotations

from typing import Any

import numpy as np

# --- measured v5e constants (see docs/TPU_NOTES.md) -----------------------
#: streamed ns per (8,128)-tile slot at the 6 B/nnz window stream
_NS_PER_SLOT_BASE = 0.0117
#: extra ns/slot per window block past K=2 (one gather+select pass per
#: value vreg; measured 85.6 -> 78.8 Gnnz/s per added pass)
_NS_PER_SLOT_PER_K = 0.00207
#: fixed cost of one Pallas grid step (probe-measured ~1 us)
_NS_PER_GRID_STEP = 1000.0
#: fixed per-kernel-launch cost inside a chained jit (probe_tiny: tiny
#: DIA/SELL plans land at 5-30 us/apply)
_NS_LAUNCH = 5000.0
#: unsorted 1-D segment-scatter fixup: ~7 ns/slot + floor
#: (probe_fixup: 1.9-2.6 ms at 300K slots)
_NS_PER_SEGSUM_SLOT = 7.0
_NS_SEGSUM_FLOOR = 30000.0
#: XLA element gather+scatter COO path (probe_tiny: 16 ns/nnz, ~3 us floor)
_NS_PER_COO_NNZ = 16.0
_NS_COO_FLOOR = 3000.0
#: HBM read bandwidth (bytes/ns)
_BYTES_PER_NS = 700.0
#: packed pass-B extraction-tree cost per visit (TPU_NOTES round-4)
_NS_PER_PACKED_VISIT = 2600.0


def estimate_seconds(plan: Any) -> float:
    """Predicted chained-marginal seconds per apply on a v5e."""
    name = type(plan).__name__
    if name == "SellPlan":
        return _sell_seconds(plan)
    if name == "DiaPlan":
        return _dia_seconds(plan)
    if name == "HybridPlan":
        return (estimate_seconds(plan.dia) + estimate_seconds(plan.rest)
                + 10e-6)
    if name == "CachedPlan":
        t = estimate_seconds(plan.hot) + 10e-6
        if plan.cold is not None:
            t += estimate_seconds(plan.cold)
        return t
    if name == "CooTail":
        return (_NS_COO_FLOOR + _NS_PER_COO_NNZ * plan.nnz) * 1e-9
    if name == "PackedPlan":
        return _packed_seconds(plan)
    if name == "MergeSellPlan":
        return _sell_seconds(plan.sell) + plan.merge_cost_seconds()
    if name == "ChunkPlan":
        return _chunk_seconds(plan)
    raise ValueError(f"no cost model for plan type {name}")


def _chunk_seconds(plan) -> float:
    """ChunkPlan: per-tile cost ~ 15 + 5.2*K ns for window buckets
    (data stream + per-tile xw prologue at wg=1 + gather tree, measured
    round-5 on the powerlaw matrix), ~ (26*W + ladder) for subwin
    buckets, plus the sorted partials fold (~9.4 ns/tile) and the fixed
    lane-perm/heavy epilogue."""
    t = 0.0
    ttot = 0
    for b in plan.buckets:
        st = b.stats
        t += _NS_LAUNCH + st.num_tiles * (15.0 + 5.2 * st.window_blocks)
        ttot += st.num_tiles
    for h in plan.hbuckets:
        W = h.window_blocks
        t += _NS_LAUNCH + h.num_tiles * (15.0 + 26.0 * W)
        ttot += h.num_tiles
    t += ttot * 9.4 + 20e3
    if plan.residue is not None:
        t += estimate_seconds(plan.residue) * 1e9
    return t * 1e-9


def _sell_seconds(plan) -> float:
    st = plan.stats
    slots = st.num_tiles * plan.positions * plan.lane_rows
    k = st.window_blocks
    if k > 0:
        per_slot = _NS_PER_SLOT_BASE + _NS_PER_SLOT_PER_K * max(k - 2, 0)
    else:
        # resident/deep select ladder: ~one pass per 128-lane x block,
        # bounded by the deep sweep's linear-in-blocks cost
        nb = -(-plan.shape[1] // 128)
        per_slot = _NS_PER_SLOT_BASE + _NS_PER_SLOT_PER_K * min(nb, 2048)
    steps = max(1, st.num_tiles // (8 * max(1, st.groups_per_step)))
    t = _NS_LAUNCH + slots * per_slot + steps * _NS_PER_GRID_STEP
    # epilogue
    if plan.identity_map or st.uniform_parts or st.group_slice_identity:
        t += 10e3
    else:
        slots_y = plan.row_map.shape[0]
        t += _NS_SEGSUM_FLOOR + _NS_PER_SEGSUM_SLOT * slots_y
    if st.double:
        t *= 2.5
    return t * 1e-9


def _dia_seconds(plan) -> float:
    vals = plan.vals
    nbytes = int(np.prod(vals.shape)) * np.dtype(vals.dtype).itemsize
    steps = max(1, vals.shape[0])
    return (_NS_LAUNCH + nbytes / _BYTES_PER_NS
            + steps * _NS_PER_GRID_STEP) * 1e-9


def _packed_seconds(plan) -> float:
    slots_a = int(np.prod(plan.vals.shape))
    visits = int(plan.sblock.shape[0])
    t = (_NS_LAUNCH * 2 + slots_a * _NS_PER_SLOT_BASE * 2
         + visits * _NS_PER_PACKED_VISIT)
    novf = int(plan.ov_vals.shape[0])
    if novf:
        t += _NS_COO_FLOOR + _NS_PER_COO_NNZ * novf
    return t * 1e-9

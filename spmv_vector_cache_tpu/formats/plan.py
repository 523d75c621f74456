"""SpMV execution plans: the layout step that replaces hazard hardware.

The reference streams CSC and pays for the scattered update
``y[rowInd] += v`` with interlock hardware — shadow queues, CAM issue
windows, and a vector cache in front of y (``chisel/frontend/``,
``chisel/cache-new/``, SURVEY.md §2.1).  On TPU the same irregularity must
be removed by *layout*, not tracked at runtime: this module builds a
**sliced-ELLPACK (SELL) tile plan** over CSR in which

* rows are bound to *lanes* — 128 consecutive (sub)rows form a *slice*,
  and a slice's nonzeros are stored as (8, 128) value/column tiles whose
  sublane axis holds successive nonzero positions of each row.  The row
  reduction is then a sublane-axis sum and the scatter disappears entirely
  (the RAW-hazard interlocks of ``InterleavedReduce.scala:51-57`` and
  ``SpMVFrontendNBCache.scala:26-77`` have no TPU analog to pay for), and
  the y output block is a lane-aligned (1, 128) vector;
* long rows are *split* into bounded sub-rows that later merge in one cheap
  segment-sum — the load-balance fix the reference probes with its
  ``row64k`` worst-case matrix and ``permuteLongestRowFirst``
  (``matrixutils.py:148-158``);
* rows may be length-sorted within windows of ``sigma`` sub-rows
  (SELL-sigma) so slices hold similar-length rows and padding stays small,
  merged back by the same fixup.

The irregular access that remains is the *gather* of x[col] — the exact
dual of the reference's y problem (CSC makes x sequential and y scattered;
CSR makes y sequential and x gathered).  The plan records per-tile column
statistics so the strategy layer can place x the way the reference placed
y: fully on-chip, windowed, or streamed from HBM (see ``ops/strategy.py``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import numpy as np

from .containers import COO, CSC, CSR
from .convert import coo_to_csr, csc_to_csr

Array = Any


@dataclasses.dataclass(frozen=True)
class PlanStats:
    """Layout-quality counters — the plan-time half of the observability
    story (the runtime half lives in ``utils/stats.py``)."""

    nnz: int
    num_tiles: int
    num_slices: int
    num_subrows: int
    num_splits: int
    padded_slots: int
    fill: float              # nnz / (num_tiles * P * R)
    max_tile_col_span: int   # worst within-tile column spread (windowing feasibility)

    def as_dict(self):
        return dataclasses.asdict(self)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class SellPlan:
    """Tiled SELL layout of one sparse matrix, ready for the Pallas kernels.

    ``vals``/``cols``: (T, P, R) — tile t covers the R=128 rows of slice
    ``tile_slice[t]`` (rows on the lane axis) and P=8 successive nonzero
    positions of each row (sublane axis); padding slots carry
    (semiring-zero, column 0).  ``tile_slice`` is nondecreasing, so the
    output slice block stays VMEM-resident across consecutive grid steps
    (revisiting-output accumulation).  ``row_map`` sends sub-row slots back
    to original rows for the split/sigma fixup; ``identity_map`` says the
    fixup can be skipped (y is the first ``rows`` entries of the flat
    sub-row vector).
    """

    vals: Array          # (T, P, R) value dtype
    cols: Array          # (T, P, R) int32
    tile_slice: Array    # (T,) int32, nondecreasing
    tile_col_min: Array  # (T,) int32 — min column referenced by tile
    row_map: Array       # (num_slices * R,) int32 → original row, or `rows` for padding
    shape: Tuple[int, int]
    lane_rows: int       # R — rows per slice (lane axis)
    positions: int       # P — nonzero positions per tile (sublane axis)
    identity_map: bool
    stats: PlanStats

    _array_fields = ("vals", "cols", "tile_slice", "tile_col_min", "row_map")

    def tree_flatten(self):
        children = tuple(getattr(self, f) for f in self._array_fields)
        aux = (self.shape, self.lane_rows, self.positions, self.identity_map,
               self.stats)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        shape, lane_rows, positions, identity_map, stats = aux
        vals, cols, tile_slice, tile_col_min, row_map = children
        return cls(vals=vals, cols=cols, tile_slice=tile_slice,
                   tile_col_min=tile_col_min, row_map=row_map, shape=shape,
                   lane_rows=lane_rows, positions=positions,
                   identity_map=identity_map, stats=stats)

    @property
    def num_tiles(self) -> int:
        return int(self.vals.shape[0])

    @property
    def num_slices(self) -> int:
        return int(self.row_map.shape[0]) // self.lane_rows

    def to_device(self):
        leaves, aux = self.tree_flatten()
        return type(self).tree_unflatten(
            aux, tuple(jax.numpy.asarray(l) for l in leaves))


def _as_csr(a) -> CSR:
    if isinstance(a, CSR):
        return a
    if isinstance(a, CSC):
        return csc_to_csr(a)
    if isinstance(a, COO):
        return coo_to_csr(a)
    raise TypeError(f"cannot plan over {type(a)}")


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _cdiv_arr(a: np.ndarray, b: int) -> np.ndarray:
    return -(-a // b)


def build_sell_plan(a, *, lane_rows: int = 128, positions: int = 8,
                    sigma: Optional[int] = None,
                    split: Optional[int] = None,
                    value_dtype=np.float32) -> SellPlan:
    """Build a SELL tile plan from any container (host-side, numpy).

    ``split``: max nonzeros per sub-row; rows longer than this are split
    (None = no splitting).  ``sigma``: window (in sub-rows) for descending
    length sort (None = keep row order; then the fixup may be skippable).
    """
    csr = _as_csr(a)
    rows, cols_n = csr.shape
    indptr = np.asarray(csr.indptr, dtype=np.int64)
    indices = np.asarray(csr.indices, dtype=np.int64)
    data = np.asarray(csr.data)
    lens = np.diff(indptr)
    nnz = int(indptr[-1])
    R, P = lane_rows, positions

    # --- 1. split long rows into bounded sub-rows -------------------------
    if split is not None and lens.size and lens.max() > split:
        pieces = np.maximum(1, _cdiv_arr(lens, split))
        sub_orig = np.repeat(np.arange(rows, dtype=np.int64), pieces)
        piece_idx = np.arange(sub_orig.shape[0], dtype=np.int64) - \
            np.repeat(np.cumsum(pieces) - pieces, pieces)
        sub_start = indptr[sub_orig] + piece_idx * split
        sub_len = np.minimum(lens[sub_orig] - piece_idx * split, split)
        num_splits = int((pieces > 1).sum())
    else:
        sub_orig = np.arange(rows, dtype=np.int64)
        sub_start = indptr[:-1].copy()
        sub_len = lens.copy()
        num_splits = 0
    num_subrows = int(sub_orig.shape[0])

    # --- 2. sigma sort (descending length within windows) -----------------
    if sigma is not None and num_subrows > 1:
        order = np.empty(num_subrows, dtype=np.int64)
        for w0 in range(0, num_subrows, sigma):
            w1 = min(w0 + sigma, num_subrows)
            order[w0:w1] = w0 + np.argsort(-sub_len[w0:w1], kind="stable")
        sorted_applied = True
    else:
        order = np.arange(num_subrows, dtype=np.int64)
        sorted_applied = False

    o_len = sub_len[order]
    o_start = sub_start[order]
    o_orig = sub_orig[order]

    # --- 3. slices and tile allocation ------------------------------------
    # slices rounded to a multiple of 8 so y-slices group into (8, R) output
    # blocks (TPU sublane granularity)
    num_slices = _cdiv(max(1, _cdiv(num_subrows, R)), 8) * 8
    padded_subrows = num_slices * R
    slice_len = np.zeros(num_slices, dtype=np.int64)
    if num_subrows:
        np.maximum.at(slice_len, np.arange(num_subrows) // R, o_len)
    ntiles = np.maximum(1, _cdiv_arr(slice_len, P))  # >=1: every slice visited
    tile_base = np.concatenate(([0], np.cumsum(ntiles)))
    T = int(tile_base[-1])

    # --- 4. scatter nonzeros into tiles ------------------------------------
    vals = np.zeros((T, P, R), dtype=value_dtype)
    cols = np.zeros((T, P, R), dtype=np.int32)
    if nnz:
        k = np.repeat(np.arange(num_subrows, dtype=np.int64), o_len)  # sorted slot
        q = np.arange(k.shape[0], dtype=np.int64) - \
            np.repeat(np.cumsum(o_len) - o_len, o_len)                # pos in subrow
        src = np.repeat(o_start, o_len) + q
        s = k // R
        j = k % R                         # lane (row within slice)
        t = tile_base[s] + q // P
        p = q % P                         # sublane (position within tile)
        vals[t, p, j] = data[src].astype(value_dtype)
        cols[t, p, j] = indices[src].astype(np.int32)

    tile_slice = np.repeat(np.arange(num_slices, dtype=np.int32),
                           ntiles.astype(np.int64))

    # per-tile column stats (for the windowed-x strategy feasibility)
    flat_cols = cols.reshape(T, -1)
    has_any = vals.reshape(T, -1) != 0
    cmin = np.where(has_any, flat_cols, np.iinfo(np.int32).max).min(axis=1)
    cmax = np.where(has_any, flat_cols, -1).max(axis=1)
    cmin = np.where(cmax >= 0, cmin, 0).astype(np.int32)
    col_span = np.where(cmax >= 0, cmax - cmin.astype(np.int64) + 1, 0)

    # --- 5. fixup map -------------------------------------------------------
    row_map = np.full(padded_subrows, rows, dtype=np.int32)
    row_map[:num_subrows] = o_orig.astype(np.int32)
    identity_map = (not sorted_applied) and num_splits == 0

    stats = PlanStats(
        nnz=nnz, num_tiles=T, num_slices=num_slices,
        num_subrows=num_subrows, num_splits=num_splits,
        padded_slots=T * P * R - nnz,
        fill=float(nnz) / float(T * P * R) if T else 0.0,
        max_tile_col_span=int(col_span.max()) if T else 0)

    return SellPlan(vals=vals, cols=cols, tile_slice=tile_slice,
                    tile_col_min=cmin, row_map=row_map,
                    shape=(rows, cols_n), lane_rows=R, positions=P,
                    identity_map=identity_map, stats=stats)


def auto_plan(a, *, value_dtype=np.float32, lane_rows: int = 128,
              positions: int = 8) -> SellPlan:
    """Heuristic plan: split/sigma only when the structure calls for it.

    The decision features are the TPU ports of the reference's
    preprocessing analyses (maxAlive/maxColSpan/row-length histogram,
    ``SparseMatrix.cpp:92-119``): skewed row lengths -> split + sigma sort;
    balanced -> plain layout with the skippable-identity fast path.
    """
    csr = _as_csr(a)
    lens = np.diff(np.asarray(csr.indptr, dtype=np.int64))
    if lens.size == 0 or lens.max() == 0:
        return build_sell_plan(csr, value_dtype=value_dtype,
                               lane_rows=lane_rows, positions=positions)
    mean = max(1.0, float(lens.mean()))
    skew = float(lens.max()) / mean
    split = None
    sigma = None
    if skew > 8.0:
        # bound sub-rows near the mean (rounded to the sublane granule) and
        # sort a few slices' worth so slices stay dense
        split = int(max(positions, _cdiv(int(mean * 4), positions) * positions))
        sigma = lane_rows * 8
    elif float(lens.std()) > mean:
        sigma = lane_rows * 8
    return build_sell_plan(csr, value_dtype=value_dtype, lane_rows=lane_rows,
                           positions=positions, sigma=sigma, split=split)

"""Matrix-structure analyses that drive strategy selection.

The reference computes these on the Zynq ARM (``software/SparseMatrix.cpp``)
and host PC (``matrices/matrixutils.py``) to predict which result-vector
placement strategy wins; here they feed :mod:`..ops.strategy`'s selector the
same way.  All are vectorized numpy (host-side preprocessing).

* ``mark_row_starts`` — tag the first (or last) nonzero of every row by
  setting a high bit in its row index; the hardware CMS ("cold-miss-skip")
  optimization reads bit 31 to install a zero instead of fetching y from DDR
  (``software/SparseMatrix.cpp:52-90``, consumed at
  ``chisel/cache-new/NoWMVectorCache.scala:162,183-186``).
* ``max_alive`` — peak number of simultaneously "live" rows between their
  first and last nonzero in nz order: a lower bound on the y working set
  (``software/SparseMatrix.cpp:92-108``, ``matrixutils.py:38-47``).
* ``max_col_span`` — max row-index spread within one column
  (``software/SparseMatrix.cpp:110-119``, ``matrixutils.py:56-64``).
* ``row_length_histogram`` / ``permute_longest_row_first`` — load-balance
  analyses (``matrixutils.py:116-137, 148-158``).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from .containers import COO, CSC, CSR
from .convert import coo_to_csr, csc_to_coo, csr_to_coo

ROW_START_BIT = 31   # SparseMatrix.cpp:97 — bit 31 marks row start (CMS bit)
ROW_END_BIT = 30     # SparseMatrix.cpp:98 — bit 30 marks row end
INDEX_MASK = 0x3FFFFFFF


def _nz_rows(a) -> np.ndarray:
    """Row index of every nonzero, in storage (nz) order."""
    if isinstance(a, CSC):
        return np.asarray(a.indices)
    if isinstance(a, CSR):
        return np.asarray(csr_to_coo(a).row)
    if isinstance(a, COO):
        return np.asarray(a.row)
    raise TypeError(f"unsupported container {type(a)}")


def first_touch_mask(row_ids: np.ndarray, reverse: bool = False) -> np.ndarray:
    """Boolean mask: is this nonzero the first occurrence of its row?

    Vectorized equivalent of the reference's seen-bitmap loop
    (``SparseMatrix.cpp:52-90`` / ``matrixutils.py:24-35``): for each nz
    position, True iff its row id has not appeared earlier (or later, if
    ``reverse``) in nz order.
    """
    rows = np.asarray(row_ids, dtype=np.int64) & INDEX_MASK
    n = rows.shape[0]
    pos = np.arange(n)
    if reverse:
        rows, pos = rows[::-1], pos  # scan from the end
    # stable argsort by row groups equal rows in encounter order
    order = np.argsort(rows, kind="stable")
    sorted_rows = rows[order]
    is_first_sorted = np.ones(n, dtype=bool)
    is_first_sorted[1:] = sorted_rows[1:] != sorted_rows[:-1]
    mask = np.zeros(n, dtype=bool)
    mask[order] = is_first_sorted
    if reverse:
        mask = mask[::-1]
    return mask


def mark_row_starts(indices: np.ndarray, reverse: bool = False,
                    shift: int = ROW_START_BIT) -> np.ndarray:
    """Return a copy of ``indices`` with bit ``shift`` set on the first
    (``reverse=False``) or last (``reverse=True``) nonzero of each row —
    the CMS preprocessing pass (``SparseMatrix.cpp:52-90``)."""
    idx = np.asarray(indices).astype(np.uint32).copy()
    mask = first_touch_mask(idx, reverse=reverse)
    idx[mask] |= np.uint32(1 << shift)
    return idx


def clear_row_markings(indices: np.ndarray) -> np.ndarray:
    """Strip the start/end marker bits (``SparseMatrix.h:48`` role)."""
    return (np.asarray(indices).astype(np.uint32) & np.uint32(INDEX_MASK))


def max_alive(a) -> int:
    """Peak simultaneously-live row count over the nz stream
    (``SparseMatrix.cpp:92-108``): +1 at each row's first nz, -1 at its last."""
    rows = np.asarray(_nz_rows(a), dtype=np.int64) & INDEX_MASK
    if rows.shape[0] == 0:
        return 0
    # the reference applies +start and -end of the same nz within one loop
    # step and takes the max after both — a cumsum of the net delta matches
    alive = np.cumsum(first_touch_mask(rows).astype(np.int64)
                      - first_touch_mask(rows, reverse=True).astype(np.int64))
    return int(alive.max())


def max_col_span(a: CSC) -> int:
    """Max (last - first) row index within any column, indices sorted
    (``SparseMatrix.cpp:110-119``, ``matrixutils.py:56-64``)."""
    indptr = np.asarray(a.indptr, dtype=np.int64)
    indices = np.asarray(a.indices, dtype=np.int64) & INDEX_MASK
    starts, ends = indptr[:-1], indptr[1:]
    nonempty = ends > starts
    if not nonempty.any():
        return 0
    first = indices[starts[nonempty]]
    last = indices[ends[nonempty] - 1]
    return int((last - first).max())


def row_length_histogram(a) -> Dict[int, int]:
    """Histogram of nonzeros-per-row (``matrixutils.py:116-125``)."""
    if isinstance(a, CSR):
        lens = np.diff(np.asarray(a.indptr))
    else:
        lens = np.bincount(np.asarray(_nz_rows(a), dtype=np.int64) & INDEX_MASK,
                           minlength=a.shape[0])
    vals, counts = np.unique(lens, return_counts=True)
    return {int(v): int(c) for v, c in zip(vals, counts)}


def longest_row_first_permutation(a) -> np.ndarray:
    """Row permutation sorting rows by descending nz count
    (``matrixutils.py:148-158``); apply with :func:`permute_rows`."""
    if isinstance(a, CSR):
        lens = np.diff(np.asarray(a.indptr))
    else:
        lens = np.bincount(np.asarray(_nz_rows(a), dtype=np.int64) & INDEX_MASK,
                           minlength=a.shape[0])
    # descending length, stable in original row order for ties
    return np.argsort(-lens.astype(np.int64), kind="stable")


def permute_rows(a: CSR, perm: np.ndarray) -> CSR:
    """Apply a row permutation: new row i = old row perm[i]."""
    coo = csr_to_coo(a)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.shape[0])
    return coo_to_csr(COO(data=np.asarray(coo.data),
                          row=inv[np.asarray(coo.row)].astype(np.int32),
                          col=np.asarray(coo.col), shape=a.shape))


def row_spans(a: CSR) -> np.ndarray:
    """Per-row (last - first) column index, sorted indices — the CSR
    dual of ``maxColSpan`` (``SparseMatrix.cpp:110-119``): in the CSC
    dataflow the irregularly-accessed vector is y and its working window
    per column is the row span; in our CSR dual it is x and the window
    per row is the *column* span.  Empty rows report 0."""
    indptr = np.asarray(a.indptr, dtype=np.int64)
    indices = np.asarray(a.indices, dtype=np.int64) & INDEX_MASK
    starts, ends = indptr[:-1], indptr[1:]
    spans = np.zeros(a.shape[0], np.int64)
    nonempty = ends > starts
    spans[nonempty] = (indices[ends[nonempty] - 1]
                       - indices[starts[nonempty]])
    return spans


def column_working_set(a: CSR) -> int:
    """Peak simultaneously-live *column* count over the row-major
    nonzero stream — the CSR dual of ``maxAlive``
    (``SparseMatrix.cpp:92-108``): how many x entries are in flight
    while the kernel sweeps rows, a lower bound on the residency a
    cache tier must provide."""
    indices = np.asarray(a.indices, dtype=np.int64) & INDEX_MASK
    if indices.shape[0] == 0:
        return 0
    alive = np.cumsum(
        first_touch_mask(indices).astype(np.int64)
        - first_touch_mask(indices, reverse=True).astype(np.int64))
    return int(alive.max())


def bandwidth(a) -> int:
    """Matrix bandwidth: max |row - col| over nonzeros (selector feature)."""
    if isinstance(a, CSC):
        coo = csc_to_coo(a)
    elif isinstance(a, CSR):
        coo = csr_to_coo(a)
    else:
        coo = a
    if coo.data.shape[0] == 0:
        return 0
    return int(np.abs(np.asarray(coo.row, dtype=np.int64)
                      - np.asarray(coo.col, dtype=np.int64)).max())


def summarize(a) -> Dict[str, int]:
    """All selector features in one dict — the preprocessing stats the
    reference exports per matrix (``SoftwareSpMV.cpp:96-131`` stat keys)."""
    csc = a if isinstance(a, CSC) else None
    out = {
        "rows": a.shape[0],
        "cols": a.shape[1],
        "nnz": int(np.asarray(_nz_rows(a)).shape[0]),
        "maxAlive": max_alive(a),
        "bandwidth": bandwidth(a),
    }
    if csc is not None:
        out["maxColSpan"] = max_col_span(csc)
    if isinstance(a, CSR):
        spans = row_spans(a)
        out["maxRowSpan"] = int(spans.max()) if spans.size else 0
        out["columnWorkingSet"] = column_working_set(a)
    return out

"""Cached plans: the vector-cache / BufferSel analog for locality-poor
matrices.

The reference's answer to a result vector that does not fit on chip is a
*cache* in front of DDR: the working set stays in BRAM and misses pay
memory latency (``chisel/cache-new/NoWMVectorCache.scala``,
``chisel/frontend/SpMVFrontendBufferSel.scala:15-300`` — route each
operand by ``id < ocmDepth`` to the on-chip pipe, everything else to the
DDR pipe).  In the CSR dual the irregularly-accessed vector is **x**, and
the TPU has no hardware cache to lean on — but the *plan* can measure
column popularity up front and split the matrix by it:

* **hot** nonzeros — those in the most-referenced columns — are remapped
  onto a compact column domain of at most ``max_hot`` entries.  The
  remapped submatrix has a tiny total column span, so the fast window /
  resident kernels apply regardless of the original matrix's locality.
  One small ``x[hot_cols]`` gather per apply stands in for the cache
  fill (the init phase of ``HardwareSpMVNewCache.cpp:46-56``).
* **cold** nonzeros — the popularity tail — run on the deep select-tree
  kernel (the BufferNone / random-access-port analog,
  ``SpMVFrontendBufferNone.scala:9-175``): slower per element, but they
  are few when popularity is skewed.

Power-law column popularity (web/social/circuit matrices — the
reference's own webbase-1M suite entry, ``matrices/matrixutils.py:18``)
makes the hot share large: at Zipf exponent ~2, a 2048-column hot set
covers >99% of the nonzeros of a 1M-column matrix.  ``coverage`` is the
plan-time hit-rate prediction — the analog of the reference's
readMissCount observability (``NoWMVectorCache.scala:129-134``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import numpy as np

from .containers import CSR
from .plan import SellPlan, _as_csr, _cdiv

Array = Any


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class CachedPlan:
    """Hot/cold split of one matrix: ``y = hot(x[hot_cols]) + cold(x)``.

    ``hot`` is a :class:`SellPlan` over the compact remapped column
    domain (shape ``(rows, hot_size)``); ``cold`` covers the residual
    nonzeros on the original column domain, or ``None`` when the hot set
    covers everything.  ``hot_cols`` holds the original column ids of the
    hot set in ascending order (so remapping preserves within-row column
    order)."""

    hot: SellPlan
    cold: Optional[Any]       # SellPlan, or PackedPlan for ring semirings
    hot_cols: Array                    # (hot_size,) int32, ascending
    shape: Tuple[int, int]
    coverage: float                    # hot nnz / total nnz (hit rate)

    def tree_flatten(self):
        return (self.hot, self.cold, self.hot_cols), (self.shape,
                                                      self.coverage)

    @classmethod
    def tree_unflatten(cls, aux, children):
        hot, cold, hot_cols = children
        return cls(hot=hot, cold=cold, hot_cols=hot_cols, shape=aux[0],
                   coverage=aux[1])

    def to_device(self):
        import jax.numpy as jnp

        return CachedPlan(
            hot=self.hot.to_device(),
            cold=self.cold.to_device() if self.cold is not None else None,
            hot_cols=jnp.asarray(self.hot_cols), shape=self.shape,
            coverage=self.coverage)


def column_frequency(csr: CSR) -> np.ndarray:
    """Per-column nonzero counts — the popularity analysis that predicts
    cache hit rates (the role ``maxAlive``/``maxColSpan`` play for the
    reference's buffer sizing, ``SparseMatrix.cpp:92-119``)."""
    indices = np.asarray(csr.indices, dtype=np.int64) & 0x3FFFFFFF
    return np.bincount(indices, minlength=csr.shape[1])


def hot_set_coverage(csr: CSR, sizes=(256, 512, 1024, 2048, 4096)
                     ) -> dict:
    """Fraction of nnz covered by the top-k columns, for each k — the
    plan-time design-space sweep (cf. the reference's ocmDepth sweeps,
    ``gen-newcache.sh:3-11``)."""
    counts = column_frequency(csr)
    nnz = max(1, int(counts.sum()))
    srt = np.sort(counts)[::-1]
    cum = np.cumsum(srt)
    return {int(k): float(cum[min(k, len(cum)) - 1]) / nnz for k in sizes}


def build_cached_plan(a, *, max_hot: int = 2048,
                      min_coverage: float = 0.5,
                      value_dtype=np.float32,
                      max_window_blocks: int = 16,
                      lane_rows: int = 128, positions: int = 8,
                      pad_value: float = 0.0,
                      allow_packed: bool = True) -> Optional[CachedPlan]:
    """Split by column popularity; None when the split would not pay.

    The hot set is the smallest power-of-two-ish prefix of the
    popularity order (multiples of 128, capped at ``max_hot``) whose
    coverage reaches ``min_coverage``; if even ``max_hot`` columns fall
    short, returns None (no working set to cache — the deep kernel's
    flat cost is then the best available)."""
    from .plan import _auto_sell_plan

    csr = _as_csr(a)
    rows, cols = csr.shape
    if csr.nnz == 0 or cols <= max_hot:
        return None
    counts = column_frequency(csr)
    order = np.argsort(counts, kind="stable")[::-1]
    cum = np.cumsum(counts[order])
    nnz = int(cum[-1])
    sizes = [h for h in (128, 256, 512, 1024, 2048, 4096, 8192)
             if h <= max_hot and h <= cols]
    cov = {h: float(cum[h - 1]) / nnz for h in sizes}
    hot_size = next((h for h in sizes if cov[h] >= min_coverage), 0)
    if not hot_size:
        return None
    # keep doubling while the working set still grows materially — a
    # bigger hot set costs ~linearly in the hot kernel but every covered
    # nonzero leaves the much slower cold pass (the ocmDepth sweep's
    # economics, gen-newcache.sh:3)
    for h in sizes:
        if h > hot_size and cov[h] - cov[hot_size] >= 0.04:
            hot_size = h
    hot_ids = np.sort(order[:hot_size]).astype(np.int64)

    # split nonzeros by membership; remap hot columns ascending so CSR
    # indices stay sorted within rows
    remap = np.full(cols, -1, np.int64)
    remap[hot_ids] = np.arange(hot_size)
    indices = np.asarray(csr.indices, dtype=np.int64) & 0x3FFFFFFF
    data = np.asarray(csr.data)
    indptr = np.asarray(csr.indptr, dtype=np.int64)
    m = remap[indices]
    is_hot = m >= 0
    lens = np.diff(indptr)
    nz_row = np.repeat(np.arange(rows, dtype=np.int64), lens)
    hot_lens = np.bincount(nz_row[is_hot], minlength=rows)
    hot_csr = CSR(
        data=data[is_hot], indices=m[is_hot].astype(np.int32),
        indptr=np.concatenate(([0], np.cumsum(hot_lens))).astype(np.int32),
        shape=(rows, hot_size))
    cold_nnz = int((~is_hot).sum())
    kw = dict(value_dtype=value_dtype, lane_rows=lane_rows,
              positions=positions, max_window_blocks=max_window_blocks,
              pad_value=pad_value)
    # the compact domain makes the fast kernels apply by construction:
    # window (span <= hot blocks <= 16) or resident (NB <= 64)
    hot_plan = _auto_sell_plan(hot_csr, allow_cached=False, **kw)
    cold_plan = None
    if cold_nnz:
        cold_csr = CSR(
            data=data[~is_hot], indices=indices[~is_hot].astype(np.int32),
            indptr=np.concatenate(([0], np.cumsum(lens - hot_lens))
                                  ).astype(np.int32),
            shape=(rows, cols))
        if allow_packed:
            # the popularity tail is locality-poor by construction: the
            # packed two-pass kernel (the BufferNone analog) runs it at
            # a bounded per-nnz cost where deep/stream would cliff
            from .packed import build_packed_plan

            cold_plan = build_packed_plan(cold_csr,
                                          value_dtype=value_dtype)
        else:
            # non-plus_times semirings: packed's segmented-scan
            # extraction does not apply; keep the SELL fallback
            cold_plan = _auto_sell_plan(cold_csr, allow_cached=False,
                                        allow_packed=False, **kw)
    return CachedPlan(hot=hot_plan, cold=cold_plan,
                      hot_cols=hot_ids.astype(np.int32),
                      shape=(rows, cols),
                      coverage=float(nnz - cold_nnz) / nnz)

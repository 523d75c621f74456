"""Multi-chip SpMV/SpMM: row-partitioned plans under shard_map.

The reference is a single-chip accelerator — its only "scaling" mechanism
is swapping bitfiles (``devcfg.cpp``); SURVEY.md §2.4 calls out multi-chip
scaling as the capability this build adds.  Design per the scaling-book
recipe: pick a mesh, shard the data, let collectives move the dense
vector, overlap with per-shard compute.

* The matrix is partitioned into ``D`` contiguous **row blocks**, one per
  device along mesh axis ``"x"``; each block gets its own SELL plan, and
  the plans are stacked into uniform (D, T, P, R) arrays (padded to the
  largest shard) so the same program runs on every device — SPMD, no
  per-device shapes.
* **x exchange**: the dense vector is row-sharded like y; before the local
  SpMV each device assembles the x segments it needs:
  - ``all_gather`` mode (general matrices): x all-gathered over ICI — the
    bandwidth-robust default;
  - ``halo`` mode (banded matrices): each device fetches only neighbor
    halos via ``ppermute`` — the ``maxColSpan``/bandwidth analysis
    (``SparseMatrix.cpp:110-119``) decides eligibility, exactly as it
    guided buffer sizing in the reference.
* Per-shard compute is the single-chip Pallas kernel (or the XLA executor
  on hosts without Mosaic); results concatenate along the row axis with no
  cross-device reduction, because rows are uniquely owned.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..formats.containers import CSR
from ..formats.plan import PlanStats, SellPlan, build_sell_plan, _as_csr
from ..formats import analysis

Array = Any


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class ShardedPlan:
    """D row-block SELL plans stacked for SPMD execution.

    All shards share tile count T (zero-padded), so arrays are
    (D, T, P, R); ``rows_per_shard`` is the uniform row-block height
    (last block zero-padded).  ``halo`` is the column halo width each side
    needed by the banded exchange mode (0 = not banded / use all-gather).
    """

    vals: Array          # (D, T, P, R)
    cols: Array          # (D, T, P, R) — GLOBAL column indices
    tile_slice: Array    # (D, T)
    row_map: Array       # (D, num_slices*R) — LOCAL row ids (or rows_per_shard)
    shape: Tuple[int, int]
    num_shards: int
    rows_per_shard: int
    identity_map: bool
    halo: int

    _array_fields = ("vals", "cols", "tile_slice", "row_map")

    def tree_flatten(self):
        children = tuple(getattr(self, f) for f in self._array_fields)
        aux = (self.shape, self.num_shards, self.rows_per_shard,
               self.identity_map, self.halo)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        shape, num_shards, rows_per_shard, identity_map, halo = aux
        vals, cols, tile_slice, row_map = children
        return cls(vals=vals, cols=cols, tile_slice=tile_slice,
                   row_map=row_map, shape=shape, num_shards=num_shards,
                   rows_per_shard=rows_per_shard, identity_map=identity_map,
                   halo=halo)

    @property
    def num_slices(self) -> int:
        return int(self.row_map.shape[1]) // 128


def build_sharded_plan(a, num_shards: int, *, value_dtype=np.float32,
                       sigma: Optional[int] = None,
                       split: Optional[int] = None) -> ShardedPlan:
    """Partition rows into ``num_shards`` blocks and plan each (host-side)."""
    csr = _as_csr(a)
    rows, cols_n = csr.shape
    rps = -(-rows // num_shards)
    indptr = np.asarray(csr.indptr, dtype=np.int64)
    indices = np.asarray(csr.indices)
    data = np.asarray(csr.data)

    plans = []
    for d in range(num_shards):
        r0, r1 = d * rps, min((d + 1) * rps, rows)
        e0, e1 = indptr[r0], indptr[max(r0, r1)]
        sub = CSR(data=data[e0:e1], indices=indices[e0:e1],
                  indptr=(indptr[r0:r1 + 1] - e0).astype(np.int32)
                  if r1 > r0 else np.zeros(1, np.int32),
                  shape=(max(r1 - r0, 0) or 1, cols_n))
        # uniform local shape: pad the row count to rps
        sub = CSR(data=sub.data, indices=sub.indices,
                  indptr=np.concatenate([
                      np.asarray(sub.indptr),
                      np.full(rps - (r1 - r0), np.asarray(sub.indptr)[-1],
                              np.int32)]).astype(np.int32)
                  if (r1 - r0) < rps else sub.indptr,
                  shape=(rps, cols_n))
        plans.append(build_sell_plan(sub, value_dtype=value_dtype,
                                     sigma=sigma, split=split))

    T = max(p.num_tiles for p in plans)
    S = max(p.num_slices for p in plans)
    D = num_shards
    Pp, R = plans[0].positions, plans[0].lane_rows
    vals = np.zeros((D, T, Pp, R), dtype=value_dtype)
    cols = np.zeros((D, T, Pp, R), dtype=np.int32)
    tile_slice = np.zeros((D, T), dtype=np.int32)
    row_map = np.full((D, S * R), rps, dtype=np.int32)
    for d, p in enumerate(plans):
        t = p.num_tiles
        vals[d, :t] = p.vals
        cols[d, :t] = p.cols
        tile_slice[d, :t] = p.tile_slice
        # padding tiles: park them on the last slice (they contribute zeros)
        tile_slice[d, t:] = S - 1
        row_map[d, :p.row_map.shape[0]] = np.where(
            p.row_map == rps, rps, p.row_map)

    identity = all(p.identity_map for p in plans) and \
        all(p.num_slices == S for p in plans)

    # halo width: max distance from a referenced column to the shard's own
    # column block [d*rps, (d+1)*rps) — bounded for banded matrices
    bw = analysis.bandwidth(csr)
    halo = int(bw) if bw < rps else 0

    return ShardedPlan(vals=vals, cols=cols, tile_slice=tile_slice,
                       row_map=row_map, shape=(rows, cols_n),
                       num_shards=D, rows_per_shard=rps,
                       identity_map=identity, halo=halo)


# ---------------------------------------------------------------------------
# local (per-shard) executor — XLA path, shard_map friendly
# ---------------------------------------------------------------------------

def _local_spmv_xla(vals, cols, tile_slice, row_map, x_full, *,
                    num_slices: int, rows_local: int, identity: bool):
    """Per-shard SpMV on gathered x (pure XLA: robust under shard_map on
    any backend; the Pallas kernel slots in on TPU via the same contract)."""
    xg = jnp.take(x_full, cols, axis=0)                    # (T, P, R)
    partial_t = jnp.sum(vals * xg, axis=1)                 # (T, R)
    y2d = jax.ops.segment_sum(partial_t, tile_slice, num_segments=num_slices)
    flat = y2d.reshape(-1)
    if identity:
        return flat[:rows_local]
    y = jax.ops.segment_sum(flat, row_map, num_segments=rows_local + 1)
    return y[:rows_local]


def spmv_sharded(sp: ShardedPlan, x: Array, mesh: Mesh, *,
                 axis: str = "x", mode: str = "auto") -> Array:
    """Distributed ``y = A @ x`` with x and y row-sharded over ``axis``.

    ``mode``: 'all_gather' | 'halo' | 'auto' (halo when the plan's
    bandwidth permits).  Returns y sharded like x.
    """
    if mode == "auto":
        mode = "halo" if 0 < sp.halo <= sp.rows_per_shard else "all_gather"
    D, rps = sp.num_shards, sp.rows_per_shard
    rows = sp.shape[0]
    num_slices = sp.num_slices
    identity = sp.identity_map
    halo = sp.halo

    xp = jnp.zeros(D * rps, sp.vals.dtype).at[:sp.shape[1]].set(
        jnp.asarray(x, sp.vals.dtype))

    def local_fn(vals, cols, tile_slice, row_map, x_shard):
        vals, cols = vals[0], cols[0]
        tile_slice, row_map = tile_slice[0], row_map[0]
        x_shard = x_shard.reshape(-1)                     # (rps,)
        if mode == "all_gather":
            x_full = jax.lax.all_gather(x_shard, axis).reshape(-1)
            cols_local = cols
        else:
            # banded: fetch left/right halos from ring neighbors
            d = jax.lax.axis_index(axis)
            left = jax.lax.ppermute(x_shard[-halo:], axis,
                                    [(i, (i + 1) % D) for i in range(D)])
            right = jax.lax.ppermute(x_shard[:halo], axis,
                                     [(i, (i - 1) % D) for i in range(D)])
            x_full = jnp.concatenate([left, x_shard, right])
            # rebase columns into the halo window [d*rps - halo, ...)
            cols_local = cols - (d * rps - halo)
            cols_local = jnp.clip(cols_local, 0, x_full.shape[0] - 1)
        y_local = _local_spmv_xla(vals, cols_local, tile_slice, row_map,
                                  x_full, num_slices=num_slices,
                                  rows_local=rps, identity=identity)
        return y_local[None, :]

    fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis))
    y = fn(sp.vals, sp.cols, sp.tile_slice, sp.row_map,
           xp.reshape(D, rps))
    return y.reshape(-1)[:rows]


def spmm_sharded(sp: ShardedPlan, b: Array, mesh: Mesh, *,
                 axis: str = "x") -> Array:
    """Distributed ``Y = A @ B`` (B replicated, Y row-sharded)."""
    D, rps = sp.num_shards, sp.rows_per_shard
    rows = sp.shape[0]
    num_slices = sp.num_slices
    identity = sp.identity_map
    k = b.shape[1]

    def local_fn(vals, cols, tile_slice, row_map, b_full):
        vals, cols = vals[0], cols[0]
        tile_slice, row_map = tile_slice[0], row_map[0]
        bg = jnp.take(b_full, cols, axis=0)                 # (T, P, R, k)
        contrib = jnp.einsum("tpr,tprk->trk", vals, bg,
                             preferred_element_type=vals.dtype)
        y3d = jax.ops.segment_sum(contrib, tile_slice,
                                  num_segments=num_slices)  # (S, R, k)
        flat = y3d.reshape(-1, k)
        if identity:
            return flat[None, :rps]
        y = jax.ops.segment_sum(flat, row_map, num_segments=rps + 1)
        return y[None, :rps]

    fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=P(axis))
    y = fn(sp.vals, sp.cols, sp.tile_slice, sp.row_map,
           jnp.asarray(b, sp.vals.dtype))
    return y.reshape(-1, k)[:rows]


def make_mesh(n_devices: Optional[int] = None, axis: str = "x") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))

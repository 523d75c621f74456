"""Band-interleaved striped SELL with a windowed merge epilogue.

Round-5 redesign for matrices with **bounded column spans but skewed row
lengths** (the BASELINE config-2 power-law class).  The committed round-4
evidence showed such matrices at 1% of roofline because the general
striped layout merges its sub-row pieces with an unsorted XLA
segment-scatter measured at ~7 ns/slot (2.86 ms of a 3.77 ms apply on
the power-law row — ``probes/probe_powerlaw.py``).  Every scatter/gather
primitive XLA offers at this granularity costs ≥0.9 ms
(``probes/probe_fixup.py``); the only affordable merges are contiguous
slab folds and small in-VMEM windowed gathers.

This plan makes the merge a windowed gather by *construction*:

* pieces = (row x column-stripe) runs — bounded span, so the windowed
  x-gather kernel applies at small K (the vector-cache role);
* slot order = ``(band, part k, stripe, length desc)`` where *band* is a
  1024-row group and *k* the piece's rank within its row: every piece of
  band *b* lands in a small contiguous slice range, and the pieces of
  one (band, k) *region* span <= 10 slot rows;
* the y merge is a Pallas kernel (``ops/spmv_merge.py``): for each band
  it gathers each row's part-k slot from that region's <= RH-row window
  with plan-precomputed int16 indices — cost per part is one small
  select ladder, not an HBM scatter;
* length-descending order within regions keeps slice tile counts graded
  (the fill story of SELL-sigma), and the slice fold stays the sorted
  2-D row-segment reduce (measured ~9 ns/tile-row, cheap at these tile
  counts).

The reference's analog is BufferSel's two-pipe routing plus its
``permuteLongestRowFirst`` preprocessing (``matrixutils.py:148-158``):
reorganize at plan time so the hot loop never pays for skew.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import numpy as np

from .containers import CSR
from .plan import (PlanStats, SellPlan, TILES_PER_STEP, _as_csr, _cdiv,
                   compute_cols_win, compute_window_rows)

Array = Any

#: bands (1024-row groups) merged per kernel grid step
BANDS_PER_STEP = 8
#: slot-row height of one (band, k) region gather window (multiple of 8)
REGION_ROWS = 24


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class MergeSellPlan:
    """A window-kernel SELL layout plus the merge-epilogue schedule.

    ``sell`` is a normal :class:`SellPlan` (its window kernel runs
    unchanged); the extra arrays drive ``ops.spmv_merge``:

    * ``idx``: (Ptot, 8, 128) int16 — for part row p covering band b,
      entry (s, l) holds the region-window-relative slot index
      (slice_in_window * 128 + lane) of row ``b*1024 + s*128 + l``'s
      piece, or -1 when that row has no such part;
    * ``region_off``: (Ptot,) int32 — the part's gather-window start
      slice, relative to its grid step's slot block (multiple of 8);
    * ``band_nparts`` / ``band_part_base``: (B,) int32 — per-band part
      count and first part row (block-relative, since idx is streamed
      per step).
    """

    sell: SellPlan
    idx: Array
    region_off: Array
    band_nparts: Array
    band_part_base: Array
    rows: int
    num_bands: int
    step_slices: int           # H: slot rows per grid step
    step_parts: int            # PB: idx rows per grid step
    band_rows: int

    def tree_flatten(self):
        return ((self.sell, self.idx, self.region_off, self.band_nparts,
                 self.band_part_base),
                (self.rows, self.num_bands, self.step_slices,
                 self.step_parts, self.band_rows))

    @classmethod
    def tree_unflatten(cls, aux, children):
        sell, idx, region_off, band_nparts, band_part_base = children
        return cls(sell=sell, idx=idx, region_off=region_off,
                   band_nparts=band_nparts, band_part_base=band_part_base,
                   rows=aux[0], num_bands=aux[1], step_slices=aux[2],
                   step_parts=aux[3], band_rows=aux[4])

    @property
    def shape(self) -> Tuple[int, int]:
        return self.sell.shape

    @property
    def stats(self):
        return self.sell.stats

    @property
    def positions(self):
        return self.sell.positions

    @property
    def lane_rows(self):
        return self.sell.lane_rows

    def merge_cost_seconds(self) -> float:
        """Model term for formats.costmodel: ~60 cycles per part row
        (RH-pass select ladder) plus step overhead."""
        nparts = int(self.idx.shape[0])
        nsteps = max(1, self.num_bands // BANDS_PER_STEP)
        return (nparts * REGION_ROWS * 2.7 + nsteps * 1000.0) * 1e-9

    def to_device(self):
        import jax.numpy as jnp

        return MergeSellPlan(
            sell=self.sell.to_device(),
            idx=jnp.asarray(self.idx),
            region_off=jnp.asarray(self.region_off),
            band_nparts=jnp.asarray(self.band_nparts),
            band_part_base=jnp.asarray(self.band_part_base),
            rows=self.rows, num_bands=self.num_bands,
            step_slices=self.step_slices, step_parts=self.step_parts,
            band_rows=self.band_rows)


def build_merge_plan(a, *, stripe_width: int = 512,
                     band_rows: int = 1024,
                     value_dtype=np.float32,
                     max_window_blocks: int = 16,
                     window_group_tiles: int = 4,
                     groups_per_step: int = 64,
                     positions: int = 8,
                     lane_rows: int = 128) -> MergeSellPlan:
    """Build the band-interleaved striped layout + merge schedule."""
    if band_rows % 1024:
        raise ValueError("band_rows must be a multiple of 1024 (one "
                         "(8,128) output vreg per band)")
    csr = _as_csr(a)
    rows, cols_n = csr.shape
    indptr = np.asarray(csr.indptr, dtype=np.int64)
    indices = np.asarray(csr.indices, dtype=np.int64) & 0x3FFFFFFF
    data = np.asarray(csr.data)
    nnz = int(indptr[-1])
    R, P, B = lane_rows, positions, TILES_PER_STEP
    sw = stripe_width
    wg = window_group_tiles

    # --- 1. pieces: (row, stripe) runs -------------------------------------
    lens_row = np.diff(indptr)
    nz_row = np.repeat(np.arange(rows, dtype=np.int64), lens_row) \
        if nnz else np.zeros(0, np.int64)
    nz_stripe = indices // sw
    change = np.ones(nnz, dtype=bool)
    if nnz:
        change[1:] = (nz_row[1:] != nz_row[:-1]) | \
            (nz_stripe[1:] != nz_stripe[:-1])
    p_start = np.flatnonzero(change).astype(np.int64)
    p_len = np.diff(np.concatenate([p_start, [nnz]]))
    p_row = nz_row[p_start]
    p_stripe = nz_stripe[p_start]
    npieces = p_row.shape[0]

    # part index k = rank of the piece within its row
    first_of_row = np.ones(npieces, dtype=bool)
    if npieces:
        first_of_row[1:] = p_row[1:] != p_row[:-1]
    run_start = np.maximum.accumulate(
        np.where(first_of_row, np.arange(npieces), 0))
    p_k = np.arange(npieces, dtype=np.int64) - run_start
    p_band = p_row // band_rows
    maxp = int(p_k.max()) + 1 if npieces else 0

    # --- 2. order: (band, k, stripe, len desc) -----------------------------
    order = np.lexsort((-p_len, p_stripe, p_k, p_band))
    o_len = p_len[order]
    o_start = p_start[order]
    o_row = p_row[order]
    o_band = p_band[order]
    o_k = p_k[order]

    # --- 3. bands padded to slice boundaries, grouped into H-slice steps ---
    num_bands_raw = _cdiv(rows, band_rows)
    num_bands = _cdiv(max(1, num_bands_raw), BANDS_PER_STEP) * BANDS_PER_STEP
    band_count = np.bincount(o_band, minlength=num_bands).astype(np.int64)
    band_slices = np.maximum(1, _cdiv(band_count, R))     # >=1 per band
    gext = band_slices.reshape(-1, BANDS_PER_STEP).sum(axis=1)
    H = int(_cdiv(int(gext.max()), 8) * 8)
    nsteps = gext.shape[0]
    S = H * nsteps                                        # total slot rows
    # slice base of each band: groups H-aligned, bands packed in order
    band_slice_base = np.zeros(num_bands, dtype=np.int64)
    for g in range(nsteps):
        base = g * H
        for j in range(BANDS_PER_STEP):
            bidx = g * BANDS_PER_STEP + j
            band_slice_base[bidx] = base
            base += band_slices[bidx]

    # slot (slice, lane) of every ordered piece
    pos_in_band = np.zeros(npieces, dtype=np.int64)
    if npieces:
        band_first = np.searchsorted(o_band, np.arange(num_bands))
        pos_in_band = np.arange(npieces, dtype=np.int64) - \
            band_first[o_band]
    p_slice = band_slice_base[o_band] + pos_in_band // R
    p_lane = pos_in_band % R

    # --- 4. tiles ----------------------------------------------------------
    slice_maxlen = np.zeros(S, dtype=np.int64)
    np.maximum.at(slice_maxlen, p_slice, o_len)
    ntiles = np.maximum(1, _cdiv(slice_maxlen, P))
    tile_base = np.concatenate(([0], np.cumsum(ntiles)))
    T = int(tile_base[-1])
    step_tiles = B * max(1, groups_per_step)
    # honour the group size: T must be a multiple of wg and step_tiles
    T_pad = _cdiv(max(T, 1), step_tiles) * step_tiles
    pad_tiles = T_pad - T

    vals = np.zeros((T_pad, P, R), dtype=value_dtype)
    cols = np.zeros((T_pad, P, R), dtype=np.int32)
    live = np.zeros((T_pad, P, R), dtype=bool)
    if nnz:
        k = np.repeat(np.arange(npieces, dtype=np.int64), o_len)
        q = np.arange(k.shape[0], dtype=np.int64) - \
            np.repeat(np.cumsum(o_len) - o_len, o_len)
        src = np.repeat(o_start, o_len) + q
        t = tile_base[p_slice[k]] + q // P
        pp = q % P
        ll = p_lane[k]
        vals[t, pp, ll] = data[src].astype(value_dtype)
        cols[t, pp, ll] = indices[src].astype(np.int32)
        live[t, pp, ll] = True
    tile_slice = np.repeat(np.arange(S, dtype=np.int32), ntiles)
    if pad_tiles:
        tile_slice = np.concatenate(
            [tile_slice, np.full(pad_tiles, S - 1, np.int32)])
    T = T_pad

    # --- 5. per-group window bases (grain ladder, as build_sell_plan) ------
    flat_cols = cols.reshape(T // wg, -1)
    flat_valid = live.reshape(T // wg, -1)
    cmin = np.where(flat_valid, flat_cols,
                    np.iinfo(np.int32).max).min(axis=1)
    cmax = np.where(flat_valid, flat_cols, -1).max(axis=1)
    any_valid = cmax >= 0
    best = None
    for g in (32, 64, 128):
        wbg = np.where(any_valid, cmin, 0) // g
        span = np.where(any_valid, (cmax - wbg * g) // 128 + 1, 1)
        kg = int(span.max()) if T else 1
        cand = (kg, -g, g, wbg)
        if best is None or cand[:2] < best[:2]:
            best = cand
    K, _, grain, wb = best
    if K > max_window_blocks:
        raise ValueError(
            f"merge plan window needs K={K} > {max_window_blocks} blocks; "
            f"shrink stripe_width (got {sw}) or raise max_window_blocks")
    cols_win = compute_cols_win(live, cols, wb, K, wg, grain)
    window_rows = compute_window_rows(wb, K, cols_n, grain)

    stats = PlanStats(
        nnz=nnz, num_tiles=T, num_slices=S, num_subrows=npieces,
        num_splits=int((p_k > 0).sum()),
        num_stripes=int(nz_stripe.max()) + 1 if nnz else 1,
        padded_slots=T * P * R - nnz,
        fill=float(nnz) / float(T * P * R) if T else 0.0,
        window_blocks=K, max_window_base=int(wb.max()) if T else 0,
        groups_per_step=max(1, groups_per_step), pad_value=0.0,
        group_tiles=wg, window_grain=grain)

    row_map = np.full(S * R, rows, dtype=np.int32)   # unused by merge path
    sell = SellPlan(vals=vals, cols=cols, cols_win=cols_win,
                    tile_slice=tile_slice, window_base=wb.astype(np.int32),
                    row_map=row_map, window_rows=window_rows,
                    shape=(rows, cols_n), lane_rows=R, positions=P,
                    identity_map=False, stats=stats)

    # --- 6. merge schedule -------------------------------------------------
    # region of (band, k): slice range of its pieces
    RH = REGION_ROWS
    bk = o_band * maxp + o_k if npieces else np.zeros(0, np.int64)
    # pieces are (band, k)-contiguous in `order`
    reg_change = np.ones(npieces, dtype=bool)
    if npieces:
        reg_change[1:] = bk[1:] != bk[:-1]
    reg_first = np.flatnonzero(reg_change)
    reg_bk = bk[reg_first]
    nregions = reg_first.shape[0]
    reg_last = np.concatenate([reg_first[1:], [npieces]]) - 1
    reg_s0 = p_slice[reg_first]
    reg_s1 = p_slice[reg_last]
    if np.any(reg_s1 - reg_s0 + 1 > RH - 7):
        raise ValueError("merge region exceeds its gather window; "
                         "raise REGION_ROWS")

    # per-band part list (k ascending — regions are (band,k)-sorted)
    reg_band = reg_bk // maxp if maxp else reg_bk
    band_nparts = np.bincount(reg_band, minlength=num_bands).astype(np.int64)
    PB_band_base = np.concatenate(([0], np.cumsum(band_nparts)))
    # pad part rows per STEP to a fixed PB
    step_parts_count = band_nparts.reshape(-1, BANDS_PER_STEP).sum(axis=1)
    PB = max(1, int(step_parts_count.max()))
    Ptot = PB * nsteps

    idx = np.full((Ptot, 8, R), -1, dtype=np.int16)
    region_off = np.zeros(Ptot, dtype=np.int32)
    band_part_base = np.zeros(num_bands, dtype=np.int32)
    band_nparts_out = band_nparts.astype(np.int32)
    # step-relative packing of part rows
    prow_of_region = np.zeros(nregions, dtype=np.int64)
    for g in range(nsteps):
        prow = g * PB
        for j in range(BANDS_PER_STEP):
            bidx = g * BANDS_PER_STEP + j
            band_part_base[bidx] = prow - g * PB      # block-relative
            r0, r1 = PB_band_base[bidx], PB_band_base[bidx + 1]
            prow_of_region[r0:r1] = prow + np.arange(r1 - r0)
            prow += r1 - r0
    if npieces:
        step_of_band = np.arange(num_bands) // BANDS_PER_STEP
        reg_step = step_of_band[reg_band]
        # window start: region start slice aligned down to 8, clamped so
        # the RH-row window stays inside the step's H-slice block
        rel_s0 = reg_s0 - reg_step * H
        off = np.minimum((rel_s0 // 8) * 8, max(0, H - RH))
        region_off[prow_of_region] = off.astype(np.int32)
        # per-piece idx entries
        reg_of_piece = np.repeat(np.arange(nregions), np.diff(
            np.concatenate([reg_first, [npieces]])))
        prow_piece = prow_of_region[reg_of_piece]
        win0 = (reg_step * H + off)[reg_of_piece]
        val = (p_slice - win0) * R + p_lane
        if val.size and (val.min() < 0 or val.max() >= RH * R):
            raise AssertionError("merge idx out of window")
        r_local = o_row - o_band * band_rows
        # band_rows == 1024: one (8,128) grid per part row per 1024 rows;
        # wider bands stack extra (8,128) grids... v1 fixes band_rows=1024
        idx[prow_piece, r_local // R, r_local % R] = val.astype(np.int16)

    return MergeSellPlan(
        sell=sell, idx=idx, region_off=region_off,
        band_nparts=band_nparts_out,
        band_part_base=band_part_base.astype(np.int32),
        rows=rows, num_bands=num_bands, step_slices=H, step_parts=PB,
        band_rows=band_rows)

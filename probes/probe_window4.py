"""Probe: select-free (vals-split) + dual-alignment SELL window kernels.

Variants on the bench banded matrix (1M rows, 27 diagonals):
  A: current window kernel (reference point, ~42 Gnnz/s)
  B: vals-split K=3, 128-aligned windows — K gathers + K fma, no selects,
     no bucket compute; vals stream is K x wider
  D: vals-split K=2 via dual-alignment (64-shifted second x copy; per-group
     (1, 256) wide slice selected between the two copies)
  E: D with bf16 split vals (f32 accumulate)
"""
import functools
import time
import numpy as np
import jax
import jax.numpy as jnp
import scipy.sparse as sp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/spmv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import sys
sys.path.insert(0, "/root/repo")
from spmv_vector_cache_tpu.formats.convert import from_scipy
from spmv_vector_cache_tpu.formats.plan import auto_plan, WINDOW_GROUP_TILES
from spmv_vector_cache_tpu.ops.spmv_pallas import spmv_plan
from spmv_vector_cache_tpu.utils import roofline

print("devices:", jax.devices())

n = 1 << 20
ndiag = 27
rng = np.random.default_rng(0)
offs = list(range(-(ndiag // 2), ndiag // 2 + 1))
m = sp.spdiags(rng.standard_normal((ndiag, n)).astype(np.float32),
               offs, n, n).tocsr()
m.sort_indices()
a = from_scipy(m.astype(np.float32))
x0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
want = m.astype(np.float64) @ np.asarray(x0)
nnz = m.nnz

plan = auto_plan(a, allow_dia=False)
T, P, R = plan.vals.shape
WG = WINDOW_GROUP_TILES
print(f"plan: T={T} K={plan.stats.window_blocks} G={plan.stats.groups_per_step} "
      f"fill={plan.stats.fill:.3f}")

vals = np.asarray(plan.vals)
cols = np.asarray(plan.cols)
live = vals != 0

# ---- host prep for vals-split variants -------------------------------------
def group_minmax():
    fc = cols.reshape(T // WG, -1)
    fv = live.reshape(T // WG, -1)
    cmin = np.where(fv, fc, np.iinfo(np.int32).max).min(axis=1)
    cmax = np.where(fv, fc, -1).max(axis=1)
    anyv = cmax >= 0
    return np.where(anyv, cmin, 0), np.where(anyv, cmax, 0)

cmin, cmax = group_minmax()

def prep_split(align, K):
    """returns wb (in `align` units), vals_split (T, K*P, R), idx16, ok"""
    wb = cmin // align
    span = cmax - wb * align + 1
    assert span.max() <= K * 128, f"span {span.max()} > {K*128}"
    wb_tile = np.repeat(wb, WG)
    off = cols - (wb_tile * align)[:, None, None]
    off = np.where(live, off, 0)
    bucket = off >> 7
    idx = (off & 127).astype(np.int16)
    vs = np.zeros((T, K, P, R), np.float32)
    for b in range(K):
        vs[:, b] = np.where(bucket == b, vals, 0.0)
    return wb.astype(np.int32), vs.reshape(T, K * P, R), idx

# ---- kernels ----------------------------------------------------------------
def make_split_kernel_128(K, NG, P, R, WG):
    PAIR = 8 // WG
    def kernel(wb_ref, vals_ref, idx_ref, x_ref, out_ref):
        i = pl.program_id(0)
        v = vals_ref[...]                       # (NG*WG, K*P, R)
        idx = idx_ref[...].astype(jnp.int32)    # (NG*WG, P, R)
        def group(g):
            base = wb_ref[i * NG + g] * 128
            ix = idx[g * WG:(g + 1) * WG].reshape(WG * P, R)
            acc = None
            for b in range(K):
                start = pl.multiple_of(base + b * 128, 128)
                xb = x_ref[0:1, pl.ds(start, 128)]
                gb = jnp.take_along_axis(
                    jnp.broadcast_to(xb, (WG * P, 128)), ix,
                    axis=1).reshape(WG, P, R)
                vb = v[g * WG:(g + 1) * WG, b * P:(b + 1) * P]
                t = vb * gb
                acc = t if acc is None else acc + t
            return jnp.sum(acc, axis=1)
        for w in range(NG // PAIR):
            parts = [group(w * PAIR + j) for j in range(PAIR)]
            res = parts[0] if PAIR == 1 else jnp.concatenate(parts, axis=0)
            out_ref[w * 8:(w + 1) * 8, :] = res
    return kernel


def make_split_kernel_dual(K, NG, P, R, WG, vdtype):
    PAIR = 8 // WG
    def kernel(wb_ref, vals_ref, idx_ref, xa_ref, xb_ref, out_ref):
        i = pl.program_id(0)
        v = vals_ref[...]                       # (NG*WG, K*P, R)
        idx = idx_ref[...].astype(jnp.int32)
        def group(g):
            wb64 = wb_ref[i * NG + g]
            base = pl.multiple_of((wb64 >> 1) * 128, 128)
            wa = xa_ref[0:1, pl.ds(base, K * 128)]
            wbv = xb_ref[0:1, pl.ds(base, K * 128)]
            wide = jnp.where(wb64 % 2 == 0, wa, wbv)   # (1, K*128)
            ix = idx[g * WG:(g + 1) * WG].reshape(WG * P, R)
            acc = None
            for b in range(K):
                xb = wide[0:1, b * 128:(b + 1) * 128]
                gb = jnp.take_along_axis(
                    jnp.broadcast_to(xb, (WG * P, 128)), ix,
                    axis=1).reshape(WG, P, R)
                vb = v[g * WG:(g + 1) * WG, b * P:(b + 1) * P]
                t = vb.astype(jnp.float32) * gb if vdtype != jnp.float32 \
                    else vb * gb
                acc = t if acc is None else acc + t
            return jnp.sum(acc, axis=1)
        for w in range(NG // PAIR):
            parts = [group(w * PAIR + j) for j in range(PAIR)]
            res = parts[0] if PAIR == 1 else jnp.concatenate(parts, axis=0)
            out_ref[w * 8:(w + 1) * 8, :] = res
    return kernel


def run_variant(name, K, align, G, vdtype=jnp.float32):
    wb, vs, idx = prep_split(align, K)
    if align == 64:
        # dual-align feasibility: span from 64-aligned base <= K*128
        pass
    B = 8
    NG = (B * G) // WG
    nblocks = max(-(-n // 128), int(wb.max() * align + K * 128 + 127) // 128)
    xa = np.zeros((1, nblocks * 128 + 128), np.float32)
    xa[0, :n] = np.asarray(x0)
    xb = np.zeros_like(xa)
    xb[0, :-64] = xa[0, 64:]
    vs = vs.astype(vdtype)
    Tp = T
    assert Tp % (B * G) == 0, (Tp, B * G)

    vs_d = jnp.asarray(vs)
    idx_d = jnp.asarray(idx)
    wb_d = jnp.asarray(wb)
    xa_d = jnp.asarray(xa)
    xb_d = jnp.asarray(xb)

    if align == 128:
        kernel = make_split_kernel_128(K, NG, P, R, WG)
        in_specs = [
            pl.BlockSpec((B * G, K * P, R), lambda i, w: (i, 0, 0)),
            pl.BlockSpec((B * G, P, R), lambda i, w: (i, 0, 0)),
            pl.BlockSpec((1, xa.shape[1]), lambda i, w: (0, 0)),
        ]
        ops = (wb_d, vs_d, idx_d, xa_d)
    else:
        kernel = make_split_kernel_dual(K, NG, P, R, WG, vdtype)
        in_specs = [
            pl.BlockSpec((B * G, K * P, R), lambda i, w: (i, 0, 0)),
            pl.BlockSpec((B * G, P, R), lambda i, w: (i, 0, 0)),
            pl.BlockSpec((1, xa.shape[1]), lambda i, w: (0, 0)),
            pl.BlockSpec((1, xa.shape[1]), lambda i, w: (0, 0)),
        ]
        ops = (wb_d, vs_d, idx_d, xa_d, xb_d)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Tp // (B * G),),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((B * G, R), lambda i, w: (i, 0)),
    )

    @jax.jit
    def f(*ops):
        part = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((Tp, R), jnp.float32),
        )(*ops)
        # identity map on this plan: y = flat partial sums per slice
        y2d = jax.ops.segment_sum(part, jnp.asarray(plan.tile_slice),
                                  num_segments=plan.num_slices,
                                  indices_are_sorted=True)
        return y2d.reshape(-1)[:n]

    y = np.asarray(f(*ops))
    err = np.abs(y - want).max() / np.abs(want).max()

    def make(iters):
        @jax.jit
        def go(*ops):
            def body(_, vcarry):
                return f(*ops) * 0 + vcarry   # keep ops constant; time kernel
            # simpler: just chain f on x? f closes over x via ops; use scan of f
            return vcarry
        # use marginal timing over repeated f calls instead
        return None

    # marginal timing: chain by re-running f with same inputs inside fori_loop
    def make_chain(iters):
        @jax.jit
        def go(*ops):
            def body(_, acc):
                return acc + f(*ops)[0]
            return jax.lax.fori_loop(0, iters, body, 0.0)
        return lambda: go(*ops)

    dt = roofline.time_marginal(make_chain, i1=20, i2=60)
    gn = nnz / dt / 1e9
    bytes_per = (vs.itemsize * K + 2) / plan.stats.fill
    print(f"{name}: K={K} align={align} G={G} dtype={np.dtype(vdtype).name} "
          f"err={err:.2e}  {dt*1e3:.3f} ms -> {gn:.1f} Gnnz/s "
          f"(~{bytes_per:.1f} B/nnz -> {gn*bytes_per:.0f} GB/s)")
    return gn


# A: current
def make_cur(iters):
    pd = plan.to_device()
    @jax.jit
    def go(p, x):
        def body(_, v):
            return spmv_plan(p, v, strategy="window")
        return jax.lax.fori_loop(0, iters, body, x)[:1]
    return lambda: go(pd, x0)

dtA = roofline.time_marginal(make_cur, i1=20, i2=60)
print(f"A current: {dtA*1e3:.3f} ms -> {nnz/dtA/1e9:.1f} Gnnz/s")

span128 = (cmax - (cmin // 128) * 128 + 1).max()
span64 = (cmax - (cmin // 64) * 64 + 1).max()
print(f"max span from 128-aligned base: {span128}; from 64-aligned: {span64}")

K128 = int(-(-span128 // 128))
K64 = int(-(-span64 // 128))
run_variant("B split128", K128, 128, 16)
run_variant("B split128 G32", K128, 128, 32)
if K64 < K128:
    run_variant("D dual64", K64, 64, 16)
    run_variant("D dual64 G32", K64, 64, 32)
    run_variant("E dual64 bf16", K64, 64, 32, vdtype=jnp.bfloat16)
run_variant("E split128 bf16", K128, 128, 32, vdtype=jnp.bfloat16)

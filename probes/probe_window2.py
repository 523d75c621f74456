"""Probe: faster SELL window kernels.

A: current kernel, G sweep.
B: per-4-tile window base (K often halves) + paired 8-row writes +
   gather-all-then-select-once accumulation.
C: current grouping (B=8) but gather-all-then-select-once.
"""
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
from spmv_vector_cache_tpu.formats.plan import build_sell_plan
from spmv_vector_cache_tpu.ops.spmv_pallas import spmv_plan, _reduce_partials

print("devices:", jax.devices())


def sync(x):
    return float(np.asarray(x).ravel()[0])


def timeit_total(fn, repeats=3):
    sync(fn())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sync(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def marginal(make_chain, i1=20, i2=60):
    return (timeit_total(make_chain(i2)) - timeit_total(make_chain(i1))) / (i2 - i1)


n = 1 << 20
ndiag = 27
rng = np.random.default_rng(0)
offs = list(range(-(ndiag // 2), ndiag // 2 + 1))
m = sp.spdiags(rng.standard_normal((ndiag, n)).astype(np.float32), offs, n, n).tocsr()
m.sort_indices()
a = from_scipy(m.astype(np.float32))
x0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
want = m.astype(np.float64) @ np.asarray(x0)
nnz = m.nnz


def chain_of(fn, *operands):
    def make(iters):
        @jax.jit
        def go(x, *ops):
            return jax.lax.fori_loop(0, iters, lambda i, v: fn(v, *ops), x)[:1]
        return lambda: go(x0, *operands)
    return make


plan = build_sell_plan(a)
T, P, R = plan.vals.shape
print(f"plan: T={T} K={plan.stats.window_blocks} fill={plan.stats.fill:.3f}")

# --- A: G sweep on current kernel -------------------------------------------
for G in (16, 128):
    p2 = build_sell_plan(a, groups_per_step=G).to_device()
    dt = marginal(chain_of(lambda v, p: spmv_plan(p, v, strategy="window"), p2))
    print(f"A window G={G}: {dt*1e3:.3f} ms -> {nnz/dt/1e9:.1f} Gnnz/s", flush=True)

# --- recompute per-Bg-tile window bases on the host --------------------------
def regroup(plan, Bg):
    vals = np.asarray(plan.vals)
    cols = np.asarray(plan.cols)
    Tt = vals.shape[0]
    fc = cols.reshape(Tt // Bg, -1)
    fv = (vals.reshape(Tt // Bg, -1) != 0)
    cmin = np.where(fv, fc, np.iinfo(np.int32).max).min(axis=1)
    cmax = np.where(fv, fc, -1).max(axis=1)
    ok = cmax >= 0
    wb = np.where(ok, cmin, 0) // 128
    K = int(np.where(ok, cmax // 128 - wb + 1, 1).max())
    wbt = np.repeat(wb, Bg)
    off = cols.astype(np.int64) - (wbt * 128)[:, None, None]
    off = np.where(vals != 0, off, 0)
    return jnp.asarray(vals), jnp.asarray(off.astype(np.int16)), \
        jnp.asarray(wb.astype(np.int32)), K, int(wb.max())


# --- B/C kernels: gather-all-then-select-once --------------------------------
def make_kernel(K, G, Bg, P, R):
    """Per grid step: G groups of Bg tiles; group g uses window block
    wb[i*G+g] .. +K-1 from the resident x; gathers each block once and
    selects among gathered values, then one FMA + sublane sum."""
    PAIR = max(1, 8 // Bg)          # groups per 8-row write

    def kernel(wb_ref, vals_ref, cols_ref, x_ref, out_ref):
        i = pl.program_id(0)

        def group(g):
            v = vals_ref[g * Bg:(g + 1) * Bg]            # (Bg, P, R)
            cw = cols_ref[g * Bg:(g + 1) * Bg].astype(jnp.int32)
            bucket = jax.lax.shift_right_logical(cw, 7)
            idx = jnp.bitwise_and(cw, 127).reshape(Bg * P, R)
            base = wb_ref[i * G + g] * 128
            gat = None
            for b in range(K):
                start = pl.multiple_of(base + b * 128, 128)
                xb = x_ref[0:1, pl.ds(start, 128)]
                gb = jnp.take_along_axis(
                    jnp.broadcast_to(xb, (Bg * P, 128)), idx,
                    axis=1).reshape(Bg, P, R)
                gat = gb if gat is None else \
                    jnp.where(bucket == b, gb, gat)
            return jnp.sum(v * gat, axis=1)              # (Bg, R)

        for w in range(G // PAIR):
            parts = [group(w * PAIR + j) for j in range(PAIR)]
            res = parts[0] if PAIR == 1 else jnp.concatenate(parts, axis=0)
            out_ref[w * 8:(w + 1) * 8, :] = res

    return kernel


def run_variant(tag, Bg, G):
    vals, cw, wb, K, maxwb = regroup(plan, Bg)
    Tt = vals.shape[0]
    step = Bg * G
    if Tt % step:
        pad = step - Tt % step
        vals = jnp.concatenate([vals, jnp.zeros((pad, P, R), vals.dtype)])
        cw = jnp.concatenate([cw, jnp.zeros((pad, P, R), cw.dtype)])
        wb = jnp.concatenate([wb, jnp.zeros(pad // Bg, wb.dtype)])
        Tt += pad
    nblocks = max(-(-n // 128), maxwb + K)
    print(f"{tag}: Bg={Bg} G={G} K={K} T={Tt}", flush=True)

    def spmv(x, vals, cw, wb):
        xp = jnp.zeros((1, nblocks * 128), jnp.float32)
        xp = xp.at[0, :n].set(x)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Tt // step,),
            in_specs=[
                pl.BlockSpec((step, P, R), lambda i, w: (i, 0, 0)),
                pl.BlockSpec((step, P, R), lambda i, w: (i, 0, 0)),
                pl.BlockSpec((1, nblocks * 128), lambda i, w: (0, 0)),
            ],
            out_specs=pl.BlockSpec((step, R), lambda i, w: (i, 0)),
        )
        partials = pl.pallas_call(
            make_kernel(K, G, Bg, P, R),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((Tt, R), jnp.float32),
        )(wb, vals, cw, xp)
        # tile_slice fold (reuse plan reduce on the unpadded prefix)
        return _reduce_partials(plan, partials[:T])

    y = np.asarray(jax.jit(spmv)(x0, vals, cw, wb))
    err = np.abs(y - want).max() / np.abs(want).max()
    dt = marginal(chain_of(lambda v, vals, cw, wb: spmv(v, vals, cw, wb),
                           vals, cw, wb))
    print(f"{tag}: err {err:.3g}, {dt*1e3:.3f} ms -> {nnz/dt/1e9:.1f} Gnnz/s",
          flush=True)


run_variant("B bg4", 4, 128)
run_variant("C bg8", 8, 64)

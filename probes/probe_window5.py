"""Probe: select-free (vals-split) SELL window kernels, proper chained timing.

B: vals-split K=3, 128-aligned. D: vals-split K=2 dual-alignment.
E: bf16 variants. Timing chains power iterations through x (data dependence
prevents hoisting).
"""
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
fc = cols.reshape(T // WG, -1)
fv = live.reshape(T // WG, -1)
cmin_ = np.where(fv, fc, np.iinfo(np.int32).max).min(axis=1)
cmax_ = np.where(fv, fc, -1).max(axis=1)
anyv = cmax_ >= 0
cmin = np.where(anyv, cmin_, 0)
cmax = np.where(anyv, cmax_, 0)
ts_d = jnp.asarray(plan.tile_slice)


def prep_split(align, K, vdtype):
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
    return wb.astype(np.int32), vs.reshape(T, K * P, R).astype(vdtype), idx


def make_split_kernel(K, NG, P, R, WG, dual, f32acc):
    PAIR = 8 // WG

    def kernel(wb_ref, vals_ref, idx_ref, *rest):
        if dual:
            xa_ref, xb_ref, out_ref = rest
        else:
            xa_ref, out_ref = rest
        i = pl.program_id(0)
        v = vals_ref[...]
        idx = idx_ref[...].astype(jnp.int32)

        def group(g):
            ix = idx[g * WG:(g + 1) * WG].reshape(WG * P, R)
            if dual:
                wb64 = wb_ref[i * NG + g]
                base = pl.multiple_of((wb64 >> 1) * 128, 128)
                even = (wb64 & 1) == 0
            else:
                base = pl.multiple_of(wb_ref[i * NG + g] * 128, 128)
            acc = None
            for b in range(K):
                start = pl.multiple_of(base + b * 128, 128)
                xa_b = jnp.broadcast_to(xa_ref[0:1, pl.ds(start, 128)],
                                        (WG * P, 128))
                if dual:
                    xb_b = jnp.broadcast_to(xb_ref[0:1, pl.ds(start, 128)],
                                            (WG * P, 128))
                    src = jnp.where(even, xa_b, xb_b)
                else:
                    src = xa_b
                gb = jnp.take_along_axis(src, ix, axis=1).reshape(WG, P, R)
                vb = v[g * WG:(g + 1) * WG, b * P:(b + 1) * P]
                if f32acc and vb.dtype != jnp.float32:
                    vb = vb.astype(jnp.float32)
                t = vb * gb
                acc = t if acc is None else acc + t
            return jnp.sum(acc, axis=1)

        for w in range(NG // PAIR):
            parts = [group(w * PAIR + j) for j in range(PAIR)]
            res = parts[0] if PAIR == 1 else jnp.concatenate(parts, axis=0)
            out_ref[w * 8:(w + 1) * 8, :] = res
    return kernel


def run_variant(name, K, align, G, vdtype=jnp.float32):
    wb, vs, idx = prep_split(align, K, vdtype)
    B = 8
    NG = (B * G) // WG
    dual = align == 64
    nlanes = max(n, int(wb.max() * align + K * 128)) + 128
    nlanes = -(-nlanes // 128) * 128
    assert T % (B * G) == 0

    vs_d, idx_d, wb_d = jnp.asarray(vs), jnp.asarray(idx), jnp.asarray(wb)
    kernel = make_split_kernel(K, NG, P, R, WG, dual, True)
    x_spec = pl.BlockSpec((1, nlanes), lambda i, w: (0, 0))
    in_specs = [
        pl.BlockSpec((B * G, K * P, R), lambda i, w: (i, 0, 0)),
        pl.BlockSpec((B * G, P, R), lambda i, w: (i, 0, 0)),
        x_spec,
    ] + ([x_spec] if dual else [])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T // (B * G),),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((B * G, R), lambda i, w: (i, 0)),
    )

    def f(wb_a, vs_a, idx_a, ts_a, x):
        xa = jnp.zeros((1, nlanes), jnp.float32).at[0, :n].set(x)
        ops = [wb_a, vs_a, idx_a, xa]
        if dual:
            xb = jnp.zeros((1, nlanes), jnp.float32)
            xb = xb.at[0, :nlanes - 64].set(xa[0, 64:])
            ops.append(xb)
        part = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((T, R), jnp.float32),
        )(*ops)
        y2d = jax.ops.segment_sum(part, ts_a, num_segments=plan.num_slices,
                                  indices_are_sorted=True)
        return y2d.reshape(-1)[:n]

    y = np.asarray(jax.jit(f)(wb_d, vs_d, idx_d, ts_d, x0))
    err = np.abs(y - want).max() / np.abs(want).max()

    def make_chain(iters):
        @jax.jit
        def go(wb_a, vs_a, idx_a, ts_a, x):
            def body(_, v):
                w = f(wb_a, vs_a, idx_a, ts_a, v)
                return w / jnp.maximum(jnp.linalg.norm(w), 1e-30)
            return jax.lax.fori_loop(0, iters, body, x)[:1]
        return lambda: go(wb_d, vs_d, idx_d, ts_d, x0)

    dt = roofline.time_marginal(make_chain, i1=20, i2=80)
    gn = nnz / dt / 1e9
    bpn = (np.dtype(vdtype).itemsize * K + 2) / plan.stats.fill
    print(f"{name}: K={K} align={align} G={G} {np.dtype(vdtype).name} "
          f"err={err:.2e}  {dt*1e3:.3f} ms -> {gn:.1f} Gnnz/s "
          f"(~{bpn:.1f} B/nnz -> {gn*bpn:.0f} GB/s)", flush=True)
    return gn


span128 = int((cmax - (cmin // 128) * 128 + 1).max())
span64 = int((cmax - (cmin // 64) * 64 + 1).max())
K128, K64 = -(-span128 // 128), -(-span64 // 128)
print(f"spans: 128-aligned {span128} (K={K128}), 64-aligned {span64} (K={K64})")


run_variant("B split128 G32", K128, 128, 32)
if K64 < K128:

    run_variant("D dual64 G32", K64, 64, 32)
    run_variant("E dual64 bf16 G32", K64, 64, 32, vdtype=jnp.bfloat16)
run_variant("E split128 bf16 G32", K128, 128, 32, vdtype=jnp.bfloat16)

"""Probe: manual once-only DMA of resident x into VMEM scratch.

Hypothesis from probe_window5: under PrefetchScalarGridSpec the constant-
indexed resident x block is re-fetched every grid step (~4.5 MB x 64 steps
= 288 MB/iter), dominating the window kernel. Variants here stage x via
pltpu.make_async_copy into a persistent VMEM scratch on step 0.

H1: select scheme (current merge), manual x, f32
H2: split scheme dual64 (K=2), manual xa+xb, f32
H3: H2 with bf16 vals
H4: H1 with bf16 vals
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
print(f"plan: T={T} K={plan.stats.window_blocks} fill={plan.stats.fill:.3f}",
      flush=True)

vals = np.asarray(plan.vals)
cols = np.asarray(plan.cols)
live = vals != 0
fc = cols.reshape(T // WG, -1)
fv = live.reshape(T // WG, -1)
anyv = np.where(fv, fc, -1).max(axis=1) >= 0
cmin = np.where(anyv, np.where(fv, fc, np.iinfo(np.int32).max).min(axis=1), 0)
cmax = np.where(anyv, np.where(fv, fc, -1).max(axis=1), 0)
ts_d = jnp.asarray(plan.tile_slice)
cw_d = jnp.asarray(plan.cols_win)
wb_sel_d = jnp.asarray(plan.window_base)
vals_d = jnp.asarray(plan.vals)


def prep_split(align, K, vdtype):
    wb = cmin // align
    span = cmax - wb * align + 1
    assert span.max() <= K * 128
    wb_tile = np.repeat(wb, WG)
    off = np.where(live, cols - (wb_tile * align)[:, None, None], 0)
    bucket = off >> 7
    idx = (off & 127).astype(np.int16)
    vs = np.zeros((T, K, P, R), np.float32)
    for b in range(K):
        vs[:, b] = np.where(bucket == b, vals, 0.0)
    return (wb.astype(np.int32), jnp.asarray(vs.reshape(T, K * P, R)
                                             .astype(vdtype)),
            jnp.asarray(idx))


def stage(i, hbm_ref, scratch, sem):
    @pl.when(i == 0)
    def _():
        cp = pltpu.make_async_copy(hbm_ref, scratch, sem)
        cp.start()
        cp.wait()


def make_select_kernel(K, NG, G):
    PAIR = 8 // WG

    def kernel(wb_ref, vals_ref, cw_ref, x_hbm, out_ref, xs, sem):
        i = pl.program_id(0)
        stage(i, x_hbm, xs, sem)
        v = vals_ref[...]
        cw = cw_ref[...].astype(jnp.int32)

        def group(g):
            base = wb_ref[i * NG + g] * 128
            vg = v[g * WG:(g + 1) * WG]
            cg = cw[g * WG:(g + 1) * WG]
            bucket = jax.lax.shift_right_logical(cg, 7)
            ix = jnp.bitwise_and(cg, 127).reshape(WG * P, R)
            gat = None
            for b in range(K):
                start = pl.multiple_of(base + b * 128, 128)
                xb = jnp.broadcast_to(xs[0:1, pl.ds(start, 128)],
                                      (WG * P, 128))
                gb = jnp.take_along_axis(xb, ix, axis=1).reshape(WG, P, R)
                gat = gb if gat is None else jnp.where(bucket == b, gb, gat)
            return jnp.sum(vg * gat, axis=1)

        for w in range(NG // PAIR):
            parts = [group(w * PAIR + j) for j in range(PAIR)]
            out_ref[w * 8:(w + 1) * 8, :] = jnp.concatenate(parts, axis=0) \
                if PAIR > 1 else parts[0]
    return kernel


def make_split_kernel(K, NG, dual):
    PAIR = 8 // WG

    def kernel(wb_ref, vals_ref, idx_ref, xa_hbm, *rest):
        if dual:
            xb_hbm, out_ref, xa_s, xb_s, sem_a, sem_b = rest
        else:
            (out_ref, xa_s, sem_a) = rest
        i = pl.program_id(0)
        stage(i, xa_hbm, xa_s, sem_a)
        if dual:
            stage(i, xb_hbm, xb_s, sem_b)
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
                src = jnp.broadcast_to(xa_s[0:1, pl.ds(start, 128)],
                                       (WG * P, 128))
                if dual:
                    srcb = jnp.broadcast_to(xb_s[0:1, pl.ds(start, 128)],
                                            (WG * P, 128))
                    src = jnp.where(even, src, srcb)
                gb = jnp.take_along_axis(src, ix, axis=1).reshape(WG, P, R)
                vb = v[g * WG:(g + 1) * WG, b * P:(b + 1) * P]
                if vb.dtype != jnp.float32:
                    vb = vb.astype(jnp.float32)
                t = vb * gb
                acc = t if acc is None else acc + t
            return jnp.sum(acc, axis=1)

        for w in range(NG // PAIR):
            parts = [group(w * PAIR + j) for j in range(PAIR)]
            out_ref[w * 8:(w + 1) * 8, :] = jnp.concatenate(parts, axis=0) \
                if PAIR > 1 else parts[0]
    return kernel


def run(name, scheme, G, K, align, vdtype=jnp.float32):
    B = 8
    NG = (B * G) // WG
    dual = align == 64
    if scheme == "split":
        wb, vs_d, idx_d = prep_split(align, K, vdtype)
        wb_d = jnp.asarray(wb)
        nlanes = -(-max(n, int(wb.max() * align + K * 128)) // 128) * 128 + 128
    else:
        wb_d = wb_sel_d
        vs_d = vals_d.astype(vdtype)
        idx_d = cw_d
        nlanes = -(-max(n, int((np.asarray(plan.window_base).max() + K) * 128))
                   // 128) * 128 + 128
    assert T % (B * G) == 0

    scratch = [pltpu.VMEM((1, nlanes), jnp.float32),
               pltpu.SemaphoreType.DMA]
    if scheme == "split" and dual:
        scratch = [pltpu.VMEM((1, nlanes), jnp.float32),
                   pltpu.VMEM((1, nlanes), jnp.float32),
                   pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA]
        kernel = make_split_kernel(K, NG, True)
    elif scheme == "split":
        kernel = make_split_kernel(K, NG, False)
    else:
        kernel = make_select_kernel(K, NG, G)

    VP = vs_d.shape[1]
    x_hbm_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    in_specs = [
        pl.BlockSpec((B * G, VP, R), lambda i, w: (i, 0, 0)),
        pl.BlockSpec((B * G, P, R), lambda i, w: (i, 0, 0)),
        x_hbm_spec,
    ] + ([x_hbm_spec] if (scheme == "split" and dual) else [])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T // (B * G),),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((B * G, R), lambda i, w: (i, 0)),
        scratch_shapes=scratch,
    )

    def f(wb_a, vs_a, idx_a, ts_a, x):
        xa = jnp.zeros((1, nlanes), jnp.float32).at[0, :n].set(x)
        ops = [wb_a, vs_a, idx_a, xa]
        if scheme == "split" and dual:
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
    print(f"{name}: K={K} G={G} {np.dtype(vdtype).name} err={err:.2e}  "
          f"{dt*1e3:.3f} ms -> {gn:.1f} Gnnz/s", flush=True)
    return gn


span64 = int((cmax - (cmin // 64) * 64 + 1).max())
K64 = -(-span64 // 128)
K128 = plan.stats.window_blocks
print(f"K128={K128} K64={K64}", flush=True)

run("H1 select manual-x", "select", 64, K128, 128)
run("H4 select manual-x bf16", "select", 64, K128, 128, vdtype=jnp.bfloat16)
if K64 < K128:
    run("H2 split dual64 manual-x", "split", 32, K64, 64)
    run("H3 split dual64 manual-x bf16", "split", 32, K64, 64,
        vdtype=jnp.bfloat16)

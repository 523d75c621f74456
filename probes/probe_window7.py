"""Probe: is PrefetchScalarGridSpec the window-kernel bottleneck?

All on the bench banded matrix, G=64 (64 grid steps):
F3: plain grid, stream vals+idx, multiply by a STATIC x slice, no gather
    -> pure stream/pipeline floor
F5: plain grid, K=1 gather with static base (wrong result, timing only)
F1: plain grid, full select-merge K=3, static base 0 (wrong result)
F4: plain grid, wb via SMEM operand, full select-merge K=3 (CORRECT)
F4s: F4 with split scheme K=2 dual64 (CORRECT)
G sweep on F4.
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
wb_sel = np.asarray(plan.window_base).astype(np.int32)
vals_d = jnp.asarray(plan.vals)
K128 = plan.stats.window_blocks


def prep_split(align, K):
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
    return wb.astype(np.int32), jnp.asarray(vs.reshape(T, K * P, R)), \
        jnp.asarray(idx)


def body_select(K, NG, get_base, v, cw, xs):
    def group(g):
        base = get_base(g)
        vg = v[g * WG:(g + 1) * WG]
        cg = cw[g * WG:(g + 1) * WG]
        bucket = jax.lax.shift_right_logical(cg, 7)
        ix = jnp.bitwise_and(cg, 127).reshape(WG * P, R)
        gat = None
        for b in range(K):
            start = pl.multiple_of(base + b * 128, 128)
            xb = jnp.broadcast_to(xs[0:1, pl.ds(start, 128)], (WG * P, 128))
            gb = jnp.take_along_axis(xb, ix, axis=1).reshape(WG, P, R)
            gat = gb if gat is None else jnp.where(bucket == b, gb, gat)
        return jnp.sum(vg * gat, axis=1)
    return group


def run(name, mode, G, K=K128, align=128):
    B = 8
    NG = (B * G) // WG
    PAIR = 8 // WG
    assert T % (B * G) == 0
    if mode == "split_smem":
        wb, vs_d, idx_d = prep_split(align, K)
        VP = vs_d.shape[1]
    else:
        wb, vs_d, idx_d = wb_sel, vals_d, cw_d
        VP = P
    nlanes = -(-max(n, int(wb.max() * align + K * 128)) // 128) * 128 + 128
    wb_d = jnp.asarray(wb)
    dual = align == 64

    def kernel(*refs):
        if mode in ("f3", "f5", "f1"):
            v_ref, cw_ref, x_ref, out_ref = refs
            wb_ref = None
        elif mode == "select_smem":
            wb_ref, v_ref, cw_ref, x_ref, out_ref = refs
        else:  # split_smem
            if dual:
                wb_ref, v_ref, cw_ref, x_ref, xb_ref, out_ref = refs
            else:
                wb_ref, v_ref, cw_ref, x_ref, out_ref = refs
        i = pl.program_id(0)
        v = v_ref[...]
        if mode == "f3":
            xs = jnp.broadcast_to(x_ref[0:1, 0:128], (1, P, R))
            acc = jnp.sum(v * xs, axis=1)
            cw = cw_ref[...]
            acc = acc + jnp.sum(cw.astype(jnp.float32), axis=1) * 1e-30
            out_ref[...] = acc
            return
        cw = cw_ref[...].astype(jnp.int32)
        if mode == "f5":
            def group(g):
                ix = jnp.bitwise_and(cw[g * WG:(g + 1) * WG], 127)\
                    .reshape(WG * P, R)
                xb = jnp.broadcast_to(x_ref[0:1, 0:128], (WG * P, 128))
                gb = jnp.take_along_axis(xb, ix, axis=1).reshape(WG, P, R)
                return jnp.sum(v[g * WG:(g + 1) * WG] * gb, axis=1)
        elif mode == "f1":
            group = body_select(K, NG, lambda g: 0, v, cw, x_ref)
        elif mode == "select_smem":
            group = body_select(K, NG, lambda g: wb_ref[g] * 128, v, cw,
                                x_ref)
        else:  # split_smem
            def group(g):
                ix = cw[g * WG:(g + 1) * WG].reshape(WG * P, R)
                if dual:
                    wb64 = wb_ref[g]
                    base = pl.multiple_of((wb64 >> 1) * 128, 128)
                    even = (wb64 & 1) == 0
                else:
                    base = pl.multiple_of(wb_ref[g] * 128, 128)
                acc = None
                for b in range(K):
                    start = pl.multiple_of(base + b * 128, 128)
                    src = jnp.broadcast_to(x_ref[0:1, pl.ds(start, 128)],
                                           (WG * P, 128))
                    if dual:
                        srcb = jnp.broadcast_to(
                            xb_ref[0:1, pl.ds(start, 128)], (WG * P, 128))
                        src = jnp.where(even, src, srcb)
                    gb = jnp.take_along_axis(src, ix, axis=1)\
                        .reshape(WG, P, R)
                    vb = v[g * WG:(g + 1) * WG, b * P:(b + 1) * P]
                    t = vb * gb
                    acc = t if acc is None else acc + t
                return jnp.sum(acc, axis=1)

        for w in range(NG // PAIR):
            parts = [group(w * PAIR + j) for j in range(PAIR)]
            out_ref[w * 8:(w + 1) * 8, :] = jnp.concatenate(parts, axis=0) \
                if PAIR > 1 else parts[0]

    x_spec = pl.BlockSpec((1, nlanes), lambda i: (0, 0))
    smem_spec = pl.BlockSpec((NG,), lambda i: (i,),
                             memory_space=pltpu.SMEM)
    in_specs = [
        pl.BlockSpec((B * G, VP, R), lambda i: (i, 0, 0)),
        pl.BlockSpec((B * G, P, R), lambda i: (i, 0, 0)),
        x_spec,
    ]
    nops = 3
    if mode in ("select_smem", "split_smem"):
        in_specs = [smem_spec] + in_specs
        nops = 4
    if mode == "split_smem" and dual:
        in_specs.append(x_spec)
        nops = 5

    def f(wb_a, vs_a, idx_a, ts_a, x):
        xa = jnp.zeros((1, nlanes), jnp.float32).at[0, :n].set(x)
        ops = [vs_a, idx_a, xa]
        if mode in ("select_smem", "split_smem"):
            ops = [wb_a] + ops
        if mode == "split_smem" and dual:
            xb = jnp.zeros((1, nlanes), jnp.float32)
            xb = xb.at[0, :nlanes - 64].set(xa[0, 64:])
            ops.append(xb)
        part = pl.pallas_call(
            kernel, grid=(T // (B * G),),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((B * G, R), lambda i: (i, 0)),
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
    print(f"{name}: G={G} K={K} err={err:.2e}  {dt*1e3:.3f} ms -> "
          f"{gn:.1f} Gnnz/s", flush=True)
    return gn


span64 = int((cmax - (cmin // 64) * 64 + 1).max())
K64 = -(-span64 // 128)

run("F3 stream-floor", "f3", 64)
run("F5 K=1 gather", "f5", 64)
run("F1 select static", "f1", 64)
run("F4 select smem-wb", "select_smem", 64)
run("F4 select smem-wb G16", "select_smem", 16)
if K64 < K128:
    run("F4s split dual64 smem-wb", "split_smem", 32, K=K64, align=64)

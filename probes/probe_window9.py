"""Probe W2: zero-dynamic-addressing window kernel.

Layout: split-16 row-major (64 rows / 128-subrow slice, group = 2 tiles).
x windows are PRE-GATHERED by one XLA row-take into xw (ngroups, 2*128)
and streamed as a regular grid operand; the kernel's only x accesses are
STATIC slices of its block.  Offsets are uint8 (idx in [0,256)).

Variants:
  w2sel  : 2 gathers from the static 128-halves + bucket select
  w2g256 : single take_along_axis over the 256-lane row (Mosaic may split)
  w2sel_i16: int16 offsets (isolate the uint8 win)
"""
import numpy as np
import scipy.sparse as sp
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/spmv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from spmv_vector_cache_tpu.utils import roofline

P, R = 8, 128
STEP_TILES = 512

n = 1 << 20
ndiag = 27
rng = np.random.default_rng(0)
offs = list(range(-(ndiag // 2), ndiag // 2 + 1))
m = sp.spdiags(rng.standard_normal((ndiag, n)).astype(np.float32),
               offs, n, n).tocsr()
m.sort_indices()
nnz = m.nnz
x0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
want = m.astype(np.float64) @ np.asarray(x0)

indptr = m.indptr.astype(np.int64)
indices = m.indices.astype(np.int64)
data = m.data

split, wg = 16, 2
parts = -(-int(np.diff(indptr).max()) // split)
rps = R // parts                       # rows per slice
nslices = -(-n // rps)
tps = -(-split // P)                   # tiles per slice
assert tps == wg
T0 = nslices * tps
lens = np.diff(indptr)
r_all = np.repeat(np.arange(n, dtype=np.int64), lens)
q_all = np.arange(nnz, dtype=np.int64) - np.repeat(indptr[:-1], lens)
part = q_all // split
pos = q_all % split
s_idx = r_all // rps
lane = (r_all % rps) + part * rps
t_idx = s_idx * tps + pos // P
p_idx = pos % P
vals = np.zeros((T0, P, R), np.float32)
cols = np.zeros((T0, P, R), np.int64)
live = np.zeros((T0, P, R), bool)
vals[t_idx, p_idx, lane] = data
cols[t_idx, p_idx, lane] = indices
live[t_idx, p_idx, lane] = True
padT = (-T0) % STEP_TILES
T = T0 + padT
if padT:
    vals = np.concatenate([vals, np.zeros((padT, P, R), np.float32)])
    cols = np.concatenate([cols, np.zeros((padT, P, R), np.int64)])
    live = np.concatenate([live, np.zeros((padT, P, R), bool)])
ngroups = T // wg
NG = STEP_TILES // wg
fc = cols.reshape(ngroups, -1)
fv = live.reshape(ngroups, -1)
anyv = fv.any(axis=1)
cmin = np.where(anyv, np.where(fv, fc, 1 << 60).min(axis=1), 0)
cmax = np.where(anyv, np.where(fv, fc, -1).max(axis=1), 0)
wb = (cmin // 128).astype(np.int64)
rel = cols - np.repeat(wb * 128, wg)[:, None, None]
rel = np.where(live, rel, 0)
assert rel.min() >= 0 and rel.max() < 256, (rel.min(), rel.max())
K = 2
nb = -(-n // 128) + K
wbpair = np.stack([np.minimum(wb + j, nb - 1) for j in range(K)],
                  axis=1).astype(np.int32).reshape(-1)   # (ngroups*K,)

vals_d = jnp.asarray(vals)
cw8_d = jnp.asarray(rel.astype(np.uint8))
cw16_d = jnp.asarray(rel.astype(np.int16))
wbp_d = jnp.asarray(wbpair)
print(f"T={T} ngroups={ngroups} span={(cmax-cmin+1).max()}", flush=True)


def run(name, mode, cw_d):
    def kernel(v_ref, c_ref, xw_ref, o_ref):
        v = v_ref[...]
        cw = c_ref[...].astype(jnp.int32)

        def group(g):
            vg = v[g * wg:(g + 1) * wg].reshape(wg * P, R)
            ix = cw[g * wg:(g + 1) * wg].reshape(wg * P, R)
            if mode == "g256":
                row = xw_ref[g:g + 1, :]                     # (1, 256)
                gat = jnp.take_along_axis(
                    jnp.broadcast_to(row, (wg * P, 2 * R)), ix, axis=1)
            else:
                w0 = xw_ref[g:g + 1, 0:128]
                w1 = xw_ref[g:g + 1, 128:256]
                bucket = jax.lax.shift_right_logical(ix, 7)
                i0 = jnp.bitwise_and(ix, 127)
                g0 = jnp.take_along_axis(
                    jnp.broadcast_to(w0, (wg * P, 128)), i0, axis=1)
                g1 = jnp.take_along_axis(
                    jnp.broadcast_to(w1, (wg * P, 128)), i0, axis=1)
                gat = jnp.where(bucket == 0, g0, g1)
            return jnp.sum(vg * gat, axis=0)[None, :]

        for ws in range(NG // 8):
            o_ref[ws * 8:(ws + 1) * 8, :] = jnp.concatenate(
                [group(ws * 8 + j) for j in range(8)], axis=0)

    def f(v_a, c_a, wbp, x):
        x2d = jnp.zeros((nb * 128,), jnp.float32).at[:n].set(x).reshape(
            nb, 128)
        xw = jnp.take(x2d, wbp, axis=0).reshape(ngroups, K * 128)
        out = pl.pallas_call(
            kernel, grid=(T // STEP_TILES,),
            in_specs=[
                pl.BlockSpec((STEP_TILES, P, R), lambda i: (i, 0, 0)),
                pl.BlockSpec((STEP_TILES, P, R), lambda i: (i, 0, 0)),
                pl.BlockSpec((NG, K * 128), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((NG, R), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((ngroups, R), jnp.float32),
        )(v_a, c_a, xw)
        acc = out[:, :rps]
        for pp in range(1, parts):
            acc = acc + out[:, pp * rps:(pp + 1) * rps]
        return acc.reshape(-1)[:n]

    y = np.asarray(jax.jit(f)(vals_d, cw_d, wbp_d, x0))
    err = np.abs(y - want).max() / np.abs(want).max()

    def make_chain(iters):
        @jax.jit
        def go(v_a, c_a, wbp, x):
            def body(_, vv):
                w = f(v_a, c_a, wbp, vv)
                return w / jnp.maximum(jnp.linalg.norm(w), 1e-30)
            return jax.lax.fori_loop(0, iters, body, x)[:1]
        return lambda: go(vals_d, cw_d, wbp_d, x0)

    dt = roofline.time_marginal(make_chain, i1=20, i2=80)
    print(f"{name}: err={err:.2e} {dt*1e3:.3f} ms -> {nnz/dt/1e9:.1f} "
          f"Gnnz/s", flush=True)


print("devices:", jax.devices(), flush=True)
run("w2sel uint8", "sel", cw8_d)
run("w2sel int16", "sel", cw16_d)
try:
    run("w2g256 uint8", "g256", cw8_d)
except Exception as e:
    print("w2g256 failed:", str(e)[:200])

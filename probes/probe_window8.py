"""Probe: K=1 window kernel via row-splitting + fine-grained (rolled) bases.

Layout idea: split rows into parts of <=16 nnz, lay subrows row-major so a
128-lane slice covers only 64 distinct rows -> per-2-tile group the column
span is 64 + band - 1 (~90 for the 27-diag bench matrix) -> ONE gather pass
from a window whose base is arbitrary (constructed in-kernel by a dynamic
pltpu.roll over an aligned 256-lane slab).  No bucket compute, no selects.

Ladder on the 1M-row 27-diagonal bench matrix:
  floor  : same streams, no gather (multiply by static block)   [wrong y]
  k1stat : K=1 gather, static base 0                            [wrong y]
  k1roll : K=1 gather + dynamic-roll window                     [CORRECT]
  k2roll : no split (128-row slices), K=2 fine-base + select    [CORRECT]
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
STEP_TILES = 512          # tiles per grid step

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


def build_split_layout(split, wg):
    """Row-major split layout: subrow k = (row k//parts, part k%parts),
    part-major within each slice (lanes [0,64) part0, [64,128) part1 for
    parts=2).  Returns vals (T,P,R), cols_win int16, fb (ngroups,), meta."""
    parts = -(-int(np.diff(indptr).max()) // split)
    rows_per_slice = R // parts
    nslices = -(-n // rows_per_slice)
    tiles_per_slice = -(-split // P)
    T = nslices * tiles_per_slice
    grp_tiles = wg
    assert tiles_per_slice == wg, "probe assumes group == slice"
    vals = np.zeros((T, P, R), np.float32)
    cols = np.zeros((T, P, R), np.int64)
    live = np.zeros((T, P, R), bool)
    lens = np.diff(indptr)
    # slot for nnz q of row r: part = q // split, pos = q % split
    r_all = np.repeat(np.arange(n, dtype=np.int64), lens)
    q_all = np.arange(nnz, dtype=np.int64) - np.repeat(indptr[:-1], lens)
    part = q_all // split
    pos = q_all % split
    s_idx = r_all // rows_per_slice
    lane = (r_all % rows_per_slice) + part * rows_per_slice
    t_idx = s_idx * tiles_per_slice + pos // P
    p_idx = pos % P
    vals[t_idx, p_idx, lane] = data
    cols[t_idx, p_idx, lane] = indices
    live[t_idx, p_idx, lane] = True
    # pad T to step multiple
    padT = (-T) % STEP_TILES
    if padT:
        vals = np.concatenate([vals, np.zeros((padT, P, R), np.float32)])
        cols = np.concatenate([cols, np.zeros((padT, P, R), np.int64)])
        live = np.concatenate([live, np.zeros((padT, P, R), bool)])
        T += padT
    ngroups = T // wg
    fc = cols.reshape(ngroups, -1)
    fv = live.reshape(ngroups, -1)
    anyv = fv.any(axis=1)
    cmin = np.where(anyv, np.where(fv, fc, 1 << 60).min(axis=1), 0)
    cmax = np.where(anyv, np.where(fv, fc, -1).max(axis=1), 0)
    span = int((cmax - cmin + 1).max())
    fb = cmin.astype(np.int32)
    off = cols - np.repeat(fb, wg).astype(np.int64)[:, None, None]
    off = np.where(live, off, 0)
    assert off.min() >= 0
    K = -(-span // 128)
    assert off.max() < K * 128, (off.max(), K)
    return (jnp.asarray(vals), jnp.asarray(off.astype(np.int16)),
            jnp.asarray(fb), T, ngroups, nslices, rows_per_slice, span, K)


nblocks = -(-n // 128) + 3
NL = nblocks * 128


def make_probe(mode, split, wg):
    (vals, cw, fb, T, ngroups, nslices, rps, span, K) = \
        build_split_layout(split, wg)
    NG = STEP_TILES // wg      # groups per step
    parts = R // rps

    def kernel(fb_ref, v_ref, c_ref, x_ref, o_ref):
        i = pl.program_id(0)
        v = v_ref[...]                         # (STEP_TILES, P, R)
        cw = c_ref[...].astype(jnp.int32)

        def group(g):
            vg = v[g * wg:(g + 1) * wg].reshape(wg * P, R)
            ix = cw[g * wg:(g + 1) * wg].reshape(wg * P, R)
            if mode == "floor":
                xb = x_ref[0:1, 0:128]
                gat = jnp.broadcast_to(xb, (wg * P, R)) + \
                    ix.astype(jnp.float32) * 1e-30
                return jnp.sum(vg * gat, axis=0)[None, :]
            base_f = fb_ref[i * NG + g]
            if mode == "k1stat":
                w = x_ref[0:1, 0:128]
                gat = jnp.take_along_axis(
                    jnp.broadcast_to(w, (wg * P, 128)), ix, axis=1)
                gat = gat + base_f.astype(jnp.float32) * 1e-30
                return jnp.sum(vg * gat, axis=0)[None, :]
            blk = jax.lax.shift_right_logical(base_f, 7)
            s = jnp.bitwise_and(base_f, 127)
            W = (K + 1) * 128
            slab = x_ref[0:1, pl.ds(pl.multiple_of(blk * 128, 128), W)]
            w = pltpu.roll(slab, W - s, axis=1)    # left-roll by s
            if mode == "k1roll":
                gat = jnp.take_along_axis(
                    jnp.broadcast_to(w[0:1, :128], (wg * P, 128)),
                    ix, axis=1)
            else:                                   # k2roll
                bucket = jax.lax.shift_right_logical(ix, 7)
                i0 = jnp.bitwise_and(ix, 127)
                g0 = jnp.take_along_axis(
                    jnp.broadcast_to(w[0:1, :128], (wg * P, 128)), i0,
                    axis=1)
                g1 = jnp.take_along_axis(
                    jnp.broadcast_to(w[0:1, 128:256], (wg * P, 128)), i0,
                    axis=1)
                gat = jnp.where(bucket == 0, g0, g1)
            return jnp.sum(vg * gat, axis=0)[None, :]

        per_store = 8
        for ws in range(NG // per_store):
            parts_ = [group(ws * per_store + j) for j in range(per_store)]
            o_ref[ws * per_store:(ws + 1) * per_store, :] = \
                jnp.concatenate(parts_, axis=0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T // STEP_TILES,),
        in_specs=[
            pl.BlockSpec((STEP_TILES, P, R), lambda i, fbr: (i, 0, 0)),
            pl.BlockSpec((STEP_TILES, P, R), lambda i, fbr: (i, 0, 0)),
            pl.BlockSpec((1, NL), lambda i, fbr: (0, 0)),
        ],
        out_specs=pl.BlockSpec((NG, R), lambda i, fbr: (i, 0)),
    )

    def f(fb_a, v_a, c_a, x):
        xp = jnp.zeros((1, NL), jnp.float32).at[0, :n].set(x)
        out = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((ngroups, R), jnp.float32),
        )(fb_a, v_a, c_a, xp)
        if parts == 1:
            return out.reshape(-1)[:n]
        acc = out[:, :rps]
        for pp in range(1, parts):
            acc = acc + out[:, pp * rps:(pp + 1) * rps]
        return acc.reshape(-1)[:n]

    y = np.asarray(jax.jit(f)(fb, vals, cw, x0))
    err = np.abs(y - want).max() / np.abs(want).max()

    def make_chain(iters):
        @jax.jit
        def go(fb_a, v_a, c_a, x):
            def body(_, vv):
                w = f(fb_a, v_a, c_a, vv)
                return w / jnp.maximum(jnp.linalg.norm(w), 1e-30)
            return jax.lax.fori_loop(0, iters, body, x)[:1]
        return lambda: go(fb, vals, cw, x0)

    dt = roofline.time_marginal(make_chain, i1=20, i2=80)
    gn = nnz / dt / 1e9
    print(f"{mode}(split={split},wg={wg}): T={T} span={span} K={K} "
          f"err={err:.2e} {dt*1e3:.3f} ms -> {gn:.1f} Gnnz/s", flush=True)


print("devices:", jax.devices(), flush=True)
make_probe("floor", 16, 2)
make_probe("k1stat", 16, 2)
make_probe("k1roll", 16, 2)
make_probe("k2roll", 32, 4)

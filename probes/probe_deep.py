"""Probe: deep select-tree resident kernel — the locality-free floor.

Question: what rate can a plain-SELL kernel sustain when x spans NB
128-lane blocks and every slot's column is arbitrary (no locality at
all), for NB well beyond the unrolled-tree cap of 64?

Design under test: block-major masked accumulate — x fully VMEM-resident
as (NB, 128); one fori_loop over blocks; per iteration ONE dynamic
sublane slice of x (amortized over the whole step's nonzeros) plus
gather/compare/select over every value vreg.  Cost model: ~3 vector ops
per (block x vreg) pair -> rate ~ c / NB.  Also measures:

* bf16 variant (Mosaic packs (16,128) vregs -> op count may halve);
* XLA small element gather jnp.take(x, idx) for idx of 1-16K (the
  CachedPlan hot-x compaction cost per apply).
"""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", "/tmp/spmv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from spmv_vector_cache_tpu.utils import roofline

P, R = 8, 128
ROWS = 1 << 16          # 65536 rows
NNZ_ROW = 32            # exactly 32 nnz/row -> 4 tiles/slice, fill 1.0

rng = np.random.default_rng(7)


def build(nb_blocks, dtype=np.float32):
    """Plain SELL tiles: lane = row % 128, slice = row // 128, positions =
    the row's nonzeros; cols uniform random over nb_blocks*128."""
    cols_n = nb_blocks * 128
    nslices = ROWS // R
    tps = NNZ_ROW // P                              # tiles per slice
    T = nslices * tps
    cols = rng.integers(0, cols_n, size=(T, P, R)).astype(np.int32)
    vals = rng.standard_normal((T, P, R)).astype(dtype)
    x = rng.standard_normal(cols_n).astype(np.float32)
    # golden: per (slice, lane) row sum over its tps*P positions
    xg = x[cols]                                    # host gather
    prod = vals.astype(np.float64) * xg.astype(np.float64)
    tile_sum = prod.sum(axis=1)                     # (T, R)
    y = tile_sum.reshape(nslices, tps, R).sum(axis=1)  # (nslices, R)
    return vals, cols, x, y


def make_deep(NB, B, dtype=jnp.float32):
    """B tiles/step; x (NB,128) resident; fori over blocks."""

    def kernel(vals_ref, cols_ref, x_ref, out_ref):
        v = vals_ref[...].reshape(B * P, R)
        if v.dtype != jnp.float32:
            v = v.astype(jnp.float32)
        c = cols_ref[...].reshape(B * P, R)
        blk = jax.lax.shift_right_logical(c, 7)
        lane = jnp.bitwise_and(c, 127)

        def body(b, xg):
            xb = x_ref[pl.ds(b, 1), :]              # (1,128) dyn sublane
            g = jnp.take_along_axis(
                jnp.broadcast_to(xb, (B * P, R)), lane, axis=1)
            return jnp.where(blk == b, g, xg)

        xg = jax.lax.fori_loop(0, NB, body, jnp.zeros((B * P, R),
                                                      jnp.float32))
        out_ref[...] = (v * xg).reshape(B, P, R).sum(axis=1)

    return kernel


def run_deep(NB, B=64, dtype="float32"):
    import ml_dtypes
    npdt = ml_dtypes.bfloat16 if dtype == "bfloat16" else np.float32
    vals, cols, x, want = build(NB, npdt)
    T = vals.shape[0]
    jdt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    xp = jnp.asarray(x.reshape(NB, 128), jdt)
    v_d, c_d = jnp.asarray(vals), jnp.asarray(cols)

    @jax.jit
    def one(xr):
        out = pl.pallas_call(
            make_deep(NB, B, jdt),
            grid=(T // B,),
            in_specs=[
                pl.BlockSpec((B, P, R), lambda i: (i, 0, 0)),
                pl.BlockSpec((B, P, R), lambda i: (i, 0, 0)),
                pl.BlockSpec((NB, 128), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((B, R), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((T, R), jnp.float32),
        )(v_d, c_d, xr)
        tps = NNZ_ROW // P
        return out.reshape(T // tps, tps, R).sum(axis=1)

    y = np.asarray(one(xp))
    err = np.abs(y - want).max() / np.abs(want).max()

    def chain(iters):
        @jax.jit
        def f(xr):
            def step(k, acc):
                return acc + one(xr + jnp.float32(k).astype(jdt) * 0)
            return jax.lax.fori_loop(0, iters, step,
                                     jnp.zeros_like(y, jnp.float32))
        f_c = f.lower(xp).compile()
        return lambda: np.asarray(f_c(xp))[0, 0]

    dt = roofline.time_marginal(chain, 10, 30)
    nnz = ROWS * NNZ_ROW
    print(f"deep NB={NB:5d} B={B} {dtype:8s}: "
          f"{nnz / dt / 1e9:7.2f} Gnnz/s  rel_err={err:.2e}")
    return nnz / dt / 1e9


def probe_small_gather():
    n = 1 << 20
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    for H in (1024, 4096, 16384):
        idx = jnp.asarray(rng.integers(0, n, H).astype(np.int32))

        def chain(iters, idx=idx, H=H):
            @jax.jit
            def f(v):
                def step(k, acc):
                    return acc + jnp.take(v + jnp.float32(k) * 0, idx)
                return jax.lax.fori_loop(0, iters, step, jnp.zeros(H))
            f_c = f.lower(x).compile()
            return lambda: np.asarray(f_c(x))[0]

        dt = roofline.time_marginal(chain, 10, 30)
        print(f"xla take H={H:6d}: {dt * 1e6:8.1f} us/apply "
              f"({H / dt / 1e6:.1f} Melem/s)")


if __name__ == "__main__":
    print("devices:", jax.devices())
    for nb in (64, 128, 256, 512, 1024):
        run_deep(nb, B=64)
    run_deep(256, B=128)
    run_deep(512, B=128)
    run_deep(256, B=64, dtype="bfloat16")
    run_deep(512, B=64, dtype="bfloat16")

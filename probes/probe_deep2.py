"""Probe: chunked-unrolled deep gather — fori over 64-block chunks,
unrolled binary select tree within each chunk, x replicated to 8
sublanes.  Expected ~5x the naive fori masked-accumulate (no per-block
broadcast/compare, no per-block loop overhead)."""
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
ROWS = 1 << 16
NNZ_ROW = 32
CHUNK = 64                                  # blocks per chunk

rng = np.random.default_rng(7)


def build(nb_blocks):
    cols_n = nb_blocks * 128
    nslices = ROWS // R
    tps = NNZ_ROW // P
    T = nslices * tps
    cols = rng.integers(0, cols_n, size=(T, P, R)).astype(np.int32)
    vals = rng.standard_normal((T, P, R)).astype(np.float32)
    x = rng.standard_normal(cols_n).astype(np.float32)
    xg = x[cols]
    prod = vals.astype(np.float64) * xg
    y = prod.sum(axis=1).reshape(nslices, tps, R).sum(axis=1)
    return vals, cols, x, y


def make_kernel(NB, B):
    nchunks = -(-NB // CHUNK)
    cw = CHUNK * 128                         # lanes per chunk

    def kernel(vals_ref, cols_ref, x_ref, out_ref):
        v = vals_ref[...].reshape(B * P, R)
        c = cols_ref[...].reshape(B * P, R)
        nv = B * P // 8

        def vreg(w):
            ix = c[w * 8:(w + 1) * 8]
            vv = v[w * 8:(w + 1) * 8]
            lane = jnp.bitwise_and(ix, 127)
            inblk = jnp.bitwise_and(jax.lax.shift_right_logical(ix, 7),
                                    CHUNK - 1)
            chunk = jax.lax.shift_right_logical(ix, 13)
            bits = [jnp.bitwise_and(
                jax.lax.shift_right_logical(inblk, d), 1) == 1
                for d in range(6)]

            def body(cc, xg):
                base = pl.multiple_of(cc * cw, cw)
                xs = x_ref[:, pl.ds(base, cw)]

                def tree(lo, size):
                    if size == 1:
                        return jnp.take_along_axis(
                            xs[:, lo * 128:(lo + 1) * 128], lane, axis=1)
                    half = size // 2
                    left = tree(lo, half)
                    right = tree(lo + half, half)
                    d = half.bit_length() - 1
                    return jnp.where(bits[d], right, left)

                g = tree(0, CHUNK)
                return jnp.where(chunk == cc, g, xg)

            xg = jax.lax.fori_loop(0, nchunks, body,
                                   jnp.zeros((8, R), jnp.float32))
            return (vv * xg).sum(axis=0)[None, :]       # tile partial

        for w8 in range(nv // 8):
            out_ref[w8 * 8:(w8 + 1) * 8, :] = jnp.concatenate(
                [vreg(w8 * 8 + j) for j in range(8)], axis=0)

    return kernel


def run(NB, B=64):
    vals, cols, x, want = build(NB)
    T = vals.shape[0]
    nbp = -(-NB // CHUNK) * CHUNK            # pad to chunk multiple
    xp = np.zeros(nbp * 128, np.float32)
    xp[:x.shape[0]] = x
    x8 = jnp.asarray(np.broadcast_to(xp, (8, nbp * 128)))
    v_d, c_d = jnp.asarray(vals), jnp.asarray(cols)

    @jax.jit
    def one(xr):
        out = pl.pallas_call(
            make_kernel(nbp, B),
            grid=(T // B,),
            in_specs=[
                pl.BlockSpec((B, P, R), lambda i: (i, 0, 0)),
                pl.BlockSpec((B, P, R), lambda i: (i, 0, 0)),
                pl.BlockSpec((8, nbp * 128), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((B, R), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((T, R), jnp.float32),
        )(v_d, c_d, xr)
        return out.reshape(T // 4, 4, R).sum(axis=1)

    y = np.asarray(one(x8))
    err = np.abs(y - want).max() / np.abs(want).max()

    def chain(iters):
        @jax.jit
        def f(xr):
            def step(k, xr):
                yy = one(xr)
                return xr.at[0, 0].add(yy[0, 0] * 1e-30)
            return jax.lax.fori_loop(0, iters, step, xr)[0, :1]
        f_c = f.lower(x8).compile()
        return lambda: np.asarray(f_c(x8))[0]

    dt = roofline.time_marginal(chain, 10, 30)
    nnz = ROWS * NNZ_ROW
    print(f"deep2 NB={NB:5d} B={B}: {nnz / dt / 1e9:7.2f} Gnnz/s  "
          f"rel_err={err:.2e}", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices())
    for nb in (64, 128, 256, 512, 1024):
        run(nb, B=64)

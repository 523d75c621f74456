"""Probe: DIA kernel with aligned loads + static lane/sublane shifts.

x is laid out 2D (NR, 128) row-major (xflat[j] = x2d[j//128, j%128]).
Each diagonal offset F = PADL + off decomposes F = 1024*Q + 128*q + s;
the kernel loads an (S+16, 128) aligned window, applies static sublane
slice (q) and static lane shift (s).
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

print("devices:", jax.devices())


def sync(x):
    return float(np.asarray(x).ravel()[0])


def timeit_total(fn, repeats=3):
    sync(fn())
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        sync(fn())
        best = min(best, time.perf_counter() - t0)
    return best


I1, I2 = 30, 90


def marginal(make_chain):
    t1 = timeit_total(make_chain(I1))
    t2 = timeit_total(make_chain(I2))
    return (t2 - t1) / (I2 - I1)


n = 1 << 20
ndiag = 27
rng = np.random.default_rng(0)
offs = list(range(-(ndiag // 2), ndiag // 2 + 1))
m = sp.spdiags(rng.standard_normal((ndiag, n)).astype(np.float32), offs, n, n).tocsr()
m.sort_indices()
x0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
want = m.astype(np.float64) @ np.asarray(x0)
nnz = m.nnz

dia = m.todia()
dia_offs = [int(o) for o in dia.offsets]
D = len(dia_offs)
OMIN, OMAX = min(dia_offs), max(dia_offs)
PADL = ((-OMIN) + 127) // 128 * 128


def build(MULT, variant):
    RS = 8 * 128 * MULT
    S = 8 * MULT
    nr = n + ((-n) % RS)
    vdia = np.zeros((D, nr), np.float32)
    for k, off in enumerate(dia_offs):
        r = np.arange(max(0, -off), min(n, n - off))
        vdia[k, r] = dia.data[k, r + off]
    vj = jnp.asarray(vdia.reshape(D, nr // RS, S, 128).transpose(1, 0, 2, 3))
    T = nr // RS
    # x2d rows: PADL/128 + nr/128 + enough right pad for max offset + carry
    PADR_ROWS = (OMAX + 1024 * 8) // 128 + 16
    NR_ROWS = PADL // 128 + nr // 128 + PADR_ROWS
    # decompositions
    dec = []
    for off in dia_offs:
        F = PADL + off
        Q, rem = divmod(F, 1024)
        q, s = divmod(rem, 128)
        dec.append((8 * Q, q, s))

    def kernel(v_ref, x_ref, o_ref):
        i = pl.program_id(0)
        acc = jnp.zeros((S, 128), jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (S, 128), 1)
        for k, (rowQ, q, s) in enumerate(dec):
            bs = pl.multiple_of(i * S + rowQ, 8)
            wide = x_ref[pl.ds(bs, S + 16), :]
            a = wide[q:q + S + 1]
            if s == 0:
                xs = a[:S]
            elif variant == "roll":
                r1 = pltpu.roll(a, 128 - s, axis=1)
                xs = jnp.where(lane < 128 - s, r1[:S], r1[1:])
            else:
                xs = jnp.concatenate([a[:S, s:], a[1:, :s]], axis=1)
            acc = acc + v_ref[0, k] * xs
        o_ref[0] = acc

    def spmv(x2, vj):
        xr = jnp.zeros((NR_ROWS * 128,), jnp.float32)
        xr = xr.at[PADL:PADL + n].set(x2)
        x2d = xr.reshape(NR_ROWS, 128)
        out = pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, D, S, 128), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((NR_ROWS, 128), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, S, 128), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((T, S, 128), jnp.float32),
        )(vj, x2d)
        return out.reshape(-1)[:n]

    return spmv, vj


for variant in ("roll", "concat"):
    for MULT in (4, 8):
        spmv, vj = build(MULT, variant)
        try:
            y = np.asarray(jax.jit(spmv)(x0, vj))
        except Exception as e:  # noqa
            print(f"dia {variant} MULT={MULT}: FAILED {str(e)[:200]}", flush=True)
            continue
        err = np.abs(y - want).max() / np.abs(want).max()

        def make(iters, spmv=spmv, vj=vj):
            @jax.jit
            def go(x, vj):
                return jax.lax.fori_loop(0, iters, lambda i, v: spmv(v, vj), x)[:1]
            return lambda: go(x0, vj)

        dt = marginal(make)
        print(f"dia {variant} MULT={MULT}: err {err:.3g}, {dt*1e3:.3f} ms -> "
              f"{nnz/dt/1e9:.1f} Gnnz/s", flush=True)

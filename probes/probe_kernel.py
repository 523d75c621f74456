"""Probe: true (tunnel-latency-free) perf of the window kernel vs a
shift-based DIA kernel, using two-point marginal timing.

Workload mirrors bench.py: 1M-row 27-diagonal matrix, f32.
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
from spmv_vector_cache_tpu.formats.plan import build_sell_plan, auto_plan
from spmv_vector_cache_tpu.ops.spmv_pallas import spmv_plan

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
    """seconds/iter free of the fixed sync/launch cost."""
    t1 = timeit_total(make_chain(I1))
    t2 = timeit_total(make_chain(I2))
    return (t2 - t1) / (I2 - I1)


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
    """fn(v, *operands) -> v'; operands passed as jit args (not constants)."""
    def make(iters):
        @jax.jit
        def go(x, *ops):
            return jax.lax.fori_loop(0, iters, lambda i, v: fn(v, *ops), x)[:1]
        return lambda: go(x0, *operands)
    return make


# --- measured true stream BW (marginal) -------------------------------------
big = jnp.asarray(np.random.default_rng(1).standard_normal(1 << 26).astype(np.float32))


def bw_make(iters):
    @jax.jit
    def go(x):
        return jax.lax.fori_loop(0, iters, lambda i, v: v * 1.0000001 + 1e-30 * i, x)[:1]
    return lambda: go(big)


dt = marginal(bw_make)
print(f"stream BW (marginal, 256MB r+w): {2 * big.size * 4 / dt / 1e9:.0f} GB/s")

# --- current window kernel ---------------------------------------------------
plan = auto_plan(a)
pd = plan.to_device()
print(f"plan: K={plan.stats.window_blocks} G={plan.stats.groups_per_step} "
      f"T={plan.stats.num_tiles} fill={plan.stats.fill:.3f}")
dt = marginal(chain_of(lambda v, p: spmv_plan(p, v, strategy="window"), pd))
print(f"window full: {dt*1e3:.3f} ms -> {nnz/dt/1e9:.1f} Gnnz/s")

# --- stream strategy ---------------------------------------------------------
dt = marginal(chain_of(lambda v, p: spmv_plan(p, v, strategy="stream"), pd))
print(f"stream full: {dt*1e3:.3f} ms -> {nnz/dt/1e9:.1f} Gnnz/s")

# --- DIA shift kernel --------------------------------------------------------
dia = m.todia()
dia_offs = [int(o) for o in dia.offsets]
D = len(dia_offs)
OMIN, OMAX = min(dia_offs), max(dia_offs)
PADL = ((-OMIN) + 127) // 128 * 128

for MULT in (1, 4, 8):
    RS = 8 * 128 * MULT
    nr = n + ((-n) % RS)
    vdia = np.zeros((D, nr), np.float32)
    for k, off in enumerate(dia_offs):
        r = np.arange(max(0, -off), min(n, n - off))
        vdia[k, r] = dia.data[k, r + off]
    PADR = ((OMAX + RS) + 127) // 128 * 128
    vj = jnp.asarray(vdia.reshape(D, nr // RS, 8 * MULT, 128).transpose(1, 0, 2, 3))
    T = nr // RS
    S = 8 * MULT
    W = PADL + nr + PADR

    def dia_kernel(v_ref, x_ref, o_ref, RS=RS, S=S):
        i = pl.program_id(0)
        base = i * RS
        acc = jnp.zeros((S, 128), jnp.float32)
        for k, off in enumerate(dia_offs):
            xs = x_ref[0, pl.ds(base + PADL + off, RS)].reshape(S, 128)
            acc = acc + v_ref[0, k] * xs
        o_ref[0] = acc

    def dia_spmv(x2, vj, T=T, S=S, W=W, RS=RS, kern=dia_kernel, nr=nr):
        xfull = jnp.zeros((1, W), jnp.float32)
        xfull = xfull.at[0, PADL:PADL + n].set(x2)
        out = pl.pallas_call(
            kern,
            grid=(T,),
            in_specs=[
                pl.BlockSpec((1, D, S, 128), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((1, W), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, S, 128), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((T, S, 128), jnp.float32),
        )(vj, xfull)
        return out.reshape(-1)[:n]

    y = np.asarray(jax.jit(dia_spmv)(x0, vj))
    err = np.abs(y - want).max() / np.abs(want).max()
    dt = marginal(chain_of(dia_spmv, vj))
    print(f"dia MULT={MULT}: err {err:.3g}, {dt*1e3:.3f} ms -> {nnz/dt/1e9:.1f} Gnnz/s", flush=True)

# --- window kernel G sweep ----------------------------------------------------
for G in (16, 128):
    p2 = build_sell_plan(a, groups_per_step=G).to_device()
    dt = marginal(chain_of(lambda v, p: spmv_plan(p, v, strategy="window"), p2))
    print(f"window G={G}: {dt*1e3:.3f} ms -> {nnz/dt/1e9:.1f} Gnnz/s", flush=True)

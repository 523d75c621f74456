"""Probe: the round-5 ChunkPlan on the powerlaw matrix (VERDICT ask #2)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from spmv_vector_cache_tpu.formats.containers import COO
from spmv_vector_cache_tpu.formats.convert import coo_to_csr
from spmv_vector_cache_tpu.formats.chunk import build_chunk_plan
from spmv_vector_cache_tpu.ops.spmv_pallas import spmv_plan
from spmv_vector_cache_tpu.ops import reference
from spmv_vector_cache_tpu.utils import roofline

jax.config.update("jax_compilation_cache_dir", "/tmp/spmv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

rng = np.random.default_rng(3)
n2 = 1 << 17
lens = np.minimum((rng.pareto(1.2, n2) * 8).astype(np.int64) + 1, 8192)
r2 = np.repeat(np.arange(n2), lens)
c2 = np.minimum((np.abs(rng.standard_normal(r2.shape[0])) * 2048)
                .astype(np.int64) + r2 - 1024, n2 - 1)
c2 = np.maximum(c2, 0).astype(np.int32)
a2 = coo_to_csr(COO(data=rng.standard_normal(r2.shape[0])
                    .astype(np.float32),
                    row=r2.astype(np.int32), col=c2, shape=(n2, n2)))
nnz = a2.nnz
x0 = jnp.asarray(rng.standard_normal(n2).astype(np.float32))
want = reference.spmv_numpy(a2, np.asarray(x0, np.float64))


def chain(fn, *args, i1=20, i2=80):
    def make(iters):
        @jax.jit
        def go(*a):
            def body(_, v):
                w = fn(*a[:-1], v)
                return w / jnp.maximum(jnp.max(jnp.abs(w)), 1e-30)
            return jax.lax.fori_loop(0, iters, body, a[-1])[:1]
        return lambda: go(*args)
    return roofline.time_marginal(make, i1=i1, i2=i2)


t0 = time.time()
pc = build_chunk_plan(a2)
print(f"build_chunk_plan: {time.time()-t0:.1f}s  {pc.stats}", flush=True)
pd = pc.to_device()
y = np.asarray(spmv_plan(pd, x0))
err = float(np.abs(y - want).max() / max(1.0, np.abs(want).max()))
dt = chain(lambda p, v: spmv_plan(p, v), pd, x0)
print(f"{'ChunkPlan':28s} {dt*1e6:8.1f} us  {nnz/dt/1e9:6.2f} Gnnz/s  "
      f"err={err:.1e}", flush=True)

# per-bucket kernel cost breakdown
for i, b in enumerate(pc.buckets):
    bd = pd.buckets[i]
    from spmv_vector_cache_tpu.ops.spmv_pallas import _window_partials

    def one(p, v):
        out, _ = _window_partials(p, v, False, "plus_times")
        return out[0, :1] * 0 + v
    dt = chain(one, bd, x0, i1=10, i2=40)
    s = b.stats
    print(f"  bucket{i}: K={s.window_blocks} T={s.num_tiles} "
          f"fill={s.fill:.2f} gps={s.groups_per_step}  "
          f"kernel {dt*1e6:8.1f} us", flush=True)

# breakdown for the big bucket: xw prologue vs kernel ladder
import functools
from jax.experimental import pallas as pl
from spmv_vector_cache_tpu.ops.spmv_pallas import (_make_window_kernel,
                                                   _window_xw,
                                                   TILES_PER_STEP)

b = pd.buckets[-1]
st = b.stats
T, P, R = b.vals.shape
ngroups = T // st.group_tiles
K = st.window_blocks

def xw_only(p, v):
    xw = _window_xw(p, v, ngroups, jnp.float32)
    return xw[0, :1] * 0 + v
dt = chain(xw_only, b, x0, i1=10, i2=40)
print(f"  xw prologue only: {dt*1e6:8.1f} us", flush=True)

xw0 = _window_xw(b, x0, ngroups, jnp.float32)
step_tiles = TILES_PER_STEP * st.groups_per_step
NG = step_tiles // st.group_tiles

def kern_only(p, xw, v):
    out = pl.pallas_call(
        _make_window_kernel(K, NG, P, R, st.group_tiles, False,
                            "plus_times", jnp.float32),
        grid=(T // step_tiles,),
        in_specs=[
            pl.BlockSpec((step_tiles, P, R), lambda i: (i, 0, 0)),
            pl.BlockSpec((step_tiles, P, R), lambda i: (i, 0, 0)),
            pl.BlockSpec((NG, K * 128), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((step_tiles, R), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((T, R), jnp.float32),
    )(p.vals, p.cols_win, xw + v[:1] * 0)
    return out[0, :1] * 0 + v
dt = chain(kern_only, b, xw0, x0, i1=10, i2=40)
print(f"  pallas (fixed xw): {dt*1e6:8.1f} us", flush=True)

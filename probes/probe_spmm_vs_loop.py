"""Fused SpMM vs looped single-RHS SpMV at k in {8, 32, 64} (TPU).

VERDICT r4 ask #6: the a5e0b1b fused kernel must beat k looped SpMVs
by >= 2x at k=32 or keep being fixed.  Banded SELL matrix (the general
window path), chained marginal timing.
"""
import numpy as np
import jax
import jax.numpy as jnp
import scipy.sparse as sp

from spmv_vector_cache_tpu.formats.convert import from_scipy
from spmv_vector_cache_tpu.formats.plan import auto_plan
from spmv_vector_cache_tpu.ops.spmv_pallas import spmv_plan
from spmv_vector_cache_tpu.ops.spmm_pallas import spmm_plan
from spmv_vector_cache_tpu.utils import roofline

jax.config.update("jax_compilation_cache_dir", "/tmp/spmv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

rng = np.random.default_rng(0)
n = 1 << 19
nd = 27
m = sp.spdiags(rng.standard_normal((nd, n)).astype(np.float32),
               list(range(-(nd // 2), nd // 2 + 1)), n, n).tocsr()
m.sort_indices()
a = from_scipy(m.astype(np.float32))
plan = auto_plan(a, allow_dia=False).to_device()
nnz = plan.stats.nnz
print(f"plan: T={plan.stats.num_tiles} K={plan.stats.window_blocks} "
      f"fill={plan.stats.fill:.2f}", flush=True)


def chain(fn, *args, i1=10, i2=40):
    def make(iters):
        @jax.jit
        def go(*a):
            def body(_, v):
                w = fn(*a[:-1], v)
                return w / jnp.maximum(jnp.max(jnp.abs(w)), 1e-30)
            return jax.lax.fori_loop(0, iters, body, a[-1])[:1]
        return lambda: go(*args)
    return roofline.time_marginal(make, i1=i1, i2=i2)


for k in (8, 32, 64):
    B = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))

    def fused(p, b):
        return spmm_plan(p, b)

    def looped(p, b):
        cols = [spmv_plan(p, b[:, j]) for j in range(k)]
        return jnp.stack(cols, axis=1)

    yf = np.asarray(spmm_plan(plan, B))
    want = m.astype(np.float64) @ np.asarray(B, np.float64)
    err = np.abs(yf - want).max() / np.abs(want).max()
    dtf = chain(fused, plan, B, i1=5, i2=20)
    dtl = chain(looped, plan, B, i1=3, i2=9)
    rate_f = nnz * k / dtf / 1e9
    rate_l = nnz * k / dtl / 1e9
    print(f"k={k:3d}  fused {dtf*1e3:8.3f} ms ({rate_f:7.1f} GnnzRHS/s) "
          f" looped {dtl*1e3:8.3f} ms ({rate_l:7.1f})  "
          f"speedup {dtl/dtf:5.2f}x  err={err:.1e}", flush=True)

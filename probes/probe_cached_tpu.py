"""Probe: CachedPlan on a >100k-col locality-poor power-law matrix, on TPU.

The VERDICT r3 done criterion for the stream-cliff fix: a committed TPU
number >= 20 Gnnz/s on a >100k-col matrix where striping is refused.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from spmv_vector_cache_tpu.formats.containers import COO
from spmv_vector_cache_tpu.formats.convert import coo_to_csr
from spmv_vector_cache_tpu.formats.plan import auto_plan
from spmv_vector_cache_tpu.formats.cached import CachedPlan, hot_set_coverage
from spmv_vector_cache_tpu.ops import reference
from spmv_vector_cache_tpu.ops.spmv_pallas import spmv_plan
from spmv_vector_cache_tpu.ops.strategy import plan_nnz
from spmv_vector_cache_tpu.utils import roofline

jax.config.update("jax_compilation_cache_dir", "/tmp/spmv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

rng = np.random.default_rng(7)
n = 1 << 18                       # 262,144 cols (>100k)
nnz_per_row = 16
rows = np.repeat(np.arange(n, dtype=np.int64), nnz_per_row)
# power-law column popularity (zipf-ish): col = floor(n * u^alpha)
u = rng.random(rows.shape[0])
alpha = float(sys.argv[1]) if len(sys.argv) > 1 else 4.0
cols = np.minimum((n * u ** alpha).astype(np.int64), n - 1).astype(np.int32)
a = coo_to_csr(COO(data=rng.standard_normal(rows.shape[0]).astype(np.float32),
                   row=rows.astype(np.int32), col=cols, shape=(n, n)))
print("coverage:", hot_set_coverage(a, sizes=(1024, 2048, 4096, 8192)),
      flush=True)

t0 = time.perf_counter()
plan = auto_plan(a)
print(f"auto_plan: {type(plan).__name__} in {time.perf_counter()-t0:.1f}s",
      flush=True)
if isinstance(plan, CachedPlan):
    print(f"  coverage={plan.coverage:.4f} hot_cols={plan.hot_cols.shape[0]} "
          f"hot plan: {type(plan.hot).__name__} wb={plan.hot.stats.window_blocks} "
          f"cold nnz={plan_nnz(plan.cold) if plan.cold is not None else 0}",
          flush=True)

pd = plan.to_device()
x0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
y = np.asarray(spmv_plan(pd, x0))
want = reference.spmv_numpy(a, np.asarray(x0, np.float64))
err = np.abs(y - want).max() / max(1.0, np.abs(want).max())
print("rel err:", err, flush=True)

def make_chain(iters):
    @jax.jit
    def go(plan, x):
        def body(_, v):
            w = spmv_plan(plan, v)
            return w / jnp.maximum(jnp.linalg.norm(w), 1e-30)
        return jax.lax.fori_loop(0, iters, body, x)[:1]
    return lambda: go(pd, x0)

dt = roofline.time_marginal(make_chain, i1=10, i2=40)
nnz = plan_nnz(pd)
print(f"cached spmv: {dt*1e3:.3f} ms/iter -> {nnz/dt/1e9:.2f} Gnnz/s",
      flush=True)

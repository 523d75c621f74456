"""Probe: TRUE chained marginal per-apply cost of tiny-matrix plans.

The committed bundled_sweep.csv showed 1.7-6.6 ms "per apply" for every
bundled matrix — but benchapp's `_time_device` timed *separate Python
dispatches* (each enqueue ~1.7 ms through the axon tunnel), not chained
device time.  This probe times the same plans with chained fori_loop
marginal timing (the report.py methodology) to find the real device
floor of each plan family at tiny sizes, which calibrates the
auto_plan fixed-cost model (VERDICT r4 ask #1b).
"""
import numpy as np
import jax
import jax.numpy as jnp

from spmv_vector_cache_tpu.formats import refio
from spmv_vector_cache_tpu.formats.plan import auto_plan, build_sell_plan
from spmv_vector_cache_tpu.formats.cached import coo_tail_from_csr
from spmv_vector_cache_tpu.ops.spmv_pallas import spmv_plan
from spmv_vector_cache_tpu.ops import reference
from spmv_vector_cache_tpu.utils import roofline

jax.config.update("jax_compilation_cache_dir", "/tmp/spmv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def chain_rate(pd, x0, i1=50, i2=200):
    def make(iters):
        @jax.jit
        def go(p, x):
            def body(_, v):
                w = spmv_plan(p, v)
                return w / jnp.maximum(jnp.max(jnp.abs(w)), 1e-30)
            return jax.lax.fori_loop(0, iters, body, x)[:1]
        return lambda: go(pd, x0)
    return roofline.time_marginal(make, i1=i1, i2=i2)


REF = "/root/reference/matrices"
for name in ["circuit204", "i64", "i1k", "i64k", "row64k"]:
    a = refio.load_reference_matrix(f"{REF}/{name}")
    x = np.ones(a.shape[1], dtype=np.float32)
    want = reference.spmv_numpy(a, x.astype(np.float64))
    plans = {"auto": auto_plan(a)}
    try:
        plans["coo"] = coo_tail_from_csr(a)
    except Exception as e:
        print(name, "coo build failed:", e)
    try:
        plans["sell"] = build_sell_plan(a)
    except Exception:
        pass
    for pname, plan in plans.items():
        pd = plan.to_device()
        y = np.asarray(spmv_plan(pd, jnp.asarray(x)))
        err = float(np.abs(y - want).max() / max(1.0, np.abs(want).max()))
        dt = chain_rate(pd, jnp.asarray(x))
        print(f"{name:12s} {pname:5s} {type(plan).__name__:10s} "
              f"nnz={a.nnz:6d} {dt*1e6:9.1f} us/apply  "
              f"{a.nnz/dt/1e9:8.4f} Gnnz/s  err={err:.1e}")

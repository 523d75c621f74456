"""Probe: packed two-pass kernel throughput on TPU (locality-poor)."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from spmv_vector_cache_tpu.formats.containers import COO
from spmv_vector_cache_tpu.formats.convert import coo_to_csr
from spmv_vector_cache_tpu.formats.packed import build_packed_plan
from spmv_vector_cache_tpu.formats.plan import auto_plan
from spmv_vector_cache_tpu.formats.cached import CachedPlan
from spmv_vector_cache_tpu.ops import reference
from spmv_vector_cache_tpu.ops.spmv_packed import spmv_packed
from spmv_vector_cache_tpu.ops.spmv_pallas import spmv_plan
from spmv_vector_cache_tpu.ops.strategy import plan_nnz
from spmv_vector_cache_tpu.utils import roofline

jax.config.update("jax_compilation_cache_dir", "/tmp/spmv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

rng = np.random.default_rng(7)


def make_matrix(n, npr, alpha):
    rows = np.repeat(np.arange(n, dtype=np.int64), npr)
    u = rng.random(rows.shape[0])
    cols = (rng.integers(0, n, rows.shape[0]) if alpha == 0 else
            np.minimum((n * u ** alpha).astype(np.int64), n - 1))
    return coo_to_csr(COO(
        data=rng.standard_normal(rows.shape[0]).astype(np.float32),
        row=rows.astype(np.int32), col=cols.astype(np.int32),
        shape=(n, n)))


def time_plan(pd, x0, fn, nnz, label, want=None):
    y = np.asarray(fn(pd, x0))
    if want is not None:
        err = np.abs(y - want).max() / max(1.0, np.abs(want).max())
        assert err < 2e-3, (label, err)
    else:
        err = float("nan")

    def make(iters):
        @jax.jit
        def go(p, x):
            def body(_, v):
                w = fn(p, v)
                return w / jnp.maximum(jnp.linalg.norm(w), 1e-30)
            return jax.lax.fori_loop(0, iters, body, x)[:1]
        return lambda: go(pd, x0)

    dt = roofline.time_marginal(make, i1=5, i2=25)
    print(f"  {label}: {nnz/dt/1e9:6.2f} Gnnz/s ({dt*1e3:.3f} ms) "
          f"err={err:.1e}", flush=True)
    return dt


def main():
    for alpha, tag in [(0, "uniform"), (8.0, "powerlaw a=8")]:
        a = make_matrix(1 << 18, 16, alpha)
        want = None
        print(f"{tag}: n=262144 nnz={a.nnz}", flush=True)
        x0 = jnp.asarray(rng.standard_normal(a.shape[1]).astype(np.float32))
        want = reference.spmv_numpy(a, np.asarray(x0, np.float64))
        for cb in (32, 64, 128):
            plan = build_packed_plan(a, chunk_blocks=cb)
            s = plan.stats
            dt = time_plan(plan.to_device(), x0,
                           lambda p, v: spmv_packed(p, v), s.nnz,
                           f"packed cb={cb} (A={s.num_steps_a} "
                           f"B={s.num_steps_b} fill={s.fill:.2f})", want)
        # the auto-selected plan (cached for skew, packed otherwise)
        ap = auto_plan(a)
        name = type(ap).__name__
        if isinstance(ap, CachedPlan):
            name += f" cov={ap.coverage:.3f}"
        time_plan(ap.to_device(), x0,
                  lambda p, v: spmv_plan(p, v), plan_nnz(ap),
                  f"auto_plan -> {name}", want)


if __name__ == "__main__":
    main()

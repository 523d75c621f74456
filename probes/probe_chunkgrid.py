"""Grid-search chunk-plan knobs on the powerlaw matrix (TPU)."""
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


for hp in (8, 16, 32):
    for sort_rows in (True, False):
        t0 = time.time()
        pc = build_chunk_plan(a2, heavy_parts=hp, sort_rows=sort_rows)
        bt = time.time() - t0
        pd = pc.to_device()
        y = np.asarray(spmv_plan(pd, x0))
        err = float(np.abs(y - want).max() / max(1.0, np.abs(want).max()))
        dt = chain(lambda p, v: spmv_plan(p, v), pd, x0)
        s = pc.stats
        print(f"hp={hp:2d} sort={int(sort_rows)}  {dt*1e6:7.1f} us  "
              f"{nnz/dt/1e9:5.2f} Gnnz/s err={err:.0e} build={bt:.0f}s "
              f"fill={s.fill:.2f} T={s.num_tiles} "
              f"ks={s.bucket_ks} bt={s.bucket_tiles}", flush=True)

"""Probe: bf16 vs f32 SELL window kernel on the banded 1M matrix."""
import numpy as np, scipy.sparse as sp, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/spmv_tpu_jax_cache")
from spmv_vector_cache_tpu.formats.convert import from_scipy
from spmv_vector_cache_tpu.formats.plan import auto_plan
from spmv_vector_cache_tpu.ops.spmv_pallas import spmv_plan
from spmv_vector_cache_tpu.utils import roofline

rng = np.random.default_rng(0)
n, nd = 1 << 20, 27
m = sp.spdiags(rng.standard_normal((nd, n)).astype(np.float32),
               list(range(-(nd//2), nd//2+1)), n, n).tocsr()
m.sort_indices()
a = from_scipy(m.astype(np.float32))
x0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
want = m.astype(np.float64) @ np.asarray(x0)

for dt in (np.float32, jnp.bfloat16):
    p = auto_plan(a, allow_dia=False, value_dtype=dt).to_device()
    y = np.asarray(spmv_plan(p, x0, strategy="window", interpret=False))
    err = np.abs(y - want).max() / np.abs(want).max()
    nnz = p.stats.nnz
    def make(iters, p=p):
        @jax.jit
        def go(plan, x):
            def body(_, v):
                w = spmv_plan(plan, v, strategy="window", interpret=False)
                return w / jnp.maximum(jnp.linalg.norm(w), 1e-30)
            return jax.lax.fori_loop(0, iters, body, x)[:1]
        return lambda: go(p, x0)
    dtm = roofline.time_marginal(make, i1=20, i2=80)
    print(f"{np.dtype(dt).name}: rel err {err:.2e}, {dtm*1e3:.3f} ms/iter "
          f"-> {nnz/dtm/1e9:.2f} Gnnz/s", flush=True)

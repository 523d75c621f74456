"""Probe: bf16-value DIA kernel throughput on TPU (expect ~2x f32)."""
import numpy as np
import jax
import jax.numpy as jnp
import scipy.sparse as sp

jax.config.update("jax_compilation_cache_dir", "/tmp/spmv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import sys
sys.path.insert(0, "/root/repo")
from spmv_vector_cache_tpu.formats.convert import from_scipy
from spmv_vector_cache_tpu.formats.dia import build_dia_plan
from spmv_vector_cache_tpu.ops.spmv_dia import spmv_dia
from spmv_vector_cache_tpu.utils import roofline

print("devices:", jax.devices())

n = 1 << 20
ndiag = 27
rng = np.random.default_rng(0)
offs = list(range(-(ndiag // 2), ndiag // 2 + 1))
m = sp.spdiags(rng.standard_normal((ndiag, n)).astype(np.float32), offs, n, n).tocsr()
m.sort_indices()
a = from_scipy(m.astype(np.float32))
nnz = m.nnz
x0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))
want = m.astype(np.float64) @ np.asarray(x0)

for dt_name, vd in (("bf16", jnp.bfloat16),):
    p = build_dia_plan(a, value_dtype=vd).to_device()
    y = np.asarray(spmv_dia(p, x0))
    err = np.abs(y - want).max() / np.abs(want).max()
    print(f"{dt_name}: rel err {err:.3g}", flush=True)

    def make(iters, p=p):
        @jax.jit
        def go(plan, x):
            def body(_, v):
                w = spmv_dia(plan, v)
                return w / jnp.maximum(jnp.linalg.norm(w), 1e-30)
            return jax.lax.fori_loop(0, iters, body, x)[:1]
        return lambda: go(p, x0)

    dtm = roofline.time_marginal(make, i1=30, i2=90)
    print(f"{dt_name}: {dtm*1e3:.3f} ms -> {nnz/dtm/1e9:.1f} Gnnz/s", flush=True)

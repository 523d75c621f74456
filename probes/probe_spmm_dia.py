"""Probe: DIA SpMM on TPU — correctness + marginal throughput."""
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
from spmv_vector_cache_tpu.ops.spmm_dia import spmm_dia
from spmv_vector_cache_tpu.utils import roofline

print("devices:", jax.devices())

n = 1 << 18              # 256k rows (x image per 8-RHS chunk ~8 MB gate)
ndiag = 27
rng = np.random.default_rng(0)
offs = list(range(-(ndiag // 2), ndiag // 2 + 1))
m = sp.spdiags(rng.standard_normal((ndiag, n)).astype(np.float32), offs, n, n).tocsr()
m.sort_indices()
a = from_scipy(m.astype(np.float32))
p = build_dia_plan(a).to_device()
nnz = m.nnz

for k in (8, 32):
    b0 = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    y = np.asarray(spmm_dia(p, b0))
    want = m.astype(np.float64) @ np.asarray(b0)
    err = np.abs(y - want).max() / np.abs(want).max()
    print(f"k={k}: err {err:.3g}", flush=True)

    def make(iters, k=k, b0=b0):
        @jax.jit
        def go(plan, b):
            def body(_, v):
                w = spmm_dia(plan, v)
                return w / jnp.maximum(jnp.linalg.norm(w), 1e-30)
            return jax.lax.fori_loop(0, iters, body, b)[:1, :1]
        return lambda: go(p, b0)

    dt = roofline.time_marginal(make, i1=10, i2=30)
    gflop = 2 * nnz * k / dt / 1e9
    print(f"k={k}: {dt*1e3:.3f} ms -> {nnz/dt/1e9:.1f} Gnnz/s x {k} RHS "
          f"= {gflop:.0f} GFLOP/s", flush=True)

"""Probe: integrated 4-tile-group window kernel speed (bench matrix)."""
import time
import numpy as np
import jax
import jax.numpy as jnp
import scipy.sparse as sp

jax.config.update("jax_compilation_cache_dir", "/tmp/spmv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import sys
sys.path.insert(0, "/root/repo")
from spmv_vector_cache_tpu.formats.convert import from_scipy
from spmv_vector_cache_tpu.formats.plan import auto_plan, build_sell_plan
from spmv_vector_cache_tpu.ops.spmv_pallas import spmv_plan
from spmv_vector_cache_tpu.ops.spmm_pallas import spmm_plan
from spmv_vector_cache_tpu.utils import roofline

print("devices:", jax.devices())

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

p = auto_plan(a, allow_dia=False).to_device()
print(f"plan: K={p.stats.window_blocks} G={p.stats.groups_per_step}")
y = np.asarray(spmv_plan(p, x0, strategy="window"))
err = np.abs(y - want).max() / np.abs(want).max()
print(f"window err {err:.3g}")


def make(iters):
    @jax.jit
    def go(plan, x):
        return jax.lax.fori_loop(
            0, iters, lambda i, v: spmv_plan(plan, v, strategy="window"), x)[:1]
    return lambda: go(p, x0)


dt = roofline.time_marginal(make, i1=20, i2=60)
print(f"window (WG=4): {dt*1e3:.3f} ms -> {nnz/dt/1e9:.1f} Gnnz/s")

# spmm sanity on a smaller banded matrix (TPU compile of full 1M spmm is heavy)
n2 = 1 << 16
m2 = sp.spdiags(rng.standard_normal((ndiag, n2)).astype(np.float32), offs, n2, n2).tocsr()
m2.sort_indices()
a2 = from_scipy(m2.astype(np.float32))
p2 = build_sell_plan(a2).to_device()
b = rng.standard_normal((n2, 16)).astype(np.float32)
yb = np.asarray(spmm_plan(p2, b))
wantb = m2.astype(np.float64) @ b
errb = np.abs(yb - wantb).max() / np.abs(wantb).max()
print(f"spmm err {errb:.3g}")

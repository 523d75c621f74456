"""Probe: per-group gather-pass count K vs throughput (banded 1M matrix).

K=1 (stripe_width=128): one gather pass, no bucket selects, but lower fill.
K=2 (stripe 256), K=3 (natural window) for comparison + stream strategy.
"""
import numpy as np, scipy.sparse as sp, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/spmv_tpu_jax_cache")
from spmv_vector_cache_tpu.formats.convert import from_scipy
from spmv_vector_cache_tpu.formats.plan import build_sell_plan, auto_plan
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
nnz = m.nnz

def run(tag, plan, strategy):
    pd = plan.to_device()
    y = np.asarray(spmv_plan(pd, x0, strategy=strategy, interpret=False))
    err = np.abs(y - want).max() / np.abs(want).max()
    def make(iters):
        @jax.jit
        def go(p, x):
            def body(_, v):
                w = spmv_plan(p, v, strategy=strategy, interpret=False)
                return w / jnp.maximum(jnp.linalg.norm(w), 1e-30)
            return jax.lax.fori_loop(0, iters, body, x)[:1]
        return lambda: go(pd, x0)
    dt = roofline.time_marginal(make, i1=20, i2=80)
    s = plan.stats
    print(f"{tag}: K={s.window_blocks} fill={s.fill:.3f} tiles={s.num_tiles} "
          f"err={err:.1e} {dt*1e3:.3f} ms -> {nnz/dt/1e9:.2f} Gnnz/s",
          flush=True)

p3 = auto_plan(a, allow_dia=False)
run("auto(K=3)", p3, "window")
for sw, sig in ((128, 1024), (256, 1024)):
    p = build_sell_plan(a, stripe_width=sw, sigma=sig, max_window_blocks=4)
    run(f"stripe{sw}", p, "window")
run("stream", p3, "stream")

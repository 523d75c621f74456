"""Probe: where do powerlaw_rows' 3.787 ms/apply actually go?

Times, on the real TPU with chained marginal timing: (a) the full
spmv_plan apply for the committed auto plan, (b) the 2-D tile->slice
sorted row-segment reduce standalone, (c) the 1-D row_map fixup
standalone, (d) candidate replacement plans.  Decides the round-5
redesign (VERDICT ask #2).
"""
import numpy as np
import jax
import jax.numpy as jnp

from spmv_vector_cache_tpu.formats.containers import COO
from spmv_vector_cache_tpu.formats.convert import coo_to_csr
from spmv_vector_cache_tpu.formats.plan import auto_plan, build_sell_plan
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


def chain(fn, *args, i1=20, i2=80):
    def make(iters):
        @jax.jit
        def go(*a):
            def body(_, v):
                w = fn(*a[:-1], v)
                return w / jnp.maximum(jnp.max(jnp.abs(w)), 1e-30)
            return jax.lax.fori_loop(0, iters, body, a[-1])[:1]
        return lambda: go(*args)
    return roofline.time_marginal(make, i1=i1, i2=i2)


def report(name, plan):
    pd = plan.to_device()
    y = np.asarray(spmv_plan(pd, x0))
    err = float(np.abs(y - want).max() / max(1.0, np.abs(want).max()))
    dt = chain(lambda p, v: spmv_plan(p, v), pd, x0)
    s = plan.stats
    print(f"{name:34s} {dt*1e6:8.1f} us  {nnz/dt/1e9:6.2f} Gnnz/s  "
          f"err={err:.1e}  T={s.num_tiles} fill={s.fill:.2f} "
          f"K={s.window_blocks} sub={s.num_subrows} str={s.num_stripes}")
    return dt


p_auto = auto_plan(a2)
dt_full = report("auto (committed r4 choice)", p_auto)

# standalone: 2-D tile->slice sorted row-segment reduce at this scale
T, S = p_auto.stats.num_tiles, p_auto.num_slices
ids = jnp.asarray(p_auto.tile_slice)
part = jnp.asarray(rng.standard_normal((T, 128)).astype(np.float32))
dt = chain(lambda i, v: jax.ops.segment_sum(
    v, i, num_segments=S, indices_are_sorted=True)[:1] * 0 + v,
    ids, part, i1=10, i2=40)
print(f"{'2D tile->slice reduce (T=%d)' % T:34s} {dt*1e6:8.1f} us")

# standalone: the 1-D row_map fixup
rm = jnp.asarray(p_auto.row_map)
y2f = jnp.asarray(rng.standard_normal(p_auto.row_map.shape[0])
                  .astype(np.float32))
dt = chain(lambda i, v: jax.ops.segment_sum(
    v, i, num_segments=n2 + 1)[0] * 0 + v, rm, y2f, i1=10, i2=40)
print(f"{'1D row_map segsum (%d slots)' % p_auto.row_map.shape[0]:34s}"
      f" {dt*1e6:8.1f} us")

# candidates
for kw, label in [
    (dict(split=32, sigma=1024, stripe_width=2048), "split32 sig1024 sw2048"),
    (dict(split=32, sigma=1024, stripe_width=1024), "split32 sig1024 sw1024"),
    (dict(split=64, sigma=2048, stripe_width=2048), "split64 sig2048 sw2048"),
    (dict(split=32, sigma=8192, stripe_width=2048), "split32 sig8192 sw2048"),
]:
    try:
        p = build_sell_plan(a2, **kw)
        if p.stats.window_blocks == 0:
            print(f"{label:34s} window-infeasible, skipped")
            continue
        report(label, p)
    except Exception as e:
        print(label, "FAIL", e)

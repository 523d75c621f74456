"""Probe: chunk-8 identity-order plans on the powerlaw matrix.

split=8 (one tile per subrow, no sigma, no stripes) keeps subrows
row-major, so row_map is NON-DECREASING and the merge is local.  This
probe measures, on the real TPU:

  (a) plan shape (fill, K) and full-apply time at max_window_blocks
      raised to 24/48/64 -- the K-cost curve for the windowed kernel;
  (b) epilogue variants for a sorted row_map: the current unsorted
      segment_sum, the same with indices_are_sorted=True, and the
      block-cumsum + gather-at-ends trick.

Decides the round-5 merge-epilogue design (VERDICT ask #2).
"""
import numpy as np
import jax
import jax.numpy as jnp

from spmv_vector_cache_tpu.formats.containers import COO
from spmv_vector_cache_tpu.formats.convert import coo_to_csr
from spmv_vector_cache_tpu.formats.plan import build_sell_plan
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
          f"K={s.window_blocks} sub={s.num_subrows}", flush=True)
    return plan, dt


# (a) chunk-8 plans at raised K caps
for mwb in (24, 48, 64):
    try:
        p = build_sell_plan(a2, split=8, max_window_blocks=mwb)
        if p.stats.window_blocks == 0:
            print(f"split8 mwb={mwb:3d}: window-infeasible "
                  f"(needs more than {mwb} blocks)", flush=True)
            continue
        report(f"split8 mwb={mwb}", p)
        break
    except Exception as e:
        print(f"split8 mwb={mwb} FAIL {type(e).__name__}: {e}", flush=True)

# also: split=16 (2 tiles/subrow) for comparison
for mwb in (48, 64):
    p16 = build_sell_plan(a2, split=16, max_window_blocks=mwb)
    if p16.stats.window_blocks:
        report(f"split16 mwb={mwb}", p16)
        break
    print(f"split16 mwb={mwb}: infeasible", flush=True)

# (b) epilogue variants over the split-8 sorted row_map
p8 = build_sell_plan(a2, split=8, max_window_blocks=64)
rm_np = np.asarray(p8.row_map)
rows = p8.shape[0]
assert (np.diff(rm_np.astype(np.int64)) >= 0).sum() >= rm_np.size - 1 - \
    (rm_np == rows).sum(), "row_map not sorted?"
sorted_ok = bool((np.diff(rm_np.astype(np.int64)) >= 0).all())
print(f"row_map sorted: {sorted_ok}  slots={rm_np.size}", flush=True)
rm = jnp.asarray(rm_np)
yf = jnp.asarray(np.random.default_rng(0)
                 .standard_normal(rm_np.size).astype(np.float32))

dt = chain(lambda i, v: jax.ops.segment_sum(
    v, i, num_segments=rows + 1)[0] * 0 + v, rm, yf, i1=10, i2=40)
print(f"{'segsum unsorted flag':34s} {dt*1e6:8.1f} us", flush=True)

dt = chain(lambda i, v: jax.ops.segment_sum(
    v, i, num_segments=rows + 1, indices_are_sorted=True)[0] * 0 + v,
    rm, yf, i1=10, i2=40)
print(f"{'segsum sorted flag':34s} {dt*1e6:8.1f} us", flush=True)

# cumsum + gather at segment ends.  ends[r] = index of last slot of row r
# (exclusive prefix), static at plan time; rows with no slots repeat the
# previous end (diff -> 0).
ends_np = np.searchsorted(rm_np, np.arange(1, rows + 1), side="left")
ends = jnp.asarray(ends_np.astype(np.int32))
def cum_gather(e, v):
    c = jnp.cumsum(v)
    ce = jnp.concatenate([jnp.zeros((1,), v.dtype), c])[e]
    y = jnp.diff(jnp.concatenate([jnp.zeros((1,), v.dtype), ce]))
    return y[:1] * 0 + v
dt = chain(cum_gather, ends, yf, i1=10, i2=40)
print(f"{'cumsum + end-gather':34s} {dt*1e6:8.1f} us", flush=True)

# blocked variant: (B, 1024) cumsum along axis 1 (vector-unit friendly),
# block offsets via small cumsum, same end-gather
def cum_gather2(e, v):
    nb = -(-v.shape[0] // 1024)
    v2 = jnp.pad(v, (0, nb * 1024 - v.shape[0])).reshape(nb, 1024)
    c2 = jnp.cumsum(v2, axis=1)
    off = jnp.concatenate([jnp.zeros((1,), v.dtype),
                           jnp.cumsum(c2[:, -1])])
    c = (c2 + off[:-1, None]).reshape(-1)
    ce = jnp.concatenate([jnp.zeros((1,), v.dtype), c])[e]
    y = jnp.diff(jnp.concatenate([jnp.zeros((1,), v.dtype), ce]))
    return y[:1] * 0 + v
dt = chain(cum_gather2, ends, yf, i1=10, i2=40)
print(f"{'blocked cumsum + end-gather':34s} {dt*1e6:8.1f} us", flush=True)

# correctness of the cumsum trick (f32, real partials magnitude)
c = np.cumsum(np.asarray(yf, np.float64))
ce = np.concatenate([[0.0], c])[ends_np]
yref = np.diff(np.concatenate([[0.0], ce]))
ysum = np.zeros(rows + 1)
np.add.at(ysum, rm_np, np.asarray(yf, np.float64))
print("cumsum-trick f64 check:",
      float(np.abs(yref - ysum[:rows]).max()), flush=True)

# (c) the new ChunkPlan on the same matrix
from spmv_vector_cache_tpu.formats.chunk import build_chunk_plan
import time
t0 = time.time()
pc = build_chunk_plan(a2)
print(f"build_chunk_plan: {time.time()-t0:.1f}s  {pc.stats}", flush=True)
pd = pc.to_device()
y = np.asarray(spmv_plan(pd, x0))
err = float(np.abs(y - want).max() / max(1.0, np.abs(want).max()))
dt = chain(lambda p, v: spmv_plan(p, v), pd, x0)
print(f"{'ChunkPlan':34s} {dt*1e6:8.1f} us  {nnz/dt/1e9:6.2f} Gnnz/s  "
      f"err={err:.1e}", flush=True)

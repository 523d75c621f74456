"""Probe: cost of candidate row-fixup primitives on TPU (round 5).

The committed powerlaw_rows row (1.04 Gnnz/s, 3.787 ms/apply) is dominated
by the general ``_fixup_rows`` path: an UNSORTED ``segment_sum`` over
~324K sub-row slots.  This probe measures every alternative primitive the
round-5 epilogue redesign could stand on, at the relevant size
(S = 300K slots -> rows = 131K), with marginal timing.
"""
import numpy as np
import jax
import jax.numpy as jnp
from spmv_vector_cache_tpu.utils import roofline

S = 300_032          # slots (multiple of 128)
ROWS = 131_072

rng = np.random.default_rng(0)
slots_np = rng.standard_normal(S).astype(np.float32)

# monotone row_map: rows in order, variable 1..8 parts per row, padded tail
parts = np.minimum(rng.pareto(1.5, ROWS).astype(np.int64) + 1, 64)
scale = (S - 64) / parts.sum()
parts = np.maximum(1, (parts * scale).astype(np.int64))
row_map_sorted = np.repeat(np.arange(ROWS, dtype=np.int32), parts)
row_map_sorted = np.pad(row_map_sorted, (0, S - row_map_sorted.shape[0]),
                        constant_values=ROWS)
starts = np.concatenate([[0], np.cumsum(parts)]).astype(np.int32)  # rows+1

# locally-shuffled row_map (sigma=1024 window sort analog)
perm = np.arange(S)
for w0 in range(0, S, 1024):
    w1 = min(w0 + 1024, S)
    perm[w0:w1] = w0 + rng.permutation(w1 - w0)
row_map_local = row_map_sorted[perm]

# fully random
row_map_rand = rng.permutation(row_map_sorted)

slots = jnp.asarray(slots_np)


def chain(fn, *args, i1=30, i2=90):
    def make(iters):
        @jax.jit
        def go(*a):
            def body(_, v):
                w = fn(*a[:-1], v)
                return w / jnp.maximum(jnp.max(jnp.abs(w)), 1e-30)
            # v must have slot shape for chaining: wrap so output feeds back
            return jax.lax.fori_loop(0, iters, body, a[-1])[:1]
        aj = [jnp.asarray(x) for x in args]
        return lambda: go(*aj)
    return roofline.time_marginal(make, i1=i1, i2=i2)


def bench(name, fn, *args):
    # chain by re-scattering y back into slot shape is awkward; instead
    # chain on the slots vector: v -> fixup -> broadcast back via cheap pad
    def step(*a):
        v = a[-1]
        y = fn(*a[:-1], v)
        # feed back: tile y to slot length (cheap, contiguous)
        reps = -(-S // y.shape[0])
        return jnp.tile(y, reps)[:S]
    dt = chain(step, *args, slots)
    print(f"{name:44s} {dt*1e6:9.1f} us")
    return dt


print("== fixup primitive costs (S=300K slots -> 131K rows) ==")

rm_s = jnp.asarray(row_map_sorted)
rm_l = jnp.asarray(row_map_local)
rm_r = jnp.asarray(row_map_rand)
st = jnp.asarray(starts)

bench("unsorted segment_sum (current path)",
      lambda rm, v: jax.ops.segment_sum(v, rm, num_segments=ROWS + 1), rm_r)
bench("locally-shuffled segment_sum",
      lambda rm, v: jax.ops.segment_sum(v, rm, num_segments=ROWS + 1), rm_l)
bench("sorted segment_sum (sorted=False flag)",
      lambda rm, v: jax.ops.segment_sum(v, rm, num_segments=ROWS + 1), rm_s)
bench("sorted segment_sum (indices_are_sorted)",
      lambda rm, v: jax.ops.segment_sum(v, rm, num_segments=ROWS + 1,
                                        indices_are_sorted=True), rm_s)

# cumsum + monotone prefix take
bench("f32 cumsum only",
      lambda v: jnp.cumsum(v)[:ROWS])
bench("f64 cumsum + monotone take(starts)",
      lambda s_, v: (lambda p: (p[s_[1:]] - p[s_[:-1]]).astype(jnp.float32))(
          jnp.concatenate([jnp.zeros(1, jnp.float64),
                           jnp.cumsum(v.astype(jnp.float64))])), st)

# takes
idx_mono = jnp.asarray(starts[:-1])
idx_rand = jnp.asarray(rng.integers(0, S, ROWS).astype(np.int32))
bench("monotone element take (131K from 300K)",
      lambda i, v: v[i], idx_mono)
bench("random element take (131K from 300K)",
      lambda i, v: v[i], idx_rand)

# padded-uniform reshape+reduce: 4 slots/row exactly
S4 = ROWS * 4
bench("(131K,4) reshape+sum of 524K",
      lambda v: jnp.pad(v, (0, S4 - S)).reshape(ROWS, 4).sum(axis=1))
bench("strided 4-way slice-add of 524K",
      lambda v: (lambda w: w[0::4] + w[1::4] + w[2::4] + w[3::4])(
          jnp.pad(v, (0, S4 - S))))
# lane-fold layout: (4, 131K) contiguous slabs
bench("contiguous 4-slab add (uniform_parts style)",
      lambda v: (lambda w: w[:ROWS] + w[ROWS:2*ROWS] + w[2*ROWS:3*ROWS]
                 + w[3*ROWS:])(jnp.pad(v, (0, S4 - S))))

# maxp monotone takes: y = sum_j v[start + j] masked
P = 4
mask = jnp.asarray((np.arange(P)[None, :] <
                    parts[:, None]).astype(np.float32))
bench("4x monotone take + mask add",
      lambda i, m, v: sum(v[i + j] * m[:, j] for j in range(P)), idx_mono,
      mask)

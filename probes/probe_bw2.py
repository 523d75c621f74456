"""Probe: DCE-proof HBM bandwidth with large-iter marginal timing.

Each measurement: total time at iters=I1 and I2, marginal = diff/(I2-I1).
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/spmv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

print("devices:", jax.devices())


def sync(x):
    return float(np.asarray(x).ravel()[0])


def timeit_total(fn, repeats=3):
    sync(fn())
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        sync(fn())
        best = min(best, time.perf_counter() - t0)
    return best


I1, I2 = 100, 300

mb = 256
n = (mb << 20) // 4
x = jnp.asarray(np.random.default_rng(0).standard_normal(n).astype(np.float32))

# 1. read-only: s += sum(x * f(i)); state = scalar
def make_reduce(iters):
    @jax.jit
    def go(x):
        def body(i, s):
            return s + jnp.sum(x * (1.0 + 1e-9 * i.astype(jnp.float32)))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0)).reshape(1)
    return lambda: go(x)


t1, t2 = timeit_total(make_reduce(I1)), timeit_total(make_reduce(I2))
dt = (t2 - t1) / (I2 - I1)
print(f"reduce read-only: marginal {dt*1e3:.3f} ms/iter -> {n*4/dt/1e9:.0f} GB/s "
      f"(totals {t1*1e3:.0f}/{t2*1e3:.0f} ms)")

# 2. scale loop, output = full sum (no slicing DCE)
def make_scale_sum(iters):
    @jax.jit
    def go(x):
        out = jax.lax.fori_loop(
            0, iters, lambda i, v: v * 1.0000001 + 1e-30 * i.astype(jnp.float32), x)
        return jnp.sum(out).reshape(1)
    return lambda: go(x)


t1, t2 = timeit_total(make_scale_sum(I1)), timeit_total(make_scale_sum(I2))
dt = (t2 - t1) / (I2 - I1)
print(f"scale r+w (sum out): marginal {dt*1e3:.3f} ms/iter -> {2*n*4/dt/1e9:.0f} GB/s "
      f"(totals {t1*1e3:.0f}/{t2*1e3:.0f} ms)")

# 3. scale loop, output sliced [:1] (DCE suspicion check)
def make_scale_slice(iters):
    @jax.jit
    def go(x):
        out = jax.lax.fori_loop(
            0, iters, lambda i, v: v * 1.0000001 + 1e-30 * i.astype(jnp.float32), x)
        return out[:1]
    return lambda: go(x)


t1, t2 = timeit_total(make_scale_slice(I1)), timeit_total(make_scale_slice(I2))
dt = (t2 - t1) / (I2 - I1)
print(f"scale r+w ([:1] out): marginal {dt*1e3:.3f} ms/iter -> {2*n*4/dt/1e9:.0f} GB/s "
      f"(totals {t1*1e3:.0f}/{t2*1e3:.0f} ms)")

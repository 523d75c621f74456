"""Probe: is the ~1.3ms/iter a while-loop overhead, a per-kernel cost, or
a measurement artifact? Vary iters at fixed size; compare unrolled chain;
compare eager dispatch."""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/spmv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

print("devices:", jax.devices())


def sync(x):
    return float(np.asarray(x).ravel()[0])


def timeit(fn, repeats=3):
    sync(fn())
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        sync(fn())
        best = min(best, time.perf_counter() - t0)
    return best


mb = 64
n = (mb << 20) // 4
x = jnp.asarray(np.random.default_rng(0).standard_normal(n).astype(np.float32))

for iters in (10, 20, 40, 80):
    @jax.jit
    def chain(x, iters=iters):
        return jax.lax.fori_loop(0, iters, lambda i, v: v * 1.0000001 + 1e-30 * i, x)[:1]

    dt = timeit(lambda: chain(x)) / iters
    print(f"fori {iters:3d} iters: {dt*1e3:.3f} ms/iter ({2*n*4/dt/1e9:.0f} GB/s)")

# unrolled: 20 dependent multiplies in one jit, no while loop
@jax.jit
def unrolled(x):
    v = x
    for i in range(20):
        v = v * 1.0000001 + 1e-30 * i
    return v[:1]

dt = timeit(lambda: unrolled(x)) / 20
print(f"unrolled 20: {dt*1e3:.3f} ms/iter ({2*n*4/dt/1e9:.0f} GB/s)")

# unrolled with DIFFERENT ops so XLA can't CSE/fuse into one loop kernel
@jax.jit
def unrolled40(x):
    v = x
    for i in range(40):
        v = v * 1.0000001 + 1e-30 * i
    return v[:1]

dt = timeit(lambda: unrolled40(x)) / 40
print(f"unrolled 40: {dt*1e3:.3f} ms/iter ({2*n*4/dt/1e9:.0f} GB/s)")

# eager: one jitted elementwise op dispatched from python 20x
@jax.jit
def onestep(v):
    return v * 1.0000001

sync(onestep(x))
t0 = time.perf_counter()
v = x
for _ in range(20):
    v = onestep(v)
sync(v)
dt = (time.perf_counter() - t0) / 20
print(f"eager 20: {dt*1e3:.3f} ms/iter ({2*n*4/dt/1e9:.0f} GB/s)")

"""Probe: what HBM bandwidth is actually achievable on this chip?

Tries several streaming shapes: elementwise scale (r+w), copy, reduce
(read-only), and a Pallas streaming-sum kernel, at several sizes.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/spmv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

print("devices:", jax.devices())


def sync(x):
    return float(np.asarray(x).ravel()[0])


def timeit(fn, iters):
    sync(fn())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sync(fn())
        best = min(best, time.perf_counter() - t0)
    return best / iters


for mb in (64, 256, 512):
    n = (mb << 20) // 4
    x = jnp.asarray(np.random.default_rng(0).standard_normal(n).astype(np.float32))

    iters = 20

    @jax.jit
    def scale_chain(x):
        return jax.lax.fori_loop(0, iters, lambda i, v: v * 1.0000001 + 1e-30 * i, x)[:1]

    dt = timeit(lambda: scale_chain(x), iters)
    print(f"{mb}MB scale (r+w): {2 * n * 4 / dt / 1e9:.0f} GB/s  ({dt*1e3:.2f} ms/iter)")

    @jax.jit
    def reduce_chain(x):
        def body(i, acc):
            return acc + jnp.sum(x * (1.0 + 1e-9 * i))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0)).reshape(1)

    dt = timeit(lambda: reduce_chain(x), iters)
    print(f"{mb}MB reduce (r):  {n * 4 / dt / 1e9:.0f} GB/s  ({dt*1e3:.2f} ms/iter)")

# pallas streaming reduce: grid over blocks, each step reads one block
mb = 512
n = (mb << 20) // 4
R = 128
C = n // R
x2 = jnp.asarray(np.random.default_rng(0).standard_normal((R, C)).astype(np.float32))
BLK = 4096


def psum_kernel(x_ref, o_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)
    o_ref[...] += jnp.sum(x_ref[...], axis=1, keepdims=True)


@jax.jit
def pallas_reduce(x):
    return pl.pallas_call(
        psum_kernel,
        grid=(C // BLK,),
        in_specs=[pl.BlockSpec((R, BLK), lambda i: (0, i))],
        out_specs=pl.BlockSpec((R, 1), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((R, 1), jnp.float32),
    )(x)


dt = timeit(lambda: pallas_reduce(x2), 1)
print(f"{mb}MB pallas reduce (r): {n * 4 / dt / 1e9:.0f} GB/s ({dt*1e3:.2f} ms)")

# pallas with bigger block along sublanes
def psum_kernel2(x_ref, o_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)
    o_ref[...] += jnp.sum(x_ref[...], axis=0, keepdims=True)


M = n // 512
x3 = jnp.asarray(np.random.default_rng(0).standard_normal((M, 512)).astype(np.float32))
for BM in (512, 2048, 8192):
    @jax.jit
    def pallas_reduce2(x):
        return pl.pallas_call(
            psum_kernel2,
            grid=(M // BM,),
            in_specs=[pl.BlockSpec((BM, 512), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((1, 512), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, 512), jnp.float32),
        )(x3)

    dt = timeit(lambda: pallas_reduce2(x3), 1)
    print(f"{mb}MB pallas reduce blk=({BM},512): {n * 4 / dt / 1e9:.0f} GB/s ({dt*1e3:.2f} ms)")

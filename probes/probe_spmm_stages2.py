"""Stage costs of the 2-D fused SpMM at k=8 (TPU), v2."""
import numpy as np
import jax
import jax.numpy as jnp
import scipy.sparse as sp
from jax.experimental import pallas as pl

from spmv_vector_cache_tpu.formats.convert import from_scipy
from spmv_vector_cache_tpu.formats.plan import auto_plan, window_image_blocks
from spmv_vector_cache_tpu.ops import spmm_pallas as sp_mod
from spmv_vector_cache_tpu.utils import roofline

jax.config.update("jax_compilation_cache_dir", "/tmp/spmv_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

rng = np.random.default_rng(0)
n = 1 << 19
nd = 27
m = sp.spdiags(rng.standard_normal((nd, n)).astype(np.float32),
               list(range(-(nd // 2), nd // 2 + 1)), n, n).tocsr()
m.sort_indices()
a = from_scipy(m.astype(np.float32))
plan = auto_plan(a, allow_dia=False).to_device()
st = plan.stats
T, P, R = plan.vals.shape
K, WG, G = st.window_blocks, st.group_tiles, st.groups_per_step
gr = st.window_grain
ngroups = T // WG
nb = window_image_blocks(plan.shape[1], st.max_window_base, K, gr)
k8, C = 1, 8
B = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
bt = B.T
btw = sp_mod._bt_windows(bt, k8, plan.shape[1], nb, gr,
                         plan.window_rows, ngroups, K, jnp.float32)
SG = 8 * G
NG = SG // WG
steps = T // SG


def chain(fn, *args, i1=5, i2=20):
    def make(iters):
        @jax.jit
        def go(*a):
            def body(_, v):
                w = fn(*a[:-1], v)
                return v + w.reshape(-1)[:1] * 1e-30
            return jax.lax.fori_loop(0, iters, body, a[-1])[:1]
        return lambda: go(*args)
    return roofline.time_marginal(make, i1=i1, i2=i2)


gs = pl.GridSpec(
    grid=(k8, steps),
    in_specs=[
        pl.BlockSpec((SG, P, R), lambda kc, i: (i, 0, 0)),
        pl.BlockSpec((SG, P, R), lambda kc, i: (i, 0, 0)),
        pl.BlockSpec((NG * C, K * 128),
                     lambda kc, i, s=steps: (kc * s + i, 0)),
    ],
    out_specs=pl.BlockSpec((SG * C, R),
                           lambda kc, i, s=steps: (kc * s + i, 0)),
)
def f_kern(b):
    return pl.pallas_call(
        sp_mod._make_spmm_kernel(K, NG, P, R, WG, jnp.float32),
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((k8 * T * C, R), jnp.float32),
    )(plan.vals, plan.cols_win, b)

# kernel only, chained on btw
def kb(v):
    return f_kern(v)
dt = chain(kb, btw)
print(f"kernel only (2-D): {dt*1e3:8.3f} ms", flush=True)

# full fused spmm, chained on B
from spmv_vector_cache_tpu.ops.spmm_pallas import spmm_plan
def full(v):
    return spmm_plan(plan, v)
dt = chain(full, B)
print(f"full fused       : {dt*1e3:8.3f} ms", flush=True)

# full minus kernel: bt + btw + downstream with a FAKE partials (zeros)
zer = jnp.zeros((k8 * T * C, R), jnp.float32)
def nokern(v):
    btv = v.T
    bw = sp_mod._bt_windows(btv, k8, plan.shape[1], nb, gr,
                            plan.window_rows, ngroups, K, jnp.float32)
    p4 = (zer + bw.reshape(-1)[:1]).reshape(k8, T, C, R)
    y4 = jnp.stack([
        jax.ops.segment_sum(p4[kc], jnp.asarray(plan.tile_slice),
                            num_segments=plan.num_slices,
                            indices_are_sorted=True)
        for kc in range(k8)], axis=1)
    flat = y4.transpose(0, 3, 1, 2).reshape(plan.num_slices * R, k8 * C)
    return flat[:plan.shape[0]]
dt = chain(nokern, B)
print(f"everything else  : {dt*1e3:8.3f} ms", flush=True)

# composition bisection: real pipeline up to stage X, scalar out
def upto_kernel(v):
    btv = v.T
    bw = sp_mod._bt_windows(btv, k8, plan.shape[1], nb, gr,
                            plan.window_rows, ngroups, K, jnp.float32)
    return f_kern(bw)
dt = chain(upto_kernel, B)
print(f"bt+btw+kernel    : {dt*1e3:8.3f} ms", flush=True)

def upto_seg(v):
    p = upto_kernel(v).reshape(k8, T, C, R)
    y4 = jnp.stack([
        jax.ops.segment_sum(p[kc], jnp.asarray(plan.tile_slice),
                            num_segments=plan.num_slices,
                            indices_are_sorted=True)
        for kc in range(k8)], axis=1)
    return y4
dt = chain(upto_seg, B)
print(f"...+segsum       : {dt*1e3:8.3f} ms", flush=True)

def upto_final(v):
    y4 = upto_seg(v)
    flat = y4.transpose(0, 3, 1, 2).reshape(plan.num_slices * R, k8 * C)
    return flat[:plan.shape[0]]
dt = chain(upto_final, B)
print(f"...+final        : {dt*1e3:8.3f} ms", flush=True)

def via_wrapped(v):
    return sp_mod._spmm_window.__wrapped__(plan, v.T, False)
dt = chain(via_wrapped, B)
print(f"_spmm_window raw : {dt*1e3:8.3f} ms", flush=True)

def via_jitted(v):
    return sp_mod._spmm_window(plan, v.T, interpret=False)
dt = chain(via_jitted, B)
print(f"_spmm_window jit : {dt*1e3:8.3f} ms", flush=True)

"""Stage-by-stage cost of the fused SpMM at k=8 (TPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import scipy.sparse as sp

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
k = 8
k8 = 1
B = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))


def chain(fn, *args, i1=5, i2=20):
    def make(iters):
        @jax.jit
        def go(*a):
            def body(_, v):
                w = fn(*a[:-1], v)
                return (w.reshape(-1)[:1] * 0 + v.reshape(-1)[:1]) \
                    .reshape(1) * 0 + v
            return jax.lax.fori_loop(0, iters, body, a[-1])[0]
        return lambda: go(*args)
    return roofline.time_marginal(make, i1=i1, i2=i2)


# stage 1: bt = B.T
dt = chain(lambda b: b.T + 0.0, B)
print(f"bt transpose      : {dt*1e3:8.3f} ms", flush=True)

bt = B.T
rowidx = plan.window_rows
# stage 2: btw build
def f_btw(bt_):
    return sp_mod._bt_windows(bt_, k8, plan.shape[1], nb, gr,
                              rowidx, ngroups, K, jnp.float32)
dt = chain(lambda b: f_btw(b), bt)
print(f"btw build         : {dt*1e3:8.3f} ms", flush=True)

btw = f_btw(bt)
from jax.experimental import pallas as pl
B_, G_ = 8, G
NG = (B_ * G_) // WG
grid_spec = pl.GridSpec(
    grid=(k8, T // (B_ * G_)),
    in_specs=[
        pl.BlockSpec((B_ * G_, P, R), lambda kc, i: (i, 0, 0)),
        pl.BlockSpec((B_ * G_, P, R), lambda kc, i: (i, 0, 0)),
        pl.BlockSpec((1, NG, 8, K * 128), lambda kc, i: (kc, i, 0, 0)),
    ],
    out_specs=pl.BlockSpec((1, B_ * G_, 8, R), lambda kc, i: (kc, i, 0, 0)),
)
def f_kern(btw_):
    return pl.pallas_call(
        sp_mod._make_spmm_kernel(K, NG, P, R, WG, jnp.float32),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k8, T, 8, R), jnp.float32),
    )(plan.vals, plan.cols_win, btw_)
dt = chain(lambda b: f_kern(b), btw)
print(f"pallas kernel     : {dt*1e3:8.3f} ms", flush=True)

partials = f_kern(btw)
def f_seg(p_):
    y4 = jax.ops.segment_sum(p_.transpose(1, 0, 2, 3),
                             jnp.asarray(plan.tile_slice),
                             num_segments=plan.num_slices,
                             indices_are_sorted=True)
    return y4
dt = chain(lambda p_: f_seg(p_), partials)
print(f"transpose+segsum  : {dt*1e3:8.3f} ms", flush=True)

y4 = f_seg(partials)
def f_final(y_):
    flat = y_.transpose(0, 3, 1, 2).reshape(plan.num_slices * R, k8 * 8)
    return flat[:plan.shape[0]]
dt = chain(lambda y_: f_final(y_), y4)
print(f"final relayout    : {dt*1e3:8.3f} ms", flush=True)

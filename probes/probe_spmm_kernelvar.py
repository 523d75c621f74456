"""Bisect the fused-SpMM kernel cost: degenerate kernel variants (TPU)."""
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
k8 = 1
B = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
bt = B.T
btw = sp_mod._bt_windows(bt, k8, plan.shape[1], nb, gr,
                         plan.window_rows, ngroups, K, jnp.float32)
SG = 8 * G
NG = SG // WG


def chain(fn, *args, i1=5, i2=20):
    def make(iters):
        @jax.jit
        def go(*a):
            def body(_, v):
                w = fn(*a[:-1], v)
                # real dependency: fold one kernel output element back in
                return v + w.reshape(-1)[:1] * 1e-30
            return jax.lax.fori_loop(0, iters, body, a[-1])[:1]
        return lambda: go(*args)
    return roofline.time_marginal(make, i1=i1, i2=i2)


def run(name, kernel, out_shape, out_spec):
    gs = pl.GridSpec(
        grid=(k8, T // SG),
        in_specs=[
            pl.BlockSpec((SG, P, R), lambda kc, i: (i, 0, 0)),
            pl.BlockSpec((SG, P, R), lambda kc, i: (i, 0, 0)),
            pl.BlockSpec((1, NG, 8, K * 128),
                         lambda kc, i: (kc, i, 0, 0)),
        ],
        out_specs=out_spec,
    )
    f = lambda b: pl.pallas_call(kernel, grid_spec=gs,
                                 out_shape=out_shape)(
        plan.vals, plan.cols_win, b)
    dt = chain(f, btw)
    print(f"{name:28s} {dt*1e3:8.3f} ms", flush=True)


# v0: pure copy of vals sum -> 3-D out (T, 8?, ...): write (SG, R)
def k_copy(v_ref, c_ref, w_ref, o_ref):
    v = v_ref[...]
    o_ref[0] = jnp.sum(v.reshape(SG, P, R), axis=1)[:, None, :] * \
        jnp.ones((1, 8, 1), v.dtype)
run("v0 sublane-sum bcast8", k_copy,
    jax.ShapeDtypeStruct((k8, T, 8, R), jnp.float32),
    pl.BlockSpec((1, SG, 8, R), lambda kc, i: (kc, i, 0, 0)))

# v1: per-tile loop with static stores, no gather
def k_loop(v_ref, c_ref, w_ref, o_ref):
    v = v_ref[...]
    for t in range(SG):
        acc = jnp.broadcast_to(jnp.sum(v[t], axis=0)[None, :], (8, R))
        o_ref[0, t] = acc
run("v1 tile loop, no gather", k_loop,
    jax.ShapeDtypeStruct((k8, T, 8, R), jnp.float32),
    pl.BlockSpec((1, SG, 8, R), lambda kc, i: (kc, i, 0, 0)))

# v2: tile loop + ONE gather per tile (shared idx), no win broadcast
def k_gat(v_ref, c_ref, w_ref, o_ref):
    v = v_ref[...]
    cw = c_ref[...].astype(jnp.int32)
    for t in range(SG):
        win = w_ref[0, t // WG]                   # (8, K*128)
        lane = jnp.bitwise_and(cw[t, 0:1], 127)   # (1, R)
        idxr = jnp.broadcast_to(lane, (8, R))
        gat = jnp.take_along_axis(win[:, :128], idxr, axis=1)
        o_ref[0, t] = gat * jnp.broadcast_to(v[t, 0:1], (8, R))
run("v2 tile loop, 1 gather", k_gat,
    jax.ShapeDtypeStruct((k8, T, 8, R), jnp.float32),
    pl.BlockSpec((1, SG, 8, R), lambda kc, i: (kc, i, 0, 0)))


# v3: the actual current kernel
run("v3 real kernel", sp_mod._make_spmm_kernel(K, NG, P, R, WG, jnp.float32),
    jax.ShapeDtypeStruct((k8, T, 8, R), jnp.float32),
    pl.BlockSpec((1, SG, 8, R), lambda kc, i: (kc, i, 0, 0)))

# v4: 3-D output (T*8, R) with per-tile static stores
def k_3d(v_ref, c_ref, w_ref, o_ref):
    v = v_ref[...]
    cw = c_ref[...].astype(jnp.int32)
    for t in range(SG):
        win = w_ref[0, t // WG]
        lane = jnp.bitwise_and(cw[t, 0:1], 127)
        idxr = jnp.broadcast_to(lane, (8, R))
        gat = jnp.take_along_axis(win[:, :128], idxr, axis=1)
        o_ref[t * 8:(t + 1) * 8] = gat * jnp.broadcast_to(v[t, 0:1],
                                                         (8, R))
gs3 = pl.GridSpec(
    grid=(k8, T // SG),
    in_specs=[
        pl.BlockSpec((SG, P, R), lambda kc, i: (i, 0, 0)),
        pl.BlockSpec((SG, P, R), lambda kc, i: (i, 0, 0)),
        pl.BlockSpec((1, NG, 8, K * 128), lambda kc, i: (kc, i, 0, 0)),
    ],
    out_specs=pl.BlockSpec((SG * 8, R), lambda kc, i: (i, 0)),
)
f3 = lambda b: pl.pallas_call(k_3d, grid_spec=gs3,
                              out_shape=jax.ShapeDtypeStruct((T * 8, R),
                                                             jnp.float32))(
    plan.vals, plan.cols_win, b)
dt = chain(f3, btw)
print(f"{'v4 2-D out, tile loop':28s} {dt*1e3:8.3f} ms", flush=True)

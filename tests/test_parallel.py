"""Sharded SpMV/SpMM on a virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spmv_vector_cache_tpu.formats import convert
from spmv_vector_cache_tpu.ops import reference
from spmv_vector_cache_tpu.parallel import (build_sharded_plan, make_mesh,
                                            spmm_sharded, spmv_sharded)
from tests.conftest import random_csr

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


def _want(a, x):
    return reference.spmv_numpy(a, np.asarray(x, np.float64))


def test_sharded_plan_shapes(rng):
    a = random_csr(rng, 1000, 1000, density=0.01)
    sp = build_sharded_plan(a, 8)
    assert sp.vals.shape[0] == 8
    assert sp.num_shards == 8
    assert sp.rows_per_shard == 128          # rounded to lane multiple
    assert sp.vals.shape == sp.cols.shape
    assert sp.window_base.shape == (8, sp.vals.shape[1] // 4)


def test_spmv_sharded_all_gather(rng):
    a = random_csr(rng, 1000, 1000, density=0.01)
    x = rng.standard_normal(1000).astype(np.float32)
    sp = build_sharded_plan(a, 8)
    mesh = make_mesh(8)
    y = np.asarray(spmv_sharded(sp, x, mesh, mode="all_gather"))
    np.testing.assert_allclose(y, _want(a, x), rtol=2e-5, atol=2e-5)


def test_spmv_sharded_halo_banded(rng):
    # banded matrix: bandwidth << rows/8 -> halo mode eligible
    import scipy.sparse as sp_
    n = 1024
    diags = [rng.standard_normal(n).astype(np.float32) for _ in range(5)]
    m = sp_.spdiags(np.stack(diags), [-2, -1, 0, 1, 2], n, n).tocsr()
    m.sort_indices()
    a = convert.from_scipy(m.astype(np.float32))
    x = rng.standard_normal(n).astype(np.float32)
    sp = build_sharded_plan(a, 8)
    assert 0 < sp.halo <= sp.rows_per_shard
    mesh = make_mesh(8)
    y_halo = np.asarray(spmv_sharded(sp, x, mesh, mode="halo"))
    y_ag = np.asarray(spmv_sharded(sp, x, mesh, mode="all_gather"))
    want = _want(a, x)
    np.testing.assert_allclose(y_halo, want, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(y_ag, want, rtol=2e-5, atol=2e-5)


def test_spmv_sharded_auto_picks_halo(rng):
    import scipy.sparse as sp_
    n = 512
    m = sp_.spdiags(np.stack([np.ones(n)] * 3), [-1, 0, 1], n, n).tocsr()
    a = convert.from_scipy(m.astype(np.float32))
    spn = build_sharded_plan(a, 8)
    x = rng.standard_normal(n).astype(np.float32)
    y = np.asarray(spmv_sharded(spn, x, make_mesh(8), mode="auto"))
    np.testing.assert_allclose(y, _want(a, x), rtol=2e-5, atol=2e-5)


def test_spmm_sharded(rng):
    a = random_csr(rng, 512, 256, density=0.02)
    b = rng.standard_normal((256, 16)).astype(np.float32)
    sp = build_sharded_plan(a, 8)
    y = np.asarray(spmm_sharded(sp, b, make_mesh(8)))
    want = convert.to_dense(a).astype(np.float64) @ b
    np.testing.assert_allclose(y, want, rtol=2e-5, atol=2e-5)


def test_sharded_jits_end_to_end(rng):
    a = random_csr(rng, 640, 640, density=0.02)
    x = rng.standard_normal(640).astype(np.float32)
    sp = build_sharded_plan(a, 8)
    mesh = make_mesh(8)
    f = jax.jit(lambda spl, xv: spmv_sharded(spl, xv, mesh, mode="all_gather"))
    y = np.asarray(f(jax.tree.map(jax.numpy.asarray, sp), x))
    np.testing.assert_allclose(y, _want(a, x), rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# sharded DIA (ppermute halo exchange)
# ---------------------------------------------------------------------------

def _banded_sq(rng, n, offs):
    import scipy.sparse as sp
    m = sp.spdiags(rng.standard_normal((len(offs), n)).astype(np.float32),
                   offs, n, n).tocsr()
    m.sort_indices()
    return m.astype(np.float32)


def test_sharded_dia_matches_reference(rng):
    from spmv_vector_cache_tpu.formats.convert import from_scipy
    from spmv_vector_cache_tpu.parallel.dia_sharded import (
        build_sharded_dia_plan, spmv_dia_sharded)
    from spmv_vector_cache_tpu.parallel.spmv_sharded import make_mesh

    n, D = 8 * 1024, 8
    m = _banded_sq(rng, n, [-130, -1, 0, 1, 130])
    a = from_scipy(m)
    sp_plan = build_sharded_dia_plan(a, D, sublanes=8)
    assert sp_plan.halo == 256                        # round128(130)
    sp_plan = jax.tree.map(jnp.asarray, sp_plan)
    mesh = make_mesh(D)
    x = rng.standard_normal(n).astype(np.float32)
    y = np.asarray(spmv_dia_sharded(sp_plan, x, mesh))
    want = m.astype(np.float64) @ x
    np.testing.assert_allclose(y, want, rtol=2e-5, atol=2e-5)


def test_sharded_dia_rejects_wide_band(rng):
    from spmv_vector_cache_tpu.formats.convert import from_scipy
    from spmv_vector_cache_tpu.parallel.dia_sharded import \
        build_sharded_dia_plan

    n = 2048
    m = _banded_sq(rng, n, [0, 1500])
    with pytest.raises(ValueError, match="span"):
        build_sharded_dia_plan(from_scipy(m), 8, sublanes=2)


def test_sharded_dia_edge_wraparound_is_zero(rng):
    """Ring halos wrap garbage into edge shards; zero values must kill it."""
    from spmv_vector_cache_tpu.formats.convert import from_scipy
    from spmv_vector_cache_tpu.parallel.dia_sharded import (
        build_sharded_dia_plan, spmv_dia_sharded)
    from spmv_vector_cache_tpu.parallel.spmv_sharded import make_mesh

    n, D = 4 * 1024, 4
    m = _banded_sq(rng, n, [-128, 128])               # pure off-diagonals
    a = from_scipy(m)
    sp_plan = jax.tree.map(jnp.asarray, build_sharded_dia_plan(a, D,
                                                               sublanes=8))
    x = np.full(n, 7.0, np.float32)                   # uniform: wrap errors
    y = np.asarray(spmv_dia_sharded(sp_plan, x, make_mesh(D)))
    want = m.astype(np.float64) @ x                   # edges differ inside
    np.testing.assert_allclose(y, want, rtol=2e-5, atol=2e-5)

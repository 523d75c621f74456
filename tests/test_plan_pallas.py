"""SELL plans + Pallas kernels (interpret mode on CPU)."""

import os

import numpy as np
import pytest

from spmv_vector_cache_tpu.formats import convert, plan as planmod, refio
from spmv_vector_cache_tpu.ops import reference, spmv_pallas, strategy
from tests.conftest import REFERENCE_MATRICES, random_csr, reference_available

needs_reference = pytest.mark.skipif(
    not reference_available(), reason="reference matrices not mounted")

STRATS = ["gather_stream", "x_resident", "x_window"]


def _want(a, x):
    return reference.spmv_numpy(a, x.astype(np.float64))


# ---------------------------------------------------------------------------
# plan construction invariants
# ---------------------------------------------------------------------------

def test_plan_basic_invariants(rng):
    a = random_csr(rng, 300, 200, density=0.05)
    p = planmod.build_sell_plan(a)
    T, P, R = p.vals.shape
    assert (P, R) == (8, 128)
    assert p.stats.nnz == a.nnz
    assert p.tile_slice.shape == (T,)
    assert np.all(np.diff(p.tile_slice) >= 0)          # nondecreasing
    assert p.num_slices % 8 == 0                       # superslice alignment
    assert p.identity_map
    # every slice has at least one tile
    assert set(np.asarray(p.tile_slice)) == set(range(p.num_slices))


def test_plan_split_bounds_subrows(rng):
    # one monster row (the row64k stress shape)
    a = random_csr(rng, 64, 64, density=0.02)
    import scipy.sparse as sp
    dense = np.zeros((64, 64), np.float32)
    dense[0, :] = 1.0
    m = convert.from_scipy(sp.csr_matrix(dense))
    p = planmod.build_sell_plan(m, split=8)
    assert p.stats.num_splits >= 1
    assert not p.identity_map
    assert p.stats.num_subrows > 64


def test_plan_sigma_improves_fill(rng):
    a = random_csr(rng, 2000, 500, density=0.02)
    p0 = planmod.build_sell_plan(a)
    p1 = planmod.build_sell_plan(a, sigma=1024)
    assert p1.stats.fill >= p0.stats.fill


def test_auto_plan_skewed_splits():
    import scipy.sparse as sp
    rng = np.random.default_rng(0)
    dense = np.zeros((256, 256), np.float32)
    dense[0, :] = 1.0                    # long row
    dense[np.arange(256), np.arange(256)] = 1.0
    m = convert.from_scipy(sp.csr_matrix(dense))
    p = planmod.auto_plan(m)
    assert p.stats.num_splits >= 1


# ---------------------------------------------------------------------------
# kernel correctness (interpret mode)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("strat", STRATS)
def test_kernels_match_reference(rng, strat):
    a = random_csr(rng, 500, 400, density=0.03)
    x = rng.standard_normal(400).astype(np.float32)
    p = planmod.build_sell_plan(a).to_device()
    y = np.asarray(spmv_pallas.spmv_plan(p, x, strategy=strat, window=512))
    np.testing.assert_allclose(y, _want(a, x), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("strat", STRATS)
def test_kernels_with_split_sigma(rng, strat):
    a = random_csr(rng, 400, 300, density=0.05)
    x = rng.standard_normal(300).astype(np.float32)
    p = planmod.build_sell_plan(a, split=8, sigma=512).to_device()
    assert not p.identity_map
    y = np.asarray(spmv_pallas.spmv_plan(p, x, strategy=strat, window=512))
    np.testing.assert_allclose(y, _want(a, x), rtol=2e-5, atol=2e-5)


def test_kernel_empty_rows(rng):
    # matrix with empty rows and empty leading/trailing slices
    import scipy.sparse as sp
    dense = np.zeros((300, 100), np.float32)
    dense[150:160, :50] = rng.standard_normal((10, 50)).astype(np.float32)
    m = convert.from_scipy(sp.csr_matrix(dense))
    x = rng.standard_normal(100).astype(np.float32)
    p = planmod.build_sell_plan(m).to_device()
    y = np.asarray(spmv_pallas.spmv_plan(p, x, strategy="gather_stream"))
    np.testing.assert_allclose(y, _want(m, x), rtol=2e-5, atol=2e-5)


@needs_reference
@pytest.mark.parametrize("name", ["circuit204", "i64", "i1k", "row64k"])
def test_kernels_vs_golden(name):
    d = os.path.join(REFERENCE_MATRICES, name)
    a = refio.load_reference_matrix(d)
    gold = refio.load_golden(d)
    p = planmod.auto_plan(a).to_device()
    x = np.ones(a.shape[1], dtype=np.float32)
    y = np.asarray(spmv_pallas.spmv_plan(p, x, strategy="gather_stream"))
    np.testing.assert_allclose(y, gold, rtol=1e-4, atol=1e-4)


def test_x_window_infeasible_raises(rng):
    a = random_csr(rng, 200, 4000, density=0.01)
    p = planmod.build_sell_plan(a).to_device()
    if p.stats.max_tile_col_span > 128:
        with pytest.raises(ValueError, match="infeasible"):
            spmv_pallas.spmv_plan(p, np.ones(4000, np.float32),
                                  strategy="x_window", window=128)


# ---------------------------------------------------------------------------
# strategy selection
# ---------------------------------------------------------------------------

def test_select_strategy_small_matrix(rng):
    a = random_csr(rng, 100, 100, density=0.1)
    p = planmod.build_sell_plan(a)
    assert strategy.select_strategy(p) in spmv_pallas.STRATEGIES


def test_autotune_runs(rng):
    a = random_csr(rng, 256, 256, density=0.05)
    p = planmod.build_sell_plan(a).to_device()
    x = np.ones(256, np.float32)
    res = strategy.autotune(p, x, iters=1)
    assert "gather_stream" in res

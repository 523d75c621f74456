"""Packed-plan tests: the full-generality BufferNone analog.

The reference's zero-buffering variant runs any matrix through its
random-access port (``SpMVFrontendBufferNone.scala:9-175``); the packed
two-pass kernel takes that role here.  Mirrors the reference's test
style: correctness against the software golden loop on structured,
random, and adversarial layouts (``tests/TestSpMVFrontend.scala``)."""

import numpy as np
import pytest
from scipy import sparse

from spmv_vector_cache_tpu.formats.cached import CachedPlan
from spmv_vector_cache_tpu.formats.convert import from_scipy
from spmv_vector_cache_tpu.formats.packed import (PackedPlan,
                                                  build_packed_plan)
from spmv_vector_cache_tpu.formats.plan import auto_plan
from spmv_vector_cache_tpu.ops import reference
from spmv_vector_cache_tpu.ops.spmv_packed import spmv_packed
from spmv_vector_cache_tpu.ops.spmv_pallas import spmv_plan
from spmv_vector_cache_tpu.ops.strategy import (execution_counters,
                                                plan_bytes_per_apply,
                                                plan_nnz, select_strategy)


def _check(m, cb, rng, rtol=1e-4):
    plan = build_packed_plan(m, chunk_blocks=cb).to_device()
    x = rng.standard_normal(m.shape[1]).astype(np.float32)
    y = np.asarray(spmv_packed(plan, x, interpret=True))
    want = reference.spmv_numpy(m, x.astype(np.float64))
    scale = max(1.0, float(np.abs(want).max()))
    np.testing.assert_allclose(y, want, rtol=0, atol=rtol * scale)
    return plan


@pytest.mark.parametrize("rows,cols,density,cb", [
    (300, 5000, 0.01, 8),
    (1000, 40000, 0.002, 64),
    (64, 64, 0.5, 1),
    (500, 100000, 0.0005, 32),    # wider than RESIDENT/DEEP would take
    (20000, 9000, 0.001, 16),     # many row windows
])
def test_packed_random(rows, cols, density, cb):
    rng = np.random.RandomState(7)
    a = sparse.random(rows, cols, density=density, format="csr",
                      random_state=rng, dtype=np.float64)
    a = a.astype(np.float32)
    a.sort_indices()
    plan = _check(from_scipy(a), cb, rng)
    assert plan.stats.nnz == a.nnz


def test_packed_dense_rows_overflow():
    """Runs longer than a lane row split; the non-final parts travel the
    overflow COO path and must still sum exactly."""
    rng = np.random.RandomState(1)
    a = sparse.random(50, 3000, density=0.3, format="csr",
                      random_state=rng, dtype=np.float64).astype(np.float32)
    a.sort_indices()
    plan = _check(from_scipy(a), 4, rng)
    assert plan.stats.overflow_nnz > 0


def test_packed_empty_and_masks():
    m = from_scipy(sparse.csr_matrix((100, 200), dtype=np.float32))
    p = build_packed_plan(m).to_device()
    y = np.asarray(spmv_packed(p, np.ones(200, np.float32),
                               interpret=True))
    assert np.all(y == 0)
    # rows beyond the last nonzero window must come out zero, not
    # uninitialized memory
    a = sparse.csr_matrix(
        (np.ones(3, np.float32), ([0, 1, 2], [5, 6, 7])),
        shape=(40000, 1000))
    plan = build_packed_plan(from_scipy(a), chunk_blocks=2).to_device()
    y = np.asarray(spmv_packed(plan, np.ones(1000, np.float32),
                               interpret=True))
    assert np.all(y[3:] == 0) and np.all(y[:3] == 1)


def test_packed_bf16_values():
    rng = np.random.RandomState(3)
    a = sparse.random(400, 30000, density=0.002, format="csr",
                      random_state=rng, dtype=np.float64).astype(np.float32)
    a.sort_indices()
    m = from_scipy(a)
    import jax.numpy as jnp

    plan = build_packed_plan(m, chunk_blocks=16,
                             value_dtype=jnp.bfloat16).to_device()
    x = rng.standard_normal(m.shape[1]).astype(np.float32)
    y = np.asarray(spmv_packed(plan, x, interpret=True))
    want = reference.spmv_numpy(m, x.astype(np.float64))
    scale = max(1.0, float(np.abs(want).max()))
    np.testing.assert_allclose(y, want, rtol=0, atol=2e-2 * scale)


def test_packed_rejects_non_ring_semirings():
    m = from_scipy(sparse.eye(64, format="csr", dtype=np.float32))
    p = build_packed_plan(m)
    with pytest.raises(ValueError, match="plus_times"):
        spmv_packed(p, np.ones(64, np.float32), semiring="min_plus",
                    interpret=True)


def test_auto_plan_routes_locality_poor_to_packed_or_cached():
    """The r3 stream cliff: a wide matrix with no locality and no column
    skew must land on a real kernel (packed), never the 0.1 Gnnz/s
    stream gather; with skew, the cached split's cold part is packed."""
    rng = np.random.RandomState(11)
    n = 1 << 17
    rows = np.repeat(np.arange(n, dtype=np.int64), 4)
    cols = rng.randint(0, n, rows.shape[0]).astype(np.int32)
    from spmv_vector_cache_tpu.formats.containers import COO
    from spmv_vector_cache_tpu.formats.convert import coo_to_csr

    a = coo_to_csr(COO(data=rng.standard_normal(rows.shape[0])
                       .astype(np.float32),
                       row=rows.astype(np.int32), col=cols,
                       shape=(n, n)))
    plan = auto_plan(a)
    assert isinstance(plan, PackedPlan)
    assert select_strategy(plan) == "packed"
    # skewed columns -> cached split with a packed cold tail
    u = rng.random_sample(rows.shape[0])
    cols2 = np.minimum((n * u ** 8).astype(np.int64), n - 1).astype(np.int32)
    a2 = coo_to_csr(COO(data=rng.standard_normal(rows.shape[0])
                        .astype(np.float32),
                        row=rows.astype(np.int32), col=cols2,
                        shape=(n, n)))
    plan2 = auto_plan(a2)
    assert isinstance(plan2, CachedPlan)
    # the tail is served by a real plan: a deeper cache level, a packed
    # plan, or (tiny tails only) a windowless SELL plan whose deep cost
    # is bounded — never the bare stream cliff at volume
    cold = plan2.cold
    while isinstance(cold, CachedPlan):
        cold = cold.cold
    if cold is not None and not isinstance(cold, PackedPlan):
        from spmv_vector_cache_tpu.formats.plan import _cdiv
        nwin = max(1, _cdiv(cold.shape[0], 8192))
        nch = max(1, _cdiv(cold.shape[1], 128 * 128))
        assert cold.stats.nnz < 100 * nwin * nch
    # end-to-end through the dispatcher
    x = rng.standard_normal(n).astype(np.float32)
    y = np.asarray(spmv_plan(plan2.to_device(), x, interpret=True))
    want = reference.spmv_numpy(a2, x.astype(np.float64))
    scale = max(1.0, float(np.abs(want).max()))
    np.testing.assert_allclose(y, want, rtol=0, atol=1e-3 * scale)


def test_packed_counters_and_bytes():
    rng = np.random.RandomState(5)
    a = sparse.random(2000, 50000, density=0.001, format="csr",
                      random_state=rng, dtype=np.float64).astype(np.float32)
    a.sort_indices()
    plan = build_packed_plan(from_scipy(a), chunk_blocks=32)
    assert plan_nnz(plan) == a.nnz
    c = execution_counters(plan)
    assert c["grid_steps"] == (plan.stats.num_steps_a
                               + plan.stats.num_steps_b)
    assert c["gather_passes"] > 0 and c["shift_ops"] > 0
    assert plan_bytes_per_apply(plan) > a.nnz * 6


def test_packed_plan_invariants():
    """Layout invariants the kernels rely on (validate_plan's role,
    ``plan.py:767``): monotonic window steps, in-range extraction
    indices, flag-bit discipline."""
    rng = np.random.RandomState(9)
    a = sparse.random(5000, 30000, density=0.002, format="csr",
                      random_state=rng, dtype=np.float64).astype(np.float32)
    a.sort_indices()
    p = build_packed_plan(from_scipy(a), chunk_blocks=16)
    sps = p.stats.step_tiles * 1024
    assert np.all(np.diff(np.asarray(p.wstep)) >= 0)
    e = np.asarray(p.esrc)
    assert e.max() < sps and e.min() >= -1
    assert np.asarray(p.sblock).max() < p.stats.num_steps_a
    cols = np.asarray(p.cols).reshape(-1)
    assert np.all((cols & 0x3FFF) < p.stats.chunk_blocks * 128)
    # primary piece count == extracted positions
    assert int((e >= 0).sum()) == p.stats.num_pieces

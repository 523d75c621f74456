"""'resident' strategy: the randAcc / BufferNone analog.

The reference's BufferNone frontend performs one random DDR access per
operand through the randAcc port (``SpMVFrontendBufferNone.scala:9-175``,
``SpMVBackendTwoPort.scala:113-136``).  The TPU port keeps x fully
VMEM-resident and pays per-block gather+select VPU work instead of DDR
latency — no column locality required at all.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from spmv_vector_cache_tpu.formats.convert import from_scipy
from spmv_vector_cache_tpu.formats.plan import auto_plan, build_sell_plan
from spmv_vector_cache_tpu.ops.spmv_pallas import (RESIDENT_MAX_BLOCKS,
                                                   spmv_plan)
from spmv_vector_cache_tpu.ops.strategy import select_strategy


def _random_lowdeg(rng, nr, nc, deg):
    rows = np.repeat(np.arange(nr), deg)
    cols = rng.integers(0, nc, nr * deg)
    m = sp.csr_matrix((rng.standard_normal(nr * deg).astype(np.float32),
                       (rows, cols)), shape=(nr, nc))
    m.sum_duplicates()
    m.sort_indices()
    return m


@pytest.mark.parametrize("nc", [1000, 4096])
def test_resident_matches_reference(rng, nc):
    import jax.numpy as jnp

    m = _random_lowdeg(rng, 2048, nc, 8)
    p = auto_plan(from_scipy(m.astype(np.float32)), allow_dia=False)
    x = rng.standard_normal(nc).astype(np.float32)
    y = np.asarray(spmv_plan(p.to_device(), jnp.asarray(x),
                             strategy="resident", interpret=True))
    want = m.astype(np.float64) @ x
    assert np.abs(y - want).max() / np.abs(want).max() < 1e-5


def test_auto_selects_resident_for_locality_poor(rng):
    """Small-x locality-poor matrices: auto_plan must leave the window
    infeasible (no striping) and dispatch must pick 'resident'."""
    import jax.numpy as jnp

    nc = 128 * min(RESIDENT_MAX_BLOCKS, 32)
    m = _random_lowdeg(rng, 4096, nc, 6)
    p = auto_plan(from_scipy(m.astype(np.float32)), allow_dia=False)
    assert p.stats.num_stripes == 1
    assert p.stats.window_blocks == 0
    assert select_strategy(p) == "resident"
    x = rng.standard_normal(nc).astype(np.float32)
    y = np.asarray(spmv_plan(p.to_device(), jnp.asarray(x),
                             interpret=True))
    want = m.astype(np.float64) @ x
    assert np.abs(y - want).max() / np.abs(want).max() < 1e-5


def test_resident_rejects_oversized_x(rng):
    import jax.numpy as jnp

    nc = 128 * (RESIDENT_MAX_BLOCKS + 1)
    m = _random_lowdeg(rng, 256, nc, 4)
    p = build_sell_plan(from_scipy(m.astype(np.float32)),
                        max_window_blocks=2)
    if p.stats.window_blocks:
        pytest.skip("unexpectedly window-feasible")
    x = rng.standard_normal(nc).astype(np.float32)
    with pytest.raises(ValueError, match="RESIDENT_MAX_BLOCKS"):
        spmv_plan(p.to_device(), jnp.asarray(x), strategy="resident",
                  interpret=True)


def test_resident_semiring(rng):
    """min_plus through the resident path (kernel_ops parameterization)."""
    import jax.numpy as jnp

    nc = 512
    dense = np.where(rng.random((300, nc)) < 0.05,
                     rng.random((300, nc)) + 0.5, 0.0).astype(np.float32)
    m = sp.csr_matrix(dense)
    m.sort_indices()
    p = auto_plan(from_scipy(m), allow_dia=False, semiring="min_plus")
    x = (rng.random(nc) * 2).astype(np.float32)
    y = np.asarray(spmv_plan(p.to_device(), jnp.asarray(x),
                             strategy="resident", interpret=True,
                             semiring="min_plus"))
    md = np.where(dense != 0, dense, np.inf)
    want = np.min(md + x[None, :], axis=1)
    mask = ~np.isinf(want)
    assert np.abs((y - want)[mask]).max() < 1e-5

"""Reference executors: host loop + jnp golden path vs scipy and goldens."""

import os

import numpy as np
import pytest

from spmv_vector_cache_tpu.formats import convert, refio
from spmv_vector_cache_tpu.ops import reference, semiring
from tests.conftest import REFERENCE_MATRICES, random_csr, reference_available

needs_reference = pytest.mark.skipif(
    not reference_available(), reason="reference matrices not mounted")

GOLDEN_MATRICES = ["circuit204", "i64", "i1k", "i64k", "row64k"]


# ---------------------------------------------------------------------------
# host loop vs scipy
# ---------------------------------------------------------------------------

def test_spmv_numpy_matches_scipy(rng):
    from scipy import sparse
    a = random_csr(rng, 120, 90, density=0.08, dtype=np.float64)
    sp = sparse.csr_matrix((np.asarray(a.data), np.asarray(a.indices),
                            np.asarray(a.indptr)), shape=a.shape)
    x = rng.standard_normal(90)
    np.testing.assert_allclose(reference.spmv_numpy(a, x), sp @ x, rtol=1e-12)
    csc = convert.csr_to_csc(a)
    np.testing.assert_allclose(reference.spmv_numpy(csc, x), sp @ x, rtol=1e-12)
    coo = convert.csr_to_coo(a)
    np.testing.assert_allclose(reference.spmv_numpy(coo, x), sp @ x, rtol=1e-12)


@needs_reference
@pytest.mark.parametrize("name", GOLDEN_MATRICES)
def test_host_loop_bitexact_vs_golden(name):
    """y = A @ ones must be byte-identical to the bundled golden.bin —
    the memcmp correctness bar of the reference (HardwareSpMV.cpp:37-39)."""
    d = os.path.join(REFERENCE_MATRICES, name)
    a = refio.load_reference_matrix(d)
    gold = refio.load_golden(d)
    assert gold is not None
    y = reference.golden(a)
    assert y.dtype == np.float64
    assert y.tobytes() == gold.tobytes()


@needs_reference
def test_uint64_exact_semiring():
    """Integer matrices are addition-order independent: exact equality
    (the role of the *-uint64 variants, matrixutils.py:100-103)."""
    d = os.path.join(REFERENCE_MATRICES, "i64-uint64")
    a = refio.load_reference_matrix(d)
    x = np.ones(a.shape[1], dtype=np.uint64)
    y = reference.spmv_numpy(a, x)
    np.testing.assert_array_equal(y, np.ones(64, dtype=np.uint64))


# ---------------------------------------------------------------------------
# jnp executors vs host loop
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("fmt", ["csr", "csc", "coo", "ell", "bsr"])
def test_jnp_spmv_all_formats(rng, fmt):
    a = random_csr(rng, 128, 128, density=0.06)
    x = rng.standard_normal(128).astype(np.float32)
    want = reference.spmv_numpy(a, x.astype(np.float64))
    if fmt == "csc":
        m = convert.csr_to_csc(a)
    elif fmt == "coo":
        m = convert.csr_to_coo(a)
    elif fmt == "ell":
        m = convert.csr_to_ell(a)
    elif fmt == "bsr":
        m = convert.csr_to_bsr(a, (8, 8))
    else:
        m = a
    got = np.asarray(reference.spmv(m, x))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_jnp_spmv_accumulate(rng):
    a = random_csr(rng, 64, 64, density=0.1)
    x = rng.standard_normal(64).astype(np.float32)
    y0 = rng.standard_normal(64).astype(np.float32)
    got = np.asarray(reference.spmv(a, x, y=y0))
    want = reference.spmv_numpy(a, x.astype(np.float64)) + y0
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_jnp_spmv_jits(rng):
    import jax
    a = random_csr(rng, 64, 64, density=0.1).to_device()
    x = np.ones(64, dtype=np.float32)
    f = jax.jit(lambda m, v: reference.spmv(m, v))
    got = np.asarray(f(a, x))
    want = reference.spmv_numpy(a.to_host(), x.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@needs_reference
@pytest.mark.parametrize("name", GOLDEN_MATRICES)
def test_jnp_vs_golden_tolerance(name):
    d = os.path.join(REFERENCE_MATRICES, name)
    a = refio.load_reference_matrix(d)
    gold = refio.load_golden(d)
    x = np.ones(a.shape[1], dtype=np.float32)
    a32 = type(a)(data=np.asarray(a.data).astype(np.float32),
                  indices=a.indices, indptr=a.indptr, shape=a.shape)
    got = np.asarray(reference.spmv(a32, x))
    np.testing.assert_allclose(got, gold, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# semirings
# ---------------------------------------------------------------------------

def test_min_plus_semiring(rng):
    a = random_csr(rng, 32, 32, density=0.2)
    # treat values as edge weights; min-plus spmv = one relaxation step
    x = rng.standard_normal(32).astype(np.float32)
    got = np.asarray(reference.spmv(a, x, semiring=semiring.MIN_PLUS))
    dense = convert.to_dense(a).astype(np.float32)
    mask = dense != 0
    expect = np.where(mask.any(axis=1),
                      np.where(mask, dense + x[None, :], np.inf).min(axis=1),
                      np.inf)
    # rows with no nonzeros give the semiring zero (inf); segment_min yields inf
    np.testing.assert_allclose(got[mask.any(axis=1)], expect[mask.any(axis=1)],
                               rtol=1e-6)


def test_or_and_semiring(rng):
    a = random_csr(rng, 24, 24, density=0.15)
    ab = type(a)(data=(np.asarray(a.data) != 0).astype(np.float32),
                 indices=a.indices, indptr=a.indptr, shape=a.shape)
    x = (rng.random(24) > 0.5).astype(np.float32)
    got = np.asarray(reference.spmv(ab, x, semiring=semiring.OR_AND))
    dense = convert.to_dense(ab)
    expect = ((dense @ x) > 0).astype(np.float32)
    np.testing.assert_array_equal(got > 0, expect > 0)


def test_spmm_matches_dense(rng):
    a = random_csr(rng, 96, 64, density=0.08)
    b = rng.standard_normal((64, 16)).astype(np.float32)
    got = np.asarray(reference.spmm(a, b))
    want = convert.to_dense(a).astype(np.float64) @ b.astype(np.float64)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    bsr = convert.csr_to_bsr(a, (8, 8))
    got_bsr = np.asarray(reference.spmm(bsr, b))
    np.testing.assert_allclose(got_bsr, want, rtol=2e-5, atol=2e-5)

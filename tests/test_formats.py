"""Formats layer: containers, conversions, reference binary IO, analyses."""

import os

import numpy as np
import pytest

import jax

from spmv_vector_cache_tpu.formats import (
    analysis, containers, convert, refio)
from tests.conftest import REFERENCE_MATRICES, random_csr, reference_available

BUNDLED = ["circuit204", "i64", "i1k", "i64k", "row64k",
           "circuit204-uint64", "dia64-uint64", "i1024-uint64",
           "i64-uint64", "rowvec64-uint64"]

needs_reference = pytest.mark.skipif(
    not reference_available(), reason="reference matrices not mounted")


# ---------------------------------------------------------------------------
# containers
# ---------------------------------------------------------------------------

def test_csr_is_pytree(rng):
    a = random_csr(rng, 64, 64)
    leaves, treedef = jax.tree_util.tree_flatten(a)
    assert len(leaves) == 3
    b = jax.tree_util.tree_unflatten(treedef, leaves)
    assert b.shape == a.shape
    np.testing.assert_array_equal(np.asarray(b.data), np.asarray(a.data))


def test_container_device_roundtrip(rng):
    a = random_csr(rng, 32, 32).to_device()
    assert isinstance(a.data, jax.Array)
    h = a.to_host()
    assert isinstance(h.data, np.ndarray)


# ---------------------------------------------------------------------------
# conversions: every path against scipy
# ---------------------------------------------------------------------------

def _dense(a):
    return convert.to_dense(a)


def test_csr_csc_roundtrip(rng):
    a = random_csr(rng, 100, 80, density=0.1)
    csc = convert.csr_to_csc(a)
    back = convert.csc_to_csr(csc)
    np.testing.assert_allclose(_dense(a), _dense(csc))
    np.testing.assert_allclose(_dense(a), _dense(back))
    # transpose keeps minor indices sorted (scipy sort_indices convention)
    for j in range(csc.shape[1]):
        seg = np.asarray(csc.indices)[csc.indptr[j]:csc.indptr[j + 1]]
        assert np.all(np.diff(seg) >= 0)


def test_coo_paths(rng):
    a = random_csr(rng, 50, 70, density=0.08)
    coo = convert.csr_to_coo(a)
    np.testing.assert_allclose(_dense(a), _dense(coo))
    np.testing.assert_allclose(_dense(convert.coo_to_csr(coo)), _dense(a))
    np.testing.assert_allclose(_dense(convert.coo_to_csc(coo)), _dense(a))


def test_ell_roundtrip(rng):
    a = random_csr(rng, 40, 40, density=0.1)
    ell = convert.csr_to_ell(a)
    np.testing.assert_allclose(_dense(ell), _dense(a))
    back = convert.ell_to_csr(ell)
    np.testing.assert_allclose(_dense(back), _dense(a))


def test_bsr_roundtrip(rng):
    a = random_csr(rng, 64, 128, density=0.05)
    bsr = convert.csr_to_bsr(a, (8, 16))
    assert bsr.data.shape[1:] == (8, 16)
    np.testing.assert_allclose(_dense(bsr), _dense(a))
    np.testing.assert_allclose(_dense(convert.bsr_to_csr(bsr)), _dense(a))


def test_counting_transpose_matches_scipy(rng):
    from scipy import sparse
    a = random_csr(rng, 33, 57, density=0.15)
    sp = sparse.csr_matrix((np.asarray(a.data), np.asarray(a.indices),
                            np.asarray(a.indptr)), shape=a.shape).tocsc()
    sp.sort_indices()
    csc = convert.csr_to_csc(a)
    np.testing.assert_array_equal(np.asarray(csc.indptr), sp.indptr)
    np.testing.assert_array_equal(np.asarray(csc.indices), sp.indices)
    np.testing.assert_allclose(np.asarray(csc.data), sp.data)


# ---------------------------------------------------------------------------
# reference binary format
# ---------------------------------------------------------------------------

@needs_reference
@pytest.mark.parametrize("name", BUNDLED)
def test_load_bundled(name):
    a = refio.load_reference_matrix(os.path.join(REFERENCE_MATRICES, name))
    assert a.shape[0] > 0 and a.nnz > 0
    assert np.asarray(a.indptr).shape[0] == a.shape[1] + 1
    expected_dtype = np.uint64 if "uint64" in name else np.float64
    assert np.asarray(a.data).dtype == expected_dtype


@needs_reference
def test_reference_format_roundtrip(tmp_path):
    src = os.path.join(REFERENCE_MATRICES, "circuit204")
    a = refio.load_reference_matrix(src)
    out = tmp_path / "circuit204"
    refio.save_reference_matrix(a, str(out))
    for part in ("meta", "indptr", "inds", "data"):
        ours = (out / f"circuit204-{part}.bin").read_bytes()
        theirs = open(os.path.join(src, f"circuit204-{part}.bin"), "rb").read()
        assert ours == theirs, f"{part} not byte-identical"
    b = refio.load_reference_matrix(str(out))
    assert b.shape == a.shape and b.nnz == a.nnz


@needs_reference
def test_aligned_layout_matches_reference():
    # decoded meta pointers reproduce the aligned-increment layout
    src = os.path.join(REFERENCE_MATRICES, "i1k")
    with open(os.path.join(src, "i1k-meta.bin"), "rb") as f:
        meta = refio.RefMeta.unpack(f.read())
    addr = refio.aligned_increment(refio.DRAM_BASE, refio.META_BYTES)
    assert meta.indptr_base == addr
    addr = refio.aligned_increment(addr, (meta.cols + 1) * 4)
    assert meta.inds_base == addr
    addr = refio.aligned_increment(addr, meta.nnz * 4)
    assert meta.data_base == addr


# ---------------------------------------------------------------------------
# analyses
# ---------------------------------------------------------------------------

def _max_alive_loop(rows_seq, n_rows):
    """Literal port of the reference loop (SparseMatrix.cpp:92-108)."""
    first = {}
    last = {}
    for e, r in enumerate(rows_seq):
        first.setdefault(r, e)
        last[r] = e
    alive = cur = 0
    firsts = {v for v in first.values()}
    lasts = {v for v in last.values()}
    for e in range(len(rows_seq)):
        if e in firsts:
            cur += 1
        if e in lasts:
            cur -= 1
        alive = max(alive, cur)
    return alive


def test_max_alive_identity():
    # identity matrix: each row starts AND ends at the same nz; the reference
    # loop applies +start then -end within one step and takes the max after
    # both (SparseMatrix.cpp:99-105), so maxAlive == 0
    eye = containers.CSC(data=np.ones(8), indices=np.arange(8, dtype=np.int32),
                         indptr=np.arange(9, dtype=np.int32), shape=(8, 8))
    assert analysis.max_alive(eye) == 0


def test_max_alive_row_vector():
    # all nonzeros in one row: alive the whole stream -> 1
    rv = containers.CSC(data=np.ones(8), indices=np.zeros(8, dtype=np.int32),
                        indptr=np.arange(9, dtype=np.int32), shape=(8, 8))
    assert analysis.max_alive(rv) == 1


def test_max_alive_matches_loop(rng):
    a = random_csr(rng, 60, 60, density=0.1)
    csc = convert.csr_to_csc(a)
    rows = list(np.asarray(csc.indices))
    assert analysis.max_alive(csc) == _max_alive_loop(rows, 60)


def test_max_col_span():
    csc = containers.CSC(data=np.ones(4),
                         indices=np.array([0, 7, 2, 3], dtype=np.int32),
                         indptr=np.array([0, 2, 4], dtype=np.int32),
                         shape=(8, 2))
    assert analysis.max_col_span(csc) == 7


def test_mark_and_clear_row_starts():
    idx = np.array([3, 3, 5, 3, 5, 1], dtype=np.uint32)
    marked = analysis.mark_row_starts(idx)
    starts = (marked >> analysis.ROW_START_BIT) & 1
    np.testing.assert_array_equal(starts, [1, 0, 1, 0, 0, 1])
    np.testing.assert_array_equal(analysis.clear_row_markings(marked), idx)
    # reverse marks last touch (row ends), bit 30
    marked_end = analysis.mark_row_starts(idx, reverse=True,
                                          shift=analysis.ROW_END_BIT)
    ends = (marked_end >> analysis.ROW_END_BIT) & 1
    np.testing.assert_array_equal(ends, [0, 0, 0, 1, 1, 1])


def test_longest_row_first_permutation(rng):
    a = random_csr(rng, 30, 30, density=0.2)
    perm = analysis.longest_row_first_permutation(a)
    lens = np.diff(np.asarray(a.indptr))
    assert np.all(np.diff(lens[perm].astype(np.int64)) <= 0)
    permuted = analysis.permute_rows(a, perm)
    d = convert.to_dense(a)
    np.testing.assert_allclose(convert.to_dense(permuted), d[perm])


@needs_reference
def test_summarize_bundled():
    a = refio.load_reference_matrix(os.path.join(REFERENCE_MATRICES, "circuit204"))
    s = analysis.summarize(a)
    assert s["rows"] == 1020 and s["cols"] == 1020 and s["nnz"] == 5883
    assert 1 <= s["maxAlive"] <= 1020
    assert s["maxColSpan"] <= 1020

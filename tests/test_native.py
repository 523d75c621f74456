"""Native C++ runtime vs the Python/numpy implementations."""

import os
import subprocess

import numpy as np
import pytest

from spmv_vector_cache_tpu import native_lib
from spmv_vector_cache_tpu.formats import analysis, convert, refio
from spmv_vector_cache_tpu.ops import reference
from tests.conftest import REFERENCE_MATRICES, random_csr, reference_available

pytestmark = pytest.mark.skipif(not native_lib.build(),
                                reason="native toolchain unavailable")

needs_reference = pytest.mark.skipif(
    not reference_available(), reason="reference matrices not mounted")


def test_native_spmv_matches_numpy(rng):
    a = random_csr(rng, 100, 80, density=0.1, dtype=np.float64)
    csc = convert.csr_to_csc(a)
    x = rng.standard_normal(80)
    want = reference.spmv_numpy(csc, x)
    got = native_lib.spmv_csc(csc, x)
    np.testing.assert_array_equal(got, want)  # identical accumulation order
    got_csr = native_lib.spmv_csr(a, x)
    np.testing.assert_allclose(got_csr, want, rtol=1e-12)


@needs_reference
def test_native_golden_bitexact():
    d = os.path.join(REFERENCE_MATRICES, "circuit204")
    a = refio.load_reference_matrix(d)
    gold = refio.load_golden(d)
    y = native_lib.spmv_csc(a, np.ones(a.shape[1]))
    assert y.tobytes() == gold.tobytes()


def test_native_analyses_match_python(rng):
    a = random_csr(rng, 64, 64, density=0.12, dtype=np.float64)
    csc = convert.csr_to_csc(a)
    assert native_lib.max_alive(csc) == analysis.max_alive(csc)
    assert native_lib.max_col_span(csc) == analysis.max_col_span(csc)
    marked_native = native_lib.mark_row_starts(np.asarray(csc.indices), 64)
    marked_py = analysis.mark_row_starts(np.asarray(csc.indices))
    np.testing.assert_array_equal(marked_native, marked_py)


def test_native_csr_to_csc_matches_python(rng):
    a = random_csr(rng, 50, 60, density=0.1, dtype=np.float64)
    ours = convert.csr_to_csc(a)
    theirs = native_lib.csr_to_csc(a)
    np.testing.assert_array_equal(np.asarray(theirs.indptr),
                                  np.asarray(ours.indptr))
    np.testing.assert_array_equal(np.asarray(theirs.indices),
                                  np.asarray(ours.indices))
    np.testing.assert_allclose(np.asarray(theirs.data), np.asarray(ours.data))


@needs_reference
def test_cli_golden_check_and_csv():
    cli = native_lib.cli_path()
    dirs = [os.path.join(REFERENCE_MATRICES, m)
            for m in ("circuit204", "i1k", "row64k")]
    out = subprocess.run([cli, "-n", "3", "-p"] + dirs,
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    lines = out.stdout.strip().splitlines()
    header = lines[0].split(",")
    assert header[:4] == ["matrix", "rows", "cols", "nz"]
    rows = [dict(zip(header, l.split(","))) for l in lines[1:]]
    assert len(rows) == 3
    for r in rows:
        assert r["diffFromGolden"] == "0"   # memcmp-clean vs golden.bin
    c204 = rows[0]
    assert c204["maxAlive"] == "591" and c204["maxColSpan"] == "969"


@needs_reference
def test_cli_uint64_variant():
    cli = native_lib.cli_path()
    out = subprocess.run(
        [cli, "-x", os.path.join(REFERENCE_MATRICES, "i64-uint64")],
        capture_output=True, text=True, timeout=60)
    assert out.returncode == 0, out.stderr


def test_cli_bad_dir_errors():
    cli = native_lib.cli_path()
    out = subprocess.run([cli, "/nonexistent/matrix"],
                         capture_output=True, text=True, timeout=60)
    assert out.returncode == 1
    assert "cannot load" in out.stderr

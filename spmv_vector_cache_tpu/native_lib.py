"""ctypes bindings for the native reference runtime (libspmvref.so).

The reference's host software layer is C++ on the Zynq ARM
(``software/SoftwareSpMV.cpp``, ``SparseMatrix.cpp``, ``csr2csc.c``); this
module exposes our POSIX re-home of it to Python, building the shared
library on first use (``make -C native``).  The numpy implementations in
:mod:`.formats.analysis` / :mod:`.ops.reference` remain the fallback when
no C++ toolchain is available, and the test suite pins both against each
other.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libspmvref.so")
_CLI_PATH = os.path.join(_NATIVE_DIR, "build", "spmv_bench")

_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None


def build(force: bool = False) -> bool:
    """Compile the native library/CLI if needed. Returns availability."""
    global _build_error
    if not force and os.path.exists(_LIB_PATH) and os.path.exists(_CLI_PATH):
        return True
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR, "all"], check=True,
                       capture_output=True, text=True, timeout=300)
        return True
    except (subprocess.SubprocessError, OSError) as e:
        _build_error = str(getattr(e, "stderr", e) or e)
        return False


def available() -> bool:
    return _load() is not None


def cli_path() -> str:
    """Path to the spmv_bench benchmark CLI (built on demand)."""
    if not build():
        raise RuntimeError(f"native build failed: {_build_error}")
    return _CLI_PATH


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    u32, f64, u64 = ctypes.c_uint32, ctypes.c_double, ctypes.c_uint64
    pu32 = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    pf64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    pu64 = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")

    lib.spmv_csc_f64.argtypes = [u32, u32, u32, pu32, pu32, pf64, pf64, pf64]
    lib.spmv_csr_f64.argtypes = [u32, u32, u32, pu32, pu32, pf64, pf64, pf64]
    lib.spmv_csc_u64.argtypes = [u32, u32, u32, pu32, pu32, pu64, pu64, pu64]
    lib.spmv_mark_row_starts.argtypes = [u32, u32, pu32, ctypes.c_int,
                                         ctypes.c_int]
    lib.spmv_clear_row_markings.argtypes = [u32, pu32]
    lib.spmv_max_alive.argtypes = [u32, u32, pu32]
    lib.spmv_max_alive.restype = u32
    lib.spmv_max_col_span.argtypes = [u32, pu32, pu32]
    lib.spmv_max_col_span.restype = u32
    lib.spmv_csr_to_csc_f64.argtypes = [u32, u32, u32, pu32, pu32, pf64,
                                        pu32, pu32, pf64]
    lib.spmv_ilu0_f64.argtypes = [u32, pu32, pu32, pf64]
    lib.spmv_ilu0_f64.restype = ctypes.c_int
    lib.spmv_time_seconds.restype = f64
    _lib = lib
    return lib


def _require():
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_build_error}")
    return lib


def _u32(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a), dtype=np.uint32)


def spmv_csc(a, x: np.ndarray, y: Optional[np.ndarray] = None) -> np.ndarray:
    """Native golden CSC SpMV (SoftwareSpMV.cpp:50-70 role)."""
    lib = _require()
    indptr, inds = _u32(a.indptr), _u32(a.indices)
    data = np.asarray(a.data)
    rows, cols = a.shape
    if data.dtype == np.uint64:
        out = np.zeros(rows, np.uint64) if y is None else y.astype(np.uint64)
        lib.spmv_csc_u64(rows, cols, data.shape[0], indptr, inds,
                         np.ascontiguousarray(data),
                         np.ascontiguousarray(x, dtype=np.uint64), out)
        return out
    out = np.zeros(rows, np.float64) if y is None else y.astype(np.float64)
    lib.spmv_csc_f64(rows, cols, data.shape[0], indptr, inds,
                     np.ascontiguousarray(data, dtype=np.float64),
                     np.ascontiguousarray(x, dtype=np.float64), out)
    return out


def spmv_csr(a, x: np.ndarray, y: Optional[np.ndarray] = None) -> np.ndarray:
    lib = _require()
    rows, cols = a.shape
    data = np.ascontiguousarray(np.asarray(a.data), dtype=np.float64)
    out = np.zeros(rows, np.float64) if y is None else y.astype(np.float64)
    lib.spmv_csr_f64(rows, cols, data.shape[0], _u32(a.indptr),
                     _u32(a.indices), data,
                     np.ascontiguousarray(x, dtype=np.float64), out)
    return out


def mark_row_starts(inds, rows: int, reverse: bool = False,
                    shift: int = 31) -> np.ndarray:
    lib = _require()
    out = _u32(inds).copy()
    lib.spmv_mark_row_starts(rows, out.shape[0], out, int(reverse), shift)
    return out


def max_alive(a) -> int:
    lib = _require()
    inds = _u32(a.indices)
    return int(lib.spmv_max_alive(a.shape[0], inds.shape[0], inds))


def max_col_span(a) -> int:
    lib = _require()
    return int(lib.spmv_max_col_span(a.shape[1], _u32(a.indptr),
                                     _u32(a.indices)))


def csr_to_csc(a):
    """Native counting-sort transpose (csr2csc.c:11-39 role)."""
    from .formats.containers import CSC

    lib = _require()
    rows, cols = a.shape
    data = np.ascontiguousarray(np.asarray(a.data), dtype=np.float64)
    nnz = data.shape[0]
    col_ptr = np.zeros(cols + 1, np.uint32)
    row_ind = np.zeros(nnz, np.uint32)
    b = np.zeros(nnz, np.float64)
    lib.spmv_csr_to_csc_f64(rows, cols, nnz, _u32(a.indptr), _u32(a.indices),
                            data, col_ptr, row_ind, b)
    return CSC(data=b, indices=row_ind.astype(np.int32),
               indptr=col_ptr.astype(np.int32), shape=a.shape)


def ilu0_inplace(indptr, indices, data: np.ndarray) -> np.ndarray:
    """Native ILU(0): factor CSR values in place on A's pattern.

    Returns the factored value array (L strictly-lower entries hold the
    multipliers, diagonal+upper hold U).  Raises on structural problems.
    """
    lib = _require()
    out = np.ascontiguousarray(np.asarray(data), dtype=np.float64).copy()
    rc = lib.spmv_ilu0_f64(len(indptr) - 1, _u32(indptr), _u32(indices), out)
    if rc > 0:
        raise ValueError(f"ILU(0): missing diagonal in row {rc - 1}")
    if rc < 0:
        raise ZeroDivisionError(f"ILU(0): zero pivot at row {-rc - 1}")
    return out

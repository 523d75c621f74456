"""Backend detection and Pallas execution-mode policy.

The reference runs the same design both in the Chisel C++ emulator (with a
simulated 64 MB memory, ``chisel/Main.scala:73-83``) and on silicon; the TPU
analog is Pallas interpret mode on CPU vs compiled Mosaic on a real chip.
Kernels consult :func:`use_interpret` so the whole test suite runs on a CPU
host (optionally with a virtual multi-device mesh) and the identical code
compiles for TPU.
"""

from __future__ import annotations

import functools
import os

import jax


@functools.lru_cache(maxsize=None)
def default_backend() -> str:
    return jax.default_backend()


def is_tpu() -> bool:
    # the "axon" platform tunnels a real TPU chip
    return default_backend() in ("tpu", "axon")


def use_interpret() -> bool:
    """Run Pallas kernels in interpreter mode?

    Override with SPMV_TPU_INTERPRET=0/1; default: interpret everywhere
    except on a real TPU backend.
    """
    env = os.environ.get("SPMV_TPU_INTERPRET")
    if env is not None:
        return env not in ("0", "false", "False")
    return not is_tpu()


def vmem_budget_bytes() -> int:
    """Usable VMEM per core for kernel planning (conservative default)."""
    env = os.environ.get("SPMV_TPU_VMEM_BYTES")
    if env is not None:
        return int(env)
    return 96 * 1024 * 1024 if _is_large_vmem() else 12 * 1024 * 1024


def _is_large_vmem() -> bool:
    return False

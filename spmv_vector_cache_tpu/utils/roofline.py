"""Roofline observatory: measured speed-of-light + kernel audits.

The reference exports activeCycles/totalCycles and a bytes-per-cycle
bandwidth formula from hardware counters (``TestSpMVBackend.cpp:100-102``,
``HardwareSpMVNewCache.cpp:183-187``); the TPU analog is an achieved-vs-
peak audit where *peak is measured on the spot* (chips and tunnels vary),
not read from a spec sheet.

Timing is synchronized by a host read of one element of the result —
``block_until_ready`` is not a reliable sync point through remote-tunnel
backends (it can return before device execution completes), a D2H read is.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional

import numpy as np

from .stats import StatRegistry

Array = Any


def sync(x) -> float:
    """Force completion of everything producing ``x``; returns one value."""
    return float(np.asarray(x).ravel()[0])


def time_chained(make_fn: Callable[[], Any], *, iters: int,
                 repeats: int = 3) -> float:
    """Time ``make_fn`` (a jitted computation that internally chains
    ``iters`` dependent steps and returns a small array).  Returns
    seconds/step, best of ``repeats``."""
    sync(make_fn())  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        sync(make_fn())
        best = min(best, time.perf_counter() - t0)
    return best / iters


def measure_stream_bandwidth(nbytes: int = 64 << 20, iters: int = 50) -> float:
    """Measured HBM streaming bandwidth in bytes/s (read+write)."""
    import jax
    import jax.numpy as jnp

    n = nbytes // 4
    x = jnp.asarray(np.random.default_rng(0).standard_normal(n)
                    .astype(np.float32))

    @jax.jit
    def chain(x):
        out = jax.lax.fori_loop(
            0, iters, lambda i, v: v * 1.0000001 + 1e-30 * i, x)
        return out[:1]

    dt = time_chained(lambda: chain(x), iters=iters)
    return 2.0 * n * 4 / dt


def spmv_roofline_nnz_per_s(stream_bw: float, bytes_per_nnz: float = 8.0
                            ) -> float:
    """Speed-of-light nnz/s for a streaming SpMV (vals + cols per nnz)."""
    return stream_bw / bytes_per_nnz


def audit(stats: StatRegistry, *, nnz: int, seconds: float,
          bytes_moved: float, stream_bw: Optional[float] = None) -> Dict:
    """Record an achieved-vs-peak audit into ``stats`` (CSV-able)."""
    gnnz = nnz / seconds / 1e9
    achieved_bw = bytes_moved / seconds
    stats["seconds"] = seconds
    stats["gnnz_per_s"] = gnnz
    stats["achieved_gb_per_s"] = achieved_bw / 1e9
    if stream_bw:
        stats["peak_gb_per_s"] = stream_bw / 1e9
        stats["roofline_fraction"] = achieved_bw / stream_bw
    return stats.as_dict()

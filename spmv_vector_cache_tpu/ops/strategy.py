"""Strategy selection: which x-placement variant runs a given matrix.

The reference selects among its five result-vector placement variants by
flashing a different bitfile and probing the accelerator's signature
register (``software/HWSpMVFactory.cpp:20-38``, ``devcfg.cpp``); choice is
guided by matrix analyses (maxAlive/maxColSpan) and synthesis sweeps
(``gen-*.sh``).  Here selection is a cheap host-side heuristic over the
:class:`~..formats.plan.SellPlan` counters, with an autotune sweep (the
gen-*.sh role) in :func:`autotune`.

Mapping of the reference's design space (SURVEY.md §2.4) onto ours — the
irregularly-accessed dense vector is y in the reference's CSC dataflow and
x in our CSR dual, so the placement question transfers directly:

===============================  =======================================
reference variant                this library's strategy
===============================  =======================================
BufferAll (y fully in OCM)       ``window`` with the window covering x
BufferSel / caches (y windowed)  ``window`` (sliding VMEM window, K from
                                 the maxColSpan-analysis port)
BufferNone (y always in DDR)     ``stream`` (x gathered through HBM)
bitfile sweep (gen-*.sh)         :func:`autotune` timing sweep
===============================  =======================================
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, Optional

import numpy as np

from ..formats.plan import SellPlan
from ..utils.stats import StatRegistry

Array = Any


def select_strategy(plan) -> str:
    """Pick the execution strategy from plan structure counters."""
    from ..formats.dia import DiaPlan, HybridPlan

    if isinstance(plan, (DiaPlan, HybridPlan)):
        return "dia"
    return "window" if plan.stats.window_blocks > 0 else "stream"


@dataclasses.dataclass
class SweepResult:
    strategy: str
    seconds: float
    gnnz_per_s: float


def plan_nnz(plan) -> int:
    """Populated nonzeros of any plan type (Sell / Dia / Hybrid)."""
    from ..formats.dia import HybridPlan

    if isinstance(plan, HybridPlan):
        return plan.dia.stats.nnz + plan.rest.stats.nnz
    return plan.stats.nnz


def plan_bytes_per_apply(plan, strategy: str = "auto") -> int:
    """HBM bytes one SpMV moves — the denominator of the achieved-vs-peak
    audit (the reference's bytes/cycle formula, TestSpMVBackend.cpp:100).
    Counts the streamed plan arrays, the dense vector, and the result."""
    import numpy as np

    from ..formats.dia import DiaPlan, HybridPlan

    if isinstance(plan, HybridPlan):
        return (plan_bytes_per_apply(plan.dia) +
                plan_bytes_per_apply(plan.rest, strategy))
    itemsize = np.dtype(plan.vals.dtype).itemsize
    rows, cols = plan.shape
    vec = (rows + cols) * itemsize
    if isinstance(plan, DiaPlan):
        return int(np.prod(plan.vals.shape)) * itemsize + vec
    T, P, R = plan.vals.shape
    vals_b = T * P * R * itemsize
    if strategy == "auto":
        strategy = select_strategy(plan)
    if strategy == "window":
        idx_b = T * P * R * 2                    # int16 in-window offsets
    else:
        idx_b = T * P * R * 4 * 3                # cols + gathered x (r+w)
    partials_b = T * R * itemsize * 2            # kernel write + fold read
    return vals_b + idx_b + partials_b + vec


def _time_device(fn, *args, iters: int = 10) -> float:
    """Wall-time with device sync through a host read of the result.

    ``block_until_ready`` alone is unreliable through remote-tunnel
    backends (it can return before execution completes), so sync by
    pulling one element to the host.
    """
    y = fn(*args)
    np.asarray(y[0])                        # warm + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(*args)
    np.asarray(y[0])
    return (time.perf_counter() - t0) / iters


def autotune(plan, x: Array, *, iters: int = 10,
             stats: Optional[StatRegistry] = None) -> Dict[str, SweepResult]:
    """Measure every feasible strategy and return timings (gen-*.sh role)."""
    from ..formats.dia import DiaPlan, HybridPlan
    from .spmv_pallas import spmv_plan

    results: Dict[str, SweepResult] = {}
    if isinstance(plan, (DiaPlan, HybridPlan)):
        feasible = ["dia" if isinstance(plan, DiaPlan) else "auto"]
    else:
        feasible = ["stream"]
        if plan.stats.window_blocks > 0:
            feasible.insert(0, "window")
    nnz = plan_nnz(plan)
    for name in feasible:
        try:
            dt = _time_device(
                lambda n=name: spmv_plan(plan, x, strategy=n), iters=iters)
        except Exception:  # noqa: BLE001 — infeasible on this backend
            continue
        results[name] = SweepResult(
            strategy=name, seconds=dt,
            gnnz_per_s=nnz / dt / 1e9 if dt > 0 else 0.0)
    if stats is not None:
        for name, r in results.items():
            stats[f"{name}_seconds"] = r.seconds
            stats[f"{name}_gnnz_per_s"] = r.gnnz_per_s
    return results


def best_strategy(plan: SellPlan, x: Array, **kw) -> str:
    results = autotune(plan, x, **kw)
    if not results:
        return select_strategy(plan)
    return min(results.values(), key=lambda r: r.seconds).strategy

"""Strategy selection: which x-placement variant runs a given matrix.

The reference selects among its five result-vector placement variants by
flashing a different bitfile and probing the accelerator's signature
register (``software/HWSpMVFactory.cpp:20-38``, ``devcfg.cpp``); choice is
guided by matrix analyses (maxAlive/maxColSpan) and synthesis sweeps
(``gen-*.sh``).  Here selection is a cheap host-side heuristic over the
:class:`~..formats.plan.SellPlan`'s structure counters, with an autotune
sweep (the gen-*.sh role) available through :func:`autotune`.

Mapping of the reference's design space (SURVEY.md §2.4) onto ours — the
irregularly-accessed dense vector is y in the reference's CSC dataflow and
x in our CSR dual, so the placement question transfers directly:

===============================  ====================================
reference variant                this library's strategy
===============================  ====================================
BufferAll (y fully in OCM)       ``x_resident``  (x fully in VMEM)
BufferNone (y always in DDR)     ``gather_stream`` (x gathered via HBM)
BufferSel / caches (y windowed)  ``x_window``  (VMEM window over x)
===============================  ====================================
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Optional

import numpy as np

from ..formats.plan import SellPlan
from ..utils import platform
from ..utils.stats import StatRegistry

Array = Any

#: VMEM bytes we allow the resident x copy to take (leave room for tiles)
X_RESIDENT_BUDGET = 4 << 20
DEFAULT_WINDOW = 2048


def select_strategy(plan: SellPlan, *, window: int = DEFAULT_WINDOW,
                    vmem_budget: int = X_RESIDENT_BUDGET) -> str:
    """Pick an x-placement strategy from plan structure counters."""
    itemsize = np.dtype(plan.vals.dtype).itemsize
    x_bytes = plan.shape[1] * itemsize
    if x_bytes <= vmem_budget:
        return "x_resident"
    if plan.stats.max_tile_col_span <= window:
        return "x_window"
    return "gather_stream"


@dataclasses.dataclass
class SweepResult:
    strategy: str
    seconds: float
    gnnz_per_s: float


def autotune(plan: SellPlan, x: Array, *, window: int = DEFAULT_WINDOW,
             iters: int = 10,
             stats: Optional[StatRegistry] = None) -> Dict[str, SweepResult]:
    """Measure every feasible strategy and return timings (gen-*.sh role).

    On non-TPU backends this is a functional sweep only (interpret mode
    timings are meaningless); on TPU it returns real device timings.
    """
    import jax

    from .spmv_pallas import spmv_plan

    results: Dict[str, SweepResult] = {}
    feasible = ["gather_stream"]
    itemsize = np.dtype(plan.vals.dtype).itemsize
    if plan.shape[1] * itemsize <= X_RESIDENT_BUDGET:
        feasible.append("x_resident")
    if plan.stats.max_tile_col_span <= window:
        feasible.append("x_window")
    for name in feasible:
        try:
            y = spmv_plan(plan, x, strategy=name, window=window)
            jax.block_until_ready(y)
            t0 = time.perf_counter()
            for _ in range(iters):
                y = spmv_plan(plan, x, strategy=name, window=window)
            jax.block_until_ready(y)
            dt = (time.perf_counter() - t0) / iters
        except Exception:  # noqa: BLE001 — infeasible on this backend
            continue
        results[name] = SweepResult(
            strategy=name, seconds=dt,
            gnnz_per_s=plan.stats.nnz / dt / 1e9 if dt > 0 else 0.0)
    if stats is not None:
        for name, r in results.items():
            stats[f"{name}_seconds"] = r.seconds
            stats[f"{name}_gnnz_per_s"] = r.gnnz_per_s
    return results


def best_strategy(plan: SellPlan, x: Array, **kw) -> str:
    results = autotune(plan, x, **kw)
    if not results:
        return "gather_stream"
    return min(results.values(), key=lambda r: r.seconds).strategy

#!/usr/bin/env python3
"""Headline benchmark: CSR SpMV throughput on TPU via the window kernel.

Prints ONE JSON line:
  {"metric": "spmv_csr_gnnz_per_s", "value": N, "unit": "Gnnz/s",
   "vs_baseline": N}

``vs_baseline`` is achieved nnz/s divided by the BASELINE.json target of
80% of the HBM-bandwidth roofline (8 bytes/nnz: values + column indices),
with the roofline *measured on this chip* at run time — so 1.0 means the
target is met exactly.  Supporting detail goes to stderr.

Workload: a 1M-row, 27-diagonal banded matrix (~28M nonzeros) — the
bounded-bandwidth class the reference's bundled matrices represent
(circuit204 et al.), planned by ``auto_plan`` and executed with the
sliding-window Pallas kernel, chained inside one jit (power iteration) so
timing is free of dispatch/tunnel effects.
"""

import json
import sys

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    if "--suite" in sys.argv:
        import jax
        jax.config.update("jax_compilation_cache_dir", "/tmp/spmv_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        from spmv_vector_cache_tpu.tools.suite import run_suite
        results = run_suite()
        print(json.dumps(results))
        return
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    jax.config.update("jax_compilation_cache_dir", "/tmp/spmv_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from spmv_vector_cache_tpu.formats.convert import from_scipy
    from spmv_vector_cache_tpu.formats.plan import auto_plan
    from spmv_vector_cache_tpu.ops.spmv_pallas import spmv_plan
    from spmv_vector_cache_tpu.utils import roofline
    from spmv_vector_cache_tpu.utils.platform import is_tpu

    log(f"devices: {jax.devices()}")

    # --- workload ---------------------------------------------------------
    n = 1 << 20
    ndiag = 27
    rng = np.random.default_rng(0)
    offs = list(range(-(ndiag // 2), ndiag // 2 + 1))
    m = sp.spdiags(rng.standard_normal((ndiag, n)).astype(np.float32),
                   offs, n, n).tocsr()
    m.sort_indices()
    a = from_scipy(m.astype(np.float32))
    plan = auto_plan(a)
    log(f"plan: nnz={plan.stats.nnz} tiles={plan.stats.num_tiles} "
        f"fill={plan.stats.fill:.3f} K={plan.stats.window_blocks} "
        f"stripes={plan.stats.num_stripes}")
    pd = plan.to_device()
    x0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    # --- correctness gate -------------------------------------------------
    interpret = not is_tpu()
    y = np.asarray(spmv_plan(pd, x0, strategy="auto", interpret=interpret))
    want = m.astype(np.float64) @ np.asarray(x0)
    err = np.abs(y - want).max() / max(1.0, np.abs(want).max())
    log(f"correctness: rel err {err:.3g}")
    assert err < 1e-4, "bench kernel is WRONG, refusing to report"

    # --- measured roofline ------------------------------------------------
    bw = roofline.measure_stream_bandwidth()
    roof = roofline.spmv_roofline_nnz_per_s(bw)  # 8 B/nnz
    log(f"measured stream BW {bw/1e9:.0f} GB/s -> roofline "
        f"{roof/1e9:.1f} Gnnz/s")

    # --- timed run (chained power iteration inside one jit) ---------------
    iters = 30

    @jax.jit
    def chain(plan, x):
        def body(_, v):
            w = spmv_plan(plan, v, strategy="auto", interpret=interpret)
            return w / jnp.maximum(jnp.linalg.norm(w), 1e-30)
        out = jax.lax.fori_loop(0, iters, body, x)
        return out[:1]

    dt = roofline.time_chained(lambda: chain(pd, x0), iters=iters)
    gnnz = plan.stats.nnz / dt / 1e9
    frac = gnnz * 1e9 / roof
    log(f"spmv: {dt*1e3:.3f} ms/iter -> {gnnz:.2f} Gnnz/s "
        f"({100*frac:.1f}% of roofline)")

    target = 0.8 * roof / 1e9
    print(json.dumps({
        "metric": "spmv_csr_gnnz_per_s",
        "value": round(gnnz, 3),
        "unit": "Gnnz/s",
        "vs_baseline": round(gnnz / target, 4),
    }))


if __name__ == "__main__":
    main()

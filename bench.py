#!/usr/bin/env python3
"""Headline benchmark: CSR SpMV throughput on TPU.

Prints ONE JSON line:
  {"metric": "spmv_csr_gnnz_per_s", "value": N, "unit": "Gnnz/s",
   "vs_baseline": N}

``vs_baseline`` is achieved nnz/s divided by the BASELINE.json target of
80% of the HBM-bandwidth roofline for the CSR format (8 bytes/nnz:
float32 value + int32 column index), with the roofline *measured on this
chip* at run time — 1.0 means the target is met exactly.  Values above
1/0.8 = 1.25 mean the kernel beats the format roofline itself, which the
diagonal (DIA) plan does legitimately: its gather-free shift kernel
streams only 4 bytes/nnz (see spmv_vector_cache_tpu/ops/spmv_dia.py).

Workload: a 1M-row, 27-diagonal banded matrix (~28M nonzeros) — the
bounded-bandwidth class the reference's bundled matrices represent
(circuit204 et al.), planned by ``auto_plan`` (which selects the DIA
plan for this structure) and chained inside one jit (power iteration).

Timing methodology: two-point marginal timing (see
``utils/roofline.py:time_marginal``) — through the remote-TPU tunnel a
single dispatch+sync costs ~25-135 ms, so per-call timing would
misreport sub-ms kernels by >2x in either direction.  Supporting detail
(plan stats, roofline audit, the general SELL-kernel number for the same
matrix) goes to stderr.
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
    from spmv_vector_cache_tpu.formats.dia import DiaPlan
    from spmv_vector_cache_tpu.formats.plan import auto_plan
    from spmv_vector_cache_tpu.ops.spmv_pallas import spmv_plan
    from spmv_vector_cache_tpu.ops.strategy import plan_nnz
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
    nnz = plan_nnz(plan)
    if isinstance(plan, DiaPlan):
        s = plan.stats
        log(f"plan: DiaPlan nnz={s.nnz} ndiag={s.ndiag} steps={s.num_steps} "
            f"fill={s.fill:.3f} bytes/nnz={s.bytes_per_nnz:.2f}")
    else:
        log(f"plan: {type(plan).__name__} nnz={nnz}")
    pd = plan.to_device()
    x0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    # --- correctness gate -------------------------------------------------
    interpret = not is_tpu()
    y = np.asarray(spmv_plan(pd, x0, interpret=interpret))
    want = m.astype(np.float64) @ np.asarray(x0)
    err = np.abs(y - want).max() / max(1.0, np.abs(want).max())
    log(f"correctness: rel err {err:.3g}")
    assert err < 1e-4, "bench kernel is WRONG, refusing to report"

    # --- measured roofline ------------------------------------------------
    bw = roofline.measure_stream_bandwidth(mode="read")
    roof = roofline.spmv_roofline_nnz_per_s(bw)  # 8 B/nnz CSR convention
    log(f"measured read-stream BW {bw/1e9:.0f} GB/s -> CSR roofline "
        f"{roof/1e9:.1f} Gnnz/s")

    # --- timed run (marginal over chained power iterations) ----------------
    def make_chain(iters):
        @jax.jit
        def go(plan, x):
            def body(_, v):
                w = spmv_plan(plan, v, interpret=interpret)
                return w / jnp.maximum(jnp.linalg.norm(w), 1e-30)
            return jax.lax.fori_loop(0, iters, body, x)[:1]
        return lambda: go(pd, x0)

    dt = roofline.time_marginal(make_chain, i1=50, i2=250)
    gnnz = nnz / dt / 1e9
    frac = gnnz * 1e9 / roof
    log(f"spmv: {dt*1e3:.3f} ms/iter -> {gnnz:.2f} Gnnz/s "
        f"({100*frac:.1f}% of the 8 B/nnz CSR roofline)")
    if isinstance(plan, DiaPlan):
        dia_roof = bw / plan.stats.bytes_per_nnz
        log(f"DIA format roofline {dia_roof/1e9:.1f} Gnnz/s -> "
            f"{100*gnnz*1e9/dia_roof:.1f}% of format speed-of-light")

    # --- bf16 mixed-precision detail (2 B/nnz value stream) ----------------
    if isinstance(plan, DiaPlan):
        try:
            from spmv_vector_cache_tpu.formats.dia import build_dia_plan
            from spmv_vector_cache_tpu.ops.spmv_dia import spmv_dia
            pb = build_dia_plan(a, value_dtype=jnp.bfloat16).to_device()
            yb = np.asarray(spmv_dia(pb, x0, interpret=interpret))
            errb = np.abs(yb - want).max() / max(1.0, np.abs(want).max())

            def make_bf16(iters):
                @jax.jit
                def go(plan, x):
                    def body(_, v):
                        w = spmv_dia(plan, v, interpret=interpret)
                        return w / jnp.maximum(jnp.linalg.norm(w), 1e-30)
                    return jax.lax.fori_loop(0, iters, body, x)[:1]
                return lambda: go(pb, x0)

            dtb = roofline.time_marginal(make_bf16, i1=50, i2=350)
            log(f"bf16 DIA (mixed precision, rel err {errb:.2g}): "
                f"{dtb*1e3:.3f} ms/iter -> {nnz/dtb/1e9:.2f} Gnnz/s")
        except Exception as e:  # noqa: BLE001 — detail only
            log(f"bf16 detail run skipped: {e}")

    # --- general SELL window kernel on the same matrix (stderr detail) -----
    try:
        sell = auto_plan(a, allow_dia=False).to_device()
        ys = np.asarray(spmv_plan(sell, x0, strategy="window",
                                  interpret=interpret))
        errs = np.abs(ys - want).max() / max(1.0, np.abs(want).max())
        assert errs < 1e-4, "SELL window kernel is WRONG, refusing to report"

        def make_sell(iters):
            @jax.jit
            def go(plan, x):
                def body(_, v):
                    w = spmv_plan(plan, v, strategy="window",
                                  interpret=interpret)
                    return w / jnp.maximum(jnp.linalg.norm(w), 1e-30)
                return jax.lax.fori_loop(0, iters, body, x)[:1]
            return lambda: go(sell, x0)

        dts = roofline.time_marginal(make_sell, i1=20, i2=80)
        log(f"SELL window kernel (general path, rel err {errs:.2g}): "
            f"{dts*1e3:.3f} ms/iter -> {nnz/dts/1e9:.2f} Gnnz/s "
            f"({100*(nnz/dts)/roof:.1f}% of the 8 B/nnz CSR roofline)")
    except Exception as e:  # noqa: BLE001 — detail only, never the headline
        log(f"SELL detail run skipped: {e}")

    # --- general path on a NON-DIA-friendly matrix (stderr detail) ---------
    # block-diagonal with random fill (community / FEM-class structure):
    # each row's 27 nonzeros land at random offsets inside its 128-column
    # block, so every diagonal is sparse (DIA refuses) but the windowed
    # SELL machinery sees bounded spans
    try:
        from spmv_vector_cache_tpu.formats.containers import COO
        from spmv_vector_cache_tpu.formats.convert import coo_to_csr

        ns = n >> 1
        blk = 128
        rsh = np.repeat(np.arange(ns, dtype=np.int64), ndiag)
        csh = ((rsh // blk) * blk
               + rng.integers(0, blk, rsh.shape[0])).astype(np.int32)
        ash = coo_to_csr(COO(
            data=rng.standard_normal(rsh.shape[0]).astype(np.float32),
            row=rsh.astype(np.int32), col=csh, shape=(ns, ns)))
        plan_sh = auto_plan(ash)
        assert not isinstance(plan_sh, DiaPlan), \
            "block-random failed to defeat DIA"
        psh = plan_sh.to_device()
        xsh = jnp.asarray(rng.standard_normal(ns).astype(np.float32))
        ysh = np.asarray(spmv_plan(psh, xsh, interpret=interpret))
        from spmv_vector_cache_tpu.ops import reference as _ref
        wsh = _ref.spmv_numpy(ash, np.asarray(xsh, np.float64))
        errsh = np.abs(ysh - wsh).max() / max(1.0, np.abs(wsh).max())
        assert errsh < 1e-4, "shuffled-band kernel is WRONG"

        def make_sh(iters):
            @jax.jit
            def go(plan, x):
                def body(_, v):
                    w = spmv_plan(plan, v, interpret=interpret)
                    return w / jnp.maximum(jnp.linalg.norm(w), 1e-30)
                return jax.lax.fori_loop(0, iters, body, x)[:1]
            return lambda: go(psh, xsh)

        dtsh = roofline.time_marginal(make_sh, i1=20, i2=80)
        nnzsh = ash.nnz
        log(f"shuffled-band (non-DIA-friendly) general path "
            f"[{type(plan_sh).__name__}, rel err {errsh:.2g}]: "
            f"{dtsh*1e3:.3f} ms/iter -> {nnzsh/dtsh/1e9:.2f} Gnnz/s "
            f"({100*(nnzsh/dtsh)/roof:.1f}% of the 8 B/nnz CSR roofline)")
    except Exception as e:  # noqa: BLE001 — detail only, never the headline
        log(f"shuffled-band detail run skipped: {e}")

    target = 0.8 * roof / 1e9
    print(json.dumps({
        "metric": "spmv_csr_gnnz_per_s",
        "value": round(gnnz, 3),
        "unit": "Gnnz/s",
        "vs_baseline": round(gnnz / target, 4),
    }))


if __name__ == "__main__":
    main()

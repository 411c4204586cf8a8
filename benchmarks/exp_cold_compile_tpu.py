"""Cold-compile wall time of the sparse device paths on the real TPU.

Round-1 baseline (BENCH_NOTES): banded-20k chain ~190 s single-phase /
~17 min two-phase; grid-20k ~160-900 s.  Round-2 target (VERDICT #1):
< 60 s at unchanged warm per-iteration time.

Run in a FRESH process per problem (the kernel cache is in-process):
    python benchmarks/exp_cold_compile_tpu.py banded
    python benchmarks/exp_cold_compile_tpu.py grid
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import madqp_tpu as mq  # noqa: E402


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "banded"
    endgame = sys.argv[2] if len(sys.argv) > 2 else "f64"
    import jax

    print(f"device: {jax.devices()[0]}  endgame={endgame}")
    if which == "grid":
        from madqp_tpu.models.generators import grid_lp

        qp = grid_lp(g=100, seed=0)
    else:
        qp = mq.banded_sparse_lp(n=20000, m=10000, band=5, seed=0)

    kw = dict(print_level=40, factorization_dtype="float32",
              max_refine_steps=1, tol=1e-8, endgame=endgame,
              step_rule=mq.AdaptiveStep(0.995),
              regularization=mq.FixedRegularization(1e-8, -1e-8))
    t0 = time.time()
    stats = mq.solve_sparse_lp(qp, **kw)
    cold = time.time() - t0
    print(f"{which}: status={stats.status.name} iters={stats.iter} "
          f"obj={stats.objective:.6e} feas={stats.primal_feas:.1e} "
          f"cold_total={cold:.1f}s")

    # warm re-solve on perturbed values (same pattern -> cached kernel)
    import dataclasses

    qp2 = dataclasses.replace(qp, c=qp.c * (1.0 + 1e-6))
    t0 = time.time()
    stats2 = mq.solve_sparse_lp(qp2, **kw)
    warm = time.time() - t0
    print(f"{which}: warm_total={warm:.2f}s iters={stats2.iter} "
          f"per_iter={warm / max(1, stats2.iter):.3f}s")

    if "--roofline" in sys.argv:
        _roofline(which, qp)


def _roofline(which, qp):
    """Standalone f32 assembly+factorization of the normal matrix: achieved
    GFLOP/s + GB/s vs chip peaks (VERDICT #3, sparse half).  flops/bytes
    are the PADDED schedule work the chip executes (roofline.schedule_*),
    so MFU here is slightly conservative: the timed region also includes
    the A D A' segment-sum assembly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from madqp_tpu.models.qp import build_standard_form_sparse
    from madqp_tpu.solver.sparse_common import canonical_coo_vals
    from madqp_tpu.solver.sparse_lp import (DeviceSparseNormalKKT,
                                            SparseLPProblem)
    from madqp_tpu.utils.roofline import (roofline_report, schedule_bytes,
                                          schedule_flops)

    std, info, x0, y0 = build_standard_form_sparse(qp)
    t0 = time.time()
    kkt = DeviceSparseNormalKKT(std.A, fact_dtype="float32")
    symbolic_s = time.time() - t0
    prob = SparseLPProblem(
        c0=jnp.asarray(std.c0), c=jnp.asarray(std.c), b=jnp.asarray(std.b),
        has_lb=jnp.asarray(std.has_lb), has_ub=jnp.asarray(std.has_ub),
        a_rows=jnp.asarray(kkt.coo_rows), a_cols=jnp.asarray(kkt.coo_cols),
        a_vals=jnp.asarray(canonical_coo_vals(std.A)),
        idx=kkt.device_idx(),
    )
    n = std.A.shape[1]
    pr_diag = jnp.asarray(np.full(n, 2.0))
    fact = jax.jit(lambda p, d: kkt.factorize(p, d, 1e-8))
    with jax.default_matmul_precision("highest"):
        t0 = time.time()
        out = fact(prob, pr_diag)
        jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        compile_s = time.time() - t0
        best = float("inf")
        for i in range(1, 4):
            t0 = time.time()
            out = fact(prob, pr_diag * (1.0 + 1e-5 * i))
            jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
            best = min(best, time.time() - t0)
    fl = schedule_flops(kkt.symb)
    by = schedule_bytes(kkt.symb, 4)
    rep = roofline_report(fl, by, best)
    print(f"{which}-roofline: factorize+assembly {best*1e3:.1f} ms  "
          f"{rep['gflops']:.0f} GF/s (mfu={rep['mfu']})  "
          f"{rep['gbps']:.1f} GB/s (hbm={rep['hbm_frac']})  "
          f"[schedule flops {fl/1e9:.2f} GF, compile {compile_s:.0f} s, "
          f"symbolic {symbolic_s:.1f} s]")


if __name__ == "__main__":
    main()

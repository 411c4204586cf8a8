"""Granular TPU compile-time breakdown for the sparse banded/grid paths.

For each program in the two-phase sparse LP pipeline, measure trace+lower
vs XLA-compile separately (AOT .lower()/.compile()) on the real TPU.

    python benchmarks/exp_compile_tpu_granular.py [banded|grid]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402
import scipy.sparse as sp  # noqa: E402


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "banded"
    import jax
    import jax.numpy as jnp

    import madqp_tpu as mq
    from madqp_tpu.models.generators import grid_lp
    from madqp_tpu.models.qp import build_standard_form_sparse
    from madqp_tpu.ops import sparse_chol as SC
    from madqp_tpu.solver.sparse_lp import DeviceSparseNormalKKT, SparseLPProblem
    from madqp_tpu.solver.sparse_common import canonical_coo_vals, two_phase_opts
    from madqp_tpu.solver.mpc import MPCKernel
    from madqp_tpu.utils import load_options

    print(f"device: {jax.devices()[0]}")
    if which == "grid":
        qp = grid_lp(g=100, seed=0)
    else:
        qp = mq.banded_sparse_lp(n=20000, m=10000, band=5, seed=0)

    std, info, x0, y0 = build_standard_form_sparse(qp)

    t0 = time.time()
    kkt = DeviceSparseNormalKKT(std.A, fact_dtype="float32")
    print(f"symbolic+maps: {time.time()-t0:.1f}s; "
          f"items={len(kkt.symb.schedule)}")

    opts, _ = load_options(
        print_level=40, factorization_dtype="float32", max_refine_steps=1,
        tol=1e-8, step_rule=mq.AdaptiveStep(0.995),
        regularization=mq.FixedRegularization(1e-8, -1e-8))
    opts1, opts2 = two_phase_opts(opts)

    dtype = jnp.float64
    prob = SparseLPProblem(
        c0=jnp.asarray(std.c0, dtype), c=jnp.asarray(std.c, dtype),
        b=jnp.asarray(std.b, dtype),
        has_lb=jnp.asarray(std.has_lb), has_ub=jnp.asarray(std.has_ub),
        a_rows=jnp.asarray(kkt.coo_rows), a_cols=jnp.asarray(kkt.coo_cols),
        a_vals=jnp.asarray(canonical_coo_vals(std.A), dtype),
        idx=kkt.device_idx(),
    )
    x0j = jnp.asarray(x0, dtype)
    y0j = jnp.asarray(y0, dtype)
    lb = jnp.asarray(std.lb, dtype)
    ub = jnp.asarray(std.ub, dtype)

    def timed_aot(tag, fn, *args):
        t0 = time.time()
        lowered = jax.jit(fn).lower(*args)
        t_l = time.time() - t0
        try:
            nbytes = len(lowered.as_text())
        except Exception:
            nbytes = -1
        t0 = time.time()
        compiled = lowered.compile()
        t_c = time.time() - t0
        print(f"{tag:34s} lower {t_l:7.1f}s  compile {t_c:7.1f}s  "
              f"module {nbytes/1e6:6.1f} MB", flush=True)
        return compiled

    with jax.default_matmul_precision("highest"):
        kern1 = MPCKernel(opts1, kkt=kkt)
        # sub-programs
        pr = jnp.ones(prob.n, dtype)
        fact = timed_aot("factorize (f32 plan)",
                         lambda p, d: kkt.factorize(p, d, -1e-8),
                         prob, pr)
        factors = fact(prob, pr)
        timed_aot("solve (1 backsolve)",
                  lambda f, r1, r2: kkt.solve(f, r1, r2),
                  factors, jnp.ones(prob.n, dtype), jnp.ones(prob.m, dtype))
        state = timed_aot("init_state", kern1.init_state,
                          prob, x0j, y0j, lb, ub)(prob, x0j, y0j, lb, ub)
        timed_aot("iteration", kern1.iteration, prob, state)
        timed_aot("solve_from (phase-1 full)", kern1.solve_from,
                  prob, x0j, y0j, lb, ub)

        kkt2 = DeviceSparseNormalKKT(std.A, fact_dtype=None)
        prob2 = prob._replace(idx=kkt2.device_idx())
        kern2 = MPCKernel(opts2, kkt=kkt2)
        if len(sys.argv) > 2 and sys.argv[2] == "sub2":
            # phase-2 subprogram granularity (where do the f64-emulation
            # compile seconds go?)
            fact2 = timed_aot("factorize (f64 plan)",
                              lambda p_, d_: kkt2.factorize(p_, d_, -1e-8),
                              prob2, pr)
            factors2 = fact2(prob2, pr)
            timed_aot("solve (1 backsolve, f64)",
                      lambda f, r1, r2: kkt2.solve(f, r1, r2),
                      factors2, jnp.ones(prob.n, dtype),
                      jnp.ones(prob.m, dtype))
            state2 = kern2.init_state_warm(
                prob2, x0j, y0j, jnp.ones(prob.n, dtype),
                jnp.ones(prob.n, dtype), lb, ub)
            timed_aot("iteration (f64)", kern2.iteration, prob2, state2)
        timed_aot("solve_from_warm (phase-2 f64 full)", kern2.solve_from_warm,
                  prob2, x0j, y0j, jnp.ones(prob.n, dtype),
                  jnp.ones(prob.n, dtype), lb, ub)


if __name__ == "__main__":
    main()

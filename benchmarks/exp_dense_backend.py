"""Dense headline experiment: XLA cholesky/cho_solve vs the blocked
GEMM-rich backend (ops/blocked_dense) on the bench.py configuration.

Measures the full jitted solve (n=500 QP, f32 factorization + 1 f64
refinement step) per backend, plus the batched-512 throughput secondary.

    python benchmarks/exp_dense_backend.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run(linear_solver: str, n=500, m=200, repeat=3):
    import jax
    import jax.numpy as jnp

    import madqp_tpu as mq
    from madqp_tpu.models.qp import build_standard_form
    from madqp_tpu.solver import state as S
    from madqp_tpu.solver.mpc import MPCKernel
    from madqp_tpu.utils.options import IPMOptions

    qp = mq.random_qp(n, m, seed=0, ineq=True)
    opts = IPMOptions(
        print_level=40,
        tol=1e-8,
        max_ncorr=0,
        step_rule=mq.AdaptiveStep(0.995),
        regularization=mq.FixedRegularization(1e-8, -1e-8),
        factorization_dtype="float32",
        max_refine_steps=1,
        linear_solver=linear_solver,
    )
    std, info, x0, y0 = build_standard_form(qp)
    dtype = jnp.dtype(opts.dtype)
    prob, lb, ub = S.problem_to_device(std, dtype)
    x0 = jnp.asarray(x0, dtype)
    y0 = jnp.asarray(y0, dtype)
    kernel = MPCKernel(opts)
    solve = jax.jit(kernel.solve_from)
    t0 = time.time()
    final = jax.block_until_ready(solve(prob, x0, y0, lb, ub))
    first = time.time() - t0
    best = float("inf")
    for r in range(repeat):
        # vary the start point so the tunnel cannot memoize the dispatch
        xr = x0 + 1e-6 * (r + 1)
        t0 = time.time()
        final = jax.block_until_ready(solve(prob, xr, y0, lb, ub))
        best = min(best, time.time() - t0)
    iters = int(final.k)
    return {
        "linear_solver": linear_solver,
        "status": int(final.status),
        "iters": iters,
        "solve_s": round(best, 4),
        "iters_per_s": round(iters / best, 1),
        "compile_plus_first_s": round(first, 2),
    }


def main():
    import jax

    print(json.dumps({"device": str(jax.devices()[0])}))
    for ls in ("dense", "blocked"):
        print(json.dumps(run(ls)), flush=True)


if __name__ == "__main__":
    main()

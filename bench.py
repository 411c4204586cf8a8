"""Benchmark entry point — prints ONE JSON line.

Protocol: BASELINE config #1 ("single dense convex QP, random SPD H,
box + equality constraints, n=500, Mehrotra predictor-corrector").
Metric: interior-point iterations per second on the end-to-end jitted solve
(compile excluded; the per-iteration cost is dominated by the KKT
factorization, matching the reference's linear_solver_time share).
"""

import json
import time

import numpy as np


def main():
    import jax
    import madqp_tpu as mq
    from madqp_tpu.models.qp import build_standard_form
    from madqp_tpu.solver import state as S
    from madqp_tpu.solver.mpc import MPCKernel
    from madqp_tpu.utils.options import IPMOptions

    n, m = 500, 200
    qp = mq.random_qp(n, m, seed=0, ineq=True)
    opts = IPMOptions(
        print_level=40,
        tol=1e-8,
        max_ncorr=0,
        step_rule=mq.AdaptiveStep(0.995),
        regularization=mq.FixedRegularization(1e-8, -1e-8),
    )
    std, info, x0, y0 = build_standard_form(qp)
    import jax.numpy as jnp

    dtype = jnp.dtype(opts.dtype)
    prob, lb, ub = S.problem_to_device(std, dtype)
    x0 = jnp.asarray(x0, dtype)
    y0 = jnp.asarray(y0, dtype)

    kernel = MPCKernel(opts)
    solve = jax.jit(kernel.solve_from)

    # Warm-up (compile).
    t0 = time.time()
    final = jax.block_until_ready(solve(prob, x0, y0, lb, ub))
    compile_and_first = time.time() - t0
    iters = int(final.k)
    assert int(final.status) == S.SUCCESS, f"bench solve failed: {int(final.status)}"

    # Timed runs.
    n_rep = 5
    t0 = time.time()
    for _ in range(n_rep):
        final = jax.block_until_ready(solve(prob, x0, y0, lb, ub))
    wall = (time.time() - t0) / n_rep

    iters_per_s = iters / wall
    result = {
        "metric": "qp_n500_mpc_iters_per_s",
        "value": round(iters_per_s, 3),
        "unit": "iters/s",
        "vs_baseline": None,
        "detail": {
            "n": n,
            "m": m,
            "iters": iters,
            "solve_s": round(wall, 5),
            "compile_plus_first_s": round(compile_and_first, 3),
            "objective": float(final.obj_val),
            "device": str(jax.devices()[0]),
            "dtype": str(dtype),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

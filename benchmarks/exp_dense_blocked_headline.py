"""Experiment: does the GEMM-rich blocked backend beat XLA's cholesky on
the headline dense n=500 config (bench.py)?  Runs both on the current
device and prints per-config timing.

    python benchmarks/exp_dense_blocked_headline.py --n 500 --m 200
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run(linear_solver, n, m, reps=3):
    import jax
    import jax.numpy as jnp
    import madqp_tpu as mq
    from madqp_tpu.models.qp import build_standard_form
    from madqp_tpu.solver import state as S
    from madqp_tpu.solver.mpc import MPCKernel
    from madqp_tpu.utils.options import IPMOptions

    opts = IPMOptions(
        print_level=40, tol=1e-8, max_ncorr=0,
        step_rule=mq.AdaptiveStep(0.995),
        regularization=mq.FixedRegularization(1e-8, -1e-8),
        factorization_dtype="float32", max_refine_steps=1,
        linear_solver=linear_solver,
    )
    dtype = jnp.dtype(opts.dtype)
    kernel = MPCKernel(opts)
    solve = jax.jit(kernel.solve_from)

    qp = mq.random_qp(n, m, seed=0, ineq=True)
    std, _, x0, y0 = build_standard_form(qp)
    prob, lb, ub = S.problem_to_device(std, dtype)
    t0 = time.time()
    final = jax.block_until_ready(
        solve(prob, jnp.asarray(x0, dtype), jnp.asarray(y0, dtype), lb, ub))
    compile_s = time.time() - t0
    assert int(final.status) == S.SUCCESS, int(final.status)

    walls, iters = [], []
    for seed in range(1, reps + 1):
        qp_i = mq.random_qp(n, m, seed=seed, ineq=True)
        std_i, _, x0_i, y0_i = build_standard_form(qp_i)
        prob_i, lb_i, ub_i = S.problem_to_device(std_i, dtype)
        t0 = time.time()
        final = jax.block_until_ready(solve(
            prob_i, jnp.asarray(x0_i, dtype), jnp.asarray(y0_i, dtype),
            lb_i, ub_i))
        walls.append(time.time() - t0)
        iters.append(int(final.k))
        assert int(final.status) == S.SUCCESS, int(final.status)
    per_iter = sum(walls) / sum(iters)
    print(f"{linear_solver:>8}: {sum(walls)/reps*1e3:8.1f} ms/solve  "
          f"{1.0/per_iter:7.1f} iters/s  iters={iters}  "
          f"compile={compile_s:.1f}s")
    return 1.0 / per_iter


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=500)
    ap.add_argument("--m", type=int, default=200)
    args = ap.parse_args()
    import jax
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    os.environ.setdefault(
        "MADQP_COMPILE_CACHE", os.path.expanduser("~/.cache/madqp_jax"))
    print("device:", jax.devices()[0])
    for ls in ("dense", "blocked"):
        run(ls, args.n, args.m)


if __name__ == "__main__":
    main()

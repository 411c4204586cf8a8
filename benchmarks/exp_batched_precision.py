"""Experiment: what dominates the batched lockstep per-iteration cost?

The batched small-QP regime (bench.py secondary metric) runs the full f64
state pytree with f32 factorizations.  On TPU v5e, f64 elementwise math is
software-emulated, so if the per-iteration cost is emulation-dominated a
two-phase *state* scheme (f32 state to a loose tol, f64 warm endgame)
would be the win.  This measures, for the bench config (batch x n=32,
m=16 dense dummy QPs):

  * per-iteration wall of the jitted vmapped `iteration` with the f64
    state + f32 factorization (current bench config);
  * the same with an all-f32 state;
  * the full `solve_from` wall for context (dispatch + while_loop).

    python benchmarks/exp_batched_precision.py --batch 512
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build(batch, n, m, **opt_kw):
    import madqp_tpu as mq
    from madqp_tpu.parallel import BatchedMPCSolver

    qps = [mq.dense_dummy_qp(n, m, seed=i) for i in range(batch)]
    kw = dict(tol=1e-8, print_level=40,
              step_rule=mq.AdaptiveStep(0.995),
              regularization=mq.FixedRegularization(1e-8, -1e-8))
    kw.update(opt_kw)
    return BatchedMPCSolver.from_problems(qps, **kw)


def time_iteration(solver, reps=20):
    import jax
    from madqp_tpu.solver.mpc import MPCKernel

    kernel = MPCKernel(solver.opts)
    init = jax.jit(jax.vmap(kernel.init_state))
    step = jax.jit(jax.vmap(kernel.iteration))
    st = init(solver.prob, solver.x0, solver.y0, solver.lb, solver.ub)
    st = step(solver.prob, st)  # compile
    jax.device_get(st.k)  # sync (block_until_ready is a no-op on axon)
    t0 = time.time()
    for _ in range(reps):
        st = step(solver.prob, st)
    jax.device_get(st.k)
    return (time.time() - t0) / reps


def time_solve(solver, reps=3):
    import jax

    solver.solve_batch()  # compile
    walls = []
    for r in range(1, reps + 1):
        prob_r = solver.prob._replace(c=solver.prob.c * (1.0 + 1e-4 * r))
        t0 = time.time()
        final = solver.solve_batch(prob_r)
        walls.append(time.time() - t0)
    ks = jax.device_get(final.k)
    return min(walls), float(ks.max()), int((jax.device_get(final.status) == 1).sum())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--m", type=int, default=16)
    args = ap.parse_args()

    import jax

    print(f"device: {jax.devices()[0]}")

    cfgs = {
        "f64_state_f32_fact": dict(factorization_dtype="float32",
                                   max_refine_steps=1),
        "f64_state_f64_fact": dict(),
        "f32_state": dict(dtype="float32", tol=1e-3),
    }
    for name, kw in cfgs.items():
        solver = build(args.batch, args.n, args.m, **kw)
        it_wall = time_iteration(solver)
        solve_wall, k_max, solved = time_solve(solver)
        print(f"{name:22s} per-iter {it_wall*1e3:8.2f} ms   "
              f"solve {solve_wall*1e3:8.1f} ms  k_max {k_max:.0f}  "
              f"solved {solved}/{args.batch}")


if __name__ == "__main__":
    main()

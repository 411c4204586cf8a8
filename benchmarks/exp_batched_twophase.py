"""Experiment: two-phase STATE precision for the batched dense regime.

exp_batched_precision.py showed a full-f32-state batched solve to 1e-3 is
~3.5x faster end-to-end than the f64-state/f32-factorization solve to
1e-8.  This prototypes the full scheme and breaks down where the f64
pipeline spends its wall:

  * init(f64)        — Mehrotra starting point (3 KKT solves)
  * run(f64)         — the while_loop alone from an initialized state
  * solve_from(f64)  — end-to-end (init + loop)
  * two-phase        — f32-state solve to phase1_tol, cast, f64
                       warm-started endgame to 1e-8

    python benchmarks/exp_batched_twophase.py --batch 512
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--phase1-tol", type=float, default=1e-3)
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    import madqp_tpu as mq
    from madqp_tpu.parallel import BatchedMPCSolver
    from madqp_tpu.solver.mpc import MPCKernel
    from madqp_tpu.solver import state as S

    print(f"device: {jax.devices()[0]}")

    base = dict(tol=1e-8, print_level=40,
                step_rule=mq.AdaptiveStep(0.995),
                regularization=mq.FixedRegularization(1e-8, -1e-8))
    qps = [mq.dense_dummy_qp(args.n, args.m, seed=i) for i in range(args.batch)]

    # f64-state / f32-fact reference pipeline (current bench config).
    ref = BatchedMPCSolver.from_problems(
        qps, factorization_dtype="float32", max_refine_steps=1, **base)
    k64 = MPCKernel(ref.opts)
    init64 = jax.jit(jax.vmap(k64.init_state))
    run64 = jax.jit(jax.vmap(k64.run))
    warm64 = jax.jit(jax.vmap(k64.solve_from_warm))

    # f32-state phase-1 solver on the same instances.
    p1 = BatchedMPCSolver.from_problems(
        qps, dtype="float32", tol=args.phase1_tol, stall_exit=5, **{
            k: v for k, v in base.items() if k != "tol"})

    def timeit(fn, *a, perturb=(0,), reps=3):
        """Times fn(*a); perturbs the .c of the args at indices `perturb`
        per rep (identical repeated requests are served from caches in
        the device tunnel) and fetches a scalar from the result inside
        the timed region (block_until_ready alone does NOT synchronize
        through the tunnel — only a device_get does)."""
        def sync(o):
            leaf = jax.tree.leaves(o)[0]
            jax.device_get(jnp.sum(leaf))
            return o

        out = sync(fn(*a))  # compile
        walls = []
        for r in range(1, reps + 1):
            args = list(a)
            for i in perturb:
                args[i] = args[i]._replace(c=args[i].c * (1.0 + 1e-5 * r))
            t0 = time.time()
            out = sync(fn(*args))
            walls.append(time.time() - t0)
        return min(walls), out

    t_init, st0 = timeit(init64, ref.prob, ref.x0, ref.y0, ref.lb, ref.ub)
    t_run, stF = timeit(run64, ref.prob, st0)
    t_e2e, _ = timeit(jax.jit(jax.vmap(k64.solve_from)),
                      ref.prob, ref.x0, ref.y0, ref.lb, ref.ub)
    print(f"f64 pipeline: init {t_init*1e3:7.1f} ms   loop {t_run*1e3:7.1f} ms  "
          f"end-to-end {t_e2e*1e3:7.1f} ms  k_max {int(jnp.max(stF.k))}")

    # Two-phase: f32-state solve -> cast -> f64 warm endgame.
    p1_solve = jax.jit(jax.vmap(MPCKernel(p1.opts).solve_from))

    def two_phase(prob32, prob64):
        f1 = p1_solve(prob32, p1.x0, p1.y0, p1.lb, p1.ub)
        cast = lambda a: a.astype(jnp.float64)
        f2 = warm64(prob64, cast(f1.x), cast(f1.y), cast(f1.zl), cast(f1.zu),
                    ref.lb, ref.ub)
        return f1, f2

    tp = jax.jit(two_phase)
    t_2p, (f1, f2) = timeit(tp, p1.prob, ref.prob, perturb=(0, 1))
    ok = int(jnp.sum(f2.status == S.SUCCESS))
    print(f"two-phase:    phase1 k_max {int(jnp.max(f1.k))}  "
          f"phase2 k_max {int(jnp.max(f2.k))}  "
          f"end-to-end {t_2p*1e3:7.1f} ms  solved {ok}/{args.batch}")
    # Sanity: objectives match the reference pipeline.
    d = float(jnp.max(jnp.abs(f2.obj_val - stF.obj_val) /
                      jnp.maximum(1.0, jnp.abs(stF.obj_val))))
    print(f"max rel objective diff vs f64 pipeline: {d:.2e}")


if __name__ == "__main__":
    main()

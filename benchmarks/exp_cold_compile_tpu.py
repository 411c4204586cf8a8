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


if __name__ == "__main__":
    main()

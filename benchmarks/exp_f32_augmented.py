"""Can the sparse *augmented* KKT sustain pure f32+IR to 1e-8?

The two-phase scheme exists because f32 on the LP *normal equations*
stalls near mu ~ 1e-6 (squared conditioning).  The augmented K2.5-scaled
quasi-definite system is far better conditioned — the dense path reaches
1e-8 with f32 factorization + one f64 IR step.  If the sparse augmented
path can too, the f64 endgame (82% of two-phase solve time) disappears.

    python benchmarks/exp_f32_augmented.py --refine 2
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault(
    "MADQP_COMPILE_CACHE", os.path.expanduser("~/.cache/madqp_jax")
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--m", type=int, default=10000)
    ap.add_argument("--refine", type=int, default=2)
    ap.add_argument("--tol", type=float, default=1e-8)
    ap.add_argument("--max-iter", type=int, default=60)
    ap.add_argument("--repeat", type=int, default=2)
    args = ap.parse_args()

    import madqp_tpu as mq
    from madqp_tpu.solver.sparse_qp import solve_sparse_qp

    qp = mq.banded_sparse_lp(n=args.n, m=args.m, band=5, seed=0)
    opts = dict(
        tol=args.tol, print_level=40, max_iter=args.max_iter,
        factorization_dtype="float32", precision_scheme="simple",
        max_refine_steps=args.refine,
    )
    times, last = [], None
    for _ in range(args.repeat):
        t0 = time.time()
        last = solve_sparse_qp(qp, **opts)
        times.append(round(time.time() - t0, 3))
    print({
        "status": str(last.status), "iters": last.iter,
        "objective": last.objective,
        "primal_feas": last.primal_feas, "dual_feas": last.dual_feas,
        "times": times, "refine": args.refine,
    })


if __name__ == "__main__":
    main()

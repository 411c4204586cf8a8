"""One-config endgame experiment for the two-phase sparse path.

Measures warm solve time of the banded n=20k LP under one option set, so
that phase1_tol / max_ncorr / stall_exit trade-offs can be compared across
fresh processes (a TPU-device-error in one config must not kill the rest).

    python benchmarks/exp_endgame.py --phase1-tol 1e-3 --max-ncorr 0
"""

from __future__ import annotations

import argparse
import json
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
    ap.add_argument("--phase1-tol", type=float, default=1e-3)
    ap.add_argument("--max-ncorr", type=int, default=0)
    ap.add_argument("--stall-exit", type=int, default=0,
                    help="0 = driver default (5 in phase 1)")
    ap.add_argument("--repeat", type=int, default=2)
    args = ap.parse_args()

    import madqp_tpu as mq

    qp = mq.banded_sparse_lp(n=args.n, m=args.m, band=5, seed=0)
    opts = dict(
        tol=1e-8, print_level=40, factorization_dtype="float32",
        precision_scheme="two-phase", phase1_tol=args.phase1_tol,
        max_ncorr=args.max_ncorr,
    )
    if args.stall_exit:
        opts["stall_exit"] = args.stall_exit

    times, last = [], None
    for _ in range(args.repeat):
        t0 = time.time()
        last = mq.solve_sparse_lp(qp, **opts)
        times.append(time.time() - t0)

    print(json.dumps({
        "phase1_tol": args.phase1_tol, "max_ncorr": args.max_ncorr,
        "stall_exit": args.stall_exit,
        "status": int(last.status), "iter": last.iter,
        "objective": float(last.objective),
        "cold_s": round(times[0], 2),
        "warm_s": round(min(times[1:]) if len(times) > 1 else times[0], 2),
    }))


if __name__ == "__main__":
    main()

"""Condensed (K1) vs augmented (K2) sparse device KKT on an
inequality-dominated QP (models/generators.py::ineq_qp).

With every row a slacked range, K2 factorizes an (n+2m)-dim quasi-definite
system while the condensed path factorizes an SPD n-dim system over the
H + AᵀA pattern — this experiment measures how much of that size advantage
survives end-to-end on the device.

    python benchmarks/exp_condensed.py --n 2000 --m-factor 2 --kkt condensed
    python benchmarks/exp_condensed.py --n 2000 --m-factor 2 --kkt augmented

One config per process (a device error in one run must not kill the rest);
warm timing solves a second same-pattern instance (distinct values) so the
pattern-keyed kernel cache serves it without retrace.
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
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--m-factor", type=int, default=2)
    ap.add_argument("--band", type=int, default=4)
    ap.add_argument("--kkt", default="condensed",
                    choices=["condensed", "augmented"])
    ap.add_argument("--f64", action="store_true",
                    help="pure f64 instead of the two-phase f32 default")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import madqp_tpu as mq

    opts = dict(tol=1e-8, print_level=40, kkt_system=args.kkt)
    if not args.f64:
        opts.update(factorization_dtype="float32",
                    precision_scheme="two-phase")

    results = []
    for i, seed in enumerate((0, 1, 2)):
        qp = mq.ineq_qp(n=args.n, m_factor=args.m_factor, band=args.band,
                        seed=seed, pattern_seed=0)
        t0 = time.time()
        st = mq.solve_sparse_qp(qp, **opts)
        wall = time.time() - t0
        results.append(dict(seed=seed, status=st.status.name, iter=st.iter,
                            objective=st.objective, wall=wall,
                            warm=(i > 0)))
        print(json.dumps(results[-1]), flush=True)
    warm = [r["wall"] for r in results if r["warm"]]
    print(json.dumps({
        "kkt": args.kkt, "n": args.n, "m": args.m_factor * args.n,
        "f64": args.f64, "warm_best_s": min(warm),
        "iters": results[-1]["iter"],
    }), flush=True)


if __name__ == "__main__":
    main()

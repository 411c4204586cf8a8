"""Dense mixed-precision iterate quality vs refinement depth.

The serial TPU suite showed f32 factorization + 1 f64 refinement step
inflating iteration counts on the transport family (16 -> 24-26 vs pure
f64).  This experiment measures iterations and warm wall time across
refinement depths and pure f64 on one instance, to pick the default.

    python benchmarks/exp_dense_refine.py --family transport --dims 40,50
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
    ap.add_argument("--family", default="transport")
    ap.add_argument("--dims", default="40,50")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import madqp_tpu as mq
    from madqp_tpu.models import suite as S

    maker = dict(transport=S.transport_lp, staircase=S.staircase_lp,
                 svm=S.svm_qp, portfolio=S.portfolio_qp)[args.family]
    dims = tuple(int(x) for x in args.dims.split(","))

    base = dict(print_level=40, tol=1e-8, max_iter=300, max_ncorr=3,
                step_rule=mq.AdaptiveStep(0.995),
                regularization=mq.FixedRegularization(1e-8, -1e-8),
                pad_mode="bucket")
    configs = {
        "f64": {},
        "f32+refine1": dict(factorization_dtype="float32",
                            max_refine_steps=1),
        "f32+refine2": dict(factorization_dtype="float32",
                            max_refine_steps=2),
        "f32+refine3": dict(factorization_dtype="float32",
                            max_refine_steps=3),
    }
    for label, extra in configs.items():
        walls, iters = [], []
        for seed in (0, 1, 2):
            qp = maker(*dims, seed=seed)
            qp_p, _, ok = mq.presolve_qp(qp)
            qp_s, _ = mq.scale_qp(qp_p)
            t0 = time.time()
            st = mq.solve(qp_s, **base, **extra)
            walls.append(time.time() - t0)
            iters.append(st.iter if st.status == mq.Status.SOLVE_SUCCEEDED
                         else -1)
        print(json.dumps({
            "config": label, "family": args.family, "dims": dims,
            "iters": iters, "cold_s": round(walls[0], 2),
            "warm_best_s": round(min(walls[1:]), 3),
        }), flush=True)


if __name__ == "__main__":
    main()

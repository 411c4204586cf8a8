"""A/B experiment: the Mehrotra sigma gate — reference vs this repo.

The reference applies the adaptive centering sigma = clamp((mu_aff/mu)^3)
only when ONE-SIDED bounds exist (ind_llb/ind_uub nonempty), forcing
sigma = 1 otherwise (/root/reference/src/kernels.jl:226-236).  This repo
defaults to applying it whenever ANY finite bound exists
(barrier_gate="any-bound"), on the claim that sigma = 1 stalls on
bounds-only (all-two-sided) problems.  This experiment records the full
iterate trajectories under both gates on:

  A. a bounds-only QP (every variable 0 <= x <= 1, no one-sided bounds) —
     the case where the gates DISAGREE: reference gate -> sigma = 1;
  B. a one-sided-only LP (x >= 0) — both gates take the adaptive branch,
     trajectories must be IDENTICAL (control);
  C. a mixed QP (two-sided bounds + one-sided slack bounds) — both gates
     adaptive again (second control).

Run:  python benchmarks/exp_barrier_gate.py [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import madqp_tpu as mq  # noqa: E402


def trajectory(qp, gate, max_iter=100, **kw):
    """Solve with the host-stepped loop, recording per-iteration
    (mu, inf_pr, inf_du, obj)."""
    from madqp_tpu.solver.driver import MPCSolver
    from madqp_tpu.solver import state as S

    solver = MPCSolver(qp, print_level=40, barrier_gate=gate,
                       max_iter=max_iter, **kw)
    st = solver._init_jit(solver.prob, solver._x0, solver._y0,
                          solver._lb0, solver._ub0)
    rows = []
    while int(st.status) == S.RUNNING:
        prev = st
        st = solver._iter_jit(solver.prob, prev)
        rows.append(dict(k=int(prev.k), mu=float(prev.mu),
                         inf_pr=float(st.inf_pr), inf_du=float(st.inf_du),
                         obj=float(st.obj_val)))
    status = {S.SUCCESS: "optimal", S.MAX_ITER: "max_iter",
              S.STEP_ERROR: "step_error", S.DIVERGED: "diverged",
              S.STALLED: "stalled"}.get(int(st.status), str(int(st.status)))
    return dict(status=status, iters=int(st.k), trajectory=rows)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default="benchmarks/results/barrier_gate.json")
    args = ap.parse_args()

    cases = {
        # A: bounds-only QP, no constraint rows -> all bounds two-sided.
        "A_bounds_only_qp_n10": mq.dense_dummy_qp(10, 0, seed=0),
        "A_bounds_only_qp_n50": mq.dense_dummy_qp(50, 0, seed=1),
        # B: one-sided-only LP (x >= 0 from random_lp's standard form).
        "B_onesided_lp": mq.random_lp(40, 16, seed=2),
        # C: mixed (two-sided variable bounds + one-sided slacks).
        "C_mixed_qp": mq.dense_dummy_qp(30, 12, seed=3),
    }

    out = {}
    for name, qp in cases.items():
        res = {}
        for gate in ("any-bound", "one-sided"):
            r = trajectory(qp, gate)
            res[gate] = r
            tail = r["trajectory"][-1] if r["trajectory"] else {}
            print(f"{name:24s} gate={gate:9s} {r['status']:10s} "
                  f"iters={r['iters']:3d} "
                  f"final mu={tail.get('mu', float('nan')):.2e} "
                  f"inf_pr={tail.get('inf_pr', float('nan')):.2e}")
        # identical-trajectory check for the controls
        ta = [(r["mu"], r["inf_pr"]) for r in res["any-bound"]["trajectory"]]
        tb = [(r["mu"], r["inf_pr"]) for r in res["one-sided"]["trajectory"]]
        res["identical_trajectories"] = bool(
            len(ta) == len(tb)
            and all(np.allclose(a, b, rtol=1e-12) for a, b in zip(ta, tb)))
        print(f"{'':24s} identical: {res['identical_trajectories']}")
        out[name] = res

    if args.json:
        os.makedirs(os.path.dirname(args.json), exist_ok=True)
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()

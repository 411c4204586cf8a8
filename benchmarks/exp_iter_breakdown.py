"""Warm per-iteration breakdown for the losing xlarge sparse families.

Round-4 judge item #1: chainqp_50000 / bandedlp_30000 / diet_2000 /
ranges_10000 lose 0.21-0.44 warm vs the 4-core host at ~0.27-0.53 s per
TPU iteration vs ~0.1 s host.  This experiment decomposes ONE warm
phase-1 iteration into {factorization, backsolve, SpMV + vector work,
dispatch} so the dominant term can be attacked (wider bucketed fronts /
f32 SpMV / krylov endgame) or the residual proven to be tunnel latency a
co-located host never pays.

For each instance it builds the suite's exact phase-1 kernel (f32,
two-phase, endgame resolved like run_suite --mixed-precision --endgame
auto) and times, warm best-of-reps:

  - null round trip: a jitted 8-element add (pure dispatch+sync floor)
  - iter:      one `MPCKernel.iteration` dispatch
  - run_k(8):  eight iterations in one dispatch, amortized per iter
  - factorize: KKT.factorize alone
  - backsolve: KKT.solve alone (given factors)
  - spmv:      prob.jac_mv alone

run_k/8 vs iter isolates per-dispatch overhead; iter - (fact + ~3 solve
+ ~4 spmv) bounds the leftover vector work.  Emits one JSON line per
instance and writes benchmarks/results/iter_breakdown.json.

Usage (real TPU, quiet chip):
    python benchmarks/exp_iter_breakdown.py [family ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


FAMILIES = ["bandedlp", "ranges", "chainqp", "diet"]


def best_of(fn, sync, reps=5):
    walls = []
    fn()  # warm (compile / cache)
    for _ in range(reps):
        t0 = time.time()
        sync(fn())
        walls.append(time.time() - t0)
    return min(walls)


def breakdown(name, qp):
    import jax
    import jax.numpy as jnp

    import madqp_tpu as mq
    from madqp_tpu.ops import kernels as K
    from madqp_tpu.solver import sparse_common as SCM

    rec = {"name": name, "nvar": qp.nvar, "ncon": qp.ncon}

    qp_p, _, ok = mq.presolve_qp(qp)
    assert ok
    qp_s, _ = mq.scale_qp(qp_p)

    # The xlarge suite's options (run_xlarge_tpu.sh: sparse-device,
    # --mixed-precision --endgame auto).
    kw = dict(print_level=40, tol=1e-8, max_iter=300, max_ncorr=3,
              step_rule=mq.AdaptiveStep(0.995),
              regularization=mq.FixedRegularization(1e-8, -1e-8),
              factorization_dtype="float32", max_refine_steps=1,
              endgame="auto")

    # Full two-phase solve first: cold wall, then a warm re-solve for the
    # end-to-end number + the endgame share (counters.endgame_time).
    import dataclasses as dc

    def full(q):
        if q.is_lp or _diag_h(q):
            return mq.solve_sparse_lp(q, **kw)
        # same route as run_suite --backend sparse-device
        return mq.solve_sparse_qp(q, kkt_system="auto", **kw)

    t0 = time.time()
    st = full(qp_s)
    rec["cold_total_s"] = round(time.time() - t0, 2)
    qp_w = dc.replace(qp_s, c=qp_s.c * (1.0 + 1e-6))
    t0 = time.time()
    st = full(qp_w)
    rec["warm_total_s"] = round(time.time() - t0, 3)
    rec["iters"] = int(st.iter)
    rec["status"] = int(st.status == mq.Status.SOLVE_SUCCEEDED)
    rec["endgame_s"] = round(getattr(st.counters, "endgame_time", 0.0), 3)
    rec["endgame_backend"] = getattr(st.counters, "endgame_backend", "")
    rec["warm_per_iter_s"] = round(rec["warm_total_s"] / max(1, st.iter), 4)

    # ---- phase-1 kernel internals (mirror solve_sparse_lp/qp setup) ----
    from madqp_tpu.utils import load_options
    opts, _ = load_options(**kw)
    opts = SCM.resolve_endgame(opts)
    opts1, _opts2 = SCM.two_phase_opts(opts, typed_phase1=True)

    if qp_s.is_lp or _diag_h(qp_s):
        from madqp_tpu.solver import sparse_lp as SL
        std, info, x0, y0 = SL.build_standard_form_sparse(
            qp_s, scaling=opts.scaling, max_gradient=opts.max_gradient)
        mode = ("dense" if std.A.shape[0] <= opts.dense_normal_limit
                else "batched")
        rec["path"] = f"normal:{mode}"
        fp = SCM.pattern_fingerprint(std.A, std.H)
        kkt, kernel, jits = SCM.get_sparse_kernel(
            f"lp:auto:{mode}", fp, opts1,
            lambda: SL.DeviceSparseNormalKKT(
                std.A, order="auto", mode=mode,
                fact_dtype=opts1.factorization_dtype or None,
                schedule_mode=opts1.sparse_schedule))
        make = SL
    else:
        from madqp_tpu.solver import sparse_qp as SQ
        std, info, x0, y0 = SQ.build_standard_form_sparse(
            qp_s, scaling=opts.scaling, max_gradient=opts.max_gradient)
        rec["path"] = "augmented"
        fp = SCM.pattern_fingerprint(std.A, std.H)
        kkt, kernel, jits = SCM.get_sparse_kernel(
            "qp:auto", fp, opts1,
            lambda: SQ.DeviceSparseAugmentedKKT(
                std.H, std.A, order="auto",
                fact_dtype=opts1.factorization_dtype or None,
                schedule_mode=opts1.sparse_schedule))
        make = SQ

    dt = jnp.dtype(opts1.dtype)
    rec["phase1_dtype"] = str(dt)

    # problem arrays exactly as the driver builds them
    prob, lb, ub, x0j, y0j = _make_arrays(make, kkt, std, x0, y0, dt)
    dev_idx = kkt.device_idx() if hasattr(kkt, "device_idx") else None
    probi = prob._replace(idx=dev_idx) if dev_idx is not None else prob

    with jax.default_matmul_precision("highest"):
        state = jits["init"](prob, x0j, y0j, lb, ub)
        # advance a few iterations so diagonals are mid-solve realistic
        for _ in range(3):
            state = jits["iter"](prob, state)

        sync = lambda out: jax.device_get(  # noqa: E731
            jax.tree_util.tree_leaves(out)[0].ravel()[:1])

        tiny = jnp.ones((8,), dt)
        null_fn = jax.jit(lambda v: v + 1.0)
        rec["t_null"] = round(best_of(lambda: null_fn(tiny), sync), 4)

        st0 = state
        rec["t_iter"] = round(
            best_of(lambda: jits["iter"](prob, st0), sync), 4)
        k8 = jnp.int32(8)
        t8 = best_of(lambda: jits["run_k"](prob, st0, k8), sync)
        rec["t_run8_per_iter"] = round(t8 / 8.0, 4)

        # component dispatches at the current state
        def fact(p, x, zl, zu, lbx, ubx, dw, dcn):
            pr = K.sigma_diagonal(x, lbx, ubx, p.has_lb, p.has_ub,
                                  zl, zu, dw)
            return kkt.factorize(p, pr, dcn)

        fact_j = jax.jit(fact)
        args = (probi, st0.x, st0.zl, st0.zu, lb, ub, st0.del_w, st0.del_c)
        rec["t_factorize"] = round(best_of(lambda: fact_j(*args), sync), 4)
        factors = fact_j(*args)
        solve_j = jax.jit(kkt.solve)
        rec["t_backsolve"] = round(
            best_of(lambda: solve_j(factors, st0.x, st0.y), sync), 4)
        spmv_j = jax.jit(lambda p, v: p.jac_mv(v))
        rec["t_spmv"] = round(
            best_of(lambda: spmv_j(probi, st0.x), sync), 4)

    # bound the residual vector work: iter - (1 fact + 3 solve + 4 spmv)
    resid = rec["t_iter"] - (rec["t_factorize"] + 3 * rec["t_backsolve"]
                             + 4 * rec["t_spmv"])
    rec["t_vector_residual"] = round(resid, 4)
    dispatch = rec["t_iter"] - rec["t_run8_per_iter"]
    rec["t_dispatch_overhead"] = round(dispatch, 4)
    print(json.dumps(rec), flush=True)
    return rec


def _diag_h(qp):
    import scipy.sparse as sp
    if qp.H is None or qp.H.nnz == 0:
        return True
    Hc = sp.coo_matrix(qp.H)
    return bool((Hc.row == Hc.col).all())


def _make_arrays(mod, kkt, std, x0, y0, dt):
    import jax.numpy as jnp

    from madqp_tpu.solver.sparse_common import (canonical_coo_vals,
                                                canonical_csc)
    from madqp_tpu.solver.sparse_qp import SparseQPProblem

    base = dict(
        c0=jnp.asarray(std.c0, dt), c=jnp.asarray(std.c, dt),
        b=jnp.asarray(std.b, dt), has_lb=jnp.asarray(std.has_lb),
        has_ub=jnp.asarray(std.has_ub),
        a_rows=jnp.asarray(kkt.coo_rows), a_cols=jnp.asarray(kkt.coo_cols),
        a_vals=jnp.asarray(canonical_coo_vals(std.A), dt),
    )
    if std.H is not None and std.H.nnz:
        Hcoo = canonical_csc(std.H).tocoo()
        p = SparseQPProblem(
            **base,
            h_rows=jnp.asarray(Hcoo.row.astype(np.int32)),
            h_cols=jnp.asarray(Hcoo.col.astype(np.int32)),
            h_vals=jnp.asarray(canonical_coo_vals(std.H), dt))
    else:
        from madqp_tpu.solver.sparse_lp import SparseLPProblem
        p = SparseLPProblem(**base)
    return (p, jnp.asarray(std.lb, dt), jnp.asarray(std.ub, dt),
            jnp.asarray(x0, dt), jnp.asarray(y0, dt))


def main():
    from madqp_tpu.models.suite import structured_suite

    fams = sys.argv[1:] or FAMILIES
    out = []
    for nm, qp in structured_suite("xlarge", families=tuple(fams)):
        if not nm.endswith("_0"):
            continue  # one seed per family is enough for a breakdown
        try:
            out.append(breakdown(nm, qp))
        except Exception as e:
            print(json.dumps({"name": nm, "error": repr(e)[:300]}),
                  flush=True)
    path = os.path.join(os.path.dirname(__file__), "results",
                        "iter_breakdown.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()

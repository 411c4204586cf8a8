"""Benchmark entry point — prints ONE JSON line.

Protocol: BASELINE config #1 ("single dense convex QP, random SPD H,
box + equality constraints, n=500, Mehrotra predictor-corrector").
Metric: interior-point iterations per second on the end-to-end jitted solve
(compile excluded; the per-iteration cost is dominated by the KKT
factorization, matching the reference's linear_solver_time share).
"""

import json
import time

import numpy as np


def _ensure_live_backend(jax, probe_timeout=150):
    """Fall back to CPU if the TPU tunnel is down.

    In this environment the tunneled TPU backend can hang *silently* (even
    `jax.devices()` blocks forever), which would turn the bench into a
    timeout with no JSON line.  Probe device enumeration + one tiny
    computation in a subprocess with a hard timeout; on failure, switch
    this process to the CPU backend before the first computation (env vars
    are too late — the config update is the only thing that works here).
    """
    import os
    import subprocess
    import sys

    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")
        os.environ.pop("MADQP_COMPILE_CACHE", None)  # TPU artifacts poison CPU
        return
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp;"
             "print(jax.devices());"
             "print(float(jnp.ones((8, 8)).sum()))"],
            timeout=probe_timeout, capture_output=True)
        ok = r.returncode == 0
    except subprocess.TimeoutExpired:
        ok = False
    if not ok:
        print("# device probe failed/hung -> CPU fallback", file=sys.stderr)
        jax.config.update("jax_platforms", "cpu")
        # The persistent compile cache holds TPU-compiled artifacts whose
        # AOT reload on a machine-feature-mismatched CPU client stalls for
        # minutes — don't let the CPU fallback touch it.
        os.environ.pop("MADQP_COMPILE_CACHE", None)


def main():
    import os

    # Persistent compile cache: bench runs on TPU where first compiles are
    # minutes; must be set before importing madqp_tpu.
    os.environ.setdefault(
        "MADQP_COMPILE_CACHE", os.path.expanduser("~/.cache/madqp_jax")
    )
    import jax

    _ensure_live_backend(jax)
    import madqp_tpu as mq
    from madqp_tpu.models.qp import build_standard_form
    from madqp_tpu.solver import state as S
    from madqp_tpu.solver.mpc import MPCKernel
    from madqp_tpu.utils.options import IPMOptions

    n, m = 500, 200
    qp = mq.random_qp(n, m, seed=0, ineq=True)
    # Headline config: f32 Jacobi-scaled factorization + one f64 refinement
    # step — converges to tol=1e-8 with iteration counts identical to full
    # f64, ~7x faster per solve on TPU v5 (see BENCH notes in README).
    opts = IPMOptions(
        print_level=40,
        tol=1e-8,
        max_ncorr=0,
        step_rule=mq.AdaptiveStep(0.995),
        regularization=mq.FixedRegularization(1e-8, -1e-8),
        factorization_dtype="float32",
        max_refine_steps=1,
    )
    std, info, x0, y0 = build_standard_form(qp)
    import jax.numpy as jnp

    dtype = jnp.dtype(opts.dtype)
    prob, lb, ub = S.problem_to_device(std, dtype)
    x0 = jnp.asarray(x0, dtype)
    y0 = jnp.asarray(y0, dtype)

    kernel = MPCKernel(opts)
    solve = jax.jit(kernel.solve_from)

    # Warm-up (compile).
    t0 = time.time()
    final = jax.block_until_ready(solve(prob, x0, y0, lb, ub))
    compile_and_first = time.time() - t0
    iters = int(final.k)
    assert int(final.status) == S.SUCCESS, f"bench solve failed: {int(final.status)}"

    # Timed runs over DISTINCT problem instances: repeated identical calls
    # can hit result-level caching in the device tunnel and undercount.
    walls = []
    iters_list = []
    for seed in range(1, 4):
        qp_i = mq.random_qp(n, m, seed=seed, ineq=True)
        std_i, _, x0_i, y0_i = build_standard_form(qp_i)
        prob_i, lb_i, ub_i = S.problem_to_device(std_i, dtype)
        x0_j = jnp.asarray(x0_i, dtype)
        y0_j = jnp.asarray(y0_i, dtype)
        t0 = time.time()
        final = jax.block_until_ready(solve(prob_i, x0_j, y0_j, lb_i, ub_i))
        walls.append(time.time() - t0)
        iters_list.append(int(final.k))
        assert int(final.status) == S.SUCCESS
    wall = sum(walls) / sum(iters_list)  # seconds per iteration
    iters = int(np.mean(iters_list))
    wall = wall * iters  # mean solve time at mean iteration count

    iters_per_s = iters / wall
    result = {
        "metric": "qp_n500_mpc_iters_per_s",
        "value": round(iters_per_s, 3),
        "unit": "iters/s",
        "vs_baseline": None,
        "detail": {
            "n": n,
            "m": m,
            "iters": iters,
            "solve_s": round(wall, 5),
            "compile_plus_first_s": round(compile_and_first, 3),
            "objective": float(final.obj_val),
            "device": str(jax.devices()[0]),
            "dtype": str(dtype),
            "factorization_dtype": opts.factorization_dtype or str(dtype),
        },
    }
    # Secondary metric (best-effort, never breaks the headline): batched
    # lockstep throughput — the regime where the TPU wins outright
    # (BASELINE config #4; BENCH_NOTES "Batched instances").
    try:
        result["detail"]["batched"] = _batched_throughput(mq)
    except Exception as e:  # pragma: no cover - defensive
        result["detail"]["batched_error"] = repr(e)
    # Roofline accounting (VERDICT #3): live f32 factorization MFU/HBM
    # fractions at n=2048, plus the committed large-n sweep if present
    # (benchmarks/results/dense_large.json, measured on the real chip).
    try:
        result["detail"]["roofline"] = _roofline(jax)
    except Exception as e:  # pragma: no cover - defensive
        result["detail"]["roofline_error"] = repr(e)
    # Sparse device-path headline (round 3): grid-20k LP cold (symbolic +
    # greedy-scan-schedule compiles + solve) and warm re-solve — the
    # VERDICT r1 #1 "cold compile < 60 s" metric, measured live.
    try:
        result["detail"]["sparse_grid20k"] = _sparse_headline(mq)
    except Exception as e:  # pragma: no cover - defensive
        result["detail"]["sparse_error"] = repr(e)
    print(json.dumps(result))


def _sparse_headline(mq):
    import dataclasses

    from madqp_tpu.models.generators import grid_lp

    qp = grid_lp(g=100, seed=0)
    kw = dict(print_level=40, factorization_dtype="float32",
              max_refine_steps=1, tol=1e-8,
              step_rule=mq.AdaptiveStep(0.995),
              regularization=mq.FixedRegularization(1e-8, -1e-8))
    t0 = time.time()
    st = mq.solve_sparse_lp(qp, **kw)
    cold = time.time() - t0
    qp2 = dataclasses.replace(qp, c=qp.c * (1.0 + 1e-6))
    t0 = time.time()
    st2 = mq.solve_sparse_lp(qp2, **kw)
    warm = time.time() - t0
    assert st.status == 1 and st2.status == 1
    return {
        "case": "grid_lp g=100 (n=20000, m=10000)",
        "cold_total_s": round(cold, 1),
        "warm_total_s": round(warm, 2),
        "iters": int(st2.iter),
        "warm_per_iter_s": round(warm / max(1, int(st2.iter)), 3),
    }


def _roofline(jax, n=2048):
    import jax.numpy as jnp

    from madqp_tpu.utils.roofline import (dense_ldl_bytes, dense_ldl_flops,
                                          roofline_report)

    rng = np.random.default_rng(0)
    # Pin f32: under x64, `f32 / np.sqrt(n)` (np.float64 scalar) promotes
    # to f64 and this roofline silently measured EMULATED-F64 cholesky in
    # rounds 1-4 (round-5 discovery; real f32 n=8192 cholesky is ~13 ms).
    P = (rng.standard_normal((n, n)) / np.sqrt(n)).astype(np.float32)
    F = jnp.asarray(P @ P.T + 2.0 * np.eye(n, dtype=np.float32),
                    jnp.float32)
    # Amortized chain (exp_dense_refresh method): a single device_get
    # probe pays the ~25 ms tunnel round trip, which floors single-shot
    # timings of ms-scale kernels; K data-dependent factorizations per
    # dispatch, round trip subtracted.
    K = 8

    @jax.jit
    def chain(M):
        with jax.default_matmul_precision("highest"):
            def step(Mc, _):
                L = jnp.linalg.cholesky(Mc)
                Mc = Mc + (L[0, 0] * 1e-12) * jnp.eye(Mc.shape[0],
                                                      dtype=Mc.dtype)
                return Mc, L[0, 0]
            _, outs = jax.lax.scan(step, M, None, length=K)
        return outs

    f0 = jax.jit(lambda v: v + 1.0)
    v = jnp.ones((8,), jnp.float32)
    jax.device_get(f0(v))
    rt = min((lambda t0: (jax.device_get(f0(v)), time.time() - t0)[1])(
        time.time()) for _ in range(5))
    jax.device_get(chain(F)[:1])  # compile
    best = float("inf")
    for i in range(1, 4):
        t0 = time.time()
        jax.device_get(chain(F * np.float32(1.0 + 1e-6 * i))[:1])
        best = min(best, time.time() - t0)
    best = max(1e-6, (best - rt) / K)
    rep = roofline_report(dense_ldl_flops(n), dense_ldl_bytes(n, 4), best)
    out = {"live_chol_n2048": rep}
    import os

    # Round 5: the old dense_large.json sweep silently measured emulated
    # f64 (the np.sqrt promotion bug) — prefer the pinned-f32 amortized
    # remeasure (exp_dense_refresh.py; chained dispatches, round trip
    # subtracted) when committed.
    base = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "benchmarks", "results")
    refresh = os.path.join(base, "dense_refresh.json")
    if os.path.exists(refresh):
        with open(refresh) as fh:
            out["committed_f32_sweep"] = json.load(fh)
    path = os.path.join(base, "dense_large.json")
    if os.path.exists(path):
        with open(path) as fh:
            sweep = json.load(fh)
        out["committed_sweep_f64_emulated"] = {
            k: {b: {kk: v[b][kk] for kk in ("seconds", "gflops", "mfu",
                                            "gbps", "hbm_frac")}
                for b in ("blocked_ldl", "xla_cholesky") if b in v}
            for k, v in sweep.items() if k in ("2048", "4096", "8192")
        }
    return out


def _batched_throughput(mq, batch=512, n=32, m=16):
    """Instances/s for a vmapped lockstep solve of `batch` small QPs
    (per-instance convergence masking; benchmarks/bench_batched.py)."""
    from madqp_tpu.parallel import BatchedMPCSolver

    qps = [mq.dense_dummy_qp(n, m, seed=i) for i in range(batch)]
    solver = BatchedMPCSolver.from_problems(
        qps, tol=1e-8, print_level=40,
        step_rule=mq.AdaptiveStep(0.995),
        regularization=mq.FixedRegularization(1e-8, -1e-8),
        factorization_dtype="float32", max_refine_steps=1)
    t0 = time.time()
    solver.solve_batch()  # warm-up (compile)
    compile_and_first = time.time() - t0
    # Timed runs over value-perturbed problems: identical repeated
    # requests can be served from caches in the device tunnel.
    reps = 3
    t0 = time.time()
    for r in range(1, reps + 1):
        prob_r = solver.prob._replace(c=solver.prob.c * (1.0 + 1e-4 * r))
        final = solver.solve_batch(prob_r)
    wall = (time.time() - t0) / reps
    ok = sum(int(s) == 1 for s in final.status[: solver.n_real])
    return {
        "metric": f"qp_batched{batch}_instances_per_s",
        "value": round(batch / wall, 1),
        "unit": "instances/s",
        "batch": batch, "n": n, "m": m, "solved": ok,
        "wall_s": round(wall, 4),
        "compile_plus_first_s": round(compile_and_first, 3),
    }


if __name__ == "__main__":
    main()

"""Large-n dense headline + roofline (VERDICT round-1 #4 and #3).

Measures, at n in {2048, 4096, 8192}:
  * f32 blocked LDL factorization time (ops/blocked_dense.blocked_ldl,
    jitted standalone, value-perturbed reps) -> GFLOP/s, MFU, HBM fraction;
  * XLA's native cholesky for comparison;
  * at --solve n: full MPC iters/s on a random dense QP (condensed path,
    f32 factorization + 1 refinement step).

    python benchmarks/exp_dense_large.py [--sizes 2048,4096,8192] [--solve 4096]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def sync(x):
    import jax

    return jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def time_fn(fn, make_args, reps=3):
    best = float("inf")
    out = None
    for i in range(reps):
        a = make_args(i)
        t0 = time.time()
        out = fn(*a)
        sync(out)
        best = min(best, time.time() - t0)
    return best, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="2048,4096,8192",
                    help="factorization sizes; '' skips the section")
    ap.add_argument("--solve", default="4096",
                    help="comma list of n[:backend] full solves, e.g. "
                         "4096,4096:blocked,8192 (backend default 'dense' "
                         "= XLA cholesky)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from madqp_tpu.ops.blocked_dense import blocked_ldl
    from madqp_tpu.utils.roofline import (dense_ldl_bytes, dense_ldl_flops,
                                          roofline_report)

    print(f"device: {jax.devices()[0]}")
    results = {}
    with jax.default_matmul_precision("highest"):
        for n in [int(s) for s in args.sizes.split(",") if s]:
            rng = np.random.default_rng(0)
            # Pin f32 END-TO-END: under x64 (madqp import), dividing an
            # f32 array by the np.float64 SCALAR np.sqrt(n) promotes to
            # f64 and jnp.asarray keeps it — the round-3/4 committed
            # sweep measured EMULATED-F64 factorizations this way and
            # reported them as f32 MFU (round-5 discovery).
            P = (rng.standard_normal((n, n)) / np.sqrt(n)).astype(np.float32)
            F0 = P @ P.T + 2.0 * np.eye(n, dtype=np.float32)
            F = jnp.asarray(F0, jnp.float32)
            assert F.dtype == jnp.float32

            f_ldl = jax.jit(lambda M: blocked_ldl(M)[0])
            t0 = time.time()
            sync(f_ldl(F))
            comp_ldl = time.time() - t0
            t_ldl, _ = time_fn(f_ldl, lambda i: (F * (1.0 + 1e-6 * i),))

            f_chol = jax.jit(jnp.linalg.cholesky)
            t0 = time.time()
            sync(f_chol(F))
            comp_chol = time.time() - t0
            t_chol, _ = time_fn(f_chol, lambda i: (F * (1.0 + 1e-6 * i),))

            fl = dense_ldl_flops(n)
            by = dense_ldl_bytes(n, 4)
            r_ldl = roofline_report(fl, by, t_ldl)
            r_chol = roofline_report(fl, by, t_chol)
            print(f"n={n}: blocked_ldl {t_ldl*1e3:8.1f} ms "
                  f"({r_ldl['gflops']:.0f} GF/s, mfu={r_ldl['mfu']}, "
                  f"hbm={r_ldl['hbm_frac']}, compile {comp_ldl:.0f}s) | "
                  f"xla chol {t_chol*1e3:8.1f} ms ({r_chol['gflops']:.0f} "
                  f"GF/s, compile {comp_chol:.0f}s)")
            results[n] = {"blocked_ldl": r_ldl, "xla_cholesky": r_chol,
                          "compile_ldl_s": round(comp_ldl, 1),
                          "compile_chol_s": round(comp_chol, 1)}

        if args.solve:
            import dataclasses

            import madqp_tpu as mq

            for spec in str(args.solve).split(","):
                if not spec:
                    continue
                if ":" in spec:
                    size, backend = spec.split(":")
                else:
                    size, backend = spec, "dense"
                n = int(size)
                m = n // 4
                qp = mq.random_qp(n, m, seed=0, ineq=True)
                kw = dict(
                    print_level=40, tol=1e-8,
                    factorization_dtype="float32", max_refine_steps=1,
                    step_rule=mq.AdaptiveStep(0.995),
                    regularization=mq.FixedRegularization(1e-8, -1e-8),
                    linear_solver=backend,
                )
                t0 = time.time()
                st = mq.solve(qp, **kw)
                cold = time.time() - t0
                qp2 = dataclasses.replace(qp, c=qp.c * (1.0 + 1e-6))
                t0 = time.time()
                st2 = mq.solve(qp2, **kw)
                warm = time.time() - t0
                print(f"solve n={n} ({backend}): {st2.status.name} "
                      f"iters={st2.iter} warm {warm:.2f}s "
                      f"({st2.iter/warm:.2f} iters/s; cold {cold:.1f}s)")
                results[f"solve_{n}_{backend}"] = {
                    "n": n, "m": m, "backend": backend, "iters": st2.iter,
                    "warm_s": round(warm, 3),
                    "iters_per_s": round(st2.iter / warm, 3),
                    "cold_s": round(cold, 1),
                    "status": st2.status.name,
                }

    out = "benchmarks/results/dense_large.json"
    os.makedirs(os.path.dirname(out), exist_ok=True)
    if os.path.exists(out):  # merge: partial runs keep earlier sections
        with open(out) as f:
            merged = json.load(f)
        merged.update(results)
        results = merged
    with open(out, "w") as f:
        json.dump(results, f, indent=1, default=str)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()

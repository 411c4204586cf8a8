"""Multi-device scaling curves on the virtual CPU mesh (VERDICT #6).

Strong scaling: a fixed batch of QP instances, lockstep-solved with the
batch axis sharded over 1/2/4/8 devices.  Weak scaling: the two-stage
Schur solver with scenario count proportional to the device count.

HONESTY NOTE: with XLA_FLAGS=--xla_force_host_platform_device_count=N the
"devices" are threads of ONE host CPU sharing its cores, so wall-clock
speedups here measure partitioning + collective overhead, NOT hardware
scaling (BASELINE's "1 chip / 1 host / N hosts" protocol needs real
chips, which this environment does not have).  What this validates:
sharded programs compile, collectives execute, per-device work shrinks
with N, objectives match the single-device solves bit-for-bit.

    JAX_PLATFORMS=cpu python benchmarks/exp_scaling.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import madqp_tpu as mq  # noqa: E402


def strong_batched(batch=64, n=32, m=16):
    from madqp_tpu.parallel.batched import BatchedMPCSolver

    qps = [mq.dense_dummy_qp(n, m, seed=i) for i in range(batch)]
    kw = dict(tol=1e-8, print_level=40,
              step_rule=mq.AdaptiveStep(0.995),
              regularization=mq.FixedRegularization(1e-8, -1e-8))
    rows = []
    ref_obj = None
    for nd in (1, 2, 4, 8):
        mesh = jax.make_mesh((nd,), ("batch",))
        solver = BatchedMPCSolver.from_problems(
            qps, mesh=mesh, batch_axis="batch", **kw)
        solver.solve_batch()  # compile
        walls = []
        for r in range(1, 4):
            pr = solver.prob._replace(c=solver.prob.c * (1.0 + 1e-5 * r))
            t0 = time.time()
            final = solver.solve_batch(pr)
            walls.append(time.time() - t0)
        stats = solver.solve_all()
        ok = sum(s.status == mq.Status.SOLVE_SUCCEEDED for s in stats)
        objs = np.asarray([s.objective for s in stats])
        if ref_obj is None:
            ref_obj = objs
        obj_err = float(np.max(np.abs(objs - ref_obj)))
        rows.append(dict(devices=nd, batch=batch, wall_s=round(min(walls), 4),
                         instances_per_s=round(batch / min(walls), 1),
                         solved=ok, obj_err_vs_1dev=obj_err))
        print(f"strong batched: {nd} dev  {min(walls)*1e3:8.1f} ms  "
              f"{batch/min(walls):8.1f} inst/s  solved {ok}/{batch}  "
              f"obj_err {obj_err:.1e}")
    return rows


def weak_schur(n0=24, ns=20, ms=12, scen_per_dev=8):
    from madqp_tpu.parallel.structured import random_two_stage, solve_two_stage

    rows = []
    ref = {}
    for nd in (1, 2, 4, 8):
        N = scen_per_dev * nd
        prob, lb, ub = random_two_stage(n0=n0, ns=ns, ms=ms, m0=4, N=N,
                                        seed=11)
        mesh = jax.make_mesh((nd,), ("scen",)) if nd > 1 else None
        kw = dict(print_level=40, tol=1e-8)
        if mesh is not None:
            kw.update(mesh=mesh, scen_axis="scen")
        t0 = time.time()
        st = solve_two_stage(prob, lb, ub, **kw)
        cold = time.time() - t0
        t0 = time.time()
        st = solve_two_stage(prob, lb, ub, **kw)
        warm = time.time() - t0
        # single-device oracle at this size
        st1 = solve_two_stage(prob, lb, ub, print_level=40, tol=1e-8)
        err = abs(st.objective - st1.objective) / max(1.0, abs(st1.objective))
        nvar = n0 + N * ns
        rows.append(dict(devices=nd, scenarios=N, nvar=nvar,
                         iters=st.iter, warm_s=round(warm, 3),
                         cold_s=round(cold, 2),
                         status=st.status.name, obj_relerr_vs_1dev=err))
        print(f"weak schur: {nd} dev  N={N:3d} nvar={nvar:6d}  "
              f"iters={st.iter}  warm {warm:7.3f}s  relerr {err:.1e}")
    return rows


def main():
    out = {
        "note": ("virtual CPU mesh: validates partitioning/collectives and "
                 "per-device work division, not hardware speedup"),
        "strong_batched": strong_batched(),
        "weak_schur": weak_schur(),
    }
    path = "benchmarks/results/scaling_cpu_mesh.json"
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()

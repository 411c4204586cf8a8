"""Isolate the batched-path TPU worker fault (round-1 weak #7; reproduced
round 2 on the structured:large 1024 bucket).

    python benchmarks/repro_fault.py svm_300x40_0,svm_300x40_1,...

Runs the named structured:large instances as ONE lockstep batch with the
suite runner's options and reports status or crashes trying.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import madqp_tpu as mq  # noqa: E402


def main():
    names = set(sys.argv[1].split(",")) if len(sys.argv) > 1 else None
    import jax

    from madqp_tpu.models.suite import structured_suite
    from madqp_tpu.parallel import BatchedMPCSolver

    print(f"device: {jax.devices()[0]}")
    inst = [(nm, qp) for nm, qp in structured_suite("large")
            if names is None or nm in names]
    print("lanes:", [nm for nm, _ in inst])
    solver = BatchedMPCSolver.from_problems(
        [qp for _, qp in inst],
        print_level=40, tol=1e-8, max_ncorr=3,
        step_rule=mq.AdaptiveStep(0.995),
        regularization=mq.FixedRegularization(1e-8, -1e-8),
        factorization_dtype="float32", max_refine_steps=1,
    )
    print("padded dims:", solver.prob.c.shape, flush=True)
    t0 = time.time()
    stats = solver.solve_all()
    print(f"OK {sum(int(s.status == mq.Status.SOLVE_SUCCEEDED) for s in stats)}"
          f"/{len(stats)} in {time.time()-t0:.1f}s")
    for (nm, _), st in zip(inst, stats):
        print(f"  {nm:24s} {st.status.name:22s} it={st.iter}")


if __name__ == "__main__":
    main()

"""Cross-path consistency battery: every execution path must agree.

The framework has three execution paths sharing one kernel source
(device jitted / host sparse / batched vmapped) plus four KKT formulations
and a mixed-precision mode — this battery checks they all produce the same
optimum over a randomized set of problem shapes."""

import numpy as np
import pytest

import madqp_tpu as mq
from madqp_tpu import Status
from madqp_tpu.solver.host import solve_host
from madqp_tpu.parallel import solve_batched

QUIET = dict(print_level=40)


def problems():
    out = []
    for seed in range(4):
        n = 8 + 5 * seed
        m = 3 + 2 * seed
        out.append(mq.dense_dummy_qp(n, m, seed=100 + seed))
    out.append(mq.random_lp(30, 12, seed=5))
    out.append(mq.random_qp(24, 9, seed=6))
    return out


class TestCrossPathConsistency:
    def test_device_vs_host_vs_batched(self):
        qps = problems()
        device = [mq.solve(qp, **QUIET) for qp in qps]
        host = [
            solve_host(
                qp, regularization=mq.FixedRegularization(1e-8, -1e-8), **QUIET
            )
            for qp in qps
        ]
        batched = solve_batched(qps, **QUIET)
        for qp, d, h, b in zip(qps, device, host, batched):
            assert d.status == Status.SOLVE_SUCCEEDED, qp.name
            assert h.status == Status.SOLVE_SUCCEEDED, qp.name
            assert b.status == Status.SOLVE_SUCCEEDED, qp.name
            assert h.objective == pytest.approx(d.objective, abs=1e-5), qp.name
            assert b.objective == pytest.approx(d.objective, abs=1e-5), qp.name
            np.testing.assert_allclose(h.solution, d.solution, atol=1e-4)
            np.testing.assert_allclose(b.solution, d.solution, atol=1e-4)

    def test_kkt_formulations_agree(self):
        qp = mq.dense_dummy_qp(18, 9, seed=42)
        base = mq.solve(qp, kkt_system="condensed", **QUIET)
        for kkt in ["k2", "k2.5"]:
            s = mq.solve(qp, kkt_system=kkt, **QUIET)
            assert s.objective == pytest.approx(base.objective, abs=1e-7), kkt
        lp = mq.random_lp(20, 8, seed=43)
        base_lp = mq.solve(lp, kkt_system="condensed", **QUIET)
        s = mq.solve(lp, kkt_system="normal", **QUIET)
        assert s.objective == pytest.approx(base_lp.objective, abs=1e-7)

    def test_mixed_precision_agrees(self):
        for qp in [mq.dense_dummy_qp(20, 10, seed=50), mq.random_lp(25, 10, seed=51)]:
            full = mq.solve(qp, **QUIET)
            mixed = mq.solve(
                qp, factorization_dtype="float32", max_refine_steps=1, **QUIET
            )
            assert mixed.status == Status.SOLVE_SUCCEEDED
            assert mixed.objective == pytest.approx(full.objective, abs=1e-6)


def test_inverse_solve_mode_agrees():
    """solve_mode='inverse' (explicit inverses, matvec backsolves) must
    reproduce the default path."""
    qp = mq.random_qp(40, 16, seed=7)
    a = mq.solve(qp, **QUIET)
    b = mq.solve(qp, solve_mode="inverse", max_refine_steps=1, **QUIET)
    assert b.status == Status.SOLVE_SUCCEEDED
    assert b.iter == a.iter
    assert b.objective == pytest.approx(a.objective, abs=1e-8)

"""Tests for the small reference-parity surfaces added in round 2:

  * NOT_ENOUGH_DEGREES_OF_FREEDOM guard (reference src/solver.jl:379-380);
  * final summary block (reference MadNLP.print_summary, src/solver.jl:394);
  * accumulated linear_solver_time in the python-loop path
    (reference scripts/benchmarks_cpu.jl:55);
  * RelaxBound fixed-variable treatment (reference src/utils.jl:81);
  * barrier_gate="one-sided" reproducing the reference's sigma gate
    (src/kernels.jl:227-233).
"""

import numpy as np
import pytest

import madqp_tpu as mq
from madqp_tpu import Status
from madqp_tpu.utils.exceptions import NotEnoughDegreesOfFreedomException

QUIET = dict(print_level=40)


def overdetermined_lp():
    """3 equality rows over 2 free variables (1 fixed of 3)."""
    return mq.QuadraticProblem(
        c=np.array([1.0, 1.0, 0.0]),
        A=np.array([[1.0, 0.0, 1.0], [0.0, 1.0, 1.0], [1.0, 1.0, 0.0]]),
        lcon=np.array([1.0, 1.0, 1.0]),
        ucon=np.array([1.0, 1.0, 1.0]),
        lvar=np.array([-np.inf, -np.inf, 0.5]),
        uvar=np.array([np.inf, np.inf, 0.5]),
    )


class TestDegreesOfFreedom:
    def test_status_7(self):
        stats = mq.solve(overdetermined_lp(), **QUIET)
        assert stats.status == Status.NOT_ENOUGH_DEGREES_OF_FREEDOM
        assert stats.iter == 0

    def test_rethrow(self):
        with pytest.raises(NotEnoughDegreesOfFreedomException):
            mq.solve(overdetermined_lp(), rethrow_error=True, **QUIET)

    def test_square_system_ok(self):
        # m == n_free is NOT over-determined; must solve normally.
        qp = mq.QuadraticProblem(
            c=np.array([1.0, 1.0]),
            A=np.array([[1.0, 0.0], [0.0, 1.0]]),
            lcon=np.array([1.0, 2.0]),
            ucon=np.array([1.0, 2.0]),
            lvar=np.array([-np.inf, -np.inf]),
            uvar=np.array([np.inf, np.inf]),
        )
        stats = mq.solve(qp, **QUIET)
        assert stats.status == Status.SOLVE_SUCCEEDED
        np.testing.assert_allclose(stats.solution, [1.0, 2.0], atol=1e-7)


class TestPrintSummary:
    def test_summary_block_printed(self, capsys):
        qp = mq.dense_dummy_qp(10, 5, seed=0)
        stats = mq.solve(qp, print_level=25)  # NOTICE
        out = capsys.readouterr().out
        assert "Number of Iterations....: " in out
        assert "Objective...............:" in out
        assert "Constraint violation....:" in out
        assert f"Number of Iterations....: {stats.iter}" in out
        # summary precedes the EXIT line (reference ordering)
        assert out.index("Number of Iterations") < out.index("EXIT:")

    def test_unscaled_objective_in_summary(self, capsys):
        qp = mq.dense_dummy_qp(10, 5, seed=3)
        stats = mq.solve(qp, print_level=25)
        out = capsys.readouterr().out
        line = next(l for l in out.splitlines()
                    if l.startswith("Objective"))
        unscaled = float(line.split()[-1])
        assert unscaled == pytest.approx(stats.objective, rel=1e-6)


class TestLinearSolverTime:
    def test_python_loop_accumulates(self):
        qp = mq.dense_dummy_qp(20, 10, seed=1)
        stats = mq.solve(qp, loop_mode="python",
                         measure_linear_solver=True, **QUIET)
        assert stats.status == Status.SOLVE_SUCCEEDED
        t = stats.counters.linear_solver_time
        assert 0 < t < stats.counters.total_time

    def test_jit_loop_extrapolates(self):
        qp = mq.dense_dummy_qp(20, 10, seed=1)
        stats = mq.solve(qp, measure_linear_solver=True, **QUIET)
        assert stats.status == Status.SOLVE_SUCCEEDED
        assert stats.counters.linear_solver_time > 0


class TestRelaxBound:
    def test_matches_make_parameter(self):
        qp = mq.dense_dummy_qp(12, 6, fixed_variables=(2, 7), seed=4)
        ref = mq.solve(qp, **QUIET)
        rel = mq.solve(qp, fixed_variable_treatment="relax_bound", **QUIET)
        assert ref.status == Status.SOLVE_SUCCEEDED
        assert rel.status == Status.SOLVE_SUCCEEDED
        assert rel.objective == pytest.approx(ref.objective, abs=1e-6)
        np.testing.assert_allclose(rel.solution, ref.solution, atol=1e-5)
        # fixed entries pinned to their value (within the relaxation)
        np.testing.assert_allclose(rel.solution[[2, 7]],
                                   qp.lvar[[2, 7]], atol=1e-6)

    def test_keeps_columns(self):
        qp = mq.dense_dummy_qp(8, 4, fixed_variables=(1,), seed=5)
        from madqp_tpu.models.qp import build_standard_form_sparse

        std_mp, info_mp, _, _ = build_standard_form_sparse(qp)
        std_rb, info_rb, _, _ = build_standard_form_sparse(
            qp, fixed_variable_treatment="relax_bound")
        assert info_mp.n_kept == 7
        assert info_rb.n_kept == 8
        # relaxed pair is strictly widened around the fixed value
        j = 1
        assert std_rb.lb[j] < qp.lvar[j] < std_rb.ub[j]

    def test_invalid_treatment_rejected(self):
        qp = mq.dense_dummy_qp(6, 3, seed=6)
        from madqp_tpu.models.qp import build_standard_form_sparse

        with pytest.raises(ValueError):
            build_standard_form_sparse(qp, fixed_variable_treatment="bogus")


class TestBarrierGate:
    def test_one_sided_gate_solves_one_sided_lp(self):
        # one-sided bounds only: both gates take the adaptive sigma branch
        # and must agree exactly.
        qp = mq.random_lp(30, 12, seed=7)
        a = mq.solve(qp, **QUIET)
        b = mq.solve(qp, barrier_gate="one-sided", **QUIET)
        assert a.status == b.status == Status.SOLVE_SUCCEEDED
        assert a.iter == b.iter
        assert a.objective == pytest.approx(b.objective, abs=1e-9)

    def test_gates_differ_on_bounds_only_qp(self):
        # bounds-only (two-sided) QP: the reference gate forces sigma=1.
        qp = mq.dense_dummy_qp(10, 0, seed=8)
        a = mq.solve(qp, max_iter=100, **QUIET)
        b = mq.solve(qp, barrier_gate="one-sided", max_iter=100, **QUIET)
        assert a.status == Status.SOLVE_SUCCEEDED
        # any-bound gate must not be slower than the reference gate here
        if b.status == Status.SOLVE_SUCCEEDED:
            assert a.iter <= b.iter

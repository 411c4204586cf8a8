"""Unit tests for solver/certificates.py — the exit-time Farkas and
descent-ray certificates (detection the reference lacks, SURVEY §4)."""

import numpy as np
import pytest

from madqp_tpu.models.qp import StandardQP
from madqp_tpu.solver.certificates import (
    certify_exit_status,
    farkas_certificate,
    unbounded_certificate,
)
from madqp_tpu.utils.status import Status


def _std(c, A, b, lb, ub, has_lb, has_ub, H=None):
    return StandardQP(
        c0=np.float64(0.0), c=np.asarray(c, float), H=H,
        A=np.asarray(A, float), b=np.asarray(b, float),
        lb=np.asarray(lb, float), ub=np.asarray(ub, float),
        has_lb=np.asarray(has_lb, bool), has_ub=np.asarray(has_ub, bool),
    )


# x1 + x2 = 1 AND x1 + x2 = 2, x >= 0: infeasible; y = t*(1, -1) is a ray.
INFEAS = _std(
    c=[1.0, 1.0], A=[[1.0, 1.0], [1.0, 1.0]], b=[1.0, 2.0],
    lb=[0.0, 0.0], ub=[0.0, 0.0], has_lb=[True, True],
    has_ub=[False, False],
)

# min -x1 - x2 s.t. x1 - x2 = 0, x >= 0: unbounded along d = (1, 1).
UNBND = _std(
    c=[-1.0, -1.0], A=[[1.0, -1.0]], b=[0.0],
    lb=[0.0, 0.0], ub=[0.0, 0.0], has_lb=[True, True],
    has_ub=[False, False],
)


class TestFarkas:
    def test_certifies_diverged_ray(self):
        y = 1e9 * np.array([1.0, -1.0]) + np.array([0.3, -0.2])
        assert farkas_certificate(INFEAS, y)

    def test_refuses_small_iterate(self):
        # same direction but |y| has not diverged: noise floor too high
        assert not farkas_certificate(INFEAS, np.array([1.0, -1.0]))

    def test_refuses_non_certificate_direction(self):
        assert not farkas_certificate(INFEAS, 1e9 * np.array([1.0, 1.0]))

    def test_refuses_zero_and_nonfinite(self):
        assert not farkas_certificate(INFEAS, np.zeros(2))
        assert not farkas_certificate(INFEAS, np.array([np.nan, np.inf]))


class TestUnbounded:
    def test_certifies_descent_ray(self):
        x = 1e9 * np.array([1.0, 1.0]) + np.array([0.4, 0.1])
        assert unbounded_certificate(UNBND, x)

    def test_refuses_small_iterate(self):
        assert not unbounded_certificate(UNBND, np.array([1.0, 1.0]))

    def test_refuses_bound_incompatible_ray(self):
        # d < 0 on a coordinate with a lower bound
        assert not unbounded_certificate(UNBND, -1e9 * np.ones(2))

    def test_refuses_nonzero_A_component(self):
        assert not unbounded_certificate(
            UNBND, 1e9 * np.array([1.0, 0.5]))

    def test_hessian_blocks_curved_direction(self):
        # same data but H has curvature along d: objective is bounded
        H = np.eye(2)
        std = _std(
            c=[-1.0, -1.0], A=[[1.0, -1.0]], b=[0.0],
            lb=[0.0, 0.0], ub=[0.0, 0.0],
            has_lb=[True, True], has_ub=[False, False], H=H,
        )
        assert not unbounded_certificate(std, 1e9 * np.ones(2))

    def test_null_hessian_direction_certifies(self):
        H = np.array([[1.0, -1.0], [-1.0, 1.0]])  # d=(1,1) in null(H)
        std = _std(
            c=[-1.0, -1.0], A=[[1.0, -1.0]], b=[0.0],
            lb=[0.0, 0.0], ub=[0.0, 0.0],
            has_lb=[True, True], has_ub=[False, False], H=H,
        )
        assert unbounded_certificate(std, 1e9 * np.ones(2))


class TestCertifyExitStatus:
    def test_upgrades_to_infeasible(self):
        y = 1e9 * np.array([1.0, -1.0])
        s = certify_exit_status(INFEAS, np.ones(2), y,
                                Status.MAXIMUM_ITERATIONS_EXCEEDED)
        assert s == Status.INFEASIBLE_PROBLEM_DETECTED

    def test_upgrades_to_unbounded(self):
        s = certify_exit_status(UNBND, 1e9 * np.ones(2), np.zeros(1),
                                Status.DIVERGING_ITERATES)
        assert s == Status.UNBOUNDED_PROBLEM_DETECTED

    def test_passes_through_other_statuses(self):
        s = certify_exit_status(INFEAS, np.ones(2),
                                1e9 * np.array([1.0, -1.0]),
                                Status.SOLVE_SUCCEEDED)
        assert s == Status.SOLVE_SUCCEEDED

    def test_no_certificate_keeps_status(self):
        s = certify_exit_status(INFEAS, np.ones(2), np.ones(2),
                                Status.MAXIMUM_ITERATIONS_EXCEEDED)
        assert s == Status.MAXIMUM_ITERATIONS_EXCEEDED


class TestInLoopCertificate:
    def test_host_exits_early_on_certified_infeasibility(self):
        """The host loop attempts the Farkas certificate in-loop once the
        duals diverge (every 5 iterations) instead of burning the whole
        iteration budget before the exit-time check — the round-3
        infeasible portfolio_800 ran 300/300 iterations this way."""
        import scipy.sparse as sp

        import madqp_tpu as mq

        n, ngroup = 200, 10
        rng = np.random.default_rng(0)
        G = np.zeros((ngroup, n))
        for g in range(ngroup):
            G[g, g::ngroup] = 1.0
        A = np.vstack([np.ones(n), G])
        # group floors sum to 2.0 > budget 1.0: infeasible by construction
        qp = mq.QuadraticProblem(
            c=-rng.uniform(0.02, 0.2, n), H=None, A=sp.csr_matrix(A),
            lcon=np.concatenate([[1.0], np.full(ngroup, 0.2)]),
            ucon=np.concatenate([[1.0], np.full(ngroup, 0.8)]),
            lvar=np.zeros(n), uvar=np.full(n, 0.15),
            name="infeasible_portfolio_lp",
        )
        st = mq.solve_host(qp, tol=1e-8, max_iter=300, print_level=0,
                           regularization=mq.FixedRegularization(1e-8, -1e-8))
        assert st.status == Status.INFEASIBLE_PROBLEM_DETECTED
        assert st.iter < 150  # early, not at the 300 cap

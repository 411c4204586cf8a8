"""Standard-form conversion and container tests (reference L5 pipeline,
scripts/common.jl semantics + MadNLP callback-layer index classification)."""

import numpy as np
import pytest
import scipy.sparse as sp

import madqp_tpu as mq
from madqp_tpu.models.qp import build_standard_form, from_coo


def test_from_coo_symmetrizes_lower_triangle():
    # H lower triangle: [[2, 0], [1, 3]] -> full [[2, 1], [1, 3]]
    qp = from_coo(
        c=[0.0, 0.0],
        Hrows=[0, 1, 1],
        Hcols=[0, 0, 1],
        Hvals=[2.0, 1.0, 3.0],
        lcon=[],
        ucon=[],
        lvar=[-1, -1],
        uvar=[1, 1],
        ncon=0,
    )
    H = qp.H.toarray()
    np.testing.assert_allclose(H, [[2.0, 1.0], [1.0, 3.0]])
    assert qp.obj(np.array([1.0, 1.0])) == pytest.approx(0.5 * (2 + 1 + 1 + 3))


def test_standard_form_slack_structure():
    # 1 equality + 1 inequality row -> one slack.
    qp = mq.QuadraticProblem(
        c=np.array([1.0, 2.0]),
        A=np.array([[1.0, 1.0], [1.0, -1.0]]),
        lcon=np.array([1.0, -1.0]),
        ucon=np.array([1.0, 2.0]),
        lvar=np.array([0.0, 0.0]),
        uvar=np.array([np.inf, 1.0]),
    )
    std, info, x0, y0 = build_standard_form(qp, scaling=False)
    assert std.n == 3  # 2 vars + 1 slack
    assert std.m == 2
    np.testing.assert_allclose(std.A[0], [1.0, 1.0, 0.0])
    np.testing.assert_allclose(std.A[1], [1.0, -1.0, -1.0])
    np.testing.assert_allclose(std.b, [1.0, 0.0])
    # slack bounds = row bounds
    assert std.has_lb[2] and std.has_ub[2]
    assert std.lb[2] == -1.0 and std.ub[2] == 2.0
    # mask sanity
    assert std.has_lb[0] and not std.has_ub[0]
    assert std.has_lb[1] and std.has_ub[1]


def test_standard_form_internal_objective_matches_user():
    qp = mq.dense_dummy_qp(12, 6, seed=2)
    std, info, x0, y0 = build_standard_form(qp, scaling=True)
    x_user = info.recover_x(np.asarray(x0[: info.n_kept + 0]))
    # internal objective at x0 equals obj_scale * user objective
    x_int = np.asarray(x0)
    obj_int = float(std.c0 + std.c @ x_int + 0.5 * x_int @ std.H @ x_int)
    assert obj_int == pytest.approx(info.obj_scale * qp.obj(x_user), rel=1e-10)


def test_fixed_variable_elimination_lp():
    # min x1 + x2 s.t. x1 + x2 = 1, x2 fixed at 0.3
    qp = mq.QuadraticProblem(
        c=np.array([1.0, 1.0]),
        A=np.array([[1.0, 1.0]]),
        lcon=np.array([1.0]),
        ucon=np.array([1.0]),
        lvar=np.array([0.0, 0.3]),
        uvar=np.array([np.inf, 0.3]),
    )
    std, info, x0, y0 = build_standard_form(qp, scaling=False)
    assert std.n == 1
    np.testing.assert_allclose(std.b, [0.7])  # 1 - 0.3
    assert std.c0 == pytest.approx(0.3)
    x_user = info.recover_x(np.array([0.7]))
    np.testing.assert_allclose(x_user, [0.7, 0.3])


def test_fixed_variable_elimination_qp_cross_terms():
    # H couples fixed and free variables; eliminated c must pick up H[free,fix]*xf.
    H = np.array([[2.0, 1.0], [1.0, 4.0]])
    qp = mq.QuadraticProblem(
        c=np.array([1.0, -1.0]),
        H=sp.csr_matrix(H),
        A=np.zeros((0, 2)),
        lcon=np.zeros(0),
        ucon=np.zeros(0),
        lvar=np.array([-10.0, 0.5]),
        uvar=np.array([10.0, 0.5]),
    )
    std, info, x0, y0 = build_standard_form(qp, scaling=False)
    assert std.n == 1
    # internal objective at x1 = t must equal user objective at (t, 0.5)
    for t in [-1.0, 0.0, 2.0]:
        obj_int = float(std.c0 + std.c @ [t] + 0.5 * std.H[0, 0] * t * t)
        assert obj_int == pytest.approx(qp.obj(np.array([t, 0.5])), rel=1e-12)


def test_scaling_recover_multipliers():
    """Multipliers recovered from the scaled internal problem must satisfy
    the *user-space* KKT stationarity."""
    qp = mq.dense_dummy_qp(15, 8, seed=4)
    stats = mq.solve(qp, print_level=40, scaling=True)
    g = qp.grad(stats.solution)
    r = g + qp.jtprod(stats.multipliers) - stats.multipliers_L + stats.multipliers_U
    assert np.max(np.abs(r)) < 1e-5


def test_infeasible_bounds_raise():
    qp = mq.QuadraticProblem(
        c=np.array([1.0]),
        A=np.zeros((0, 1)),
        lcon=np.zeros(0),
        ucon=np.zeros(0),
        lvar=np.array([1.0]),
        uvar=np.array([0.0]),
    )
    with pytest.raises(ValueError, match="lvar > uvar"):
        build_standard_form(qp)


def test_free_constraint_row():
    """A (-inf, inf) constraint row becomes a free slack and is harmless."""
    qp = mq.QuadraticProblem(
        c=np.array([1.0, 1.0]),
        A=np.array([[1.0, 1.0], [1.0, -1.0]]),
        lcon=np.array([1.0, -np.inf]),
        ucon=np.array([1.0, np.inf]),
        lvar=np.zeros(2),
        uvar=np.full(2, np.inf),
    )
    stats = mq.solve(qp, print_level=40)
    assert stats.status == mq.Status.SOLVE_SUCCEEDED
    assert stats.objective == pytest.approx(1.0, abs=1e-6)


def test_grid_lp_generator_and_sparse_solve():
    """grid_lp produces a feasible 2D-mesh-structured LP whose sparse
    device path agrees with the dense solver (wide-front etree regime)."""
    from madqp_tpu.models.generators import grid_lp

    qp = grid_lp(g=8, seed=0)
    assert qp.nvar == 2 * 64 and qp.ncon == 64
    st = mq.MPCSolver(qp, kkt_system="sparse-normal", tol=1e-8,
                      print_level=0).solve()
    ref = mq.solve(qp, tol=1e-8, print_level=0)
    assert st.status == mq.Status.SOLVE_SUCCEEDED
    assert st.iter == ref.iter
    assert st.objective == pytest.approx(ref.objective, rel=1e-7)

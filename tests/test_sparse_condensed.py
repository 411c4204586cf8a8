"""On-device sparse condensed (K1) KKT path (solver/sparse_condensed.py).

The reference supports MadNLP's SparseCondensedKKTSystem behind
RelaxBound/RelaxEquality treatments (SURVEY §2.3 #3, src/utils.jl:81-82)
but never tests it; here both the linear algebra (exact K2-residual
oracle, including the eliminated slack/dual blocks) and the end-to-end
solver (cross-KKT self-consistency, reference test/runtests.jl:95-135
pattern) are covered.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

import madqp_tpu as mq
from madqp_tpu.models.generators import random_lp, random_qp
from madqp_tpu.solver.sparse_condensed import (
    DeviceSparseCondensedKKT,
    relax_equalities,
    solve_sparse_condensed,
)
from madqp_tpu.solver.sparse_qp import SparseQPProblem


def _internal_problem(kkt, A_int, H0=None):
    """SparseQPProblem over the internal [A0, -I] form, canonical CSC."""
    A = sp.csc_matrix(A_int)
    A.sum_duplicates()
    Acoo = A.sorted_indices().tocoo()
    m, n = A.shape
    if H0 is not None:
        H_int = sp.block_diag([H0, sp.csc_matrix((m, m))], format="csc")
        H_int.sum_duplicates()
        Hcoo = H_int.sorted_indices().tocoo()
        h = (jnp.asarray(Hcoo.row.astype(np.int32)),
             jnp.asarray(Hcoo.col.astype(np.int32)),
             jnp.asarray(Hcoo.data))
    else:
        h = (jnp.zeros((0,), jnp.int32), jnp.zeros((0,), jnp.int32),
             jnp.zeros((0,)))
    return SparseQPProblem(
        c0=jnp.zeros(()), c=jnp.zeros(n), b=jnp.zeros(m),
        has_lb=jnp.ones(n, bool), has_ub=jnp.zeros(n, bool),
        a_rows=jnp.asarray(Acoo.row.astype(np.int32)),
        a_cols=jnp.asarray(Acoo.col.astype(np.int32)),
        a_vals=jnp.asarray(Acoo.data),
        h_rows=h[0], h_cols=h[1], h_vals=h[2],
    )


@pytest.mark.parametrize("with_h", [False, True])
def test_condensed_kkt_solves_k2_system(with_h):
    """kkt.solve must satisfy the FULL augmented system
    [W Aᵀ; A δ_c I][dx;dy] = [rx;ry] with A = [A0, -I] — the slack and
    dual eliminations are exact."""
    rng = np.random.default_rng(0)
    m, n0 = 40, 25
    A0 = sp.random(m, n0, density=0.2, random_state=1, format="csc")
    A0 = A0 + sp.random(m, n0, density=0.05, random_state=7, format="csc")
    H0 = None
    if with_h:
        B = sp.random(n0, n0, density=0.15, random_state=3)
        H0 = (B @ B.T + 0.1 * sp.eye(n0)).tocsc()
    A_int = sp.hstack([A0, -sp.eye(m)], format="csc")
    kkt = DeviceSparseCondensedKKT(H0, A0)
    prob = _internal_problem(kkt, A_int, H0=H0)

    n = n0 + m
    pr_diag = jnp.asarray(rng.uniform(0.1, 10.0, n))
    del_c = -1e-7
    f = kkt.factorize(prob, pr_diag, del_c)
    assert bool(kkt.factor_ok(f))

    rx = jnp.asarray(rng.standard_normal(n))
    ry = jnp.asarray(rng.standard_normal(m))
    dx, dy = kkt.solve(f, rx, ry)

    W = np.diag(np.asarray(pr_diag))
    if H0 is not None:
        W[:n0, :n0] += H0.toarray()
    Ad = A_int.toarray()
    res1 = W @ np.asarray(dx) + Ad.T @ np.asarray(dy) - np.asarray(rx)
    res2 = Ad @ np.asarray(dx) + del_c * np.asarray(dy) - np.asarray(ry)
    assert np.max(np.abs(res1)) < 1e-8
    assert np.max(np.abs(res2)) < 1e-8


def test_relax_equalities():
    qp = random_qp(n=30, m=12, seed=5, ineq=False)  # all equality rows
    rel = relax_equalities(qp, 1e-8)
    assert np.all(rel.lcon < rel.ucon)
    gap = rel.ucon - rel.lcon
    assert np.all(gap >= 1.9e-8 * np.maximum(1.0, np.abs(qp.lcon)))


@pytest.mark.parametrize("maker,kwargs", [
    (random_lp, dict(n=60, m=25, seed=2)),
    (random_qp, dict(n=50, m=20, seed=3, ineq=True)),
    (random_qp, dict(n=40, m=15, seed=4, ineq=False)),
])
def test_condensed_end_to_end_matches_augmented(maker, kwargs):
    qp = maker(**kwargs)
    ref = mq.solve_sparse_qp(qp, kkt_system="augmented", tol=1e-8,
                             print_level=0)
    out = solve_sparse_condensed(qp, tol=1e-8, print_level=0)
    assert ref.status.name == "SOLVE_SUCCEEDED"
    assert out.status.name == "SOLVE_SUCCEEDED"
    # Equality relaxation perturbs the feasible set by ~tol: objectives
    # agree to a few orders above tol.
    assert out.objective == pytest.approx(ref.objective, abs=1e-5, rel=1e-5)
    assert np.max(np.abs(out.solution - ref.solution)) < 1e-4


def test_condensed_via_solve_sparse_qp_routing():
    qp = random_qp(n=30, m=12, seed=9, ineq=True)
    out = mq.solve_sparse_qp(qp, kkt_system="condensed", tol=1e-8,
                             print_level=0)
    ref = mq.solve(qp, tol=1e-8, print_level=0)
    assert out.status.name == "SOLVE_SUCCEEDED"
    assert out.objective == pytest.approx(ref.objective, abs=1e-5, rel=1e-5)


def test_condensed_f32_two_phase():
    qp = random_qp(n=50, m=20, seed=11, ineq=True)
    out = solve_sparse_condensed(
        qp, tol=1e-8, factorization_dtype="float32",
        precision_scheme="two-phase", print_level=0)
    ref = mq.solve(qp, tol=1e-8, print_level=0)
    assert out.status.name == "SOLVE_SUCCEEDED"
    assert out.objective == pytest.approx(ref.objective, abs=1e-5, rel=1e-5)


def test_auto_routes_ineq_dominated_to_condensed():
    """auto must pick K1 for inequality-dominated non-diagonal-H QPs
    (no equality rows, banded A) and keep K2 when equalities exist."""
    from madqp_tpu.models.generators import ineq_qp
    from madqp_tpu.solver.sparse_qp import _condensed_auto_ok

    qp = ineq_qp(n=120, m_factor=2, band=4, seed=3)
    assert _condensed_auto_ok(qp)
    out = mq.solve_sparse_qp(qp, kkt_system="auto", tol=1e-8, print_level=0)
    ref = mq.solve_sparse_qp(qp, kkt_system="condensed", tol=1e-8,
                             print_level=0)
    assert out.status.name == "SOLVE_SUCCEEDED"
    assert out.iter == ref.iter
    assert out.objective == pytest.approx(ref.objective, rel=1e-9, abs=1e-9)

    # equality-constrained QP: relaxation is not a no-op -> stays on K2
    qp_eq = random_qp(n=40, m=20, seed=5)
    assert not _condensed_auto_ok(qp_eq)

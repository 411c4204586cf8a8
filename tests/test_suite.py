"""Structured synthetic suite (models/suite.py) — the Netlib/Maros-Mészáros
stand-in (reference scripts/benchmarks_cpu.jl:66-72 runs the real
collections; no network here)."""

import numpy as np
import pytest

import madqp_tpu as mq
from madqp_tpu.models import suite as SU


ALL_SMALL = list(SU.structured_suite("small", seeds=(0,)))


def test_suite_families_present():
    kinds = {nm.split("_")[0] for nm, _ in ALL_SMALL}
    assert kinds == {"transport", "multicomm", "staircase", "blending",
                     "portfolio", "svm", "fixedvars"}


@pytest.mark.parametrize("nm,qp", ALL_SMALL, ids=[nm for nm, _ in ALL_SMALL])
def test_suite_instance_solves(nm, qp):
    st = mq.solve(qp, kkt_system="k2", tol=1e-8, print_level=0, max_ncorr=2)
    assert st.status == mq.Status.SOLVE_SUCCEEDED, nm
    assert np.isfinite(st.objective)


def test_transport_balanced_optimum_bounds():
    """Optimal cost is between min-cost-greedy LB and any feasible UB."""
    qp = SU.transport_lp(6, 8, seed=0)
    st = mq.solve(qp, print_level=0, tol=1e-8)
    assert st.status == mq.Status.SOLVE_SUCCEEDED
    # LB: total demand * cheapest unit cost
    demand = qp.lcon[6:]
    assert st.objective >= demand.sum() * qp.c.min() - 1e-6
    assert st.objective <= demand.sum() * qp.c.max() + 1e-6


def test_svm_qp_separating():
    """SVM QP objective equals 0.5||w||^2 + C sum(xi) at the solution and
    the margin constraints hold."""
    qp = SU.svm_qp(30, 8, seed=0)
    st = mq.solve(qp, kkt_system="k2", print_level=0, tol=1e-8)
    assert st.status == mq.Status.SOLVE_SUCCEEDED
    x = st.solution
    nfeat = 8
    w, xi = x[:nfeat], x[nfeat + 1:]
    manual = 0.5 * (w @ w) + xi.sum() + 1e-8 * 0.5 * x[nfeat] ** 2
    assert st.objective == pytest.approx(manual, rel=1e-5)
    assert (np.asarray(qp.A @ x) >= 1.0 - 1e-6).all()


def test_write_suite_roundtrip(tmp_path):
    """Every family survives MPS write -> parse -> solve with the same
    objective (RANGES, free vars, fixed vars, QUADOBJ all exercised)."""
    paths = SU.write_suite(str(tmp_path), size="small", seeds=(0,))
    assert len(paths) == len(ALL_SMALL)
    by_name = dict(ALL_SMALL)
    for path in paths:
        qp2 = mq.read_mps(path)
        qp1 = by_name[qp2.name]
        st1 = mq.solve(qp1, kkt_system="k2", print_level=0, tol=1e-8)
        st2 = mq.solve(qp2, kkt_system="k2", print_level=0, tol=1e-8)
        assert st2.status == mq.Status.SOLVE_SUCCEEDED, qp2.name
        assert st2.objective == pytest.approx(st1.objective, rel=1e-6, abs=1e-8)

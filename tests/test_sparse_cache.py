"""Pattern-keyed sparse kernel cache (solver/sparse_common.py): same
sparsity + options must reuse one jitted kernel; values are traced, so
different problems on the same pattern get their own correct answers."""

import numpy as np
import pytest

import madqp_tpu as mq
from madqp_tpu.solver import sparse_common as SCm


def _banded(seed):
    return mq.banded_sparse_lp(n=300, m=150, band=3, seed=seed)


def test_fingerprint_pattern_only():
    a, b = _banded(0), _banded(1)
    assert not np.allclose(a.A.data, b.A.data)  # values differ
    assert (SCm.pattern_fingerprint(a.A)
            == SCm.pattern_fingerprint(b.A))     # pattern identical
    c = mq.banded_sparse_lp(n=300, m=150, band=4, seed=0)
    assert (SCm.pattern_fingerprint(a.A)
            != SCm.pattern_fingerprint(c.A))


def test_lp_kernel_reused_values_differ():
    SCm._KERNEL_CACHE.clear()
    st0 = mq.solve_sparse_lp(_banded(0), tol=1e-8, print_level=0)
    n_after_first = len(SCm._KERNEL_CACHE)
    st1 = mq.solve_sparse_lp(_banded(1), tol=1e-8, print_level=0)
    assert len(SCm._KERNEL_CACHE) == n_after_first  # cache hit, no rebuild
    assert st0.status == st1.status == mq.Status.SOLVE_SUCCEEDED
    assert st0.objective != pytest.approx(st1.objective, rel=1e-3)
    # cross-check against the dense reference path
    ref1 = mq.solve(_banded(1), tol=1e-8, print_level=0)
    assert st1.objective == pytest.approx(ref1.objective, rel=1e-7)


def test_qp_kernel_reused_values_differ():
    SCm._KERNEL_CACHE.clear()

    def make(seed):
        qp = mq.random_qp(60, 30, seed=seed, ineq=True)
        return qp

    st0 = mq.solve_sparse_qp(make(0), tol=1e-8, print_level=0)
    n_after_first = len(SCm._KERNEL_CACHE)
    st1 = mq.solve_sparse_qp(make(1), tol=1e-8, print_level=0)
    # random_qp with a different seed has the same DENSE pattern => hit
    assert len(SCm._KERNEL_CACHE) == n_after_first
    assert st0.status == st1.status == mq.Status.SOLVE_SUCCEEDED
    ref1 = mq.solve(make(1), kkt_system="k2", tol=1e-8, print_level=0)
    assert st1.objective == pytest.approx(ref1.objective, rel=1e-6)


def test_mpcsolver_sparse_shares_cache():
    SCm._KERNEL_CACHE.clear()
    s0 = mq.MPCSolver(_banded(0), kkt_system="sparse-normal",
                      tol=1e-8, print_level=0)
    st0 = s0.solve()
    n_after_first = len(SCm._KERNEL_CACHE)
    s1 = mq.MPCSolver(_banded(1), kkt_system="sparse-normal",
                      tol=1e-8, print_level=0)
    st1 = s1.solve()
    assert len(SCm._KERNEL_CACHE) == n_after_first
    assert st0.status == st1.status == mq.Status.SOLVE_SUCCEEDED
    assert st0.objective != pytest.approx(st1.objective, rel=1e-3)

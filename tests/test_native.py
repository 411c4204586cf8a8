"""Native C++ sparse kernels + host sparse solver tests."""

import numpy as np
import pytest
import scipy.sparse as sp

import madqp_tpu as mq
from madqp_tpu import Status
from madqp_tpu.native import (
    SparseLDL,
    amd_order,
    available,
    col_counts,
    etree,
    ordering,
    postorder,
)
from madqp_tpu.solver.host import solve_host

pytestmark = pytest.mark.skipif(
    not available(), reason="native library unavailable (no g++?)"
)


def spd_matrix(rng, n=120, density=0.03):
    M = sp.random(n, n, density=density, random_state=7)
    return (M @ M.T + 10 * sp.eye(n)).tocsc()


class TestSymbolic:
    def test_etree_valid_forest(self, rng):
        A = spd_matrix(rng)
        parent = etree(A)
        n = A.shape[0]
        # parents are later columns or -1 (etree property)
        for j in range(n):
            assert parent[j] == -1 or parent[j] > j

    def test_postorder_is_permutation(self, rng):
        A = spd_matrix(rng)
        post = postorder(etree(A))
        assert sorted(post) == list(range(A.shape[0]))

    def test_col_counts_match_factor(self, rng):
        A = spd_matrix(rng, n=60)
        counts = col_counts(A)
        # exact check against a dense Cholesky pattern of the same matrix
        import numpy.linalg as la

        L = la.cholesky(A.toarray())
        # structural count: nnz per column of L for a matrix with no exact
        # cancellation (values random -> pattern = symbolic pattern)
        struct = (np.abs(L) > 1e-14).sum(axis=0)
        np.testing.assert_array_equal(counts, struct)

    def test_amd_reduces_fill(self, rng):
        A = spd_matrix(rng, n=200, density=0.02)
        f_amd = SparseLDL(A, order="amd")
        f_nat = SparseLDL(A, use_amd=False)
        assert f_amd.nnz_factor <= f_nat.nnz_factor

    def test_amd_variants_are_permutations(self, rng):
        A = spd_matrix(rng, n=150, density=0.03)
        for variant in ["elem", "clique"]:
            perm = amd_order(A, variant)
            assert sorted(perm) == list(range(150))
        # element variant must produce a usable factorization
        f = SparseLDL(A, order="amd")
        assert f.factorize(A)
        b = np.ones(150)
        np.testing.assert_allclose(
            f.solve(b), np.linalg.solve(A.toarray(), b), rtol=1e-8, atol=1e-9
        )

    def test_orderings_are_permutations(self, rng):
        A = spd_matrix(rng, n=80)
        for method in ["amd", "rcm", "natural", "auto"]:
            perm = ordering(A, method)
            assert sorted(perm) == list(range(80))


class TestSparseLDL:
    def test_solve_matches_dense(self, rng):
        A = spd_matrix(rng)
        f = SparseLDL(A)
        assert f.factorize(A) and f.is_factorized
        b = rng.standard_normal(A.shape[0])
        x = f.solve(b)
        np.testing.assert_allclose(
            x, np.linalg.solve(A.toarray(), b), rtol=1e-9, atol=1e-10
        )

    def test_refactorize_same_pattern(self, rng):
        A = spd_matrix(rng)
        f = SparseLDL(A)
        f.factorize(A)
        A2 = A * 2.0  # same pattern, different values
        assert f.factorize(A2)
        b = rng.standard_normal(A.shape[0])
        np.testing.assert_allclose(
            f.solve(b), np.linalg.solve(A2.toarray(), b), rtol=1e-9, atol=1e-10
        )

    def test_quasidefinite_k2(self, rng):
        n, m = 80, 30
        M = sp.random(n, n, density=0.05, random_state=3)
        W = (M @ M.T + 5 * sp.eye(n)).tocsc()
        B = sp.random(m, n, density=0.1, random_state=4)
        K = sp.bmat([[W, B.T], [B, -1e-6 * sp.eye(m)]]).tocsc()
        f = SparseLDL(K)
        assert f.factorize(K)
        b = rng.standard_normal(n + m)
        np.testing.assert_allclose(
            f.solve(b), np.linalg.solve(K.toarray(), b), rtol=1e-6, atol=1e-8
        )

    def test_breakdown_detected(self):
        # structurally fine but numerically singular
        A = sp.csc_matrix(np.array([[1.0, 1.0], [1.0, 1.0]]))
        f = SparseLDL(A)
        assert not f.factorize(A)
        assert not f.is_factorized


class TestHostSolver:
    def test_degenerate_lp_default_options(self):
        """Regression: del_c = 0 defaults must not silently produce a bad
        no-pivot factorization (found by verification probing)."""
        host = solve_host(mq.simple_lp(), print_level=40)
        dense = mq.solve(mq.simple_lp(), print_level=40)
        assert host.status == Status.SOLVE_SUCCEEDED
        assert host.iter == dense.iter
        assert host.objective == pytest.approx(1.0, abs=1e-6)
        np.testing.assert_allclose(host.solution, dense.solution, atol=1e-5)

    def test_lp_normal_matches_dense_solver(self):
        lp = mq.random_lp(60, 25, seed=1)
        host = solve_host(
            lp, print_level=40, kkt_system="normal",
            regularization=mq.FixedRegularization(1e-8, -1e-8),
        )
        dense = mq.solve(lp, print_level=40)
        assert host.status == Status.SOLVE_SUCCEEDED
        assert host.objective == pytest.approx(dense.objective, abs=1e-6)
        np.testing.assert_allclose(host.solution, dense.solution, atol=1e-5)
        assert host.linear_solver_time > 0  # real measurement

    def test_qp_k2_matches_dense_solver(self):
        qp = mq.dense_dummy_qp(25, 12, seed=4)
        host = solve_host(
            qp, print_level=40,
            regularization=mq.FixedRegularization(1e-8, -1e-8),
        )
        dense = mq.solve(qp, print_level=40)
        assert host.status == Status.SOLVE_SUCCEEDED
        assert host.objective == pytest.approx(dense.objective, abs=1e-6)
        np.testing.assert_allclose(host.multipliers, dense.multipliers, atol=1e-5)

    def test_gondzio_host(self):
        qp = mq.dense_dummy_qp(20, 10, seed=6)
        s = solve_host(qp, print_level=40, max_ncorr=3,
                       regularization=mq.FixedRegularization(1e-8, -1e-8))
        assert s.status == Status.SOLVE_SUCCEEDED

    def test_large_banded_lp(self):
        qp = mq.banded_sparse_lp(4000, 2000, seed=0)
        s = solve_host(
            qp, print_level=40, kkt_system="normal", max_iter=100,
            regularization=mq.FixedRegularization(1e-8, -1e-8),
        )
        assert s.status == Status.SOLVE_SUCCEEDED
        # primal feasibility at the reported solution
        r = np.max(np.abs(qp.cons(s.solution) - qp.lcon))
        assert r < 1e-5

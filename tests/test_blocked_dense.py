"""Oracle tests for ops/blocked_dense.py (GEMM-rich blocked factorizations).

NumPy-oracle pattern per SURVEY §4: each kernel is validated against the
dense reference (np.linalg) and against the sequential unblocked
implementation it replaces."""

import numpy as np
import pytest

import jax.numpy as jnp

from madqp_tpu.ops.blocked_dense import (
    blocked_cholesky,
    blocked_ldl,
    inv_lower,
    inv_unit_lower,
    unblocked_ldl,
)


def _spd(rng, *shape):
    w = shape[-1]
    M = rng.standard_normal(shape)
    return M @ np.swapaxes(M, -1, -2) + w * np.eye(w)


@pytest.mark.parametrize("w", [4, 32, 96, 128, 160])
@pytest.mark.parametrize("batch", [(), (7,)])
def test_blocked_cholesky_matches_numpy(w, batch, rng):
    A = _spd(rng, *batch, w, w)
    L = np.asarray(blocked_cholesky(jnp.asarray(A)))
    Lref = np.linalg.cholesky(A)
    np.testing.assert_allclose(L, Lref, rtol=1e-9, atol=1e-9 * w)
    assert np.allclose(np.triu(L, 1), 0.0)


@pytest.mark.parametrize("w", [8, 32, 80, 128])
def test_blocked_ldl_matches_unblocked(w, rng):
    A = _spd(rng, 5, w, w)
    Lb, db = blocked_ldl(jnp.asarray(A))
    Lu, du = unblocked_ldl(jnp.asarray(A))
    np.testing.assert_allclose(np.asarray(db), np.asarray(du), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(Lb), np.asarray(Lu),
                               rtol=1e-8, atol=1e-8)


@pytest.mark.parametrize("w", [16, 64, 128])
def test_blocked_ldl_quasi_definite_signed(w, rng):
    # Quasi-definite [W A'; A -D]: positive then negative pivots, no
    # pivoting needed (Vanderbei) — reconstruction must hold and pivot
    # signs must match the block structure.
    h = w // 2
    Adat = rng.standard_normal((h, h))
    K = np.zeros((w, w))
    K[:h, :h] = np.diag(rng.uniform(0.5, 2.0, h))
    K[h:, :h] = Adat
    K[:h, h:] = Adat.T
    K[h:, h:] = -np.diag(rng.uniform(0.5, 2.0, h)) - Adat @ Adat.T
    L, d = blocked_ldl(jnp.asarray(K))
    rec = np.asarray(L) @ np.diag(np.asarray(d)) @ np.asarray(L).T
    np.testing.assert_allclose(rec, K, rtol=1e-8, atol=1e-8)
    assert np.all(np.asarray(d)[:h] > 0) and np.all(np.asarray(d)[h:] < 0)


def test_blocked_ldl_pivot_floor(rng):
    # A pivot that drifts to a tiny value of the CORRECT sign is clamped
    # to sgn * floor (the quasi-definite contract: flooring rescues
    # near-zero drift, not wrong-sign pivots — a large wrong-sign pivot
    # means the regularization policy failed upstream).
    w = 48
    A = _spd(rng, w, w)
    A[3, :] = 0.0
    A[:, 3] = 0.0
    A[3, 3] = 1e-12  # decoupled, nearly-zero positive pivot
    sgn = jnp.ones((w,))
    L, d = blocked_ldl(jnp.asarray(A), sgn=sgn, floor=1e-6)
    d = np.asarray(d)
    assert np.all(d >= 1e-6 - 1e-18)
    assert np.isfinite(np.asarray(L)).all()


@pytest.mark.parametrize("w", [8, 32, 96, 128])
@pytest.mark.parametrize("unit", [True, False])
def test_inv_lower_matches_numpy(w, unit, rng):
    # Off-diagonals scaled ~1/sqrt(w): a raw N(0,1) unit triangular has an
    # exponentially ill-conditioned inverse (entries ~1e11 at w=96), which
    # would test conditioning, not the kernel.
    L = np.tril(rng.standard_normal((3, w, w)) / np.sqrt(w), -1)
    ii = np.arange(w)
    L[:, ii, ii] = 1.0 if unit else rng.uniform(0.5, 2.0, (3, w))
    X = (inv_unit_lower(jnp.asarray(L)) if unit
         else inv_lower(jnp.asarray(L)))
    np.testing.assert_allclose(
        np.asarray(X), np.linalg.inv(L), rtol=1e-8, atol=1e-8)
    assert np.allclose(np.triu(np.asarray(X), 1), 0.0)


def test_dense_solver_blocked_backend_matches():
    """linear_solver='blocked' (GEMM-rich LDL + explicit inverses in the
    condensed dense KKT) must be iteration-identical to the XLA backend."""
    import madqp_tpu as mq

    qp = mq.random_qp(n=80, m=40, seed=3, ineq=True)
    ref = mq.solve(qp, tol=1e-8, print_level=0)
    st = mq.solve(qp, tol=1e-8, print_level=0, linear_solver="blocked")
    assert st.status == ref.status
    assert st.iter == ref.iter
    assert st.objective == pytest.approx(ref.objective, rel=1e-9)
    st32 = mq.solve(qp, tol=1e-8, print_level=0, linear_solver="blocked",
                    factorization_dtype="float32", max_refine_steps=1)
    assert st32.status == ref.status
    assert st32.objective == pytest.approx(ref.objective, rel=1e-7)

    lp = mq.banded_sparse_lp(n=150, m=70, band=4, seed=1)
    r = mq.solve(lp, tol=1e-8, print_level=0)
    s = mq.solve(lp, tol=1e-8, print_level=0, linear_solver="blocked")
    assert (s.status, s.iter) == (r.status, r.iter)
    assert s.objective == pytest.approx(r.objective, rel=1e-9)


def test_k2_blocked_signed_ldl_matches_lu():
    """K2/K2.5 with the blocked backend (signed LDL + explicit inverse,
    pivot-sign inertia check) match the LU backend iteration-for-iteration."""
    import madqp_tpu as mq

    qp = mq.random_qp(n=60, m=30, seed=2, ineq=True)
    ref = mq.solve(qp, tol=1e-8, print_level=0, kkt_system="k2")
    for ks in ("k2", "k2.5"):
        st = mq.solve(qp, tol=1e-8, print_level=0, kkt_system=ks,
                      linear_solver="blocked")
        assert (st.status, st.iter) == (ref.status, ref.iter)
        assert st.objective == pytest.approx(ref.objective, rel=1e-9)
    st32 = mq.solve(qp, tol=1e-8, print_level=0, kkt_system="k2.5",
                    linear_solver="blocked", factorization_dtype="float32",
                    max_refine_steps=2)
    assert st32.status == ref.status
    assert st32.objective == pytest.approx(ref.objective, rel=1e-7)


@pytest.mark.parametrize("n", [100, 300, 1100])
def test_panel_ldl_matches_numpy(n, rng):
    """Right-looking panel LDL (the O(1)-program large-n path, auto-
    dispatched by blocked_ldl for 2-D inputs >= 1024) reconstructs A and
    its panel inverse inverts L, including non-multiple-of-panel sizes."""
    from madqp_tpu.ops.blocked_dense import panel_ldl, panel_inv_unit_lower

    A = _spd(rng, n, n)
    L, d = panel_ldl(jnp.asarray(A))
    rec = np.asarray(L) @ np.diag(np.asarray(d)) @ np.asarray(L).T
    assert np.abs(rec - A).max() / np.abs(A).max() < 1e-13
    assert np.allclose(np.triu(np.asarray(L), 1), 0.0)
    X = panel_inv_unit_lower(L)
    assert np.abs(np.asarray(X) @ np.asarray(L) - np.eye(n)).max() < 1e-12


def test_panel_ldl_quasidefinite_signed_floor(rng):
    from madqp_tpu.ops.blocked_dense import blocked_ldl

    n = 1500
    h = n // 2
    Adat = rng.standard_normal((h, h))
    K = np.zeros((n, n))
    K[:h, :h] = np.diag(rng.uniform(0.5, 2.0, h))
    K[h:, :h] = Adat
    K[:h, h:] = Adat.T
    K[h:, h:] = -np.diag(rng.uniform(0.5, 2.0, h)) - Adat @ Adat.T
    sgn = np.concatenate([np.ones(h), -np.ones(h)])
    # n >= 1024 and 2-D => panel path
    L, d = blocked_ldl(jnp.asarray(K), sgn=jnp.asarray(sgn), floor=1e-10)
    rec = np.asarray(L) @ np.diag(np.asarray(d)) @ np.asarray(L).T
    assert np.abs(rec - K).max() / np.abs(K).max() < 1e-13
    assert (np.sign(np.asarray(d)) == sgn).all()


def test_dense_solver_blocked_backend_panel_regime():
    """linear_solver='blocked' at n >= 1024 exercises the panel_ldl /
    panel_inv_unit_lower dispatch inside the condensed KKT; must match
    the XLA backend's result."""
    import madqp_tpu as mq

    qp = mq.random_qp(n=1100, m=200, seed=5, ineq=True)
    ref = mq.solve(qp, tol=1e-8, print_level=0)
    st = mq.solve(qp, tol=1e-8, print_level=0, linear_solver="blocked",
                  factorization_dtype="float32", max_refine_steps=1)
    assert st.status == ref.status == mq.Status.SOLVE_SUCCEEDED
    assert st.objective == pytest.approx(ref.objective, rel=1e-7)


@pytest.mark.parametrize("n", [300, 1024, 1500, 2304])
def test_panel_chol_matches_numpy(n, rng):
    """Two-level panel Cholesky (XLA panel bases + right-sized stripe
    GEMMs) reconstructs SPD A at multi-stripe and ragged sizes; its
    non-unit panel inverse inverts L."""
    from madqp_tpu.ops.blocked_dense import (chol_explicit_inverse,
                                             panel_chol, panel_inv_lower)

    A = _spd(rng, n, n)
    L = np.asarray(panel_chol(jnp.asarray(A)))
    assert np.abs(np.tril(L) @ np.tril(L).T - A).max() < 1e-11 * n
    assert np.allclose(np.triu(L, 1), 0.0)
    X = np.asarray(panel_inv_lower(jnp.asarray(np.tril(L))))
    assert np.abs(X @ np.tril(L) - np.eye(n)).max() < 1e-11
    Lc, Minv = chol_explicit_inverse(jnp.asarray(A))
    assert np.abs(np.asarray(Minv) @ A - np.eye(n)).max() < 1e-9 * n


def test_blocked_cholesky_panel_dispatch(rng):
    from madqp_tpu.ops.blocked_dense import blocked_cholesky

    A = _spd(rng, 1280, 1280)
    L = np.asarray(blocked_cholesky(jnp.asarray(A)))
    assert np.abs(np.tril(L) @ np.tril(L).T - A).max() < 1e-10

"""KKT-system contract tests.

Replicates the reference's protocol-conformance harness
(MadNLPTests.test_kkt_system, test/runtests.jl:149-163): every formulation
must satisfy solve-mul consistency against a dense NumPy reference of the
reduced 2x2 system, and all formulations must agree with each other.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from madqp_tpu.ops.kkt import make_kkt, kkt_mul
from madqp_tpu.ops import kernels as K
from madqp_tpu.solver.state import ProblemArrays

FORMULATIONS = ["condensed", "normal", "k2", "k2.5"]


def wrap_prob(H, A):
    """Minimal ProblemArrays for the KKT layer (only H/A/matvecs used)."""
    import jax.numpy as jnp

    m, n = A.shape
    return ProblemArrays(
        c0=jnp.zeros(()), c=jnp.zeros(n),
        H=None if H is None else jnp.asarray(H),
        A=jnp.asarray(A), b=jnp.zeros(m),
        has_lb=jnp.zeros(n, bool), has_ub=jnp.zeros(n, bool),
    )


def make_system(rng, n=16, m=6, lp=False):
    A = rng.standard_normal((m, n))
    if lp:
        H = None
    else:
        P = rng.standard_normal((n, n)) / np.sqrt(n)
        H = P.T @ P + 0.1 * np.eye(n)
    pr_diag = rng.uniform(0.5, 2.0, size=n)
    del_c = -1e-8
    return H, A, pr_diag, del_c


def dense_reference_solve(H, A, pr_diag, del_c, rx, ry):
    n, m = len(rx), len(ry)
    W = np.diag(pr_diag) if H is None else H + np.diag(pr_diag)
    Kmat = np.zeros((n + m, n + m))
    Kmat[:n, :n] = W
    Kmat[:n, n:] = A.T
    Kmat[n:, :n] = A
    Kmat[n:, n:] = del_c * np.eye(m)
    d = np.linalg.solve(Kmat, np.concatenate([rx, ry]))
    return d[:n], d[n:]


@pytest.mark.parametrize("name", FORMULATIONS)
@pytest.mark.parametrize("lp", [True, False])
def test_kkt_solve_matches_dense_reference(name, lp, rng):
    if name == "normal" and not lp:
        pytest.skip("normal equations reject QPs")
    H, A, pr_diag, del_c = make_system(rng, lp=lp)
    n, m = A.shape[1], A.shape[0]
    rx = rng.standard_normal(n)
    ry = rng.standard_normal(m)

    kkt = make_kkt(name)
    f = kkt.factorize(wrap_prob(H, A), jnp.asarray(pr_diag), del_c)
    assert bool(kkt.factor_ok(f))
    dx, dy = kkt.solve(f, jnp.asarray(rx), jnp.asarray(ry))

    dx_ref, dy_ref = dense_reference_solve(H, A, pr_diag, del_c, rx, ry)
    np.testing.assert_allclose(np.asarray(dx), dx_ref, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(dy), dy_ref, rtol=1e-8, atol=1e-10)


def test_normal_kkt_rejects_qp(rng):
    H, A, pr_diag, del_c = make_system(rng, lp=False)
    kkt = make_kkt("normal")
    with pytest.raises(ValueError, match="linear programs"):
        kkt.factorize(wrap_prob(H, A), jnp.asarray(pr_diag), del_c)


def test_factor_ok_detects_indefinite(rng):
    """A negative pr_diag entry on an LP makes the Schur complement
    indefinite -> factor_ok must be False (inertia check analog,
    reference normalkkt.jl:132-134)."""
    H, A, pr_diag, del_c = make_system(rng, lp=True, n=8, m=8)
    pr_diag = -np.abs(pr_diag)  # flips S = A D A' negative definite
    kkt = make_kkt("condensed")
    f = kkt.factorize(wrap_prob(None, A), jnp.asarray(pr_diag), del_c)
    assert not bool(kkt.factor_ok(f))


def test_kkt_mul_solve_roundtrip(rng):
    """solve(mul(v)) ~ v through the full unreduced operator."""
    n, m = 16, 6
    has_lb = rng.random(n) < 0.7
    has_ub = rng.random(n) < 0.7
    lb = np.where(has_lb, -1.0, 0.0)
    ub = np.where(has_ub, 2.0, 0.0)
    x = rng.uniform(0.0, 1.0, size=n)
    zl = np.where(has_lb, rng.uniform(0.5, 1.5, n), 0.0)
    zu = np.where(has_ub, rng.uniform(0.5, 1.5, n), 0.0)
    del_w, del_c = 1e-8, -1e-8
    H, A, _, _ = make_system(rng, n=n, m=m, lp=False)

    v = K.KKTVec(
        x=jnp.asarray(rng.standard_normal(n)),
        y=jnp.asarray(rng.standard_normal(m)),
        zl=jnp.asarray(np.where(has_lb, rng.standard_normal(n), 0.0)),
        zu=jnp.asarray(np.where(has_ub, rng.standard_normal(n), 0.0)),
    )
    prob = wrap_prob(H, A)
    p = kkt_mul(prob, del_w, del_c, x, lb, ub, has_lb, has_ub, zl, zu, v)

    # Solve K d = p through reduce -> 2x2 solve -> recover; expect d == v.
    pr_diag = K.sigma_diagonal(x, lb, ub, has_lb, has_ub, zl, zu, del_w)
    kkt = make_kkt("condensed")
    f = kkt.factorize(prob, pr_diag, del_c)
    rx, ry = K.reduce_rhs(p, x, lb, ub, has_lb, has_ub)
    dx, dy = kkt.solve(f, rx, ry)
    dzl, dzu = K.recover_bound_duals(p, dx, x, lb, ub, has_lb, has_ub, zl, zu)

    np.testing.assert_allclose(np.asarray(dx), np.asarray(v.x), rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(dy), np.asarray(v.y), rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(dzl), np.asarray(v.zl), rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(dzu), np.asarray(v.zu), rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("m", [0, 6])
def test_kkt_no_constraints_edge(m, rng):
    """m = 0 (bound-constrained QP) must work (reference size (10, 0) test)."""
    n = 10
    P = rng.standard_normal((n, n)) / np.sqrt(n)
    H = P.T @ P + 0.5 * np.eye(n)
    A = np.zeros((m, n))
    pr_diag = np.full(n, 0.7)
    kkt = make_kkt("condensed")
    f = kkt.factorize(wrap_prob(H, A), jnp.asarray(pr_diag), -1e-8)
    rx = rng.standard_normal(n)
    ry = rng.standard_normal(m)
    dx, dy = kkt.solve(f, jnp.asarray(rx), jnp.asarray(ry))
    if m == 0:
        np.testing.assert_allclose(
            np.asarray(dx), np.linalg.solve(H + np.diag(pr_diag), rx), rtol=1e-8
        )

"""Differentiable QP layer: implicit-KKT gradients vs finite differences.

The reference has no AD capability; this is additive (madqp_tpu/diff.py).
Oracle: central finite differences of scalar losses of the solution map
θ → x*(θ) on small strictly-convex QPs with a mix of active/inactive
bounds (strict complementarity ⇒ the map is differentiable there).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import madqp_tpu as mq
from madqp_tpu import qp_layer, qp_layer_general

TOL = dict(tol=1e-10, print_level=40)


def _rand_qp(n=6, m=2, seed=0):
    rng = np.random.default_rng(seed)
    M = rng.normal(size=(n, n))
    H = M @ M.T + n * np.eye(n)
    c = rng.normal(size=n)
    A = rng.normal(size=(m, n))
    x_feas = rng.normal(size=n)
    b = A @ x_feas
    lb = x_feas - rng.uniform(0.05, 2.0, size=n)   # some bounds end up active
    ub = x_feas + rng.uniform(0.05, 2.0, size=n)
    return map(jnp.asarray, (H, c, A, b, lb, ub))


def _fd_grad(f, x, eps=1e-6):
    x = np.asarray(x, np.float64)
    g = np.zeros_like(x)
    for i in np.ndindex(*x.shape):
        e = np.zeros_like(x)
        e[i] = eps
        g[i] = (f(x + e) - f(x - e)) / (2 * eps)
    return g


@pytest.mark.parametrize("seed", [0, 3])
def test_qp_layer_gradients_match_fd(seed):
    H, c, A, b, lb, ub = _rand_qp(seed=seed)
    w = jnp.linspace(0.5, 1.5, c.shape[0])

    def loss(H, c, A, b, lb, ub):
        sol = qp_layer(H, c, A, b, lb, ub, **TOL)
        return jnp.sum(w * sol.x ** 2) + jnp.sum(sol.y) * 0.1

    sol = qp_layer(H, c, A, b, lb, ub, **TOL)
    assert int(sol.status) == 1
    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4, 5))(H, c, A, b, lb, ub)
    args = [H, c, A, b, lb, ub]
    names = ["H", "c", "A", "b", "lb", "ub"]
    for i, (g, name) in enumerate(zip(grads, names)):
        def f(v, i=i):
            a = list(args)
            a[i] = jnp.asarray(v)
            return float(loss(*a))
        fd = _fd_grad(f, args[i])
        if name == "H":
            # loss is only defined on symmetric H; FD perturbs entries
            # independently, so compare symmetrized gradients.
            fd = 0.5 * (fd + fd.T)
        np.testing.assert_allclose(np.asarray(g), fd, rtol=2e-4, atol=2e-6,
                                   err_msg=f"grad wrt {name}")


def test_qp_layer_general_matches_fd_on_lcon():
    rng = np.random.default_rng(5)
    n, m = 5, 3
    M = rng.normal(size=(n, n))
    H = jnp.asarray(M @ M.T + n * np.eye(n))
    c = jnp.asarray(rng.normal(size=n))
    A = jnp.asarray(rng.normal(size=(m, n)))
    lcon = jnp.asarray(rng.normal(size=m) - 2.0)
    ucon = jnp.asarray(np.asarray(lcon) + rng.uniform(0.01, 0.5, size=m))

    def loss(lcon, ucon):
        sol = qp_layer_general(H, c, A, lcon, ucon, **TOL)
        return jnp.sum(sol.x ** 2)

    sol = qp_layer_general(H, c, A, lcon, ucon, **TOL)
    assert int(sol.status) == 1
    # Check the constraint activity actually bites (else gradients are 0).
    r = np.asarray(A) @ np.asarray(sol.x)
    assert ((r < np.asarray(ucon) - 1e-6) | (r > np.asarray(lcon) + 1e-6)).any()

    gl, gu = jax.grad(loss, argnums=(0, 1))(lcon, ucon)
    fd_l = _fd_grad(lambda v: float(loss(jnp.asarray(v), ucon)), lcon)
    fd_u = _fd_grad(lambda v: float(loss(lcon, jnp.asarray(v))), ucon)
    np.testing.assert_allclose(np.asarray(gl), fd_l, rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(np.asarray(gu), fd_u, rtol=2e-4, atol=2e-6)


def test_qp_layer_vmap_grad():
    """Batched differentiable layers: vmap(grad(loss)) over instance data."""
    H, c, A, b, lb, ub = _rand_qp(seed=1)
    cs = jnp.stack([c, c + 0.3, c - 0.2])

    def loss(ci):
        return jnp.sum(qp_layer(H, ci, A, b, lb, ub, **TOL).x ** 2)

    gs = jax.vmap(jax.grad(loss))(cs)
    assert gs.shape == cs.shape
    for i in range(cs.shape[0]):
        np.testing.assert_allclose(
            np.asarray(gs[i]), np.asarray(jax.grad(loss)(cs[i])),
            rtol=1e-9, atol=1e-12)
    # different data -> different gradients (no constant folding accidents)
    assert not np.allclose(np.asarray(gs[0]), np.asarray(gs[1]))


def test_qp_layer_unbounded_and_lp():
    """No bounds: layer equals the equality-QP closed form; LP gradients
    vanish a.e. (piecewise-constant vertex solutions)."""
    rng = np.random.default_rng(2)
    n, m = 4, 2
    M = rng.normal(size=(n, n))
    H = jnp.asarray(M @ M.T + n * np.eye(n))
    c = jnp.asarray(rng.normal(size=n))
    A = jnp.asarray(rng.normal(size=(m, n)))
    b = jnp.asarray(rng.normal(size=m))

    sol = qp_layer(H, c, A, b, **TOL)
    K = np.block([[np.asarray(H), np.asarray(A).T],
                  [np.asarray(A), np.zeros((m, m))]])
    ref = np.linalg.solve(K, np.concatenate([-np.asarray(c), np.asarray(b)]))
    np.testing.assert_allclose(np.asarray(sol.x), ref[:n], atol=1e-8)
    # exact implicit gradient of sum(x) wrt c: -[I 0] K^-1 [I; 0]
    g = jax.grad(lambda ci: jnp.sum(qp_layer(H, ci, A, b, **TOL).x))(c)
    ref_g = -np.linalg.inv(K)[:n, :n].T.sum(axis=1)
    np.testing.assert_allclose(np.asarray(g), ref_g, atol=1e-7)

    # LP: bounded box, generic c -> vertex solution, zero gradient a.e.
    nl, ml = 6, 2
    Al = jnp.asarray(rng.normal(size=(ml, nl)))
    bl = Al @ jnp.asarray(rng.uniform(0.2, 0.8, size=nl))
    cl = jnp.asarray(rng.normal(size=nl))
    lo, hi = jnp.zeros(nl), jnp.ones(nl)
    sol_lp = qp_layer(None, cl, Al, bl, lo, hi, **TOL)
    assert int(sol_lp.status) == 1
    glp = jax.grad(lambda ci: jnp.sum(
        qp_layer(None, ci, Al, bl, lo, hi, **TOL).x))(cl)
    assert np.max(np.abs(np.asarray(glp))) < 1e-5

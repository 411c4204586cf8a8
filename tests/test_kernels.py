"""Kernel-parity tests: every masked JAX kernel against a NumPy oracle.

Mirrors the reference test strategy (SURVEY §4) at the granularity of
src/kernels.jl: RHS builders, corrections, ratio tests, step rules,
complementarity measures, barrier, initialization helpers.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from madqp_tpu.ops import kernels as K


def make_bound_setup(rng, n=24):
    """Random x strictly inside a random masked bound box."""
    has_lb = rng.random(n) < 0.6
    has_ub = rng.random(n) < 0.6
    lb_raw = rng.normal(size=n) - 2.0
    ub_raw = lb_raw + 1.0 + rng.random(n) * 3.0
    lb = np.where(has_lb, lb_raw, 0.0)
    ub = np.where(has_ub, ub_raw, 0.0)
    lo = np.where(has_lb, lb_raw, -5.0)
    hi = np.where(has_ub, ub_raw, 5.0)
    t = rng.uniform(0.2, 0.8, size=n)
    x = lo + t * (hi - lo)
    zl = np.where(has_lb, rng.uniform(0.1, 2.0, size=n), 0.0)
    zu = np.where(has_ub, rng.uniform(0.1, 2.0, size=n), 0.0)
    return x, lb, ub, has_lb, has_ub, zl, zu


def test_sigma_diagonal(rng):
    x, lb, ub, has_lb, has_ub, zl, zu = make_bound_setup(rng)
    del_w = 1e-8
    got = np.asarray(K.sigma_diagonal(x, lb, ub, has_lb, has_ub, zl, zu, del_w))
    want = np.full_like(x, del_w)
    want[has_lb] += zl[has_lb] / (x - lb)[has_lb]
    want[has_ub] += zu[has_ub] / (ub - x)[has_ub]
    np.testing.assert_allclose(got, want, rtol=1e-12)
    assert np.all(got > 0)


def test_predictor_rhs_oracle(rng):
    n, m = 24, 7
    x, lb, ub, has_lb, has_ub, zl, zu = make_bound_setup(rng)
    g = rng.normal(size=n)
    jacl = rng.normal(size=n)
    c_res = rng.normal(size=m)
    p = K.predictor_rhs(g, jacl, c_res, x, lb, ub, has_lb, has_ub, zl, zu)
    np.testing.assert_allclose(np.asarray(p.x), -g + zl - zu - jacl)
    np.testing.assert_allclose(np.asarray(p.y), -c_res)
    want_zl = np.where(has_lb, -(x - lb) * zl, 0.0)
    want_zu = np.where(has_ub, -(ub - x) * zu, 0.0)
    np.testing.assert_allclose(np.asarray(p.zl), want_zl)
    np.testing.assert_allclose(np.asarray(p.zu), want_zu)


def test_correction_rhs_targets_mu(rng):
    """Solving the zl row exactly should drive the product to mu."""
    n, m = 24, 5
    x, lb, ub, has_lb, has_ub, zl, zu = make_bound_setup(rng)
    g = np.zeros(n)
    jacl = np.zeros(n)
    c_res = np.zeros(m)
    mu = 0.37
    corr_lb = np.zeros(n)
    corr_ub = np.zeros(n)
    p = K.correction_rhs(
        g, jacl, c_res, x, lb, ub, has_lb, has_ub, zl, zu, mu, corr_lb, corr_ub
    )
    # With dx = 0, the row sl*dzl = pzl gives dzl; then (x-lb)(zl+dzl) = mu.
    sl = x - lb
    su = ub - x
    dzl = np.asarray(p.zl) / np.where(has_lb, sl, 1.0)
    dzu = np.asarray(p.zu) / np.where(has_ub, su, 1.0)
    np.testing.assert_allclose(
        (sl * (zl + dzl))[has_lb], mu, rtol=1e-12
    )
    np.testing.assert_allclose(
        (su * (zu + dzu))[has_ub], mu, rtol=1e-12
    )


def test_reduce_and_recover_consistency(rng):
    """Eliminating the bound rows and recovering dzl/dzu must satisfy the
    original unreduced rows exactly."""
    n = 24
    x, lb, ub, has_lb, has_ub, zl, zu = make_bound_setup(rng)
    p = K.KKTVec(
        x=jnp.asarray(rng.normal(size=n)),
        y=jnp.asarray(rng.normal(size=5)),
        zl=jnp.asarray(np.where(has_lb, rng.normal(size=n), 0.0)),
        zu=jnp.asarray(np.where(has_ub, rng.normal(size=n), 0.0)),
    )
    dx = rng.normal(size=n)
    dzl, dzu = K.recover_bound_duals(p, dx, x, lb, ub, has_lb, has_ub, zl, zu)
    dzl, dzu = np.asarray(dzl), np.asarray(dzu)
    sl, su = x - lb, ub - x
    # Row zl: zl.dx + sl.dzl = pzl
    np.testing.assert_allclose(
        (zl * dx + sl * dzl)[has_lb], np.asarray(p.zl)[has_lb], rtol=1e-10
    )
    # Row zu: -zu.dx + su.dzu = pzu
    np.testing.assert_allclose(
        (-zu * dx + su * dzu)[has_ub], np.asarray(p.zu)[has_ub], rtol=1e-10
    )
    # Reduced rhs: px + pzl/sl - pzu/su
    rx, ry = K.reduce_rhs(p, x, lb, ub, has_lb, has_ub)
    want = np.asarray(p.x).copy()
    want[has_lb] += np.asarray(p.zl)[has_lb] / sl[has_lb]
    want[has_ub] -= np.asarray(p.zu)[has_ub] / su[has_ub]
    np.testing.assert_allclose(np.asarray(rx), want, rtol=1e-10)


def test_complementarity_measures(rng):
    x, lb, ub, has_lb, has_ub, zl, zu = make_bound_setup(rng)
    mu = float(K.complementarity_measure(x, lb, ub, has_lb, has_ub, zl, zu))
    want = (
        np.sum(((x - lb) * zl)[has_lb]) + np.sum(((ub - x) * zu)[has_ub])
    ) / (has_lb.sum() + has_ub.sum())
    assert mu == pytest.approx(want, rel=1e-12)

    # Affine measure at alpha = 0 equals the current measure.
    d = K.KKTVec(
        x=jnp.zeros_like(x), y=jnp.zeros(3),
        zl=jnp.zeros_like(x), zu=jnp.zeros_like(x),
    )
    mu0 = float(
        K.affine_complementarity_measure(
            d, x, lb, ub, has_lb, has_ub, zl, zu, 0.0, 0.0
        )
    )
    assert mu0 == pytest.approx(mu, rel=1e-12)


def test_optimality_gap(rng):
    x, lb, ub, has_lb, has_ub, zl, zu = make_bound_setup(rng)
    gap = float(K.optimality_gap(x, lb, ub, has_lb, has_ub, zl, zu))
    want = max(
        np.max(np.abs(((x - lb) * zl)[has_lb]), initial=0.0),
        np.max(np.abs(((ub - x) * zu)[has_ub]), initial=0.0),
    )
    assert gap == pytest.approx(want, rel=1e-12)


def test_alpha_max_primal_oracle(rng):
    x, lb, ub, has_lb, has_ub, zl, zu = make_bound_setup(rng)
    dx = rng.normal(size=x.shape[0])
    tau = 0.9
    al, au, il, iu = K.alpha_max_primal(x, lb, ub, has_lb, has_ub, dx, tau)
    vals_l = [
        tau * (lb[i] - x[i]) / dx[i]
        for i in range(len(x))
        if has_lb[i] and dx[i] < 0
    ]
    vals_u = [
        tau * (ub[i] - x[i]) / dx[i]
        for i in range(len(x))
        if has_ub[i] and dx[i] > 0
    ]
    assert float(al) == pytest.approx(min([1.0] + vals_l), rel=1e-12)
    assert float(au) == pytest.approx(min([1.0] + vals_u), rel=1e-12)
    # Feasibility of the step with tau shrink.
    xn = x + float(min(al, au)) * dx
    assert np.all(xn[has_lb] >= lb[has_lb] - 1e-12)
    assert np.all(xn[has_ub] <= ub[has_ub] + 1e-12)


def test_alpha_max_dual_oracle(rng):
    x, lb, ub, has_lb, has_ub, zl, zu = make_bound_setup(rng)
    dzl = np.where(has_lb, rng.normal(size=x.shape[0]), 0.0)
    dzu = np.where(has_ub, rng.normal(size=x.shape[0]), 0.0)
    tau = 0.95
    al, au, _, _ = K.alpha_max_dual(zl, zu, has_lb, has_ub, dzl, dzu, tau)
    vals_l = [
        -tau * zl[i] / dzl[i]
        for i in range(len(x))
        if has_lb[i] and dzl[i] < 0
    ]
    # The reference's upper-dual guard: (dzu < 0) && (zu + dzu < 0).
    vals_u = [
        -tau * zu[i] / dzu[i]
        for i in range(len(x))
        if has_ub[i] and dzu[i] < 0 and zu[i] + dzu[i] < 0
    ]
    assert float(al) == pytest.approx(min([1.0] + vals_l), rel=1e-12)
    assert float(au) == pytest.approx(min([1.0] + vals_u), rel=1e-12)
    zn = zl + float(al) * dzl
    assert np.all(zn[has_lb] >= -1e-12)


def test_gondzio_correction_clamps(rng):
    x, lb, ub, has_lb, has_ub, zl, zu = make_bound_setup(rng)
    n = x.shape[0]
    d = K.KKTVec(
        x=jnp.asarray(rng.normal(size=n) * 0.01),
        y=jnp.zeros(3),
        zl=jnp.asarray(np.where(has_lb, rng.normal(size=n) * 0.01, 0.0)),
        zu=jnp.asarray(np.where(has_ub, rng.normal(size=n) * 0.01, 0.0)),
    )
    corr_lb = np.zeros(n)
    corr_ub = np.zeros(n)
    mu = 0.5
    new_lb, new_ub = K.gondzio_extra_correction(
        d, x, lb, ub, has_lb, has_ub, zl, zu, corr_lb, corr_ub,
        0.5, 0.5, 0.1, 10.0, mu,
    )
    new_lb, new_ub = np.asarray(new_lb), np.asarray(new_ub)
    # delta is zero whenever the trial product is already inside the box.
    v_l = (x + 0.5 * np.asarray(d.x) - lb) * (zl + 0.5 * np.asarray(d.zl))
    inside = (v_l >= 0.1 * mu) & (v_l <= 10.0 * mu) & has_lb
    np.testing.assert_allclose(new_lb[inside], 0.0, atol=1e-15)
    # delta pushes toward the box from below.
    below = (v_l < 0.1 * mu) & has_lb
    np.testing.assert_allclose(new_lb[below], -(0.1 * mu - v_l[below]), rtol=1e-12)


def test_mehrotra_barrier_rules():
    # With one-sided bounds: sigma = clamp((mu_aff/mu)^3, 1e-6, 10).
    mu = float(K.mehrotra_barrier(1.0, 0.5, 3, 1e-11))
    assert mu == pytest.approx(0.125)
    # Clamped below.
    mu = float(K.mehrotra_barrier(1.0, 1e-9, 3, 1e-11))
    assert mu == pytest.approx(1e-6)
    # No one-sided bounds -> sigma = 1 (reference LP-vs-two-sided rule).
    mu = float(K.mehrotra_barrier(0.3, 0.01, 0, 1e-11))
    assert mu == pytest.approx(0.3)
    # mu_min floor.
    mu = float(K.mehrotra_barrier(1e-12, 1e-13, 3, 1e-11))
    assert mu == pytest.approx(1e-11)


def test_dual_objective(rng):
    x, lb, ub, has_lb, has_ub, zl, zu = make_bound_setup(rng)
    y = rng.normal(size=4)
    b = rng.normal(size=4)
    got = float(K.dual_objective(y, b, lb, ub, has_lb, has_ub, zl, zu))
    want = -y @ b + np.sum((zl * lb)[has_lb]) - np.sum((zu * ub)[has_ub])
    assert got == pytest.approx(want, rel=1e-12)


def test_push_inside_bounds(rng):
    x, lb, ub, has_lb, has_ub, _, _ = make_bound_setup(rng)
    x_out = x + np.where(rng.random(x.shape[0]) < 0.5, 100.0, -100.0)
    xp = np.asarray(
        K.push_inside_bounds(x_out, lb, ub, has_lb, has_ub, 1e-2, 1e-2)
    )
    assert np.all(xp[has_lb] > lb[has_lb])
    assert np.all(xp[has_ub] < ub[has_ub])


def test_mehrotra_positivity_shift_produces_interior(rng):
    x, lb, ub, has_lb, has_ub, _, _ = make_bound_setup(rng)
    n = x.shape[0]
    # Start with violated duals and an iterate at the bounds.
    zl = np.where(has_lb, rng.normal(size=n), 0.0)
    zu = np.where(has_ub, rng.normal(size=n), 0.0)
    x2, zl2, zu2 = K.mehrotra_positivity_shift(x, lb, ub, has_lb, has_ub, zl, zu)
    zl2, zu2 = np.asarray(zl2), np.asarray(zu2)
    assert np.all(zl2[has_lb] > 0)
    assert np.all(zu2[has_ub] > 0)
    # Two-sided entries must not move (the reference's aliased +delta/-delta).
    both = has_lb & has_ub
    shift_free = ~has_lb & ~has_ub
    np.testing.assert_allclose(np.asarray(x2)[shift_free], x[shift_free])


def test_adjust_boundary_relaxes_tight_bounds():
    x = np.array([1.0, 0.5])
    lb = np.array([1.0 - 1e-20, 0.0])
    ub = np.array([2.0, 1.0])
    has = np.array([True, True])
    mu = 1e-2
    eps = np.finfo(np.float64).eps
    lb2, ub2 = K.adjust_boundary(x, lb, ub, has, has, mu, eps)
    assert float(lb2[0]) < lb[0]          # tight bound relaxed
    assert float(lb2[1]) == lb[1]         # loose bound untouched
    assert float(ub2[1]) == ub[1]


def test_init_bound_duals(rng):
    n = 12
    has_lb = np.array([True] * 4 + [False] * 4 + [True] * 4)
    has_ub = np.array([False] * 4 + [True] * 4 + [True] * 4)
    r = rng.normal(size=n)
    zl, zu = K.init_bound_duals(r, has_lb, has_ub, np.ones(n), np.ones(n))
    zl, zu = np.asarray(zl), np.asarray(zu)
    np.testing.assert_allclose(zl[:4], r[:4])          # lb only: zl = r
    np.testing.assert_allclose(zu[4:8], -r[4:8])       # ub only: zu = -r
    np.testing.assert_allclose(zl[8:], 0.5 * r[8:])    # two-sided: split
    np.testing.assert_allclose(zu[8:], -0.5 * r[8:])
    np.testing.assert_allclose(zl[4:8], 0.0)           # masked off

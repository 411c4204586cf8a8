"""KKT systems: the four formulations of SURVEY §2.3, dense TPU backends.

Protocol (functional equivalent of MadNLP's AbstractKKTSystem as implemented
by the reference at src/KKT/normalkkt.jl:128-219):

  * `factorize(H, A, pr_diag, del_c) -> factors`  — per-iteration numeric
    factorization (the reference's build_kkt! + factorize_wrapper!).
  * `solve(factors, rx, ry) -> (dx, dy)`          — solve the *reduced* 2x2
    system [W A'; A dc I] [dx; dy] = [rx; ry], W = H + diag(pr_diag).
  * `factor_ok(factors) -> bool scalar`           — success probe, the jit
    equivalent of `is_factorized` (src/utils.jl:54-62); feeds the
    retry-with-100x-regularization loop (src/linear_solver.jl:6-17).

Bound-dual elimination/recovery around this reduced system is formulation-
independent and lives in ops.kernels (reduce_rhs / recover_bound_duals).

All formulations produce the same Newton step in exact arithmetic; they
differ in conditioning and cost:

  * CONDENSED — block elimination: Cholesky of W (SPD: H PSD + pr_diag > 0),
    then Cholesky of the SPD Schur complement S = A W^-1 A' - dc I.  Two
    MXU-friendly dense factorizations; the primary TPU path.
  * NORMAL    — LP specialization (W diagonal): S = A D A' - dc I with
    D = 1/pr_diag.  Rejects QPs like the reference (normalkkt.jl:45-48).
  * K2        — full (n+m) symmetric-indefinite augmented matrix, dense LU.
  * K2_5      — K2 with symmetric Jacobi scaling (MadNLP ScaledSparseKKT
    analog) for better conditioning.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl


# ---------------------------------------------------------------------------
# Condensed / normal-equations formulation
# ---------------------------------------------------------------------------


class CondensedFactors(NamedTuple):
    chol_W: Optional[jax.Array]   # (n, n) lower Cholesky of W; None for LP
    w_diag: jax.Array             # (n,) pr_diag (used directly when LP)
    chol_S: jax.Array             # (m, m) lower Cholesky of Schur complement
    A: jax.Array                  # (m, n) kept for the solve


class DenseCondensedKKT:
    """Block-elimination (condensed) dense KKT.

    Covers both the QP condensed form and the LP normal equations
    (reference NormalKKTSystem build_kkt!/solve!, normalkkt.jl:166-205):
    with H = None, W is the diagonal pr_diag and S = A D A' - dc I.
    """

    name = "condensed"

    def factorize(self, H, A, pr_diag, del_c):
        m = A.shape[0]
        if H is None:
            w_diag = pr_diag
            chol_W = None
            Winv_AT = A.T / pr_diag[:, None]  # (n, m)
        else:
            W = H + jnp.diag(pr_diag)
            chol_W = jsl.cholesky(W, lower=True)
            Winv_AT = jsl.cho_solve((chol_W, True), A.T)
            w_diag = pr_diag
        S = A @ Winv_AT
        S = S - del_c * jnp.eye(m, dtype=A.dtype)
        chol_S = jsl.cholesky(S, lower=True)
        return CondensedFactors(chol_W=chol_W, w_diag=w_diag, chol_S=chol_S, A=A)

    def _W_solve(self, f: CondensedFactors, r):
        if f.chol_W is None:
            return r / f.w_diag
        return jsl.cho_solve((f.chol_W, True), r)

    def solve(self, f: CondensedFactors, rx, ry):
        m = f.A.shape[0]
        if m == 0:
            return self._W_solve(f, rx), ry
        # (A W^-1 A' - dc I) dy = A W^-1 rx - ry
        rhs_y = f.A @ self._W_solve(f, rx) - ry
        dy = jsl.cho_solve((f.chol_S, True), rhs_y)
        dx = self._W_solve(f, rx - f.A.T @ dy)
        return dx, dy

    def factor_ok(self, f: CondensedFactors):
        ok = jnp.all(jnp.isfinite(jnp.diagonal(f.chol_S))) & jnp.all(
            jnp.diagonal(f.chol_S) > 0
        ) if f.chol_S.size else jnp.asarray(True)
        if f.chol_W is not None:
            dW = jnp.diagonal(f.chol_W)
            ok = ok & jnp.all(jnp.isfinite(dW)) & jnp.all(dW > 0)
        else:
            ok = ok & jnp.all(f.w_diag > 0)
        return ok


class DenseNormalKKT(DenseCondensedKKT):
    """Normal-equations KKT, LP only (reference NormalKKTSystem).

    Inertia correctness = SPD Schur complement (normalkkt.jl:132-134), which
    is exactly `factor_ok`.
    """

    name = "normal"

    def factorize(self, H, A, pr_diag, del_c):
        if H is not None:
            raise ValueError(
                "NormalKKT supports only linear programs "
                "(reference normalkkt.jl:45-48): Hessian must be empty."
            )
        return super().factorize(None, A, pr_diag, del_c)


# ---------------------------------------------------------------------------
# K2 augmented formulation (dense LU)
# ---------------------------------------------------------------------------


class K2Factors(NamedTuple):
    lu: jax.Array
    piv: jax.Array


class DenseK2KKT:
    """Full augmented symmetric-indefinite system [W A'; A dc I], dense LU.

    MadNLP SparseKKTSystem analog (the reference default, src/utils.jl:108).
    """

    name = "k2"

    def _assemble(self, H, A, pr_diag, del_c):
        n = pr_diag.shape[0]
        m = A.shape[0]
        dtype = pr_diag.dtype
        W = jnp.diag(pr_diag) if H is None else H + jnp.diag(pr_diag)
        K = jnp.zeros((n + m, n + m), dtype=dtype)
        K = K.at[:n, :n].set(W)
        K = K.at[:n, n:].set(A.T)
        K = K.at[n:, :n].set(A)
        K = K.at[n:, n:].set(del_c * jnp.eye(m, dtype=dtype))
        return K

    def factorize(self, H, A, pr_diag, del_c):
        K = self._assemble(H, A, pr_diag, del_c)
        lu, piv = jsl.lu_factor(K)
        return K2Factors(lu=lu, piv=piv)

    def solve(self, f: K2Factors, rx, ry):
        n = rx.shape[0]
        rhs = jnp.concatenate([rx, ry])
        d = jsl.lu_solve((f.lu, f.piv), rhs)
        return d[:n], d[n:]

    def factor_ok(self, f: K2Factors):
        dU = jnp.diagonal(f.lu)
        return jnp.all(jnp.isfinite(dU)) & jnp.all(jnp.abs(dU) > 0.0)


class DenseK25KKT(DenseK2KKT):
    """K2.5: augmented system with symmetric Jacobi (sqrt-diagonal) scaling.

    MadNLP ScaledSparseKKTSystem analog (tested iteration-identical to K2 in
    the reference, test/runtests.jl:102-115).  We scale K -> D K D with
    D = 1/sqrt(max(|diag K|, eps)) and unscale the solution.
    """

    name = "k2.5"

    def factorize(self, H, A, pr_diag, del_c):
        K = self._assemble(H, A, pr_diag, del_c)
        dK = jnp.abs(jnp.diagonal(K))
        scale = 1.0 / jnp.sqrt(jnp.maximum(dK, 1e-8))
        Ks = scale[:, None] * K * scale[None, :]
        lu, piv = jsl.lu_factor(Ks)
        return K25Factors(lu=lu, piv=piv, scale=scale)

    def solve(self, f: "K25Factors", rx, ry):
        n = rx.shape[0]
        rhs = jnp.concatenate([rx, ry]) * f.scale
        d = jsl.lu_solve((f.lu, f.piv), rhs) * f.scale
        return d[:n], d[n:]


class K25Factors(NamedTuple):
    lu: jax.Array
    piv: jax.Array
    scale: jax.Array


# ---------------------------------------------------------------------------
# Unreduced KKT operator (for residual checks; MadNLP mul! analog)
# ---------------------------------------------------------------------------


def kkt_mul(H, A, del_w, del_c, x, lb, ub, has_lb, has_ub, zl, zu, v):
    """w = K v for the *unreduced* KKT operator (reference normalkkt.jl:207-219
    plus MadNLP._kktmul!), using this module's sign conventions:

        wx  = (H + dw I) vx + A' vy - vzl + vzu
        wy  = A vx + dc vy
        wzl = zl.vx + sl.vzl          (masked; 0 off-mask)
        wzu = -zu.vx + su.vzu         (masked)
    """
    from .kernels import KKTVec, slacks

    sl, su = slacks(x, lb, ub, has_lb, has_ub)
    wx = del_w * v.x + A.T @ v.y - v.zl + v.zu
    if H is not None:
        wx = wx + H @ v.x
    wy = A @ v.x + del_c * v.y
    wzl = jnp.where(has_lb, zl * v.x + sl * v.zl, 0.0)
    wzu = jnp.where(has_ub, -zu * v.x + su * v.zu, 0.0)
    return KKTVec(x=wx, y=wy, zl=wzl, zu=wzu)


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

_KKT_REGISTRY = {
    "condensed": DenseCondensedKKT,
    "normal": DenseNormalKKT,
    "k2": DenseK2KKT,
    "k2.5": DenseK25KKT,
}


def make_kkt(name: str):
    try:
        return _KKT_REGISTRY[name]()
    except KeyError:
        raise ValueError(
            f"unknown kkt_system '{name}'; options: {sorted(_KKT_REGISTRY)}"
        )

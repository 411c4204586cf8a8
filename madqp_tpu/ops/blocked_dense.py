"""GEMM-rich blocked dense factorizations for the supernodal numeric phase.

XLA's own batched `cholesky` / `triangular_solve` on TPU lower to long
sequential column sweeps over the full panel; in software-emulated f64
they run ~50x slower than the equivalent GEMM FLOPs (measured on a TPU
v5: (256,128,128) f64 cholesky 1039 ms vs 18 ms for the same-shape
matmul; triangular_solve 310 ms).  Since the f64 endgame of the
two-phase sparse solver is factorization-bound, these replacements
restructure the same math so that all O(w^3) work lands in batched
matmuls and only O(w) steps of (nb, b, b) elementwise work stay
sequential (b = the 32-wide unblocked base).

Contents (all batched over arbitrary leading dims, last two dims w x w):
  * `unblocked_ldl`    — masked rank-1 sweep LDL^T (optionally sign-
    directed pivot flooring), the base case; same semantics as
    `sparse_chol.dense_ldl`.
  * `blocked_ldl`      — recursive block LDL^T built from the base case
    plus GEMM panel/trailing updates.
  * `blocked_cholesky` — SPD Cholesky via blocked_ldl (L_chol = L√d);
    drop-in for `jnp.linalg.cholesky` on lower-triangular use.
  * `inv_unit_lower` / `inv_lower` — blocked triangular inversion
    (explicit inverses turn every downstream panel solve into a matmul).

Reference context: the numeric phase these feed is the TPU equivalent of
cuDSS's factorization loop (scripts/benchmarks_gpu.jl:41-42); the
pivot-floor semantics mirror dense_ldl (cuDSS-style static pivoting).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BLK = 32


def unblocked_ldl(F, sgn=None, floor: float = 0.0):
    """No-pivot LDL^T of (..., w, w) symmetric matrices: F = L D L' with
    L unit lower triangular.  Sequential masked rank-1 sweep over the w
    columns — use only as the blocked base case (w <= ~32).

    With `sgn` ((..., w) expected pivot signs) and `floor` > 0, pivots
    are perturbed to sgn * max(sgn * d, floor)."""
    w = F.shape[-1]
    idx = jnp.arange(w)

    def body(j, carry):
        F, L, d = carry
        dj = F[..., j, j]
        if sgn is not None and floor > 0.0:
            sj = sgn[..., j]
            dj = sj * jnp.maximum(sj * dj, jnp.asarray(floor, F.dtype))
        col = F[..., :, j] / dj[..., None]
        col = jnp.where(idx > j, col, 0.0)
        F = F - dj[..., None, None] * col[..., :, None] * col[..., None, :]
        L = L.at[..., :, j].set(col)
        d = d.at[..., j].set(dj)
        return F, L, d

    L0 = jnp.zeros_like(F)
    d0 = jnp.zeros(F.shape[:-1], F.dtype)
    _, L, d = jax.lax.fori_loop(0, w, body, (F, L0, d0))
    L = L + jnp.eye(w, dtype=F.dtype)
    return L, d


def inv_unit_lower(L, blk: int = BLK):
    """Explicit inverse of a batched UNIT lower-triangular (..., w, w):
    blocked 2x2 recursion — inv([[A,0],[B,C]]) = [[iA,0],[-iC B iA, iC]]
    — with a sequential row-sweep base case."""
    w = L.shape[-1]
    if w > blk:
        h = blk * (((w + 1) // 2 + blk - 1) // blk)  # split at a blk multiple
        h = min(h, w - 1)
        iA = inv_unit_lower(L[..., :h, :h], blk)
        iC = inv_unit_lower(L[..., h:, h:], blk)
        B = L[..., h:, :h]
        off = -(iC @ (B @ iA))
        top = jnp.concatenate([iA, jnp.zeros_like(L[..., :h, h:])], axis=-1)
        bot = jnp.concatenate([off, iC], axis=-1)
        return jnp.concatenate([top, bot], axis=-2)

    idx = jnp.arange(w)

    def body(i, X):
        # row i of inv: e_i - L[i, :i] @ X[:i, :]  (unit diagonal)
        li = jnp.where(idx < i, L[..., i, :], 0.0)            # (..., w)
        acc = jnp.einsum("...k,...kj->...j", li, X)
        row = jnp.where(idx == i, 1.0, 0.0) - acc
        return X.at[..., i, :].set(row)

    X0 = jnp.zeros_like(L)
    return jax.lax.fori_loop(0, w, body, X0)


def inv_lower(L, unit: bool = False, blk: int = BLK):
    """Explicit inverse of batched lower-triangular (..., w, w).
    Non-unit L = L_u @ diag(d)  =>  inv(L) = diag(1/d) @ inv(L_u)."""
    if unit:
        return inv_unit_lower(L, blk)
    d = jnp.diagonal(L, axis1=-2, axis2=-1)
    Lu = L / d[..., None, :]
    return inv_unit_lower(Lu, blk) / d[..., :, None]


def blocked_ldl(F, sgn=None, floor: float = 0.0, blk: int = BLK):
    """Blocked no-pivot LDL^T of (..., w, w): same result as
    unblocked_ldl, but panel solves and trailing updates are GEMMs and
    only blk-column base sweeps stay sequential."""
    w = F.shape[-1]
    if w <= blk:
        return unblocked_ldl(F, sgn=sgn, floor=floor)
    h = blk
    F11 = F[..., :h, :h]
    F21 = F[..., h:, :h]
    F22 = F[..., h:, h:]
    L11, d1 = unblocked_ldl(F11, sgn=None if sgn is None else sgn[..., :h],
                            floor=floor)
    i11 = inv_unit_lower(L11, blk)
    Z = F21 @ jnp.swapaxes(i11, -1, -2)        # Z = F21 L11^{-T}
    L21 = Z / d1[..., None, :]
    S22 = F22 - Z @ jnp.swapaxes(L21, -1, -2)
    L22, d2 = blocked_ldl(S22, sgn=None if sgn is None else sgn[..., h:],
                          floor=floor, blk=blk)
    top = jnp.concatenate([L11, jnp.zeros_like(F[..., :h, h:])], axis=-1)
    bot = jnp.concatenate([L21, L22], axis=-1)
    return jnp.concatenate([top, bot], axis=-2), jnp.concatenate([d1, d2], axis=-1)


def blocked_cholesky(F, blk: int = BLK):
    """SPD Cholesky of (..., w, w) via blocked LDL^T: L_chol = L * sqrt(d).
    Drop-in for jnp.linalg.cholesky (lower), GEMM-rich.  No pivoting: the
    IPM's regularized normal/augmented systems keep pivots positive; NaN
    from a non-SPD input propagates and is caught by factor_ok."""
    L, d = blocked_ldl(F, blk=blk)
    return L * jnp.sqrt(d)[..., None, :]

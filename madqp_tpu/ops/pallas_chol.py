"""Pallas TPU blocked Cholesky factorization.

The per-iteration KKT factorization is the solver's hot kernel (SURVEY §3.4:
"FACTORIZATION — dominant cost").  This kernel keeps the entire matrix
resident in VMEM and performs the full right-looking blocked factorization
in a single fused kernel — no HBM round-trips between the diagonal factor,
panel solve and trailing update, unlike a composition of XLA ops:

  for each 128-block column j:
    1. unblocked Cholesky of the diagonal block      (VPU, rank-1 sweeps)
    2. panel triangular solve X = P L^-T             (MXU matvec sweeps)
    3. trailing update  A -= X X^T  (masked)         (MXU)

All shapes are static: the panel/update steps process full-height columns
with row/column masks instead of shrinking the trailing submatrix (trades
<=3x FLOPs for static shapes — SURVEY §7.1: TPUs prefer masked dense work).

VMEM bound: n^2 * 4 bytes * 2 buffers must fit in ~16 MB -> n <= ~1024 for
f32 with scratch.  Larger problems stay on the XLA path (the `auto` policy
in `select_cholesky`).

STATUS: numerically verified in interpret mode (machine precision vs
LAPACK, tests/test_pallas.py) AND in compiled Mosaic mode on a real TPU
v5 chip (factor matches jax.scipy.linalg.cholesky to f32 roundoff;
reconstruction error identical to XLA's).  Two Mosaic pitfalls fixed for
compiled mode: no dynamic scalar indexing (masked-2D forms throughout)
and i32 fori_loop bounds (under jax_enable_x64 the default i64 loop
index hits an infinite recursion in Mosaic's convert_element_type
lowering).  XLA's cholesky is faster at these sizes (n <= 1024 fits
VMEM; both ~30-80 ms through the tunnel), so the default linear_solver
remains "dense" (XLA); the kernel is the building block for future fused
factorize+solve steps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

BLOCK = 128


def _unblocked_chol_block(D):
    """Lower Cholesky of a (B, B) block via B masked rank-1 sweeps (VPU).

    Everything stays 2D and masked — no `D[k, k]` / `.at[:, k]` dynamic
    indexing, which Mosaic cannot lower (scalar gathers from VMEM values;
    tracing them recurses forever in pallas compiled mode)."""
    B = D.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    rids = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)   # (B, 1)

    def step(k, D):
        col = jnp.sum(jnp.where(cols == k, D, 0.0), axis=1,
                      keepdims=True)                          # D[:, k] (B,1)
        piv = jnp.sqrt(jnp.sum(jnp.where(rids == k, col, 0.0)))  # D[k, k]
        colp = col / piv
        col_m = jnp.where(rids > k, colp, 0.0)
        # trailing rank-1 update restricted to cols > k
        upd = col_m * jnp.transpose(col_m)                    # (B, B) outer
        D = D - jnp.where(cols > k, upd, 0.0)
        # write the scaled column (diag = piv, below-diag = col, above = 0)
        newcol = jnp.where(rids > k, colp,
                           jnp.where(rids == k, piv, 0.0))    # (B, 1)
        D = jnp.where(cols == k, newcol, D)
        return D

    # i32 bounds: under jax_enable_x64, int fori_loop indices become i64 and
    # Mosaic's i64 convert_element_type lowering recurses infinitely.
    D = jax.lax.fori_loop(jnp.int32(0), jnp.int32(B), step, D)
    # zero the strict upper triangle
    return jnp.where(rows >= cols, D, 0.0)


def _panel_solve(P, L):
    """Solve X L^T = P for X, with L (B, B) lower-triangular and P (n, B):
    forward substitution over columns, each step one (n,B)x(B,1) matvec.
    Masked-2D form for the same Mosaic reason as `_unblocked_chol_block`."""
    n, B = P.shape
    colsB = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)   # (1, B)
    rowsB = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)   # (B, 1)

    def step(k, X):
        lk = jnp.sum(jnp.where(rowsB == k, L, 0.0), axis=0,
                     keepdims=True)                           # L[k, :] (1,B)
        lk_m = jnp.where(colsB < k, lk, 0.0)
        acc = jax.lax.dot_general(
            X, lk_m,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=X.dtype,
        )                                                     # (n, 1)
        lkk = jnp.sum(jnp.where(colsB == k, lk, 0.0))         # L[k, k]
        pk = jnp.sum(jnp.where(colsB == k, P, 0.0), axis=1,
                     keepdims=True)                           # P[:, k] (n,1)
        xk = (pk - acc) / lkk
        return jnp.where(colsB == k, xk, X)

    return jax.lax.fori_loop(jnp.int32(0), jnp.int32(B), step,
                             jnp.zeros_like(P))  # i32: see _unblocked_chol_block


def _chol_kernel(a_ref, out_ref, *, n, block):
    nb = n // block
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    out_ref[:] = jnp.where(rows >= cols, a_ref[:], 0.0)

    def block_col(j, _):
        jB = j * block
        # 1) diagonal block factorization
        D = out_ref[pl.ds(jB, block), pl.ds(jB, block)]
        LD = _unblocked_chol_block(D)
        out_ref[pl.ds(jB, block), pl.ds(jB, block)] = LD

        # 2) full-height panel solve, masked to rows below the block
        P = out_ref[:, pl.ds(jB, block)]          # (n, B)
        X = _panel_solve(P, LD)
        # (n, 1) 2D mask — Mosaic cannot lower 1D iota slices
        below = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0) >= jB + block
        keep = out_ref[:, pl.ds(jB, block)]
        Xm = jnp.where(below, X, 0.0)
        out_ref[:, pl.ds(jB, block)] = jnp.where(below, Xm, keep)

        # 3) trailing update A -= Xm Xm^T on rows/cols >= jB + B (MXU)
        upd = jax.lax.dot_general(
            Xm, Xm,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=out_ref.dtype,
        )
        mask = (rows >= jB + block) & (cols >= jB + block) & (rows >= cols)
        out_ref[:, :] = out_ref[:, :] - jnp.where(mask, upd, 0.0)
        return 0

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(nb), block_col, 0)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def pallas_cholesky(A, block: int = BLOCK, interpret: bool = False):
    """Lower Cholesky factor of SPD A via the fused Pallas kernel.

    Pads to a multiple of `block` with an identity tail; returns the (n, n)
    lower factor.  Use `interpret=True` off-TPU (tests/CI).
    """
    n = A.shape[0]
    n_pad = ((n + block - 1) // block) * block
    if n_pad != n:
        Ap = jnp.zeros((n_pad, n_pad), A.dtype)
        Ap = Ap.at[:n, :n].set(A)
        Ap = Ap.at[jnp.arange(n, n_pad), jnp.arange(n, n_pad)].set(1.0)
    else:
        Ap = A

    kernel = functools.partial(_chol_kernel, n=n_pad, block=block)
    L = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, n_pad), A.dtype),
        interpret=interpret,
    )(Ap)
    return L[:n, :n]


def select_cholesky(backend: str, platform: str | None = None):
    """Cholesky implementation by backend name: 'pallas' uses the fused
    kernel (interpret mode off-TPU), anything else XLA's."""
    if backend != "pallas":
        return lambda M: jax.scipy.linalg.cholesky(M, lower=True)
    if platform is None:
        platform = jax.default_backend()
    interp = platform not in ("tpu", "axon")
    return lambda M: pallas_cholesky(M, interpret=interp)

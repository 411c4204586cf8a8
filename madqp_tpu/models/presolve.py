"""Presolve-lite: conservative reductions with exact postsolve.

Equivalent of the reference's `presolve_qp` (scripts/common.jl:102-126, which
delegates to QuadraticModels.presolve).  Implemented reductions:

  * empty constraint rows — dropped (declared infeasible if 0 not in
    [lcon, ucon]);
  * empty columns (no A entries, no H entries) — fixed at the bound implied
    by the gradient sign, or declared unbounded for an LP with an open bound
    in the descent direction;
  * detection of trivially solved problems (no rows and no cols left).

Returns (presolved_qp, info, flag): flag=False means the problem was solved,
declared infeasible or unbounded during presolve (matching the reference's
convention of returning the original problem with flag=false).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import List, Optional

import numpy as np
import scipy.sparse as sp

from .qp import QuadraticProblem


class PresolveStatus(enum.Enum):
    REDUCED = "reduced"
    UNCHANGED = "unchanged"
    SOLVED = "solved"
    INFEASIBLE = "infeasible"
    UNBOUNDED = "unbounded"


@dataclasses.dataclass
class PresolveInfo:
    status: PresolveStatus
    keep_rows: np.ndarray
    keep_cols: np.ndarray
    fixed_cols: np.ndarray
    fixed_vals: np.ndarray
    nvar: int
    ncon: int

    def postsolve_x(self, x_red: np.ndarray) -> np.ndarray:
        x = np.zeros(self.nvar)
        x[self.keep_cols] = x_red
        x[self.fixed_cols] = self.fixed_vals
        return x

    def postsolve_y(self, y_red: np.ndarray) -> np.ndarray:
        y = np.zeros(self.ncon)
        y[self.keep_rows] = y_red
        return y


def presolve_qp(
    qp: QuadraticProblem, tol: float = 0.0
) -> tuple[QuadraticProblem, PresolveInfo, bool]:
    m, n = qp.ncon, qp.nvar
    A = qp.A.tocsc()
    H = qp.H.tocsc() if qp.H is not None else None

    # -- empty rows ---------------------------------------------------------
    row_nnz = np.diff(qp.A.tocsr().indptr)
    empty_rows = row_nnz == 0
    for i in np.where(empty_rows)[0]:
        if qp.lcon[i] > tol or qp.ucon[i] < -tol:
            info = PresolveInfo(
                PresolveStatus.INFEASIBLE,
                np.arange(m), np.arange(n), np.array([], dtype=int),
                np.array([]), n, m,
            )
            return qp, info, False
    keep_rows = np.where(~empty_rows)[0]

    # -- empty columns ------------------------------------------------------
    col_nnz = np.diff(A.indptr)
    h_col_nnz = np.diff(H.indptr) if H is not None else np.zeros(n, dtype=int)
    empty_cols = (col_nnz == 0) & (h_col_nnz == 0)
    fixed_cols: List[int] = []
    fixed_vals: List[float] = []
    sign = 1.0 if qp.minimize else -1.0
    for j in np.where(empty_cols)[0]:
        cj = sign * qp.c[j]
        if cj > 0:
            v = qp.lvar[j]
        elif cj < 0:
            v = qp.uvar[j]
        else:
            v = np.clip(0.0, qp.lvar[j], qp.uvar[j])
        if not np.isfinite(v):
            info = PresolveInfo(
                PresolveStatus.UNBOUNDED,
                np.arange(m), np.arange(n), np.array([], dtype=int),
                np.array([]), n, m,
            )
            return qp, info, False
        fixed_cols.append(j)
        fixed_vals.append(float(v))
    keep_cols = np.where(~empty_cols)[0]

    if len(keep_rows) == m and len(keep_cols) == n:
        info = PresolveInfo(
            PresolveStatus.UNCHANGED,
            keep_rows, keep_cols, np.array(fixed_cols, dtype=int),
            np.array(fixed_vals), n, m,
        )
        return qp, info, True

    if len(keep_cols) == 0:
        info = PresolveInfo(
            PresolveStatus.SOLVED,
            keep_rows, keep_cols, np.array(fixed_cols, dtype=int),
            np.array(fixed_vals), n, m,
        )
        return qp, info, False

    A_red = qp.A.tocsr()[keep_rows][:, keep_cols]
    H_red = None
    if H is not None:
        H_red = qp.H.tocsr()[keep_cols][:, keep_cols]
    c0_red = qp.c0 + float(qp.c[fixed_cols] @ np.asarray(fixed_vals)) if fixed_cols else qp.c0

    reduced = QuadraticProblem(
        c=qp.c[keep_cols],
        A=A_red,
        H=H_red,
        c0=c0_red,
        lcon=qp.lcon[keep_rows],
        ucon=qp.ucon[keep_rows],
        lvar=qp.lvar[keep_cols],
        uvar=qp.uvar[keep_cols],
        x0=qp.x0[keep_cols],
        y0=qp.y0[keep_rows],
        minimize=qp.minimize,
        name=qp.name,
    )
    info = PresolveInfo(
        PresolveStatus.REDUCED,
        keep_rows, keep_cols, np.array(fixed_cols, dtype=int),
        np.array(fixed_vals), n, m,
    )
    return reduced, info, True

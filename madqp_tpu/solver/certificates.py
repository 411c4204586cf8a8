"""Exit-time infeasibility / unboundedness certificates (host-side numpy).

The reference has *no* infeasible or unbounded detection at all — its loop
only stops on tolerance or max_iter (/root/reference/src/solver.jl:279-283,
SURVEY §4 gaps).  An IPM manifests an empty feasible set as diverging dual
iterates and an unbounded objective as diverging primal iterates; these
functions certify those directions at exit so the driver can report
INFEASIBLE_PROBLEM_DETECTED / UNBOUNDED_PROBLEM_DETECTED instead of a bare
MAX_ITER.  Both take the *internal standard form*

    min c0 + c'x + 1/2 x'Hx   s.t.  A x = b,   lb <= x <= ub (masked)

(StandardQP with dense A/H, or SparseStandardQP with scipy A/H — only
`A @ d` / `A.T @ y` / `H @ d` products are used) and a terminal internal
iterate.  Pure numpy, runs once at exit — never in the hot loop.
"""

from __future__ import annotations

import numpy as np

__all__ = ["farkas_certificate", "unbounded_certificate",
           "certify_exit_status"]


def certify_exit_status(std, x, y, status):
    """Upgrade a non-convergent exit status to a certified one.

    For MAX_ITER / STEP_ERROR / DIVERGING_ITERATES exits, try the Farkas
    certificate on the terminal duals, then the descent-ray certificate on
    the terminal primals; other statuses pass through unchanged.  Shared by
    the dense driver, the host path, and the sparse drivers' finish_stats.
    """
    from ..utils.status import Status

    if status in (Status.MAXIMUM_ITERATIONS_EXCEEDED,
                  Status.ERROR_IN_STEP_COMPUTATION,
                  Status.DIVERGING_ITERATES):
        if farkas_certificate(std, y):
            return Status.INFEASIBLE_PROBLEM_DETECTED
        if unbounded_certificate(std, x):
            return Status.UNBOUNDED_PROBLEM_DETECTED
    return status


def _matvec(M, v):
    return np.asarray(M @ v).ravel()


def _abs_col_sum_max(A) -> float:
    """max_j sum_i |A_ij| (the 1-norm) for dense or scipy-sparse A."""
    if A.shape[0] == 0 or A.shape[1] == 0:
        return 0.0
    return float(np.max(np.asarray(abs(A).sum(axis=0)).ravel()))


def farkas_certificate(std, y, rtol: float = 1e-6,
                       vtol: float = 1e-9) -> bool:
    """Certified primal infeasibility from the terminal dual direction.

    The feasible set {Ax = b, lb <= x <= ub (masked)} is empty iff some y
    has  sup_{lb <= x <= ub} (A'y)'x < b'y  (Farkas lemma).  The sup
    separates per coordinate: v_i ub_i for v_i > 0 (+inf if unbounded
    above), v_i lb_i for v_i < 0 (+inf if unbounded below).  Diverging
    multipliers approach such a ray directionally, so the check normalizes
    y to unit infinity norm and treats |v_i| <= vtol as zero (certified up
    to tolerance — "local infeasibility" in the status taxonomy).  The
    terminal iterate only approximates the ray to O(1/|y|inf) per entry
    (it diverges from a finite point), and A amplifies that by its column
    sums, so the zero-clip threshold adapts: max(vtol, 10*|A|_1/|y|inf).
    """
    try:
        y = np.asarray(y, dtype=np.float64)
        y = np.where(np.isfinite(y), y, 0.0)
        ny = float(np.max(np.abs(y))) if y.size else 0.0
        if ny == 0.0:
            return False
        vclip = max(vtol, 10.0 * max(1.0, _abs_col_sum_max(std.A)) / ny)
        if vclip > 1e-4:
            # |y| has not actually diverged: the extracted direction's
            # noise floor swamps v and any "certificate" would be built
            # on clipped-away mass.  Refuse rather than mislabel.
            return False
        y = y / ny
        thresh = rtol * max(1.0, float(np.max(np.abs(std.b))))

        def certifies(yd):
            v = _matvec(std.A.T, yd)
            v = np.where(np.abs(v) <= vclip, 0.0, v)
            pos, neg = v > 0.0, v < 0.0
            if np.any(pos & ~std.has_ub) or np.any(neg & ~std.has_lb):
                return False  # sup is +inf via an unbounded coordinate
            sup = float(np.sum(v[pos] * std.ub[pos])
                        + np.sum(v[neg] * std.lb[neg]))
            return float(std.b @ yd) - sup > thresh

        # the diverging iterate approaches the ray up to sign convention
        return certifies(y) or certifies(-y)
    except Exception:  # pragma: no cover — certificate is best-effort
        return False


def unbounded_certificate(std, x, rtol: float = 1e-6,
                          vtol: float = 1e-9) -> bool:
    """Certified unboundedness from the terminal primal direction.

    The objective is unbounded below on the feasible set iff there is a
    ray d with  A d = 0,  d_i >= 0 wherever ub_i is finite is *violated*
    only through unbounded coordinates (d_i > 0 requires no upper bound,
    d_i < 0 requires no lower bound), and — H being PSD — H d = 0 with
    c'd < 0 (along such d the objective decreases linearly forever).
    Diverging primal iterates approach the ray directionally: feasibility
    A x = b holds along the run, so A (x/|x|) = b/|x| -> 0.
    """
    try:
        x = np.asarray(x, dtype=np.float64)
        x = np.where(np.isfinite(x), x, 0.0)
        nx = float(np.max(np.abs(x))) if x.size else 0.0
        if nx == 0.0:
            return False
        dclip = max(vtol, 10.0 / nx)
        if dclip > 1e-4:
            return False  # |x| has not diverged enough to trust the ray
        d = x / nx
        # same direction-extraction noise floor as the Farkas side
        d = np.where(np.abs(d) <= dclip, 0.0, d)
        if not np.any(d):
            return False
        # bound compatibility: moving forever along d must stay in the box
        if np.any((d > 0.0) & std.has_ub) or np.any((d < 0.0) & std.has_lb):
            return False
        # ray in the null space of A (relative to the product's magnitude)
        if std.m > 0:
            r = _matvec(std.A, d)
            denom = max(1.0, float(np.max(np.abs(std.b))))
            if float(np.max(np.abs(r))) > rtol * denom:
                return False
        # PSD Hessian: descent ray must be in null(H)
        if std.H is not None:
            hd = _matvec(std.H, d)
            if float(np.max(np.abs(hd))) > rtol:
                return False
        # strict linear descent along the ray
        return float(std.c @ d) < -rtol * max(1.0, float(np.max(np.abs(std.c))))
    except Exception:  # pragma: no cover — certificate is best-effort
        return False

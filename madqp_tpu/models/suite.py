"""Structured synthetic LP/QP suite — a Netlib/Maros-Mészáros stand-in.

The reference's benchmark protocol runs the Netlib LP and Maros-Mészáros QP
collections (scripts/benchmarks_cpu.jl:66-72); this environment has no
network access, so this module generates a *structurally diverse* family of
instances that exercises the same feature axes those suites do:

- equality / one-sided / two-sided (RANGES) constraints,
- free / boxed / fixed variables,
- sparse structured Jacobians (network, staircase, banded, grid),
- LPs and convex QPs (diagonal and sparse-block Hessians),
- degenerate and near-degenerate optima (transport ties).

Instances are deterministic in (kind, size, seed) and carry a known
feasible point; several have closed-form or independently verifiable
optima, checked in tests/test_suite.py.  `write_suite` materializes the
family as MPS/QPS files so the directory mode of benchmarks/run_suite.py
(the reference's file-driven harness, scripts/benchmarks_cpu.jl:12-27)
runs on real parser input.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Tuple

import numpy as np
import scipy.sparse as sp

from .qp import QuadraticProblem


def transport_lp(ns: int = 12, nd: int = 15, seed: int = 0) -> QuadraticProblem:
    """Classic transportation LP: min c·x, supply rows ≤, demand rows ≥.

    Network structure: every column has exactly two nonzeros.  Balanced
    totals make many optimal bases degenerate — the classic stress case
    for ratio tests and step rules.
    """
    rng = np.random.default_rng(seed)
    supply = rng.integers(20, 100, ns).astype(np.float64)
    demand = rng.uniform(0.4, 1.0, nd)
    demand *= supply.sum() / demand.sum()  # balanced
    cost = rng.uniform(1.0, 10.0, (ns, nd))
    n = ns * nd
    rows, cols = [], []
    for i in range(ns):
        for j in range(nd):
            k = i * nd + j
            rows.append(i)          # supply row
            cols.append(k)
            rows.append(ns + j)     # demand row
            cols.append(k)
    A = sp.coo_matrix((np.ones(len(rows)), (rows, cols)),
                      shape=(ns + nd, n)).tocsr()
    lcon = np.concatenate([np.full(ns, -np.inf), demand])
    ucon = np.concatenate([supply, np.full(nd, np.inf)])
    return QuadraticProblem(
        c=cost.ravel(), A=A, lcon=lcon, ucon=ucon,
        lvar=np.zeros(n), uvar=np.full(n, np.inf),
        name=f"transport_{ns}x{nd}_{seed}",
    )


def multicommodity_lp(nodes: int = 10, ncomm: int = 3,
                      seed: int = 0) -> QuadraticProblem:
    """Multicommodity min-cost flow with shared arc capacities.

    Per-commodity flow conservation (equalities) + coupling capacity
    RANGES rows over arc sums — the two-sided-constraint axis.
    """
    rng = np.random.default_rng(seed)
    # random connected digraph: ring + chords
    arcs = [(i, (i + 1) % nodes) for i in range(nodes)]
    extra = max(nodes, nodes * 3 // 2)
    while len(arcs) < nodes + extra:
        u, v = rng.integers(0, nodes, 2)
        if u != v and (u, v) not in arcs:
            arcs.append((int(u), int(v)))
    na = len(arcs)
    n = na * ncomm
    rows, cols, vals = [], [], []
    # Drop node (nodes-1)'s conservation row per commodity: the full set
    # sums to zero (rank deficient); nc rows per commodity keeps full rank.
    nc = nodes - 1
    b = np.zeros(nc * ncomm)
    # Feasibility by construction: route every commodity along the ring
    # (arcs 0..nodes-1 are i -> i+1) and size the shared capacities to
    # admit that flow — random draws otherwise produce infeasible
    # instances (shared-arc cuts smaller than routed demand; observed at
    # nodes=10, ncomm=3, seed=1 and certified by the Farkas check).
    ring_usage = np.zeros(na)
    for k in range(ncomm):
        s, t = rng.choice(nodes, 2, replace=False)
        dem = float(rng.integers(5, 20))
        i = int(s)
        while i != t:
            ring_usage[i] += dem
            i = (i + 1) % nodes
        if s < nc:
            b[k * nc + s] = dem
        if t < nc:
            b[k * nc + t] = -dem
        for a, (u, v) in enumerate(arcs):
            col = k * na + a
            if u < nc:
                rows.append(k * nc + u)
                cols.append(col)
                vals.append(1.0)
            if v < nc:
                rows.append(k * nc + v)
                cols.append(col)
                vals.append(-1.0)
    # shared capacity rows: 0 <= sum_k x[k,a] <= cap_a  (two-sided)
    for a in range(na):
        for k in range(ncomm):
            rows.append(nc * ncomm + a)
            cols.append(k * na + a)
            vals.append(1.0)
    cap = ring_usage + rng.uniform(15.0, 40.0, na)
    A = sp.coo_matrix((vals, (rows, cols)),
                      shape=(nc * ncomm + na, n)).tocsr()
    lcon = np.concatenate([b, np.zeros(na)])
    ucon = np.concatenate([b, cap])
    cost = rng.uniform(1.0, 5.0, n)
    return QuadraticProblem(
        c=cost, A=A, lcon=lcon, ucon=ucon,
        lvar=np.zeros(n), uvar=np.full(n, np.inf),
        name=f"multicomm_{nodes}n{ncomm}k_{seed}",
    )


def staircase_lp(periods: int = 20, nper: int = 8,
                 seed: int = 0) -> QuadraticProblem:
    """Multi-period production planning: block-bidiagonal (staircase)
    constraints linking inventory across periods — the dynamic-LP axis
    (Netlib's SCTAP/SCSD family shape)."""
    rng = np.random.default_rng(seed)
    # per period: nper production vars + 1 inventory carry var
    npc = nper + 1
    n = periods * npc
    m = periods
    rows, cols, vals = [], [], []
    demand = rng.uniform(5.0, 15.0, periods)
    for t in range(periods):
        for j in range(nper):
            rows.append(t)
            cols.append(t * npc + j)
            vals.append(1.0)
        rows.append(t)                      # + inventory in
        cols.append(t * npc + nper)
        vals.append(-1.0)
        if t > 0:                           # − inventory carried from t−1
            rows.append(t)
            cols.append((t - 1) * npc + nper)
            vals.append(1.0)
    A = sp.coo_matrix((vals, (rows, cols)), shape=(m, n)).tocsr()
    cost = rng.uniform(1.0, 4.0, n)
    cost[nper::npc] = 0.2  # cheap storage
    uvar = np.full(n, np.inf)
    uvar[: n: npc] = rng.uniform(8.0, 20.0, periods)  # capacity on 1st machine
    return QuadraticProblem(
        c=cost, A=A, lcon=demand, ucon=demand,
        lvar=np.zeros(n), uvar=uvar,
        name=f"staircase_{periods}p{nper}_{seed}",
    )


def blending_lp(nraw: int = 30, nspec: int = 8, seed: int = 0) -> QuadraticProblem:
    """Product blending: dense-ish spec rows with RANGES + a fixed total,
    free cost-offset variable — exercises dense rows, ranges, free vars."""
    rng = np.random.default_rng(seed)
    n = nraw + 1                      # + one free accounting variable
    m = nspec + 1
    spec = rng.uniform(0.0, 1.0, (nspec, nraw))
    lo = spec.mean(1) * 0.8
    hi = spec.mean(1) * 1.2
    A = np.zeros((m, n))
    A[:nspec, :nraw] = spec
    A[nspec, :nraw] = 1.0             # total mass == 1
    A[nspec, nraw] = 0.0
    A[0, nraw] = 1.0                  # free var appears in one spec row
    lcon = np.concatenate([lo, [1.0]])
    ucon = np.concatenate([hi, [1.0]])
    lvar = np.concatenate([np.zeros(nraw), [-np.inf]])
    uvar = np.concatenate([np.full(nraw, 0.4), [np.inf]])
    c = np.concatenate([rng.uniform(1.0, 9.0, nraw), [1e-3]])
    return QuadraticProblem(
        c=c, A=sp.csr_matrix(A), lcon=lcon, ucon=ucon, lvar=lvar, uvar=uvar,
        name=f"blending_{nraw}_{seed}",
    )


def portfolio_qp(nassets: int = 60, nfactor: int = 6,
                 seed: int = 0) -> QuadraticProblem:
    """Markowitz portfolio: H = F Fᵀ + D (factor model, dense low-rank +
    diagonal), budget equality, group RANGES rows, boxed weights."""
    rng = np.random.default_rng(seed)
    F = rng.standard_normal((nassets, nfactor)) * 0.3
    D = rng.uniform(0.05, 0.3, nassets)
    H = F @ F.T + np.diag(D)
    mu = rng.uniform(0.02, 0.2, nassets)
    ngroup = max(2, nassets // 20)
    G = np.zeros((ngroup, nassets))
    for g in range(ngroup):
        G[g, g::ngroup] = 1.0
    A = np.vstack([np.ones(nassets), G])
    lcon = np.concatenate([[1.0], np.full(ngroup, 0.05)])
    ucon = np.concatenate([[1.0], np.full(ngroup, 0.8)])
    return QuadraticProblem(
        c=-mu, H=sp.csr_matrix(H), A=sp.csr_matrix(A),
        lcon=lcon, ucon=ucon,
        lvar=np.zeros(nassets), uvar=np.full(nassets, 0.15),
        name=f"portfolio_{nassets}_{seed}",
    )


def svm_qp(nsamp: int = 80, nfeat: int = 15, seed: int = 0) -> QuadraticProblem:
    """Soft-margin linear SVM primal as a QP: min ½‖w‖² + C·Σξ subject to
    yᵢ(w·xᵢ+b) ≥ 1−ξᵢ — sparse-block diagonal Hessian, one-sided rows,
    free (w, b) variables, bounded slacks."""
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((nsamp, nfeat))
    w_true = rng.standard_normal(nfeat)
    y = np.sign(X @ w_true + 0.1 * rng.standard_normal(nsamp))
    y[y == 0] = 1.0
    n = nfeat + 1 + nsamp            # w, b, xi
    H = sp.diags(np.concatenate([np.ones(nfeat), [1e-8], np.zeros(nsamp)])).tocsr()
    A = sp.hstack([
        sp.csr_matrix(X * y[:, None]),
        sp.csr_matrix(y[:, None]),
        sp.eye(nsamp, format="csr"),
    ]).tocsr()
    C = 1.0
    c = np.concatenate([np.zeros(nfeat + 1), np.full(nsamp, C)])
    lvar = np.concatenate([np.full(nfeat + 1, -np.inf), np.zeros(nsamp)])
    return QuadraticProblem(
        c=c, H=H, A=A,
        lcon=np.ones(nsamp), ucon=np.full(nsamp, np.inf),
        lvar=lvar, uvar=np.full(n, np.inf),
        name=f"svm_{nsamp}x{nfeat}_{seed}",
    )


def fixed_vars_lp(n: int = 40, seed: int = 3) -> QuadraticProblem:
    """LP with a block of FIXED variables (lvar == uvar) — the MakeParameter
    elimination axis (reference fixed_variable_treatment)."""
    rng = np.random.default_rng(seed)
    m = n // 2
    A = sp.csr_matrix(rng.standard_normal((m, n)) * (rng.random((m, n)) < 0.3))
    x_feas = rng.uniform(0.5, 1.5, n)
    lvar = np.zeros(n)
    uvar = np.full(n, np.inf)
    nfix = n // 5
    lvar[:nfix] = uvar[:nfix] = x_feas[:nfix]
    b = np.asarray(A @ x_feas).ravel()
    return QuadraticProblem(
        c=rng.uniform(0.5, 2.0, n), A=A, lcon=b, ucon=b,
        lvar=lvar, uvar=uvar, name=f"fixedvars_{n}_{seed}",
    )


_SMALL = dict(transport=(6, 8), multicomm=(6, 2), staircase=(8, 4),
              blending=(12, 4), portfolio=(24, 3), svm=(30, 8), fixed=(20,))
_MEDIUM = dict(transport=(12, 15), multicomm=(10, 3), staircase=(20, 8),
               blending=(30, 8), portfolio=(60, 6), svm=(80, 15), fixed=(40,))
_LARGE = dict(transport=(40, 50), multicomm=(25, 5), staircase=(80, 20),
              blending=(120, 20), portfolio=(200, 12), svm=(300, 40),
              fixed=(150,))

_MAKERS = dict(transport=transport_lp, multicomm=multicommodity_lp,
               staircase=staircase_lp, blending=blending_lp,
               portfolio=portfolio_qp, svm=svm_qp, fixed=fixed_vars_lp)


def structured_suite(size: str = "medium",
                     seeds: Tuple[int, ...] = (0, 1)) -> Iterator[Tuple[str, QuadraticProblem]]:
    """Yield (name, problem) across all structured families."""
    dims = {"small": _SMALL, "medium": _MEDIUM, "large": _LARGE}[size]
    for kind, maker in _MAKERS.items():
        for seed in seeds:
            args = dims[kind]
            qp = maker(*args, seed=seed) if kind != "fixed" else maker(args[0], seed=seed)
            yield qp.name, qp


def write_suite(outdir: str, size: str = "medium",
                seeds: Tuple[int, ...] = (0, 1)) -> List[str]:
    """Materialize the suite as MPS/QPS files (via io.mps.write_mps) so the
    file-driven harness parses real MPS input end to end."""
    import os

    from ..io.mps_write import write_mps

    os.makedirs(outdir, exist_ok=True)
    paths = []
    for name, qp in structured_suite(size, seeds):
        ext = "qps" if qp.H is not None else "mps"
        path = os.path.join(outdir, f"{name}.{ext}")
        write_mps(qp, path)
        paths.append(path)
    return paths

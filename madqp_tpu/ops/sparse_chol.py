"""Supernodal multifrontal sparse Cholesky on device (SPARSE_PLAN S1+S2).

The on-device answer to SURVEY §7.3 hard part #1 ("sparse symmetric
factorization on TPU — nothing exists off-the-shelf").  Strategy:

  * host symbolic (once per pattern): fill-reducing ordering + elimination
    tree + exact factor structure (via the native C++ layer), fundamental
    supernode partition, and *static index maps* for every front — the
    A-scatter map and the child extend-add maps;
  * device numeric (every IPM iteration): a traced Python loop over
    supernodes in postorder; each front is a DENSE (r, r) matrix — assemble
    (scatter-add), extend-add children, factor the leading (w, w) block
    (Cholesky), panel triangular solve, Schur-complement update.  All
    shapes static; all irregularity lives in precomputed gather indices.

This is the prototype (unrolled trace, one front at a time).  The
production step (SPARSE_PLAN S3) buckets same-shape fronts per elimination
level and vmaps them — the numeric code below is already structured
per-front to make that swap mechanical.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np
import scipy.sparse as sp

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl


@dataclasses.dataclass
class Supernode:
    cols: np.ndarray        # global (permuted) column indices, width w
    rows: np.ndarray        # full row structure incl. diagonal block, size r
    parent: int             # parent supernode id or -1
    # Assembly: scatter of A's upper-triangle entries into the (r, r) front.
    a_src: np.ndarray       # indices into the permuted upper-CSC value array
    a_dst: np.ndarray       # flat positions into the front (r*r)
    # Extend-add: for each child, positions of its update matrix in this front.
    child_ids: List[int]
    child_dst: List[np.ndarray]  # flat positions (uc*uc entries each)


@dataclasses.dataclass
class SupernodalSymbolic:
    n: int
    perm: np.ndarray
    iperm: np.ndarray
    supernodes: List[Supernode]
    Up: np.ndarray          # permuted upper-CSC structure (for value refill)
    Ui: np.ndarray
    max_width: int

    def permute_values(self, A: sp.spmatrix) -> np.ndarray:
        """Upper-triangle value array of P A P' in the stored CSC order."""
        Ap = sp.csc_matrix(A)[self.perm][:, self.perm]
        U = sp.triu(Ap.tocsr(), k=0, format="csc").sorted_indices()
        return np.asarray(U.data, dtype=np.float64)


def analyze(A: sp.spmatrix, order: str = "auto",
            max_supernode: int = 128, relax: int = 16) -> SupernodalSymbolic:
    """Host symbolic analysis of the SPD pattern of A.

    Supernodes use *relaxed amalgamation*: column j joins the running
    supernode when it is its elimination-tree parent and the merge adds at
    most `relax` padded rows to the panel.  Fundamental supernodes alone
    degenerate to width 1 on banded/chain patterns (struct(j-1) is never
    exactly {j} ∪ struct(j)); relaxation recovers the wide dense panels
    the MXU needs — on a banded matrix the merge is exact (zero fill) and
    panels reach max_supernode width.
    """
    from ..native import SparseLDL, etree as _etree, ordering, postorder

    A = sp.csc_matrix(A)
    n = A.shape[0]
    perm0 = ordering(A, order)
    # Postorder the elimination tree so supernode columns are contiguous
    # and children precede parents (multifrontal traversal requirement).
    Aperm0 = A[perm0][:, perm0].tocsc()
    parent0 = _etree(Aperm0)
    post = postorder(parent0)
    perm = np.asarray(perm0)[post]

    # Exact factor structure from the native symbolic+numeric machinery
    # (numeric on a made-SPD proxy materializes Li in final order).
    Aperm = A[perm][:, perm].tocsc()
    proxy = Aperm.copy()
    proxy = (abs(proxy) + abs(proxy).T).tocsc()
    proxy = proxy + (abs(proxy).sum(axis=1).A1.max() + 1.0) * sp.eye(n)
    fs = SparseLDL(proxy, use_amd=False)
    ok = fs.factorize(proxy)
    assert ok, "symbolic proxy factorization failed"
    Lp, Li, Lnz = fs.Lp, fs.Li, fs.Lnz
    parent = np.asarray(_etree(Aperm))

    # column structures (strictly lower) of L
    col_rows = [np.sort(Li[Lp[j]: Lp[j] + Lnz[j]]) for j in range(n)]

    # Relaxed supernode partition.  B tracks the running panel's
    # strictly-below row set (as a python set for cheap union/diff).
    sn_start = [0]
    B = set(int(r) for r in col_rows[0]) if n else set()
    for j in range(1, n):
        chain = parent[j - 1] == j and (j - sn_start[-1]) < max_supernode
        if chain:
            newB = (B - {j}) | set(int(r) for r in col_rows[j])
            if len(newB) - col_rows[j].size <= relax:
                B = newB
                continue
        sn_start.append(j)
        B = set(int(r) for r in col_rows[j])
    sn_start.append(n)

    U = sp.triu(Aperm.tocsr(), k=0, format="csc").sorted_indices()
    Up = U.indptr.astype(np.int64)
    Ui = U.indices.astype(np.int32)

    # map column -> supernode id
    nsn = len(sn_start) - 1
    col_sn = np.empty(n, np.int32)
    for s in range(nsn):
        col_sn[sn_start[s]: sn_start[s + 1]] = s

    # Bottom-up row structures: a supernode's below set is the union of its
    # member columns' structures AND its children's update rows — with
    # amalgamated (padded) panels the update can carry rows absent from the
    # exact parent structure, so the union is required for the extend-add
    # maps to stay total.  Processing by ascending first column is
    # topological (postordered etree: children's columns precede parents').
    snodes: List[Supernode] = []
    pending: List[List[int]] = [[] for _ in range(nsn)]  # child ids per snode
    below_sets: List[np.ndarray] = [None] * nsn
    for s in range(nsn):
        j0, j1 = sn_start[s], sn_start[s + 1]
        rows = set()
        for i in range(j0, j1):
            rows.update(int(r) for r in col_rows[i])
        for c in pending[s]:
            rows.update(int(r) for r in below_sets[c])
        rows.difference_update(range(j0, j1))
        below = np.asarray(sorted(rows), np.int64)
        below_sets[s] = below
        cols = np.arange(j0, j1)
        all_rows = np.concatenate([cols, below]).astype(np.int64)
        snodes.append(Supernode(cols=cols, rows=all_rows, parent=-1,
                                a_src=None, a_dst=None,
                                child_ids=[], child_dst=[]))
        if below.size:
            p = int(col_sn[below[0]])
            snodes[s].parent = p
            pending[p].append(s)

    for s in range(nsn):
        snodes[s].child_ids = pending[s]

    # A-assembly maps.  An upper entry (i, j), i <= j, is the lower entry
    # (j, i) of column i, so it is assembled in the front of snode(i) at
    # local position (loc[j], loc[i]) — j is guaranteed to be in that
    # front's row structure (A's column pattern is a subset of L's).
    locs = [
        {int(g): k for k, g in enumerate(sn.rows)} for sn in snodes
    ]
    src_lists: List[List[int]] = [[] for _ in snodes]
    dst_lists: List[List[int]] = [[] for _ in snodes]
    for j in range(n):
        for p in range(Up[j], Up[j + 1]):
            i = int(Ui[p])  # i <= j
            s = int(col_sn[i])
            loc = locs[s]
            r = snodes[s].rows.size
            a, b = loc[j], loc[i]
            if a < b:
                a, b = b, a
            src_lists[s].append(p)
            dst_lists[s].append(a * r + b)
    for s, sn in enumerate(snodes):
        sn.a_src = np.asarray(src_lists[s], np.int64)
        sn.a_dst = np.asarray(dst_lists[s], np.int64)

    # extend-add maps: child update rows = child.rows[wc:] — all appear in
    # the parent's row set (by the etree property, possibly spread).
    for s, sn in enumerate(snodes):
        loc = {int(g): k for k, g in enumerate(sn.rows)}
        for c in sn.child_ids:
            ch = snodes[c]
            urows = ch.rows[ch.cols.size:]
            # positions of each (i, j) pair of the child's update (uc x uc,
            # lower triangle mirrored like above)
            uc = urows.size
            lidx = np.asarray([loc[int(g)] for g in urows], np.int64)
            grid_a = np.repeat(lidx, uc)
            grid_b = np.tile(lidx, uc)
            a = np.maximum(grid_a, grid_b)
            b = np.minimum(grid_a, grid_b)
            r = sn.rows.size
            sn.child_dst.append(a * r + b)

    iperm = np.empty(n, np.int64)
    iperm[perm] = np.arange(n)
    return SupernodalSymbolic(
        n=n, perm=np.asarray(perm, np.int64), iperm=iperm,
        supernodes=snodes, Up=Up, Ui=Ui,
        max_width=max(sn.cols.size for sn in snodes),
    )


def factorize(symb: SupernodalSymbolic, a_values):
    """Device numeric factorization: returns the list of L panels (r, w)
    per supernode (a pytree — jit/vmap friendly).

    Each front F (r, r) uses only its lower triangle; the update matrix
    passed to the parent is the trailing (r-w, r-w) Schur complement.
    """
    panels = [None] * len(symb.supernodes)
    updates = [None] * len(symb.supernodes)
    for s, sn in enumerate(symb.supernodes):  # postorder by construction
        r = sn.rows.size
        w = sn.cols.size
        F = jnp.zeros((r * r,), a_values.dtype)
        F = F.at[sn.a_dst].add(a_values[sn.a_src])
        for c, dst in zip(sn.child_ids, sn.child_dst):
            # Only the lower triangle: the mirrored position map would
            # double-count symmetric off-diagonal pairs otherwise.
            F = F.at[dst].add(jnp.tril(updates[c]).reshape(-1))
            updates[c] = None
        F = F.reshape(r, r)
        # symmetrize the lower-stored front
        F = jnp.tril(F) + jnp.tril(F, -1).T
        F11 = F[:w, :w]
        L11 = jsl.cholesky(F11, lower=True)
        if r > w:
            L21 = jsl.solve_triangular(L11, F[w:, :w].T, lower=True).T
            U = F[w:, w:] - L21 @ L21.T
            updates[s] = U
            panels[s] = jnp.concatenate([L11, L21], axis=0)
        else:
            updates[s] = jnp.zeros((0, 0), a_values.dtype)
            panels[s] = L11
    return panels


def solve(symb: SupernodalSymbolic, panels, b):
    """Solve A x = b given the supernodal factor panels."""
    x = jnp.asarray(b)[symb.perm]
    # forward: L y = b
    for s, sn in enumerate(symb.supernodes):
        w = sn.cols.size
        P = panels[s]
        xj = jsl.solve_triangular(P[:w, :], x[sn.cols], lower=True)
        x = x.at[sn.cols].set(xj)
        if sn.rows.size > w:
            x = x.at[sn.rows[w:]].add(-(P[w:, :] @ xj))
    # backward: L' x = y
    for s in range(len(symb.supernodes) - 1, -1, -1):
        sn = symb.supernodes[s]
        w = sn.cols.size
        P = panels[s]
        rhs = x[sn.cols]
        if sn.rows.size > w:
            rhs = rhs - P[w:, :].T @ x[sn.rows[w:]]
        x = x.at[sn.cols].set(
            jsl.solve_triangular(P[:w, :].T, rhs, lower=False)
        )
    return x[symb.iperm]


class DeviceSparseCholesky:
    """Convenience wrapper: analyze once, refactorize values per iteration."""

    def __init__(self, A: sp.spmatrix, order: str = "auto",
                 max_supernode: int = 128):
        self.symb = analyze(A, order=order, max_supernode=max_supernode)
        self._factorize = jax.jit(lambda v: factorize(self.symb, v))

    def factorize(self, A: sp.spmatrix):
        vals = jnp.asarray(self.symb.permute_values(A))
        self.panels = self._factorize(vals)
        return self

    def solve(self, b):
        return solve(self.symb, self.panels, b)

    @property
    def n_supernodes(self) -> int:
        return len(self.symb.supernodes)

# ---------------------------------------------------------------------------
# SPARSE_PLAN S3: level-scheduled, shape-bucketed batched numeric phase.
#
# The prototype above traces one dense front per supernode — compile time
# (and XLA program size) grows linearly with the supernode count.  The
# batched phase groups supernodes by elimination-tree level (children
# strictly before parents) and, within a level, buckets them by padded
# (width, update) shape; each bucket is ONE batched Cholesky + triangular
# solve + matmul on a (L, r_pad, r_pad) tensor — MXU food, compile cost
# O(levels x buckets).  All irregularity is precomputed host-side as flat
# gather/scatter-add index arrays; child Schur updates flow through a
# single flat `upd_buf` device array with static per-supernode offsets.
# ---------------------------------------------------------------------------


def _pad_pow2(v: int, lo: int = 8) -> int:
    b = lo
    while b < v:
        b *= 2
    return b


@dataclasses.dataclass
class _Bucket:
    """One (level, shape) group of supernodes, batched on device."""

    w_pad: int
    u_pad: int
    count: int
    cols_idx: np.ndarray     # (L, w_pad) gather/scatter idx into x; dummy = n
    below_idx: np.ndarray    # (L, u_pad) idx of below-diagonal rows; dummy = n
    asm_src: np.ndarray      # gather into a_values (A assembly)
    asm_dst: np.ndarray      # flat scatter into the (L*r_pad*r_pad,) fronts
    pad_dst: np.ndarray      # unit-diagonal positions for width padding
    child_src: np.ndarray    # gather into upd_buf (extend-add)
    child_dst: np.ndarray    # flat scatter into fronts
    upd_src: np.ndarray      # gather from the (L*u_pad*u_pad,) update tensor
    upd_dst: np.ndarray      # scatter (set) into upd_buf
    diag_rows: np.ndarray    # (L, w_pad) real-column mask for factor_ok


@dataclasses.dataclass
class BucketedSymbolic:
    n: int
    perm: np.ndarray
    iperm: np.ndarray
    Up: np.ndarray
    Ui: np.ndarray
    levels: List[List[_Bucket]]   # levels[k] = buckets at tree level k
    total_upd: int


def analyze_batched(A: sp.spmatrix, order: str = "auto",
                    max_supernode: int = 128,
                    relax: int = 16) -> BucketedSymbolic:
    """Host symbolic analysis producing the level/bucket schedule."""
    symb = analyze(A, order=order, max_supernode=max_supernode, relax=relax)
    snodes = symb.supernodes
    nsn = len(snodes)
    n = symb.n

    # Tree levels: leaves at 0, parent strictly above all children.
    level = np.zeros(nsn, np.int64)
    for s in range(nsn):  # postorder: children come first
        p = snodes[s].parent
        if p >= 0:
            level[p] = max(level[p], level[s] + 1)
    nlev = int(level.max()) + 1 if nsn else 0

    # Flat update-buffer offsets (unpadded u*u blocks per supernode).
    u_sizes = np.asarray([sn.rows.size - sn.cols.size for sn in snodes])
    upd_off = np.zeros(nsn + 1, np.int64)
    np.cumsum(u_sizes * u_sizes, out=upd_off[1:])
    total_upd = int(upd_off[-1])

    levels: List[List[_Bucket]] = []
    for lev in range(nlev):
        members = [s for s in range(nsn) if level[s] == lev]
        groups: dict = {}
        for s in members:
            sn = snodes[s]
            w, u = sn.cols.size, sn.rows.size - sn.cols.size
            key = (_pad_pow2(w), _pad_pow2(u) if u else 0)
            groups.setdefault(key, []).append(s)
        bucks = []
        for (w_pad, u_pad), ids in sorted(groups.items()):
            r_pad = w_pad + u_pad
            L = len(ids)
            cols_idx = np.full((L, w_pad), n, np.int32)
            below_idx = np.full((L, max(u_pad, 1)), n, np.int32)
            diag_rows = np.zeros((L, w_pad), bool)
            asm_src, asm_dst = [], []
            pad_dst = []
            child_src, child_dst = [], []
            upd_src, upd_dst = [], []
            for k, s in enumerate(ids):
                sn = snodes[s]
                w = sn.cols.size
                u = sn.rows.size - w
                cols_idx[k, :w] = sn.cols
                if u:
                    below_idx[k, :u] = sn.rows[w:]
                diag_rows[k, :w] = True
                base = k * r_pad * r_pad

                # local position map: eliminated rows keep their index,
                # below-diagonal rows shift to the padded update block.
                def loc(i):
                    return i if i < w else w_pad + (i - w)

                # A assembly (a_dst encodes a*r + b over the UNPADDED front)
                r = sn.rows.size
                for src, dflat in zip(sn.a_src, sn.a_dst):
                    a, b = divmod(int(dflat), r)
                    asm_src.append(int(src))
                    asm_dst.append(base + loc(a) * r_pad + loc(b))
                for i in range(w, w_pad):
                    pad_dst.append(base + i * r_pad + i)

                # extend-add from children (lower-triangle pairs only)
                lmap = {int(g): loc(j) for j, g in enumerate(sn.rows)}
                for c in sn.child_ids:
                    ch = snodes[c]
                    urows = ch.rows[ch.cols.size:]
                    uc = urows.size
                    lidx = np.asarray([lmap[int(g)] for g in urows])
                    off = upd_off[c]
                    for ci in range(uc):
                        for cj in range(ci + 1):
                            a2, b2 = lidx[ci], lidx[cj]
                            if a2 < b2:
                                a2, b2 = b2, a2
                            child_src.append(off + ci * uc + cj)
                            child_dst.append(base + a2 * r_pad + b2)

                # update write-out: padded tensor -> flat unpadded buffer
                ubase = k * u_pad * u_pad
                off = upd_off[s]
                for ci in range(u):
                    for cj in range(u):
                        upd_src.append(ubase + ci * u_pad + cj)
                        upd_dst.append(off + ci * u + cj)

            bucks.append(_Bucket(
                w_pad=w_pad, u_pad=u_pad, count=L,
                cols_idx=cols_idx, below_idx=below_idx,
                asm_src=np.asarray(asm_src, np.int64),
                asm_dst=np.asarray(asm_dst, np.int64),
                pad_dst=np.asarray(pad_dst, np.int64),
                child_src=np.asarray(child_src, np.int64),
                child_dst=np.asarray(child_dst, np.int64),
                upd_src=np.asarray(upd_src, np.int64),
                upd_dst=np.asarray(upd_dst, np.int64),
                diag_rows=diag_rows,
            ))
        levels.append(bucks)

    return BucketedSymbolic(
        n=n, perm=symb.perm, iperm=symb.iperm, Up=symb.Up, Ui=symb.Ui,
        levels=levels, total_upd=total_upd,
    )


def factorize_batched(bs: BucketedSymbolic, a_values):
    """Batched numeric factorization.  Returns panels: one (L, r_pad, w_pad)
    array per bucket, in level-major order (a flat pytree list)."""
    dtype = a_values.dtype
    upd_buf = jnp.zeros((bs.total_upd,), dtype)
    panels = []
    for bucks in bs.levels:
        new_chunks = []
        for bk in bucks:
            Lb, w_pad, u_pad = bk.count, bk.w_pad, bk.u_pad
            r_pad = w_pad + u_pad
            F = jnp.zeros((Lb * r_pad * r_pad,), dtype)
            F = F.at[bk.asm_dst].add(a_values[bk.asm_src])
            if bk.pad_dst.size:
                F = F.at[bk.pad_dst].add(jnp.ones((bk.pad_dst.size,), dtype))
            if bk.child_src.size:
                F = F.at[bk.child_dst].add(upd_buf[bk.child_src])
            F = F.reshape(Lb, r_pad, r_pad)
            F = jnp.tril(F) + jnp.tril(F, -1).transpose(0, 2, 1)
            L11 = jnp.linalg.cholesky(F[:, :w_pad, :w_pad])
            if u_pad:
                L21 = jax.lax.linalg.triangular_solve(
                    L11, F[:, w_pad:, :w_pad], left_side=False,
                    lower=True, transpose_a=True,
                )
                U = F[:, w_pad:, w_pad:] - L21 @ L21.transpose(0, 2, 1)
                new_chunks.append((bk, U))
                panels.append(jnp.concatenate([L11, L21], axis=1))
            else:
                panels.append(L11)
        # write updates after the whole level (siblings never conflict, but
        # batching order inside the level is irrelevant anyway)
        for bk, U in new_chunks:
            upd_buf = upd_buf.at[bk.upd_dst].set(U.reshape(-1)[bk.upd_src])
    return panels


def solve_batched(bs: BucketedSymbolic, panels, b):
    """Level-scheduled batched triangular solves: L y = b, then L' x = y."""
    x = jnp.concatenate([jnp.asarray(b)[bs.perm], jnp.zeros((1,), b.dtype)])
    flat = [bk for bucks in bs.levels for bk in bucks]
    # forward
    for bk, P in zip(flat, panels):
        w_pad, u_pad = bk.w_pad, bk.u_pad
        xj = x[bk.cols_idx]                              # (L, w_pad)
        xj = jax.lax.linalg.triangular_solve(
            P[:, :w_pad, :], xj[..., None], left_side=True, lower=True,
        )[..., 0]
        x = x.at[bk.cols_idx.reshape(-1)].set(xj.reshape(-1))
        if u_pad:
            y = (P[:, w_pad:, :] @ xj[..., None])[..., 0]  # (L, u_pad)
            x = x.at[bk.below_idx.reshape(-1)].add(-y.reshape(-1))
        x = x.at[bs.n].set(0.0)
    # backward
    for bk, P in zip(flat[::-1], panels[::-1]):
        w_pad, u_pad = bk.w_pad, bk.u_pad
        rhs = x[bk.cols_idx]
        if u_pad:
            xb = x[bk.below_idx]                          # (L, u_pad)
            rhs = rhs - (P[:, w_pad:, :].transpose(0, 2, 1) @ xb[..., None])[..., 0]
        xj = jax.lax.linalg.triangular_solve(
            P[:, :w_pad, :], rhs[..., None], left_side=True, lower=True,
            transpose_a=True,
        )[..., 0]
        x = x.at[bk.cols_idx.reshape(-1)].set(xj.reshape(-1))
        x = x.at[bs.n].set(0.0)
    return x[:-1][bs.iperm]


def factor_ok_batched(panels) -> jax.Array:
    """All diagonal pivots finite and positive (padding diag is 1)."""
    ok = jnp.asarray(True)
    for P in panels:
        w = P.shape[-1]
        d = jnp.diagonal(P[:, :w, :], axis1=-2, axis2=-1)
        ok = ok & jnp.all(jnp.isfinite(d)) & jnp.all(d > 0)
    return ok

# ---------------------------------------------------------------------------
# Signed LDL^T numeric phase over the same bucketed symbolic: factorizes
# symmetric QUASI-DEFINITE matrices (reference SURVEY §7.3 #1: "emulate
# [Bunch-Kaufman] via regularized quasi-definite LDL^T — signed diagonal,
# no pivoting").  This is what the augmented KKT [W A'; A dc I] needs: W
# block positive, dual block negative, both kept away from zero by the
# IPM's primal/dual regularization, so no dynamic pivoting is required
# (Vanderbei's quasi-definite factorization theorem — same justification
# as the reference's cuDSS pivotless LDL path).
# ---------------------------------------------------------------------------


def dense_ldl(F):
    """No-pivot LDL^T of (..., w, w) symmetric matrices: F = L D L' with L
    unit lower triangular.  Sequential over columns (w is a supernode panel
    width, <= max_supernode); everything else stays batched."""
    w = F.shape[-1]
    idx = jnp.arange(w)

    def body(j, carry):
        F, L, d = carry
        dj = F[..., j, j]
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


def factorize_batched_ldl(bs: BucketedSymbolic, a_values):
    """Batched supernodal LDL^T.  Returns (panels, dvecs, dglob): per-bucket
    unit-lower panels (L, r_pad, w_pad), pivot vectors (L, w_pad), and the
    global pivot vector in permuted order (n+1, last slot dummy 1)."""
    dtype = a_values.dtype
    upd_buf = jnp.zeros((bs.total_upd,), dtype)
    dglob = jnp.ones((bs.n + 1,), dtype)
    panels, dvecs = [], []
    for bucks in bs.levels:
        new_chunks = []
        for bk in bucks:
            Lb, w_pad, u_pad = bk.count, bk.w_pad, bk.u_pad
            r_pad = w_pad + u_pad
            F = jnp.zeros((Lb * r_pad * r_pad,), dtype)
            F = F.at[bk.asm_dst].add(a_values[bk.asm_src])
            if bk.pad_dst.size:
                F = F.at[bk.pad_dst].add(jnp.ones((bk.pad_dst.size,), dtype))
            if bk.child_src.size:
                F = F.at[bk.child_dst].add(upd_buf[bk.child_src])
            F = F.reshape(Lb, r_pad, r_pad)
            F = jnp.tril(F) + jnp.tril(F, -1).transpose(0, 2, 1)
            L11, d = dense_ldl(F[:, :w_pad, :w_pad])
            dglob = dglob.at[bk.cols_idx.reshape(-1)].set(d.reshape(-1))
            dvecs.append(d)
            if u_pad:
                # Z = F21 L11^{-T};  L21 = Z / d;  U = F22 - Z diag(1/d) Z'
                Z = jax.lax.linalg.triangular_solve(
                    L11, F[:, w_pad:, :w_pad], left_side=False,
                    lower=True, transpose_a=True, unit_diagonal=True,
                )
                L21 = Z / d[:, None, :]
                U = F[:, w_pad:, w_pad:] - Z @ L21.transpose(0, 2, 1)
                new_chunks.append((bk, U))
                panels.append(jnp.concatenate([L11, L21], axis=1))
            else:
                panels.append(L11)
        for bk, U in new_chunks:
            upd_buf = upd_buf.at[bk.upd_dst].set(U.reshape(-1)[bk.upd_src])
    dglob = dglob.at[bs.n].set(1.0)
    return panels, dvecs, dglob


def solve_batched_ldl(bs: BucketedSymbolic, factors, b):
    """Solve A x = b given the supernodal LDL^T factors: L z = b (unit
    lower, level-scheduled), z /= d, L' x = z."""
    panels, _, dglob = factors
    x = jnp.concatenate([jnp.asarray(b)[bs.perm], jnp.zeros((1,), b.dtype)])
    flat = [bk for bucks in bs.levels for bk in bucks]
    for bk, P in zip(flat, panels):
        w_pad, u_pad = bk.w_pad, bk.u_pad
        xj = jax.lax.linalg.triangular_solve(
            P[:, :w_pad, :], x[bk.cols_idx][..., None], left_side=True,
            lower=True, unit_diagonal=True,
        )[..., 0]
        x = x.at[bk.cols_idx.reshape(-1)].set(xj.reshape(-1))
        if u_pad:
            y = (P[:, w_pad:, :] @ xj[..., None])[..., 0]
            x = x.at[bk.below_idx.reshape(-1)].add(-y.reshape(-1))
        x = x.at[bs.n].set(0.0)
    x = x / dglob
    for bk, P in zip(flat[::-1], panels[::-1]):
        w_pad, u_pad = bk.w_pad, bk.u_pad
        rhs = x[bk.cols_idx]
        if u_pad:
            xb = x[bk.below_idx]
            rhs = rhs - (P[:, w_pad:, :].transpose(0, 2, 1) @ xb[..., None])[..., 0]
        xj = jax.lax.linalg.triangular_solve(
            P[:, :w_pad, :], rhs[..., None], left_side=True, lower=True,
            transpose_a=True, unit_diagonal=True,
        )[..., 0]
        x = x.at[bk.cols_idx.reshape(-1)].set(xj.reshape(-1))
        x = x.at[bs.n].set(0.0)
    return x[:-1][bs.iperm]


def bucket_signs(bs: BucketedSymbolic, signs: np.ndarray) -> List[np.ndarray]:
    """Expected pivot signs per bucket column (original order -> buckets);
    padding columns expect +1.  Host-side, once per pattern."""
    sp_perm = np.concatenate([np.asarray(signs)[bs.perm], [1.0]])
    return [
        sp_perm[bk.cols_idx]
        for bucks in bs.levels for bk in bucks
    ]


def factor_ok_batched_ldl(factors, expected_signs) -> jax.Array:
    """Inertia check (reference is_inertia_correct, normalkkt.jl:132-134
    generalized): every pivot finite, nonzero, and of the sign quasi-
    definiteness predicts (+ primal block, - dual block)."""
    _, dvecs, _ = factors
    ok = jnp.asarray(True)
    for d, s in zip(dvecs, expected_signs):
        ok = ok & jnp.all(jnp.isfinite(d)) & jnp.all(d * jnp.asarray(s) > 0)
    return ok

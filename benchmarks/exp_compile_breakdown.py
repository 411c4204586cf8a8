"""Where does the sparse-path compile time go?  (VERDICT round-1 #1)

Round-1 measurements: 190-916 s cold compile per sparse pattern on TPU.
The schedule for the banded LP is already a single lax.scan chain, so item
count alone cannot explain it.  Candidate costs this experiment separates,
on the CPU backend (same XLA frontend passes; absolute times differ from
TPU but rankings transfer):

  1. host symbolic analysis (analyze_batched);
  2. trace+lower time of jit(factorize)/jit(solve) — dominated by folding
     the NUMPY gather/scatter index arrays into the module as constants?
  3. XLA compile time of the lowered module;
  4. the same with index arrays passed as device ARGUMENTS (shapes only in
     the program) — if constants are the problem this collapses 2+3.

Run:  python benchmarks/exp_compile_breakdown.py [--grid 100 | --banded]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np
import scipy.sparse as sp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=100)
    ap.add_argument("--banded", action="store_true")
    ap.add_argument("--cpu", action="store_true", default=True)
    ap.add_argument("--tpu", action="store_true")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import madqp_tpu as mq
    from madqp_tpu.models.generators import grid_lp
    from madqp_tpu.models.qp import build_standard_form_sparse
    from madqp_tpu.ops import sparse_chol as SC

    if args.banded:
        qp = mq.banded_sparse_lp(n=20000, m=10000, band=5, seed=0)
        name = "banded20k"
    else:
        qp = grid_lp(g=args.grid, seed=0)
        name = f"grid{args.grid}"
    std, info, x0, y0 = build_standard_form_sparse(qp)
    A = std.A.tocsc()
    Abool = A.copy()
    Abool.data = np.ones_like(Abool.data)
    S_pat = (Abool @ Abool.T + sp.eye(A.shape[0])).tocsc().sorted_indices()
    print(f"{name}: n={std.A.shape[1]} m={std.A.shape[0]} "
          f"nnz(A)={A.nnz} nnz(S)={S_pat.nnz}")

    t0 = time.time()
    bs = SC.analyze_batched(S_pat, order="auto")
    t_symbolic = time.time() - t0
    from madqp_tpu.ops.sparse_chol import _Chain

    n_items = len(bs.schedule)
    n_chain = sum(isinstance(it, _Chain) for it in bs.schedule)
    const_bytes = 0
    for it in bs.schedule:
        for f in it.__dataclass_fields__:
            v = getattr(it, f)
            if isinstance(v, np.ndarray):
                const_bytes += v.nbytes
    print(f"symbolic: {t_symbolic:.1f}s; {n_items} items "
          f"({n_chain} chains); index arrays {const_bytes/1e6:.1f} MB")

    vals = jnp.asarray(bs.permute_values(S_pat.astype(np.float64)
                                         + 10.0 * sp.eye(S_pat.shape[0])))

    def timed(tag, fn, *a, **kw):
        t0 = time.time()
        out = fn(*a, **kw)
        dt = time.time() - t0
        print(f"{tag:42s} {dt:8.2f}s")
        return out, dt

    # --- constants path (today's implementation) -------------------------
    f = jax.jit(lambda v: SC.factorize_batched(bs, v))
    lowered, t_lower = timed("factorize: trace+lower (constants)", f.lower, vals)
    try:
        txt = lowered.as_text()
        print(f"    lowered module: {len(txt)/1e6:.1f} MB, "
              f"{txt.count(chr(10))} lines")
    except Exception:
        pass
    compiled, t_compile = timed("factorize: XLA compile (constants)",
                                lowered.compile)
    panels, t_run1 = timed("factorize: first run", lambda: jax.block_until_ready(compiled(vals)))

    g = jax.jit(lambda p, b: SC.solve_batched(bs, p, b))
    b = jnp.ones((bs.n,), jnp.float64)
    lowered_s, t_lower_s = timed("solve: trace+lower (constants)",
                                 g.lower, panels, b)
    _, t_compile_s = timed("solve: XLA compile (constants)", lowered_s.compile)

    # --- device-argument path (the shipped configuration) -----------------
    bs_dev = jax.device_put(bs)
    f2 = jax.jit(SC.factorize_batched)
    lowered2, t_lower2 = timed("factorize: trace+lower (dev args)",
                               f2.lower, bs_dev, vals)
    try:
        txt2 = lowered2.as_text()
        print(f"    lowered module: {len(txt2)/1e6:.1f} MB")
    except Exception:
        pass
    compiled2, t_compile2 = timed("factorize: XLA compile (dev args)",
                                  lowered2.compile)
    panels2, _ = timed("factorize: first run (dev args)",
                       lambda: jax.block_until_ready(compiled2(bs_dev, vals)))
    g2 = jax.jit(SC.solve_batched)
    lowered_s2, t_lower_s2 = timed("solve: trace+lower (dev args)",
                                   g2.lower, bs_dev, panels2, b)
    _, t_compile_s2 = timed("solve: XLA compile (dev args)",
                            lowered_s2.compile)

    # numerics check: both paths must agree
    import numpy as _np

    x1 = jax.device_get(jax.jit(lambda p, b: SC.solve_batched(bs, p, b))(panels, b))
    x2 = jax.device_get(lowered_s2.compile()(bs_dev, panels2, b))
    err = float(_np.max(_np.abs(x1 - x2)))
    print(f"    const-vs-args max abs diff: {err:.2e}")

    print()
    print(f"SUMMARY {name}: symbolic {t_symbolic:.1f}s | const: fact "
          f"{t_lower+t_compile:.1f}s solve {t_lower_s+t_compile_s:.1f}s | "
          f"dev-args: fact {t_lower2+t_compile2:.1f}s solve "
          f"{t_lower_s2+t_compile_s2:.1f}s")


if __name__ == "__main__":
    main()

"""Micro-profile of panel_ldl's per-step pieces on the real chip.

panel_ldl(n=8192) measured 3.7 s while its trailing-update GEMMs alone
are worth ~35 ms at the 6-pass-f32 ceiling — something in the per-panel
work costs ~115 ms/step.  Times each candidate (repeated inside one jit
via lax.fori_loop to beat the ~40 ms tunnel latency floor):

  * blocked_ldl on one (256,256) block (the recursive base)
  * inv_unit_lower on one (256,256)
  * XLA cholesky(256) and triangular_solve(256) vs I
  * the full-width masked rank-panel GEMM at npad=8448
  * dynamic_update_slice of a (npad, panel) column into (npad, npad)

Usage: python benchmarks/exp_panel_profile.py [--n 8192] [--panel 256]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--panel", type=int, default=256)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from madqp_tpu.ops.blocked_dense import blocked_ldl, inv_unit_lower

    w = args.panel
    npad = -(-args.n // w) * w
    reps = args.reps
    print(f"device: {jax.devices()[0]}  panel={w} npad={npad} reps={reps}")

    rng = np.random.default_rng(0)
    # pinned f32 (f32/np.sqrt promotes to f64 under x64 — see
    # exp_dense_refresh.py)
    P = (rng.standard_normal((w, w)) / np.sqrt(w)).astype(np.float32)
    F = jnp.asarray(P @ P.T + 2.0 * np.eye(w, dtype=np.float32),
                    jnp.float32)
    L1 = jnp.asarray(np.tril(rng.standard_normal((w, w)).astype(np.float32), -1)
                     + np.eye(w, dtype=np.float32))
    W = jnp.asarray(rng.standard_normal((npad, npad)).astype(np.float32))
    Z = jnp.asarray(rng.standard_normal((npad, w)).astype(np.float32))

    def timed(name, fn, *xs):
        rest = xs[1:]

        def rep(x0):
            def body(i, x):
                out = fn(x, *rest)
                if isinstance(out, tuple):
                    out = out[0]
                # tiny data-dependent perturbation: chains the iterations
                # (no CSE/elision) without changing the math measurably
                s = jnp.sum(out).astype(x0.dtype) * jnp.asarray(1e-30, x0.dtype)
                return x + s
            return jax.lax.fori_loop(0, reps, body, x0)

        f = jax.jit(rep)
        x0 = xs[0]
        f(x0).block_until_ready()
        t0 = time.time()
        f(x0 * 1.000001).block_until_ready()
        total = time.time() - t0
        per = total / reps * 1e3
        print(f"{name:45s} {per:9.3f} ms/op   ({total*1e3:8.1f} ms / {reps})")
        return per

    with jax.default_matmul_precision("highest"):
        timed("blocked_ldl (256,256) recursive", lambda x: blocked_ldl(x)[0], F)
        timed("inv_unit_lower (256,256)", inv_unit_lower, L1)
        timed("xla cholesky (256,256)", jnp.linalg.cholesky, F)
        timed("xla triangular_solve vs I (256,256)",
              lambda x: jax.lax.linalg.triangular_solve(
                  x, jnp.eye(w, dtype=x.dtype), left_side=True, lower=True),
              L1)
        timed(f"masked GEMM update ({npad},{w})@({w},{npad})",
              lambda Wx, Zx: Wx - Zx @ Zx.T, W, Z)
        timed(f"dyn_update_slice col ({npad},{w}) into W",
              lambda Wx, Zx: jax.lax.dynamic_update_slice(Wx, Zx, (0, 0)),
              W, Z)
        timed(f"dynamic_slice (256,{npad}) row from W",
              lambda Wx: jax.lax.dynamic_slice(Wx, (0, 0), (w, npad)), W)


if __name__ == "__main__":
    main()

"""Trustworthy GEMM roofline probe for the factorization panel shapes.

exp_matmul_precision's 64-op chains are now elided by XLA (it reports
>10,000 TF/s), so this probe chains DATA-DEPENDENT matmuls — the output
of step k feeds step k+1 with a rescale, so nothing can be hoisted or
CSE'd — and sizes the chain so one dispatch takes >= 300 ms, far above
the ~40-50 ms tunnel latency floor.  All operands are jit ARGUMENTS
(a closure constant would ship 268 MB to the remote compile server —
HTTP 413).

Shapes measured (the two GEMM archetypes of a right-looking panel
factorization at n=8192):
  * square n x n (the trailing-update upper bound shape)
  * rank-k update n x k @ k x n for k in {256, 512, 1024}

Across f32 default, f32 highest (6-pass bf16), and bf16.

    python benchmarks/exp_gemm_roofline.py [--n 8192] [--chain 32]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--chain", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    n, chain = args.n, args.chain
    print(f"device: {jax.devices()[0]}  n={n} chain={chain}")
    rng = np.random.default_rng(0)

    def bench(label, step, flops_per_step, x0, *ops):
        @jax.jit
        def run(x, *ops):
            def body(i, x):
                return step(x, *ops)
            return jax.lax.fori_loop(0, chain, body, x)

        run(x0, *ops).block_until_ready()  # compile
        t0 = time.time()
        run(x0 * 1.000001, *ops).block_until_ready()
        dt = time.time() - t0
        tf = flops_per_step * chain / dt / 1e12
        print(f"{label:44s} {dt/chain*1e3:9.2f} ms/op  {tf:8.2f} TF/s")

    x0 = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    B = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32)
                    / np.sqrt(n))
    Zs = {k: jnp.asarray(rng.standard_normal((n, k)).astype(np.float32)
                         / np.sqrt(k)) for k in (256, 512, 1024)}

    for prec in ["default", "highest"]:
        with jax.default_matmul_precision(prec):
            bench(f"f32/{prec} square {n}x{n}",
                  lambda x, b: (x @ b) * 0.99, 2 * n * n * n, x0, B)
            for k in (256, 512, 1024):
                bench(f"f32/{prec} rank-{k} update {n}x{k}@{k}x{n}",
                      functools.partial(
                          lambda x, z, k=k:
                          x - (jax.lax.dynamic_slice(x, (0, 0), (n, k))
                               @ z.T) * 1e-6),
                      2 * n * n * k, x0, Zs[k])

    Bb = B.astype(jnp.bfloat16)
    xb = x0.astype(jnp.bfloat16)
    bench(f"bf16 square {n}x{n}",
          lambda x, b: (x @ b) * 0.99, 2 * n * n * n, xb, Bb)


if __name__ == "__main__":
    main()

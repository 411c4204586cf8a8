"""Measure the f64-emulation tax on TPU matmuls.

TPU MXUs have no f64 unit: XLA emulates f64 in software.  This measures
square and batched-front GEMM shapes (the supernodal factorization's hot
op) across dtypes, to size the win of a double-float (split f32) GEMM
for the f64 endgame.

Environment notes: the axon tunnel has ~40-50 ms round-trip latency, so
a single sub-ms matmul is unmeasurable — each timing runs CHAIN
data-dependent matmuls inside one jitted fori_loop and divides.  x64
must be enabled before any computation (madqp_tpu import does).

    python benchmarks/exp_matmul_precision.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CHAIN = 64


def main():
    import madqp_tpu  # noqa: F401  (enables x64 before first computation)
    import jax
    import jax.numpy as jnp
    import numpy as np

    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)

    shapes = [
        ("square-1024", (1024, 1024)),
        ("square-2048", (2048, 2048)),
        ("batched-fronts-256x128", (256, 128, 128)),
    ]
    for name, s in shapes:
        flops = 2 * np.prod(s) * s[-1]
        row = {"shape": name}
        for dt, prec in [("float32", None), ("float32", "highest"),
                         ("bfloat16", None), ("float64", None)]:
            A = jnp.asarray(rng.standard_normal(s) / np.sqrt(s[-1]), dt)
            B = jnp.asarray(rng.standard_normal(s) / np.sqrt(s[-1]), dt)

            @jax.jit
            def chain(a, b):
                def step(_, a):
                    return jnp.matmul(a, b, precision=prec)
                return jax.lax.fori_loop(0, CHAIN, step, a)

            chain(A, B).block_until_ready()  # compile
            t0 = time.time()
            chain(A, B).block_until_ready()
            t = (time.time() - t0) / CHAIN
            key = dt + ("+highest" if prec else "")
            row[key] = f"{t*1e3:.3f}ms {flops/t/1e12:.1f}TF"
        print(row)


if __name__ == "__main__":
    main()

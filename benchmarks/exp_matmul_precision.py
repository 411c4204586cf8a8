"""Measure the f64-emulation tax on TPU matmuls.

TPU MXUs have no f64 unit: XLA emulates f64 in software.  This measures
square and batched-front GEMM shapes (the supernodal factorization's hot
op) across dtypes, to size the win of a double-float (split f32) GEMM
for the f64 endgame.

    python benchmarks/exp_matmul_precision.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench(fn, *args, reps=10):
    out = fn(*args)
    out.block_until_ready()
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    out.block_until_ready()
    return (time.time() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)

    shapes = [
        ("square-1024", (1024, 1024), (1024, 1024)),
        ("square-2048", (2048, 2048), (2048, 2048)),
        ("batched-fronts", (256, 128, 128), (256, 128, 128)),
    ]
    for name, sa, sb in shapes:
        A64 = rng.standard_normal(sa)
        B64 = rng.standard_normal(sb)
        flops = 2 * np.prod(sa) * sb[-1]
        row = {"shape": name}
        for dt, prec in [("float32", None), ("float32", "highest"),
                         ("bfloat16", None), ("float64", None)]:
            a = jnp.asarray(A64, dt)
            b = jnp.asarray(B64, dt)
            f = jax.jit(lambda x, y: jnp.matmul(x, y, precision=prec))
            t = bench(f, a, b)
            key = dt + ("+highest" if prec else "")
            row[key] = f"{t*1e3:.2f}ms {flops/t/1e12:.2f}TF"
        print(row)


if __name__ == "__main__":
    main()
